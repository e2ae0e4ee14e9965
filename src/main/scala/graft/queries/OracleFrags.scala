package graft.queries

import graft.ops.{TextStats, Training}

/** Shared DuckDB-oracle CTE fragments, parameterized by their source CTE —
  * the single-source-of-truth rule for composed gates: q87's pipeline twin
  * is BUILT from the same fragments that gate each stage individually
  * (q78 clusters, q80 quality/chunk/pack, q86 decontamination), so a
  * semantic drift in any stage breaks both its own gate and every
  * composition that embeds it.
  */
object OracleFrags {

  /** The distinct word-3-shingle fragment (the `Dedup.wordShingles` twin,
    * w=3): emits CTEs `toks, sh` over `$src(doc_id, text)` with
    * `sh(doc_id, shingle)` distinct per doc. Shared by [[lshPairsCtes]]
    * and the novelty gate (q125).
    */
  def shinglesCtes(src: String): String = s"""
        toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
          FROM $src),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
          FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
          WHERE len(t) >= 3)"""

  /** The source-overlap fragment (q127/q130/q131): distinct (source,
    * shingle) index, per-source shingle totals, and the pairwise overlap
    * matrix with Jaccard. Emits CTEs `ss, sz, ov` over the `sh` CTE of
    * [[shinglesCtes]] (call that first) joined back to `$src` for the
    * source label; `ov(src_a < src_b, n_shared, sz_a, sz_b, jaccard)`.
    */
  def sourceOverlapCtes(src: String): String = s"""
        ss AS (
          SELECT DISTINCT d.source, s.shingle
          FROM sh s JOIN $src d USING (doc_id)),
        sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source),
        ov AS (
          SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS n_shared, za.n AS sz_a, zb.n AS sz_b,
            round(CAST(count(*) AS DOUBLE)
              / CAST(za.n + zb.n - count(*) AS DOUBLE), 4) AS jaccard
          FROM ss a
          JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
          JOIN sz za ON za.source = a.source
          JOIN sz zb ON zb.source = b.source
          GROUP BY a.source, b.source, za.n, zb.n)"""

  /** The top-3-partner provenance edge fragment (q130/q131): symmetrized
    * overlap rows ranked per source by (n_shared desc, partner). Emits
    * CTEs `sym, rk, edges` over [[sourceOverlapCtes]]' `ov`.
    */
  def provenanceEdgesCtes: String = s"""
        sym AS (
          SELECT src_a AS src, src_b AS dst, n_shared, jaccard FROM ov
          UNION ALL SELECT src_b, src_a, n_shared, jaccard FROM ov),
        rk AS (
          SELECT src, dst, n_shared,
            row_number() OVER (PARTITION BY src ORDER BY n_shared DESC, dst) AS rn
          FROM sym),
        edges AS (SELECT src, dst FROM rk WHERE rn <= 3)"""

  /** The budget-driven mixture-epochs fragment (q123/q131): per-source
    * token mass, corpus total, linear-in-index weights replayed from the
    * source name, and the final epochs/over-cap frame. Emits CTEs
    * `mt, mtot, mw, mix` over `$src(source, n_chars)`;
    * `mix(source, tokens, weight, target_tokens, epochs, over_cap)`.
    */
  def mixtureEpochsCtes(src: String): String = s"""
        mt AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens
          FROM $src GROUP BY source),
        mw AS (
          SELECT source, tokens,
            (CAST(substr(source, 4) AS INTEGER) + 1) / 210.0 AS weight
          FROM mt
          WHERE CAST(substr(source, 4) AS INTEGER) BETWEEN 0 AND 19),
        -- the budget's corpus mass sums the MIXTURE's sources only (the
        -- mixture defines the corpus — same rule as the operator); with
        -- the fixture's src0..src19 this equals the all-source total, but
        -- the fragment must not depend on that
        mtot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM mw),
        mix AS (
          SELECT mw.source, mw.tokens, mw.weight,
            round(mw.weight * 2.0 * CAST(mtot.total AS DOUBLE), 4) AS target_tokens,
            round(mw.weight * 2.0 * CAST(mtot.total AS DOUBLE)
              / CAST(mw.tokens AS DOUBLE), 4) AS epochs,
            round(mw.weight * 2.0 * CAST(mtot.total AS DOUBLE)
              / CAST(mw.tokens AS DOUBLE), 4) > 2.0 AS over_cap
          FROM mw, mtot)"""

  /** The MinHash signature fragment (k=4, w=3 — the
    * `Dedup.minhashSignaturesScanLocal` twin): emits CTEs `toks, sh, sig`
    * over `$src(doc_id, text)` with `sig(doc_id, s0..s3)`. Shared by
    * [[lshPairsCtes]] and the CDC signature-index gate (q187).
    */
  def sigCtes(src: String): String = s"""${shinglesCtes(src)},
        sig AS (
          SELECT doc_id,
            min(('0x' || substr(md5('mh0' || shingle), 1, 8))::BIGINT) AS s0,
            min(('0x' || substr(md5('mh1' || shingle), 1, 8))::BIGINT) AS s1,
            min(('0x' || substr(md5('mh2' || shingle), 1, 8))::BIGINT) AS s2,
            min(('0x' || substr(md5('mh3' || shingle), 1, 8))::BIGINT) AS s3
          FROM sh GROUP BY doc_id)"""

  /** The LSH candidate-pair fragment (q78/q83/q85/q87/q92): scan-local
    * MinHash (k=4, w=3), 2 bands of 2 rows, band-bucket pairs. Emits CTEs
    * `toks, sh, sig, bands, pairs` over `$src(doc_id, text)`, with
    * `pairs(id_a < id_b)`.
    */
  def lshPairsCtes(src: String): String = s"""${sigCtes(src)},
        bands AS (
          SELECT doc_id, 0 AS band_idx, s0::VARCHAR || '_' || s1::VARCHAR AS band_key FROM sig
          UNION ALL
          SELECT doc_id, 1 AS band_idx, s2::VARCHAR || '_' || s3::VARCHAR AS band_key FROM sig),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id)"""

  /** [[lshPairsCtes]] + reachability closure (q78/q83/q87): symmetric
    * closure, recursive walk. Adds CTEs `edges, walk`. The enclosing query
    * must start `WITH RECURSIVE`.
    */
  def dedupWalkCtes(src: String): String = s"""${lshPairsCtes(src)},
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs
          UNION SELECT id_a, id_a FROM pairs
          UNION SELECT id_b, id_b FROM pairs),
        walk AS (
          SELECT src AS id, src AS component FROM edges
          UNION
          SELECT e.src AS id, w.component
          FROM walk w JOIN edges e ON e.dst = w.id)"""

  /** The content-anchored span-window fragment (q93/q95): all
    * `spanTokens`-token windows of `$src(doc_id, text)`, fingerprinted,
    * thinned by the fp-prefix anchor rule. Emits CTEs `toks, w, a` with
    * `a(doc_id, span_fp)` — the twin of `Training.anchoredWindows`.
    */
  def anchoredWindowsCtes(src: String, spanTokens: Int, anchorMod: Int): String = s"""
        toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
          FROM $src WHERE text IS NOT NULL),
        w AS (
          SELECT doc_id,
            substr(md5(array_to_string(t[i:i+${spanTokens - 1}], ' ')), 1, 16) AS span_fp
          FROM toks, unnest(generate_series(1, len(t) - ${spanTokens - 1})) AS g(i)
          WHERE len(t) >= $spanTokens),
        a AS (
          SELECT doc_id, span_fp FROM w
          WHERE ('0x' || substr(span_fp, 1, 8))::BIGINT % $anchorMod = 0)"""

  /** The exact-dedup keeper fragment (q80/q87): canonical-md5 groups, keep
    * the min id. Emits `$out(doc_id, text)` over `$src(doc_id, text)`.
    */
  def exactKeepCtes(src: String, out: String): String = s"""
        ${out}_k AS (
          SELECT min(doc_id) AS doc_id FROM $src
          GROUP BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))),
        $out AS (
          SELECT d.doc_id, d.text FROM $src d JOIN ${out}_k k USING (doc_id))"""

  /** The quality-score filter fragment (q80/q87, replaying
    * [[TextStats.qualityScore]]'s exact arithmetic): emits `$out(doc_id,
    * text)` = rows of `$src` whose rounded score ≥ $minScore.
    */
  def qualityCtes(src: String, out: String, minScore: Double): String = {
    val stops = TextStats.qualityStopwords.map(w => s"'$w'").mkString(", ")
    s"""
        ${out}_f AS (
          SELECT doc_id,
            CAST(len(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS DOUBLE) AS n_toks,
            CAST(length(text) AS DOUBLE) AS n_chars,
            CAST(len(list_filter(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                     x -> list_contains([$stops], x))) AS DOUBLE) AS stop_hits
          FROM $src),
        ${out}_sc AS (
          SELECT doc_id,
            (CASE WHEN n_toks >= 10 AND n_toks <= 100000 THEN 1.0 ELSE 0.3 END) * 0.4
          + (CASE WHEN n_chars / greatest(n_toks, 1.0) >= 2.5
                   AND n_chars / greatest(n_toks, 1.0) <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.4
          + (CASE WHEN stop_hits / greatest(n_toks, 1.0) >= 0.01 THEN 1.0 ELSE 0.5 END) * 0.2
            AS raw FROM ${out}_f),
        $out AS (
          SELECT s.doc_id, s.text FROM $src s JOIN ${out}_sc USING (doc_id)
          WHERE round(raw, 4) >= $minScore)"""
  }

  /** The decontamination pair fragment (q76/q86/q87): distinct word-3-
    * shingles of `$src(doc_id, text)`, split-tagged by the generated CASE,
    * test×train shared-shingle counts ≥ `minShared`. Emits
    * `$out(test_id, train_id, n_shared)`.
    */
  def contamPairsCtes(
      src: String, out: String, splits: Seq[(String, Double)],
      minShared: Long): String = s"""
        ${out}_toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
          FROM $src),
        ${out}_sh AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
          FROM ${out}_toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
          WHERE len(t) >= 3),
        ${out}_tagged AS (
          SELECT doc_id, shingle, ${Training.splitSql("doc_id", splits)} AS split
          FROM ${out}_sh),
        $out AS (
          SELECT a.doc_id AS test_id, b.doc_id AS train_id, count(*) AS n_shared
          FROM ${out}_tagged a JOIN ${out}_tagged b ON a.shingle = b.shingle
          WHERE a.split = 'test' AND b.split = 'train'
          GROUP BY 1, 2 HAVING count(*) >= $minShared)"""

  /** The containment-drop fragment (q114/q120, replaying
    * [[graft.ops.Dedup.containmentKeepers]]): word-3-shingles of
    * `$src(doc_id, text)`, Broder containment both directions, drop the
    * subsumed side (both over the bar → the higher id). Emits
    * `${out}_dropped(doc_id)` and `$out` = the surviving rows of `$src`.
    */
  def containmentDropCtes(src: String, out: String, minContainment: Double): String = s"""
        ${out}_toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
          FROM $src),
        ${out}_sh AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
          FROM ${out}_toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
          WHERE len(t) >= 3),
        ${out}_sz AS (SELECT doc_id, count(*) AS s FROM ${out}_sh GROUP BY doc_id),
        ${out}_ip AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM ${out}_sh a JOIN ${out}_sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        ${out}_cp AS (
          SELECT id_a, id_b,
            CAST(inter AS DOUBLE) / sa.s AS c_a,
            CAST(inter AS DOUBLE) / sb.s AS c_b
          FROM ${out}_ip
          JOIN ${out}_sz sa ON sa.doc_id = id_a
          JOIN ${out}_sz sb ON sb.doc_id = id_b
          WHERE greatest(CAST(inter AS DOUBLE) / sa.s,
                         CAST(inter AS DOUBLE) / sb.s) >= $minContainment),
        ${out}_dropped AS (
          SELECT DISTINCT
            CASE WHEN c_a >= $minContainment AND c_b >= $minContainment
                   THEN greatest(id_a, id_b)
                 WHEN c_a >= $minContainment THEN id_a
                 ELSE id_b END AS doc_id
          FROM ${out}_cp),
        $out AS (
          SELECT s.* FROM $src s LEFT JOIN ${out}_dropped d USING (doc_id)
          WHERE d.doc_id IS NULL)"""

  /** The per-source quota fragment (q103/q106): emits `$out` = the rows of
    * `$src` (which must carry doc_id + source) whose hash handle ranks ≤
    * `cap` within their source — the twin of [[Training.sourceQuota]].
    */
  def sourceQuotaCtes(
      src: String, out: String, cap: Long,
      seed: String = "graft-domain-cap"): String = s"""
        ${out}_r AS (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY ${Training.hashHexSql("doc_id", seed)}, doc_id) AS rn
          FROM $src),
        $out AS (SELECT * EXCLUDE (rn) FROM ${out}_r WHERE rn <= $cap)"""

  /** The target-affinity fragment (q102/q106): emits `$out(doc_id,
    * n_tokens, tgt_mass, all_mass, affinity)` over `$src(doc_id, text,
    * ...)`, with the target slice defined by `$targetExpr` — the twin of
    * [[Training.targetAffinity]]. Counts are computed over `$src` itself
    * (the corpus the scores are relative to — in a composition that is
    * the RETAINED corpus, not the raw one).
    */
  def affinityCtes(src: String, out: String, targetExpr: String): String = s"""
        ${out}_toks AS (
          SELECT doc_id, $targetExpr AS tgt,
            unnest(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS tok
          FROM $src WHERE text IS NOT NULL),
        ${out}_cnt AS (
          SELECT tok, count(*) AS c_all,
            sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
          FROM ${out}_toks GROUP BY tok),
        $out AS (
          SELECT t.doc_id, count(*) AS n_tokens,
            CAST(sum(c.c_tgt) AS BIGINT) AS tgt_mass,
            CAST(sum(c.c_all) AS BIGINT) AS all_mass,
            CAST(sum(c.c_tgt) AS DOUBLE) / sum(c.c_all) AS affinity
          FROM ${out}_toks t JOIN ${out}_cnt c USING (tok) GROUP BY t.doc_id)"""

  /** The chunk → cid/split/shard → per-(split, shard) packing fragment
    * (q80/q87): emits the final `SELECT split, shard, bin, n_chunks,
    * bin_tokens` over `$src(doc_id, text)`. Call LAST — this fragment
    * closes the query.
    */
  def chunkPackSelect(
      src: String, chunkSize: Int, budget: Long,
      splits: Seq[(String, Double)]): String = s"""
        ${src}_toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
          FROM $src WHERE text IS NOT NULL),
        ${src}_ch AS (
          SELECT doc_id, CAST(i AS INTEGER) AS chunk_start,
            CAST(len(t[i:i+${chunkSize - 1}]) AS INTEGER) AS chunk_tokens
          FROM ${src}_toks, unnest(generate_series(1, greatest(len(t), 1), $chunkSize)) AS g(i)),
        ${src}_cids AS (
          SELECT doc_id * 1000000 + chunk_start AS cid, chunk_tokens,
            ${Training.splitSql("doc_id", splits)} AS split,
            ${Training.hashHexSql("doc_id * 1000000 + chunk_start", "graft-pack", hexChars = 1)} AS shard
          FROM ${src}_ch),
        ${src}_w AS (
          SELECT split, shard, cid, chunk_tokens,
            sum(chunk_tokens) OVER (PARTITION BY split, shard ORDER BY cid) AS cum
          FROM ${src}_cids)
        SELECT split, shard, CAST(floor((cum - chunk_tokens) / $budget) AS BIGINT) AS bin,
          count(*) AS n_chunks, CAST(sum(chunk_tokens) AS BIGINT) AS bin_tokens
        FROM ${src}_w GROUP BY split, shard, bin ORDER BY split, shard, bin"""
}
