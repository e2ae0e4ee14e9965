package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventOps, MovieLensQ, Relational, SearchOps, TextOps, TrainingOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
  * extensions) appears in [[queries]] via the [[QueryDef]] registry; where
  * the semantics are ANSI-SQL-expressible the DuckDB twin lives in
  * [[oracleSql]] (same column names, deterministic ordering, exact-decimal
  * interior math so cross-engine hash compare is stable).
  */
object SparkEntry {

  /** Single source of truth: query + oracle defined together so names can't
    * drift between the two maps (ADVICE.md r1).
    */
  val defs: Seq[QueryDef] = {
    val all = Relational.defs ++ SearchOps.defs ++ TextOps.defs ++
      EventOps.defs ++ VectorOps.defs ++ MovieLensQ.defs ++ TrainingOps.defs
    val dups = all.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names would silently drop entries: $dups")
    all
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.stripMargin.trim)).toMap
}
