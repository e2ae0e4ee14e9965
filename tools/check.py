#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (Spark result) and
<verifyOutDir>/oracle_sql.json, runs each oracle against the sfDir tables
registered as views, and compares (columns sorted by name, rows sorted,
values exactly). Dev-only tool; the engine itself is pure Scala/Spark.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            else:
                row.append(str(v))
        out.append(tuple(row))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_glob}'")
            scols = sorted(sdf.columns)
            srows = canon(con.sql(
                f"SELECT {', '.join(scols)} FROM '{spark_glob}'").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            odf = con.sql(sql)
            ocols = sorted(odf.columns)
            orows = canon(con.sql(
                f"SELECT {', '.join(ocols)} FROM ({sql}) oq").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema mismatch spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # Type drift hazard: DuckDB promotes sum(int) to HUGEINT (and some
        # exprs to DECIMAL), which the driver's hasher renders differently
        # from Spark's int64 even when Python values compare equal
        # (CORRECTNESS_r02: q14/q22/q32/q33). Narrow int widths (TINYINT vs
        # int32) are harmless — q29 passed with one. A DECIMAL oracle column
        # is only a hazard when the Spark column is NOT the same decimal
        # type (same precision/scale renders identically) — ADVICE r3.
        stypes = dict(zip(sdf.columns, map(str, sdf.types)))
        otypes = dict(zip(odf.columns, map(str, odf.types)))
        hazard = {c: t for c, t in otypes.items()
                  if t == "HUGEINT"
                  or (t.startswith("DECIMAL") and stypes.get(c) != t)}
        if hazard:
            print(f"FAIL {name}: oracle type hazard (add CAST): {hazard}")
            n_fail += 1
        elif srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}, "
                  f"first diffs: {[(srows[i], orows[i]) for i in diffs[:2]] if diffs else 'length-only'}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    # queries with no oracle: just report row counts
    have = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in have:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {name}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
