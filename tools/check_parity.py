#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query dir in
<outDir>, loads the Spark parquet result, runs the matching oracle SQL from
oracle_sql.json in DuckDB (views over the same testdata parquet), sorts columns
by name, and value-compares row by row. Dev tool only — not part of the engine.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [[norm(row[c]) for c in spark_cols]
                      for row in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})"); continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        duck_cols = sorted(duck.column_names)
        duck_rows = [[norm(row[c]) for c in duck_cols] for row in duck.to_pylist()]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}"); n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
