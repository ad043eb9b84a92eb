#!/usr/bin/env python3
"""Dev-only correctness harness mimicking the driver's DuckDB-oracle compare.

Usage:
  python3 scripts/check.py [outDir] [sfDir]

Assumes Verify has already been run:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"

For each query: load Spark parquet result + run oracle SQL in DuckDB with
views over the sfDir parquet tables; compare columns IN DECLARED ORDER
(the driver's hash is column-order sensitive — sorting columns here masked
the ev_props_json red row through rounds 3-4), sort rows, and compare
values exactly (doubles via repr). NOT part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # columns stay in DECLARED order — the driver's hash respects it
    out = [tuple(norm(v) for v in r) for r in rows]
    out.sort(key=repr)
    return list(cols), out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
        elif s_rows != d_rows:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows; "
                  f"first diffs: {diff[:3]}"
                  + (f" extra_spark={s_rows[len(d_rows):][:2]}" if len(s_rows) > len(d_rows) else "")
                  + (f" extra_duck={d_rows[len(s_rows):][:2]}" if len(d_rows) > len(s_rows) else ""))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
