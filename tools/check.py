#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables and
compares against the Spark-written parquet in <verifyOutDir>/<name>/.
Comparison: sort columns by name, sort rows, exact value equality
(floats compared exactly — parity queries are designed to be bit-exact).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    # Order-sensitive: every query carries a total ORDER BY on both sides,
    # so results must match row-for-row (stricter than the driver needs —
    # an order-only diff is reported distinctly below).
    return [tuple("NULL" if v is None else repr(v) for v in r) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = norm(con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall())
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = norm(con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
        elif spark_rows != duck_rows:
            if sorted(spark_rows) == sorted(duck_rows):
                print(f"FAIL {name}: ORDER-ONLY mismatch (same multiset; "
                      f"ORDER BY is not a total order)")
            else:
                diffs = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b]
                print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
                      f" first-diffs={diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
