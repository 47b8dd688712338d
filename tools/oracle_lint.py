#!/usr/bin/env python3
"""Oracle output-TYPE lint — the regression guard for the rank1/graph5
HUGEINT failure class.

The driver's correctness gate hashes DuckDB oracle values against the
Spark-written parquet after sorting columns by name; it can only agree
when both engines SERIALIZE the value identically. DuckDB silently
widens integer aggregates (sum(BIGINT) -> HUGEINT, window sums too) and
`x // y` keeps the widened type, so one uncast window-sum anywhere in
the board makes that oracle's repr() diverge from the Spark long even
when the VALUES are equal (the r10 `rank1_running_revenue` red). This
gate runs every `SparkEntry.oracleSql` entry through DuckDB's binder
(LIMIT 0 — types only, no data scan) and fails unless every output
column types to one of the CLOSED set below, i.e. the types whose
DuckDB repr is bit-compatible with the Spark parquet value:

  BIGINT    <- Spark LongType (every fixed-point *_x1eN column)
  DOUBLE    <- Spark DoubleType (bit-exact parity queries)
  VARCHAR   <- StringType
  DATE      <- DateType
  BOOLEAN   <- BooleanType
  TIMESTAMP <- TimestampType (micros on both sides; events.ts round-trips)

HUGEINT, DECIMAL(p,s), FLOAT, and sub-64-bit integers are all rejected:
HUGEINT/DECIMAL repr as Decimal('...') vs int/float; FLOAT loses the
bit-exact contract; INTEGER/SMALLINT signal a missing CAST that DuckDB
may widen differently from Spark elsewhere in the expression.

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
Exit 0 = every oracle's every column is in the allowed set.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ALLOWED = {"BIGINT", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN", "TIMESTAMP"}


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    n_ok = 0
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            # LIMIT 0 binds and types the full query without scanning
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            offending = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                         if str(t) not in ALLOWED]
        except Exception as e:
            bad.append((name, f"bind error: {e}"))
            continue
        if offending:
            bad.append((name, f"disallowed output type(s): {offending}"))
        else:
            n_ok += 1
    for name, why in bad:
        print(f"LINT-FAIL {name}: {why}")
    print(f"== oracle type lint: {n_ok} ok / {len(bad)} bad "
          f"(allowed: {sorted(ALLOWED)}) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
