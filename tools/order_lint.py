#!/usr/bin/env python3
"""Oracle ORDER-determinism lint — the regression guard for the rank1
tie-hazard class (the second oracle failure class that has actually
bitten, alongside oracle_lint.py's HUGEINT types).

The driver hashes rows in oracle ORDER BY order, so an oracle whose
top-level ORDER BY is not a TOTAL order is nondeterministic across
engines the moment the data grows ties: both engines sort correctly,
but tied rows land in engine-chosen order and the row-for-row hash
diverges (the round-9/10 `rank1_running_revenue` hazard — afterwards
reasoned about ad hoc per query, and 247 oracles of hand-reasoning is
exactly how it bit in the first place).

Method — no expression parsing, the probe edits the ORDER BY in place
so every alias / ordinal / qualified / inner-scope reference keeps its
original binding:

  1. locate the top-level ORDER BY (paren/quote-aware: window ORDER BYs
     and CTE-internal ones sit at depth > 0) and the top-level LIMIT;
  2. strip the LIMIT — a top-k's ties matter at the boundary of the
     FULL pre-limit set, where two engines pick different rows; the
     post-limit result would hide exactly those;
  3. run the query twice, appending OPPOSITE full-output-row tiebreaks
     to the ORDER BY clause ( , "c1" ASC, "c2" ASC…  vs  …DESC…) and
     compare the sequences. Inside an ORDER-BY-tie group the two runs
     emit distinct rows in opposite order, so ANY difference == a tie
     group holding ≥2 distinct rows == a real cross-engine hash hazard.
     Groups of exact full-row duplicates (bag-semantics queries) are
     hash-invariant under any permutation and correctly pass.

  A query with NO top-level ORDER BY passes only when it returns ≤ 1
  row (order is trivially total); otherwise the driver's row-for-row
  compare makes it a failure outright.

Usage: python3 tools/order_lint.py <sfDir> <oracle_sql.json>
Exit 0 = every oracle's ORDER BY is a total order (up to full-row
duplicates) on that SF's data.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> documented justification for an intentionally non-total ORDER
# BY. Every entry must PROVE hash-invariance in its comment. Kept empty
# by design: full-row-duplicate ties already pass without whitelisting.
WHITELIST = {}


def find_top_level(sql, word_re):
    """(start, end) spans of word_re matches at paren depth 0, outside
    single-quoted strings."""
    depth, i, in_str = 0, 0, False
    spans = []
    while i < len(sql):
        c = sql[i]
        if in_str:
            if c == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = word_re.match(sql, i)
            if m:
                spans.append((m.start(), m.end()))
                i = m.end()
                continue
        i += 1
    return spans


ORDER_RE = re.compile(r"ORDER\s+BY\b", re.IGNORECASE)
LIMIT_RE = re.compile(r"LIMIT\s+\d+\b", re.IGNORECASE)


def probe_pair(sql, out_cols):
    """The two opposite-tiebreak query texts, or None if the sql has no
    top-level ORDER BY."""
    orders = find_top_level(sql, ORDER_RE)
    if not orders:
        return None
    clause_start = orders[-1][1]
    tail = sql[clause_start:]
    limits = find_top_level(tail, LIMIT_RE)
    if limits:
        ins = clause_start + limits[0][0]   # insert before the LIMIT...
        rest = clause_start + limits[0][1]  # ...which is spliced out
    else:
        ins = rest = len(sql)
    def with_tiebreak(direction):
        # ordinals, not names: an output alias sharing its name with
        # several FROM columns would bind ambiguously; ORDER BY ordinals
        # always denote the output row's columns
        tb = ", " + ", ".join(f"{i + 1} {direction}"
                              for i in range(len(out_cols)))
        return sql[:ins] + tb + " " + sql[rest:]
    return with_tiebreak("ASC"), with_tiebreak("DESC")


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    n_ok = n_wl = 0
    bad = []
    for name, sql in sorted(oracle.items()):
        if name in WHITELIST:
            n_wl += 1
            continue
        try:
            out_cols = con.sql(f"SELECT * FROM ({sql}) LIMIT 0").columns
            pair = probe_pair(sql, out_cols)
            if pair is None:
                n = con.sql(f"SELECT count(*) FROM ({sql}) __q").fetchall()[0][0]
                if n <= 1:
                    n_ok += 1  # a ≤1-row result is trivially totally ordered
                else:
                    bad.append((name, f"no top-level ORDER BY with {n} rows — "
                                "the driver compares row-for-row"))
                continue
            asc, desc = pair
            rows_asc = con.sql(asc).fetchall()
            rows_desc = con.sql(desc).fetchall()
        except Exception as e:
            bad.append((name, f"probe error: {e}"))
            continue
        if rows_asc != rows_desc:
            first = next((i for i, (a, b) in
                          enumerate(zip(rows_asc, rows_desc)) if a != b), -1)
            bad.append((name, "ORDER BY is not a total order: opposite "
                        f"tiebreaks reorder distinct rows (first diff at row "
                        f"{first}: {rows_asc[first]} vs {rows_desc[first]})"))
        else:
            n_ok += 1
    for name, why in bad:
        print(f"ORDER-LINT-FAIL {name}: {why}")
    print(f"== oracle order lint: {n_ok} ok / {len(bad)} bad / "
          f"{n_wl} whitelisted ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
