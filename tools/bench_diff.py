#!/usr/bin/env python3
"""Per-query bench drift gate: current run vs the rolling best.

Automates the drift-vs-regression adjudication that used to live in
COVERAGE.md prose: every full-board bench run is compared QUERY BY
QUERY against the best time each query has ever recorded in the
committed records, and anything slower than --threshold (default
1.5x) is flagged with a nonzero exit — next to the two lints in the
round checklist.

Rolling-best sources (min over all of them, per query):
  * bench/baseline_*.json   — pinned full-board snapshots (r13 seed)
  * bench/history.jsonl     — entries that carry a "queries" dict
                              (Bench appends per-query times since r14)
The current run's own history line may be among the sources; that is
harmless — min() lets an older, faster record win, so a slow current
run still flags.

Contamination guard: a run whose own sentinel spread exceeds
--max-spread (default 1.5; the Bench sentinel contract) is NOT
adjudicated — exit 2, "re-run exclusively". A contaminated sweep
inflates arbitrary queries and would cry regression on host noise.

Flagging: ratio = current / best, flagged when ratio > threshold AND
best >= --floor seconds (default 0.15 s — sub-150 ms queries jitter
2x on scheduler noise alone and carry no scale signal). New queries
(no prior record) are listed informationally, never flagged.

Exit codes: 0 clean, 1 regression flagged, 2 not adjudicated
(contaminated or no current run).
"""
import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_sources(explicit):
    """Yield (label, sf, {query: seconds}) per committed record."""
    paths = sorted(glob.glob(os.path.join(REPO, "bench", "baseline_*.json")))
    for p in paths + list(explicit):
        try:
            with open(p) as f:
                d = json.load(f)
            qs = d.get("queries")
            if isinstance(qs, dict) and qs:
                yield os.path.basename(p), d.get("sf"), qs
        except (OSError, ValueError) as e:
            print(f"bench_diff: skipping {p}: {e}", file=sys.stderr)
    hist = os.path.join(REPO, "bench", "history.jsonl")
    if os.path.exists(hist):
        with open(hist) as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                qs = d.get("queries")
                if isinstance(qs, dict) and qs:
                    yield (f"history:{i + 1}@{d.get('utc', '?')}",
                           d.get("sf"), qs)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("current", nargs="?",
                    default=os.path.join(REPO, "bench", "bench.json"),
                    help="bench.json of the run to adjudicate")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag when current/best exceeds this (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.15,
                    help="ignore queries whose best is below this many "
                         "seconds (default 0.15)")
    ap.add_argument("--max-spread", type=float, default=1.5,
                    help="refuse to adjudicate a run whose sentinel spread "
                         "exceeds this (default 1.5)")
    ap.add_argument("--baseline", action="append", default=[],
                    help="extra per-query record file(s) to fold into the "
                         "rolling best")
    args = ap.parse_args()

    try:
        with open(args.current) as f:
            cur = json.load(f)
    except (OSError, ValueError) as e:
        print(f"bench_diff: cannot read current run {args.current}: {e}")
        return 2
    cur_qs = cur.get("queries") or {}
    if not cur_qs:
        print(f"bench_diff: {args.current} carries no per-query times")
        return 2
    spread = (cur.get("sentinel") or {}).get("spread")
    if spread is not None and spread > args.max_spread:
        print(f"bench_diff: NOT ADJUDICATED — sentinel spread {spread} > "
              f"{args.max_spread}: the sweep overlapped external load; "
              "re-run the bench exclusively and try again")
        return 2

    best = {}
    best_src = {}
    n_sources = 0
    cur_sf = cur.get("sf")
    for label, sf, qs in load_sources(args.baseline):
        # a record timed at a different scale factor is not comparable —
        # an sf0.001 subset iteration run must never become the "best"
        # an sf0.1 full-board run is judged against
        if sf != cur_sf:
            continue
        n_sources += 1
        for q, t in qs.items():
            try:
                t = float(t)
            except (TypeError, ValueError):
                continue
            if t >= 0 and (q not in best or t < best[q]):
                best[q] = t
                best_src[q] = label
    if not best:
        print("bench_diff: no per-query records found under bench/ — "
              "commit a baseline_*.json or run a full bench first")
        return 2

    flagged, improved, new, failed = [], [], [], []
    for q, t in sorted(cur_qs.items()):
        t = float(t)
        if t < 0:
            failed.append(q)
            continue
        if q not in best:
            new.append((q, t))
            continue
        b = best[q]
        if b < args.floor:
            continue
        ratio = t / b
        if ratio > args.threshold:
            flagged.append((ratio, q, t, b, best_src[q]))
        elif ratio < 1 / args.threshold:
            improved.append((ratio, q, t, b))

    for ratio, q, t, b, src in sorted(flagged, reverse=True):
        print(f"REGRESSION {q}: {t:.3f}s vs best {b:.3f}s "
              f"({ratio:.2f}x, best from {src})")
    for q, t in new:
        print(f"new {q}: {t:.3f}s (no prior record)")
    for ratio, q, t, b in sorted(improved):
        print(f"improved {q}: {t:.3f}s vs best {b:.3f}s ({ratio:.2f}x)")
    if failed:
        print(f"failed (-1) in current run: {', '.join(failed)}")
    verdict = "FAIL" if flagged or failed else "ok"
    print(f"== bench drift gate: {verdict} — {len(flagged)} flagged / "
          f"{len(cur_qs)} queries, {len(new)} new, {len(improved)} improved, "
          f"best-of {n_sources} records, spread "
          f"{spread if spread is not None else 'n/a'} ==")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
