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
In --history-runs mode the guard is anchored to the NEWEST full-board
entry: if that one was contaminated, the gate exits 2 rather than
silently adjudicating older clean runs (the tree's most recent
measurement would never have been judged), and when fewer than N
adjudicable entries exist it warns loudly that the noise filter is
weaker than requested.

Flagging: ratio = current / best, flagged when ratio > threshold AND
best >= --floor seconds (default 0.15 s — sub-150 ms queries jitter
2x on scheduler noise alone and carry no scale signal) AND the
absolute excess (current - best) > --min-delta seconds (default 1.0).
The delta floor is the host-noise calibration: measured on identical
trees back-to-back (r14), sub-second queries swing +/-60% between
sentinel-clean exclusive runs (q13 0.32 vs 0.77 s, d10 0.24 vs 0.37 s),
so a pure ratio gate flags ~5 random small queries every run; a plan
regression that matters at scale costs whole seconds and still flags.
New queries (no prior record) are listed informationally, never
flagged.

Multiple current runs: pass several bench.json files (positional) and
the per-query MIN across them is adjudicated — a plan regression is
PERSISTENT across exclusive runs, while this host's noise moves
between them (measured r14, identical tree back-to-back: totals
153.9 vs 132.3 s, both sentinel-clean; 41 vs 21 queries above 1.5x
of the r13 record with only 7 in common, each of those swinging
+/-50% between the two runs). Single-run 1.5x-vs-best on this host
cries wolf by construction; min-of-2 at the same threshold is the
calibrated form of the same gate.

Accepted costs: bench/accepted_costs.json maps query -> {"seconds":
t, "reason": ...} for queries whose cost was RAISED deliberately
(e.g. an oracle upgraded from a 5-row flag to a corpus-sized
value-carrying emission). The rolling best is clamped UP to the
accepted value, so the old cheaper records stop flagging the
intentional change while any regression beyond the accepted cost
still flags.

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
    ap.add_argument("current", nargs="*",
                    default=[os.path.join(REPO, "bench", "bench.json")],
                    help="bench.json of the run(s) to adjudicate; with "
                         "several, the per-query MIN is judged (plan "
                         "regressions persist, host noise moves)")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag when current/best exceeds this (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.15,
                    help="ignore queries whose best is below this many "
                         "seconds (default 0.15)")
    ap.add_argument("--min-delta", type=float, default=1.0,
                    help="flag only when current exceeds best by more than "
                         "this many seconds (default 1.0 — the measured "
                         "host-noise envelope; see module doc)")
    ap.add_argument("--history-runs", type=int, default=0,
                    help="instead of bench.json, adjudicate the min over "
                         "the last N full-board history.jsonl entries "
                         "(non-subset, clean sentinel, same SF as the "
                         "newest) — the committed-record form of the "
                         "min-of-N protocol")
    ap.add_argument("--max-spread", type=float, default=1.5,
                    help="refuse to adjudicate a run whose sentinel spread "
                         "exceeds this (default 1.5)")
    ap.add_argument("--baseline", action="append", default=[],
                    help="extra per-query record file(s) to fold into the "
                         "rolling best")
    ap.add_argument("--history", default=None,
                    help="history.jsonl path for --history-runs mode "
                         "(default bench/history.jsonl; exists so the "
                         "in-suite negative controls can feed a synthetic "
                         "history)")
    args = ap.parse_args()

    runs = []
    if args.history_runs > 0:
        hist = args.history or os.path.join(REPO, "bench", "history.jsonl")
        if not os.path.exists(hist):
            print("bench_diff: --history-runs but no bench/history.jsonl")
            return 2
        # full-board (non-subset) entries, clean and contaminated alike:
        # the contamination filter must not silently slide the window
        # back onto older runs — if the NEWEST full-board run was
        # excluded for contamination, the tree's most recent measurement
        # was never judged, and "ok" over older runs would be a lie.
        # (Subset entries are excluded by design, not contamination —
        # they never make a run "newest".)
        full_board = []
        with open(hist) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                qs = d.get("queries")
                if isinstance(qs, dict) and qs and not d.get("subset"):
                    full_board.append(d)
        if not full_board:
            print("bench_diff: no adjudicable full-board history entries")
            return 2
        newest = full_board[-1]
        if (newest.get("spread") or 0) > args.max_spread:
            print(f"bench_diff: NOT ADJUDICATED — the newest full-board "
                  f"history entry has sentinel spread {newest.get('spread')} "
                  f"> {args.max_spread}: the most recent measurement of "
                  "this tree overlapped external load; re-run the bench "
                  "exclusively and try again")
            return 2
        entries = [d for d in full_board
                   if (d.get("spread") or 0) <= args.max_spread]
        newest_sf = newest.get("sf")
        runs = [d for d in entries
                if d.get("sf") == newest_sf][-args.history_runs:]
        if len(runs) < args.history_runs:
            print(f"bench_diff: WARNING — only {len(runs)} adjudicable "
                  f"full-board run(s) at {newest_sf}, fewer than the "
                  f"{args.history_runs} requested; min-of-{len(runs)} is a "
                  "weaker noise filter (see module doc)")
        print(f"bench_diff: adjudicating min over the last {len(runs)} "
              f"committed full-board run(s) at {newest_sf}")
    else:
        paths = args.current if args.current else \
            [os.path.join(REPO, "bench", "bench.json")]
        for p in paths:
            try:
                with open(p) as f:
                    runs.append(json.load(f))
            except (OSError, ValueError) as e:
                print(f"bench_diff: cannot read current run {p}: {e}")
                return 2
    cur_qs = {}
    cur_sf = None
    spread = None
    for cur in runs:
        qs = cur.get("queries") or {}
        if not qs:
            print("bench_diff: a current run carries no per-query times")
            return 2
        sp = cur.get("spread") if "spread" in cur \
            else (cur.get("sentinel") or {}).get("spread")
        if sp is not None and sp > args.max_spread:
            print(f"bench_diff: NOT ADJUDICATED — sentinel spread {sp} "
                  f"> {args.max_spread}: the sweep overlapped external "
                  "load; re-run the bench exclusively and try again")
            return 2
        if cur_sf is not None and cur.get("sf") != cur_sf:
            print(f"bench_diff: current runs mix scale factors "
                  f"({cur_sf} vs {cur.get('sf')})")
            return 2
        cur_sf = cur.get("sf")
        spread = sp if spread is None else max(spread, sp or 0)
        for q, t in qs.items():
            t = float(t)
            prev = cur_qs.get(q)
            # min across runs; a -1 failure in ANY run stays a failure
            if t < 0 or (prev is not None and prev < 0):
                cur_qs[q] = -1.0
            elif prev is None or t < prev:
                cur_qs[q] = t

    best = {}
    best_src = {}
    n_sources = 0
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

    # deliberate cost increases: clamp the rolling best UP to the
    # accepted value so pre-change records stop flagging the accepted
    # change, while regressions beyond it still flag
    accepted_path = os.path.join(REPO, "bench", "accepted_costs.json")
    if os.path.exists(accepted_path):
        with open(accepted_path) as f:
            accepted = json.load(f)
        for q, entry in accepted.items():
            t = float(entry["seconds"])
            if q in best and best[q] < t:
                best[q] = t
                best_src[q] = f"accepted: {entry.get('reason', '?')}"

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
        if ratio > args.threshold and t - b > args.min_delta:
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
