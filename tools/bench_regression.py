#!/usr/bin/env python3
"""Cross-round bench regression gate (r10 VERDICT #6).

Compares two graft.Bench output JSONs and FAILS (exit 1) when any query
shared by both rounds worsens by more than --factor x (default 2.0) AND
by more than --abs seconds (default 0.25 s): the absolute floor filters
the sub-second fixed-overhead jitter on trivially small queries (the
pipeline_split/pipeline_redact class round 10's judge had to hand-triage)
while the factor catches real plan regressions on queries that matter.

Ratios are NORMALIZED by the suite drift — the MEDIAN per-query ratio
over the shared set — before gating: a round that adds queries raises
JVM/GC contention across the whole suite, inflating every data-bound
query's full-suite time by a common factor (verified: dedup_minhash,
whose code did not change r9 -> r10, measured 2.85 s inside the
126-query r10 suite, per-pass spread [3.7, 2.8, 11.5], but 1.62 s run
alone). The median is robust to a handful of genuinely-regressed
queries, so a real plan regression still trips the gate while uniform
drift cancels. --no-normalize gates on raw ratios.

Accepted input formats, per file:
  - graft.Bench stdout/bench_out.json: {"queries": {name: sec | [sec,...]}}
    (per-pass arrays take min-of-passes — Bench reports min-of-3);
  - the driver's BENCH_r{N}.json wrapper: {"parsed": {...}} when populated,
    else the last {"metric":...} line found inside its "tail" capture.

Usage:
  python3 tools/bench_regression.py PREV.json CURR.json [--factor 2.0] [--abs 0.25]

Exit codes: 0 = gate passes, 1 = regressions found, 2 = unusable input.
Compare against the previous round's artifact, e.g.:
  git show <prev-round-commit>:bench_out.json > /tmp/prev.json
  python3 tools/bench_regression.py /tmp/prev.json bench_out.json
"""

import argparse
import json
import re
import sys


def warn_contention(path, doc):
    """Surface the artifact's load_check self-description (r11: machine
    contention produced phantom 3-6x regressions on unchanged queries).
    A 1-min loadavg already high BEFORE the run, or clearly above the
    benchmark's own core count after it, marks the numbers suspect."""
    lc = doc.get("load_check") or (doc.get("parsed") or {}).get("load_check")
    if not isinstance(lc, dict):
        return
    cpus = float(lc.get("cpus", 0) or 0)
    before, after = float(lc.get("before", -1)), float(lc.get("after", -1))
    if cpus <= 0:
        return
    if before > 0.5 * cpus or after > 1.5 * cpus:
        print(f"WARNING {path}: load_check before={before} after={after} "
              f"cpus={int(cpus)} — artifact self-reports machine contention; "
              f"treat regressions as suspect", file=sys.stderr)


def load_queries(path):
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"bench_regression: cannot read {path}: {e}", file=sys.stderr)
        sys.exit(2)
    warn_contention(path, doc)
    queries = doc.get("queries")
    if queries is None and isinstance(doc.get("parsed"), dict):
        queries = doc["parsed"].get("queries")
    if queries is None and isinstance(doc.get("tail"), str):
        # Driver wrapper with parsed=null: fish the bench line out of the
        # raw stdout tail (it may be truncated at the front — only accept
        # a line that parses whole).
        for line in reversed(doc["tail"].splitlines()):
            m = re.search(r'\{"metric".*\}', line)
            if m:
                try:
                    queries = json.loads(m.group(0)).get("queries")
                    break
                except json.JSONDecodeError:
                    continue
    if not isinstance(queries, dict) or not queries:
        # Exit 2 = unusable input (documented contract) — distinct from
        # exit 1 = regressions found, so CI callers can tell them apart.
        print(f"bench_regression: no per-query timings in {path}", file=sys.stderr)
        sys.exit(2)
    out = {}
    for name, v in queries.items():
        out[name] = min(v) if isinstance(v, list) else float(v)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="fail when curr > factor * prev (default 2.0)")
    ap.add_argument("--abs", dest="abs_floor", type=float, default=0.25,
                    help="...and curr - prev exceeds this many seconds (default 0.25)")
    ap.add_argument("--no-normalize", action="store_true",
                    help="gate on raw ratios instead of suite-drift-normalized ones")
    args = ap.parse_args()

    prev = load_queries(args.prev)
    curr = load_queries(args.curr)
    shared = sorted(set(prev) & set(curr))
    if not shared:
        print("bench_regression: no shared queries between the two artifacts")
        return 2

    drift = 1.0
    if not args.no_normalize:
        ratios = sorted(curr[n] / prev[n] for n in shared)
        mid = len(ratios) // 2
        drift = ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2

    regressed, improved = [], 0
    for name in shared:
        p, c = prev[name], curr[name]
        if c / drift > p * args.factor and c - p > args.abs_floor:
            regressed.append((name, p, c))
        elif c < p:
            improved += 1

    print(f"bench_regression: {len(shared)} shared queries "
          f"({len(curr) - len(shared)} new in curr, {len(prev) - len(shared)} dropped), "
          f"suite drift {drift:.2f}x, {improved} improved, {len(regressed)} regressed "
          f"(gate: >{args.factor}x drift-normalized and >{args.abs_floor}s)")
    if regressed:
        width = max(len(n) for n, _, _ in regressed)
        for name, p, c in regressed:
            print(f"  REGRESSED {name:<{width}}  {p:8.3f}s -> {c:8.3f}s  "
                  f"({c / p:.2f}x raw, {c / p / drift:.2f}x normalized)")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
