#!/usr/bin/env python3
"""Per-query bench regression guard.

Compares two Bench JSON artifacts (the {"metric", "value", "queries": {key:
sec}} shape graft.Bench prints and BENCH_FULL.json stores) and separates
real regressions from host noise. This shared VM shows up-to-~2x run-to-run
variance (BASELINE.md), but that noise is UNIFORM — so the guard first
estimates the host-speed ratio between the two runs as the median per-query
ratio over common keys, normalizes every ratio by it, and only then flags
per-query moves beyond the threshold. A single key moving 2.8x while the
median sits at 1.0 is a regression; every key moving 1.8x together is a
slow host.

Usage:
  python3 scripts/bench_diff.py OLD.json NEW.json [--threshold 2.0]
                                [--min-sec 0.2]

Exit code 1 when any normalized regression exceeds the threshold (keys
faster than --min-sec in BOTH runs are ignored: sub-200ms timings are
scheduler jitter, not plans).
"""
import argparse
import json
import statistics
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)  # accept a bare {key: sec} map too
    if not isinstance(q, dict) or not q:
        sys.exit(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in q.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="flag normalized per-query ratios above this")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore keys faster than this in both runs")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common query keys between the two runs")

    # graft.Bench times errored keys as -1; treat any non-positive timing
    # as "did not run" — a key that errored in one run but not the other
    # is a hard finding on its own, never a ratio
    bad_old = {k for k in common if old[k] <= 0}
    bad_new = {k for k in common if new[k] <= 0}
    newly_failed = sorted(bad_new - bad_old)
    recovered = sorted(bad_old - bad_new)
    if newly_failed:
        print(f"ERRORED in the new run (timed <= 0): "
              f"{', '.join(newly_failed)}")
    if recovered:
        print(f"recovered (errored in old run, now timed): "
              f"{', '.join(recovered)}")
    comparable = [k for k in common if k not in bad_old and k not in bad_new]
    if not comparable:
        sys.exit("no key has a positive timing in both runs — "
                 "nothing to compare")

    ratios = {k: new[k] / old[k] for k in comparable}
    host = statistics.median(ratios.values())
    common = comparable
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"common keys: {len(common)}; total {tot_old:.1f}s -> "
          f"{tot_new:.1f}s; median per-query ratio (host-speed estimate): "
          f"{host:.2f}")

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"new keys (+{sum(new[k] for k in added):.1f}s): "
              f"{', '.join(added)}")
    if removed:
        print(f"removed keys: {', '.join(removed)}")

    flagged = []
    for k in common:
        if old[k] < args.min_sec and new[k] < args.min_sec:
            continue
        norm = ratios.get(k, 1.0) / host
        if norm > args.threshold or norm < 1.0 / args.threshold:
            flagged.append((norm, k))
    flagged.sort(reverse=True)

    if not flagged:
        print(f"no per-query move beyond {args.threshold}x after "
              "host-speed normalization")
        return 1 if newly_failed else 0
    print(f"\nmoves beyond {args.threshold}x (host-normalized):")
    for norm, k in flagged:
        arrow = "REGRESSED" if norm > 1 else "improved"
        print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s "
              f"(raw {ratios[k]:.2f}x, normalized {norm:.2f}x) {arrow}")
    return 1 if (newly_failed or any(n > 1 for n, _ in flagged)) else 0


if __name__ == "__main__":
    sys.exit(main())
