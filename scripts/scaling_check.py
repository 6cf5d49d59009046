#!/usr/bin/env python3
"""Measured scaling audit: compare per-query bench times at two scale
factors and flag keys whose growth exceeds the data-size ratio.

Usage:
  python3 scripts/scaling_check.py <bench_small.json> <bench_big.json> \
      [--data-ratio 10] [--threshold 1.5] [--min-sec 0.5]

A key is flagged when time_big / max(time_small, floor) >
data_ratio * threshold — i.e. it grew more than `threshold`× worse
than linear between the two scale factors. Keys under --min-sec at the
BIG scale are skipped (fixed JVM/codegen overhead dominates and the
ratio is noise). The floor (0.05 s) stops division blow-ups on
sub-overhead small-scale timings.

Interpretation notes:
 - sub-linear ratios are normal here: per-query fixed overhead
   (session, codegen, parquet footer reads) is a large share at small
   scale factors;
 - a key near the linear ratio with heavy shuffles is expected;
 - anything flagged is a candidate quadratic pair space or a plan that
   lost a pushdown at scale — read its .explain before believing it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        line = f.read()
    j = json.loads(line[line.index('{'):])
    return j["queries"], j.get("sf", "?")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.split("=", 1) if "=" in a else (a, "")
                for a in sys.argv[1:] if a.startswith("--"))
    ratio = float(opts.get("--data-ratio", 10))
    thresh = float(opts.get("--threshold", 1.5))
    min_sec = float(opts.get("--min-sec", 0.5))
    small, sf_s = load(args[0])
    big, sf_b = load(args[1])
    common = sorted(set(small) & set(big))
    print(f"common keys: {len(common)}; small={sf_s} big={sf_b}; "
          f"flag if > {ratio}x data ratio * {thresh} tolerance")
    flagged = []
    rows = []
    for k in common:
        ts, tb = small[k], big[k]
        if ts < 0 or tb < 0 or tb < min_sec:
            continue
        r = tb / max(ts, 0.05)
        rows.append((r, k, ts, tb))
        if r > ratio * thresh:
            flagged.append((r, k, ts, tb))
    rows.sort(reverse=True)
    print("\nworst growth ratios (time_big/time_small; linear ==",
          f"{ratio}x):")
    for r, k, ts, tb in rows[:15]:
        print(f"  {r:6.1f}x  {k}  {ts:.3f}s -> {tb:.3f}s")
    if flagged:
        print(f"\nFLAGGED ({len(flagged)}) — grew worse than "
              f"{ratio * thresh:.0f}x:")
        for r, k, ts, tb in sorted(flagged, reverse=True):
            print(f"  {r:6.1f}x  {k}  {ts:.3f}s -> {tb:.3f}s")
        sys.exit(1)
    print("\nno key grew worse than the tolerance — no superlinear "
          "candidates at this scale step")


if __name__ == "__main__":
    main()
