#!/usr/bin/env python3
"""Per-query bench regression guard.

Compares two Bench JSON artifacts (the {"metric", "value", "queries": {key:
sec}} shape graft.Bench prints and BENCH_FULL.json stores) and separates
real regressions from host noise. This shared VM shows up-to-~2x run-to-run
variance (BASELINE.md), but that noise is UNIFORM — so the guard first
estimates the host-speed ratio between the two runs, normalizes every
per-query ratio by it, and only then flags moves beyond the threshold. A
single key moving 2.8x while the median sits at 1.0 is a regression; every
key moving 1.8x together is a slow host.

Host-speed estimation has two modes:

 - PER-SEGMENT (r14, both artifacts carry "host_sentinel_mid"): graft.Bench
   times keys in SORTED order and emits a single-thread sentinel reading
   every 100 keys, so each key's position maps to a segment bracketed by
   two sentinel readings. A key's host factor is the ratio of its segment's
   bracket means (new/old) — this localizes mid-suite host drift the
   pre/post brackets can only detect, not place. The sentinel calibration
   residue (sentinels measure ALU speed, not 32-thread suite throughput) is
   then removed by re-centering on the median sentinel-normalized ratio.
 - GLOBAL (fallback for pre-r14 artifacts): the median per-query ratio over
   common keys.

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


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)  # accept a bare {key: sec} map too
    if not isinstance(q, dict) or not q:
        sys.exit(f"{path}: no per-query timings found")
    return d if isinstance(d.get("queries"), dict) else {"queries": q}


def segment_table(d):
    """(boundaries, speeds) for a run carrying mid sentinels, else None.

    Keys are timed in sorted order (r14 Bench); segment s covers sorted
    positions [boundaries[s], boundaries[s+1]) and its host speed is the
    mean of its two bracketing sentinel readings (seconds — higher is a
    slower host).
    """
    mids = d.get("host_sentinel_mid")
    pre, post = d.get("host_sentinel_pre_s"), d.get("host_sentinel_post_s")
    if not mids or pre is None or post is None:
        return None
    mids = sorted(mids, key=lambda m: m["after_key"])
    n = len(d["queries"])
    boundaries = [0] + [m["after_key"] for m in mids] + [n]
    # a BENCH_SUMMARY artifact carries only the top-30 queries while its
    # mid checkpoints reference full-suite positions — the boundaries go
    # non-monotonic and segment assignment would be garbage; fall back
    # to global normalization (use BENCH_FULL for per-segment work)
    if any(boundaries[i] >= boundaries[i + 1]
           for i in range(len(boundaries) - 1)):
        return None
    readings = [pre] + [m["s"] for m in mids] + [post]
    speeds = [(readings[i] + readings[i + 1]) / 2.0
              for i in range(len(readings) - 1)]
    return boundaries, speeds


def seg_of(pos, boundaries):
    for s in range(len(boundaries) - 1):
        if boundaries[s] <= pos < boundaries[s + 1]:
            return s
    return len(boundaries) - 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="flag normalized per-query ratios above this")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore keys faster than this in both runs")
    ap.add_argument("--tiers", metavar="BENCH_TIERS.json",
                    help="per-key tier budgets: flag NEW-run keys over "
                         "their tier's fair-band bar")
    ap.add_argument("--enforce-tiers", action="store_true",
                    help="exit 1 when any key exceeds its tier budget")
    args = ap.parse_args()

    dold, dnew = load(args.old), load(args.new)
    old = {k: float(v) for k, v in dold["queries"].items()}
    new = {k: float(v) for k, v in dnew["queries"].items()}
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

    # per-segment sentinel factor when both runs carry mid checkpoints;
    # position = index in each run's own sorted full key list (the order
    # Bench timed them in)
    seg_old, seg_new = segment_table(dold), segment_table(dnew)
    sent_factor = {}
    if seg_old and seg_new:
        pos_old = {k: i for i, k in enumerate(sorted(old))}
        pos_new = {k: i for i, k in enumerate(sorted(new))}
        bo, so = seg_old
        bn, sn = seg_new
        for k in comparable:
            f_old = so[seg_of(pos_old[k], bo)]
            f_new = sn[seg_of(pos_new[k], bn)]
            sent_factor[k] = f_new / f_old
        pairs = [f"seg{j}:{v:.3f}" for j, v in enumerate(sn)]
        print("per-segment sentinel speeds (new run, s): " +
              ", ".join(pairs))
        pairs = [f"seg{j}:{v:.3f}" for j, v in enumerate(so)]
        print("per-segment sentinel speeds (old run, s): " +
              ", ".join(pairs))
        # re-center: sentinels track ALU speed, not 32-thread suite
        # throughput — the residual calibration comes out as the median
        # of the sentinel-normalized ratios
        resid = statistics.median(
            ratios[k] / sent_factor[k] for k in comparable)
        norm_of = {k: ratios[k] / sent_factor[k] / resid
                   for k in comparable}
        print(f"normalization: per-SEGMENT sentinel factors, residual "
              f"median {resid:.2f}")
    else:
        host = statistics.median(ratios.values())
        norm_of = {k: ratios[k] / host for k in comparable}
        print(f"normalization: GLOBAL median per-query ratio "
              f"(host-speed estimate): {host:.2f}"
              + ("" if seg_old or seg_new else
                 " [no host_sentinel_mid in either artifact]"))

    common = comparable
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"common keys: {len(common)}; total {tot_old:.1f}s -> "
          f"{tot_new:.1f}s")

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
        norm = norm_of[k]
        if norm > args.threshold or norm < 1.0 / args.threshold:
            flagged.append((norm, k))
    flagged.sort(reverse=True)

    # absolute per-key tier budgets (BENCH_TIERS.json, r14): the
    # relative guard above cannot say whether 4 s is FINE for a key —
    # the tier table records why each expensive key is allowed its cost
    # and the fair-band bar it must stay under
    over = []
    if args.enforce_tiers and not args.tiers:
        sys.exit("--enforce-tiers requires --tiers BENCH_TIERS.json")
    tiers_advisory = False
    if args.tiers:
        with open(args.tiers) as f:
            t = json.load(f)
        budgets = {name: spec["budget_s"] for name, spec in
                   t["tiers"].items()}
        key_tier = t.get("keys", {})
        # a typo'd tier name must be a diagnostic, not a KeyError
        # traceback mid-check
        bad_tiers = sorted((k, tr) for k, tr in key_tier.items()
                           if tr not in budgets)
        if bad_tiers:
            k0, t0 = bad_tiers[0]
            sys.exit(f"{args.tiers}: key '{k0}' names unknown tier "
                     f"'{t0}' ({len(bad_tiers)} key(s) affected; known "
                     f"tiers: {', '.join(sorted(budgets))})")
        sfref = t.get("sf")
        # exact basename match: "sf0.1" must not accept sf0.15/sf0.12 —
        # budgets are calibrated for one scale factor only
        sfnew = str(dnew.get("sf", "")).rstrip("/").rsplit("/", 1)[-1]
        if sfref and sfref != sfnew:
            print(f"tier budgets are calibrated for {sfref}; new run "
                  f"sf='{sfnew}' — skipping the tier check")
        else:
            # budgets are FAIR-BAND bars: on a degraded host raw seconds
            # overshoot them without any code regression (the relative
            # guard above normalizes for host speed; this gate must
            # too). Scale each key's bar by its segment's single-thread
            # sentinel vs the band center, and when the MT sentinel
            # condemns the host outright (32-thread contention the
            # single-thread sentinel cannot see), downgrade the gate to
            # advisory — re-run on a fair host for an enforceable read.
            band = t.get("fair_band", {})
            st_lo, st_hi = band.get("single_s", [1.30, 1.40])
            mt_lo, mt_hi = band.get("mt_s", [1.45, 1.70])
            st_center = (st_lo + st_hi) / 2.0
            seg = segment_table(dnew)
            pos = {k: i for i, k in enumerate(sorted(new))}
            st_all = [dnew.get("host_sentinel_pre_s"),
                      dnew.get("host_sentinel_post_s")] + \
                     [m["s"] for m in dnew.get("host_sentinel_mid", [])]
            st_all = [v for v in st_all if v is not None]

            def host_factor(k):
                if seg:
                    b, sp = seg
                    s = sp[seg_of(pos[k], b)]
                elif st_all:
                    s = sum(st_all) / len(st_all)
                else:
                    return 1.0  # pre-sentinel artifact: raw bars
                return max(1.0, s / st_center)

            mt_all = [dnew.get("host_sentinel_mt_pre_s"),
                      dnew.get("host_sentinel_mt_post_s")]
            mt_all = [v for v in mt_all if v is not None]
            if mt_all and max(mt_all) > 1.2 * mt_hi:
                tiers_advisory = True
                print(f"WARNING: new run's MT sentinel "
                      f"{max(mt_all):.2f}s is far above the fair band "
                      f"(≤{mt_hi:.2f}s) — contended host; tier check "
                      "is ADVISORY (re-run on a fair host to enforce)")
            if st_all and max(st_all) > st_hi:
                print(f"note: single-thread sentinel up to "
                      f"{max(st_all):.2f}s (band {st_lo:.2f}–"
                      f"{st_hi:.2f}s) — tier bars scaled per segment")
            for k, v in sorted(new.items(), key=lambda kv: -kv[1]):
                if v <= 0:
                    continue
                tier = key_tier.get(k, "screen")
                bar = budgets[tier] * host_factor(k)
                if v > bar:
                    over.append((v, bar, tier, k))
            if over:
                print(f"\nover tier budget ({len(over)} keys; fair-band "
                      f"{sfref} bars"
                      + (", host-scaled" if any(host_factor(k) > 1.0
                         for _, _, _, k in over) else "") + "):")
                for v, b, tier, k in over:
                    print(f"  {k}: {v:.2f}s > {b:.1f}s [{tier}]")
            else:
                print("tier budgets: every key within its tier's bar")

    fail = newly_failed or (args.enforce_tiers and over
                            and not tiers_advisory)
    if not flagged:
        print(f"no per-query move beyond {args.threshold}x after "
              "host-speed normalization")
        return 1 if fail else 0
    print(f"\nmoves beyond {args.threshold}x (host-normalized):")
    for norm, k in flagged:
        arrow = "REGRESSED" if norm > 1 else "improved"
        print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s "
              f"(raw {ratios[k]:.2f}x, normalized {norm:.2f}x) {arrow}")
    return 1 if (fail or any(n > 1 for n, _ in flagged)) else 0


if __name__ == "__main__":
    sys.exit(main())
