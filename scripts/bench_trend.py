#!/usr/bin/env python3
"""Append the current BENCH_SUMMARY.json as a row to BENCH_TREND.md so
round-over-round drift is visible without git archaeology (r12 verdict
#8). Carries BOTH sentinel forms — BASELINE.md declares the MT reading
the load-bearing one for host fairness.
Usage: python3 scripts/bench_trend.py <round> [note...]"""
import json
import sys

round_id = sys.argv[1]
note = " ".join(sys.argv[2:]) or "-"
d = json.load(open("BENCH_SUMMARY.json"))
total, n = d["value"], d["n_queries"]
if n <= 0:
    sys.exit("BENCH_SUMMARY.json has n_queries <= 0 — not a full run")
pre = d.get("host_sentinel_pre_s", "-")
post = d.get("host_sentinel_post_s", "-")
mt_pre = d.get("host_sentinel_mt_pre_s", "-")
mt_post = d.get("host_sentinel_mt_post_s", "-")
row = (f"| {round_id} | {total:.1f} | {n} | {total / n:.3f} "
       f"| {pre} | {post} | {mt_pre} | {mt_post} | {note} |\n")
with open("BENCH_TREND.md", "a") as f:
    f.write(row)
print(row, end="")
