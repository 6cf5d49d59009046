#!/usr/bin/env python3
"""Audit SparkEntry.queries coverage against SURVEY.md §2's key inventory.

Parses the §2 tables for `key` names (first backticked token per row) and
diffs them against the declared queries, observed as the per-key output
directories of a prior `graft.Verify` run.

Usage: python3 scripts/coverage_check.py [verify_out_dir]
"""
import re
import sys
from pathlib import Path

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

# §2 keys that are intentionally not queryable (SURVEY/VERDICT rulings)
NON_QUERYABLE = {
    "sink_parquet",          # exercised by the Verify write path
    "llm_multimodal_schema", # design-only: MULTIMODAL.md + Multimodal.scala
    "stream_late_data",      # test-only: StreamingSpec late-drop test
}


def survey_keys():
    keys = []
    in_s2 = False
    for line in SURVEY.read_text().splitlines():
        if line.startswith("## §2"):
            in_s2 = True
            continue
        if in_s2 and line.startswith("## §"):
            break
        if in_s2 and line.startswith("| `"):
            m = re.match(r"\| `([a-z0-9_]+)`", line)
            if m:
                keys.append(m.group(1))
    return keys


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify_sf001"
    if not Path(out_dir).is_dir():
        sys.exit(f"no Verify output at {out_dir} — run "
                 f'`sbt "runMain graft.Verify <sfDir> {out_dir}"` first')
    declared = {p.name for p in Path(out_dir).iterdir()
                if p.is_dir()}
    skeys = survey_keys()
    missing = [k for k in skeys
               if k not in declared and k not in NON_QUERYABLE]
    extra = sorted(declared - set(skeys))
    print(f"SURVEY §2 keys: {len(skeys)} "
          f"({len(skeys) - len(NON_QUERYABLE)} queryable)")
    print(f"declared queries with output: {len(declared)}")
    if missing:
        print(f"MISSING ({len(missing)}): {missing}")
    else:
        print("MISSING: none — full §2 coverage")
    print(f"beyond-§2 extensions ({len(extra)}): {extra}")
    sys.exit(1 if missing else 0)


if __name__ == "__main__":
    main()
