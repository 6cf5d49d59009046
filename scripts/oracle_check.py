#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate (SURVEY.md §5.3).

Usage:
  python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [keyFilter...]

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` already ran (or
run with --run to invoke it). For each key in oracle_sql.json it executes the
oracle SQL in DuckDB against the sfDir parquet tables and compares with the
Spark parquet output: row count, column names (sorted), and exact cell
values. Mirrors the driver: sort columns by name, hash ordered content.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr: bit-exact compare
    return repr(v)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_verify = "--run" in sys.argv
    sf_dir, out_dir = args[0], args[1]
    key_filter = set(args[2:])

    if run_verify:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    failures = []

    # Schema guard over EVERY declared output (including no-oracle keys):
    # the driver's pandas comparator sorts every Spark output by all
    # columns, and raw ARRAY/STRUCT/MAP columns crash it with
    # "unhashable type: numpy.ndarray" (CORRECTNESS_r02 fn_array_ops /
    # llm_fingerprint). Flatten (concat_ws / to_json) before declaring.
    for key_dir in sorted(p for p in Path(out_dir).iterdir() if p.is_dir()):
        if key_filter and key_dir.name not in key_filter:
            continue
        parts = sorted(str(p) for p in key_dir.glob("*.parquet"))
        if not parts:
            continue
        try:
            desc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({parts!r})").fetchall()
        except Exception as e:
            print(f"FAIL {key_dir.name}: unreadable Spark output: {e}")
            n_fail += 1
            failures.append(key_dir.name)
            continue
        bad_cols = [(c[0], c[1]) for c in desc
                    if "[]" in c[1] or c[1].startswith(("STRUCT", "MAP"))]
        if bad_cols:
            print(f"FAIL {key_dir.name}: nested output columns break the "
                  f"driver comparator: {bad_cols}")
            n_fail += 1
            failures.append(key_dir.name)
    schema_failed = set(failures)
    for key in sorted(oracle):
        if key_filter and key not in key_filter:
            continue
        if key in schema_failed:
            continue  # already failed the schema guard; don't double-count
        spark_dir = Path(out_dir, key)
        if not spark_dir.exists():
            print(f"FAIL {key}: no Spark output (query crashed?)")
            n_fail += 1; failures.append(key)
            continue
        try:
            duck = con.execute(oracle[key])
            duck_cols = [c[0] for c in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            n_fail += 1; failures.append(key)
            continue
        # HUGEINT guard (CORRECTNESS_r04 tpch_q12 class): DuckDB SUM over
        # INTEGER returns HUGEINT; the driver's fetchdf() renders it as
        # float64/object while Spark emits int64, so the hash gate fails
        # even when values agree. fetchall() (python ints) can't see this —
        # DESCRIBE the oracle and force an explicit BIGINT/DOUBLE cast.
        try:
            odesc = con.execute(f"DESCRIBE {oracle[key]}").fetchall()
            huge = [(c[0], c[1]) for c in odesc if "HUGEINT" in c[1]]
            if huge:
                print(f"FAIL {key}: oracle yields HUGEINT column(s) {huge}; "
                      f"CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1; failures.append(key)
                continue
        except Exception:
            pass  # DESCRIBE can choke on some constructs; dtype check below
        try:
            # explicit sorted part-file list: glob ordering is lexicographic
            # in practice but not contractual, and the compare is ordered
            parts = sorted(str(p) for p in spark_dir.glob("*.parquet"))
            sp = con.execute(
                f"SELECT * FROM read_parquet({parts!r})")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {key}: cannot read Spark output: {e}")
            n_fail += 1; failures.append(key)
            continue

        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {key}: columns differ duck={sorted(duck_cols)} "
                  f"spark={sorted(sp_cols)}")
            n_fail += 1; failures.append(key)
            continue
        if len(duck_rows) != len(sp_rows):
            print(f"FAIL {key}: rows duck={len(duck_rows)} spark={len(sp_rows)}")
            n_fail += 1; failures.append(key)
            continue
        # Pandas dtype-kind mirror of the driver's fetchdf() comparator:
        # same column must land in the same numpy kind (i=int, f=float,
        # O=object, b=bool, M=datetime) on both sides, else the driver's
        # value rendering (1831 vs 1831.0) diverges and the hash fails.
        try:
            ddf = con.execute(oracle[key]).fetchdf()
            sdf = con.execute(
                f"SELECT * FROM read_parquet({parts!r})").fetchdf()
            kind_bad = []
            for c in duck_cols:
                dk, sk = ddf[c].dtype.kind, sdf[c].dtype.kind
                # all-null columns surface as object/float interchangeably
                if dk != sk and not (ddf[c].isna().all()
                                     or sdf[c].isna().all()):
                    kind_bad.append((c, f"duck:{ddf[c].dtype}",
                                     f"spark:{sdf[c].dtype}"))
            if kind_bad:
                print(f"FAIL {key}: pandas dtype kind mismatch (driver "
                      f"hash would diverge): {kind_bad}")
                n_fail += 1; failures.append(key)
                continue
        except Exception as e:
            print(f"WARN {key}: dtype mirror check skipped: {e}")
        # driver sorts columns by name before hashing
        dperm = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        sperm = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        bad = None
        for ri, (dr, sr) in enumerate(zip(duck_rows, sp_rows)):
            dv = [norm_cell(dr[i]) for i in dperm]
            sv = [norm_cell(sr[i]) for i in sperm]
            if dv != sv:
                bad = (ri, dv, sv)
                break
        if bad:
            ri, dv, sv = bad
            print(f"FAIL {key}: first diff at row {ri}:")
            print(f"  cols : {sorted(duck_cols)}")
            print(f"  duck : {dv}")
            print(f"  spark: {sv}")
            n_fail += 1; failures.append(key)
        else:
            print(f"PASS {key} ({len(sp_rows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed"
          + (f": {failures}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
