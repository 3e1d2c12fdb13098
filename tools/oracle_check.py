#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just lets the builder
run the same DuckDB-vs-Spark compare the driver runs, before committing).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the same parquet
tables, and compares row counts, column names, and values (columns
sorted by name, rows sorted, floats compared exactly then with 1e-9
tolerance fallback reported separately)."""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (2, v)
    return (2, str(v)) if not isinstance(v, (int, float)) else (2, v)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        got_cols = sorted(got.column_names)
        got_rows = sorted(
            tuple(norm_cell(r[c]) for c in got_cols)
            for r in got.to_pylist())
        if name not in oracle:
            print(f"[skip ] {name}: no oracle ({got.num_rows} rows)")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.column_names)
        exp_rows = sorted(
            tuple(norm_cell(r[c]) for c in exp_cols)
            for r in exp.to_pylist())
        if got_cols != exp_cols:
            print(f"[FAIL ] {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"[FAIL ] {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        exact = got_rows == exp_rows
        if exact:
            print(f"[pass ] {name}: {len(got_rows)} rows exact")
            n_pass += 1
            continue
        # find first mismatch, check tolerance
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            for gc, ec, cn in zip(g, e, got_cols):
                if gc == ec:
                    continue
                if (isinstance(gc, float) and isinstance(ec, float)
                        and abs(gc - ec) <= 1e-9 * max(1.0, abs(ec))):
                    continue
                bad = (i, cn, gc, ec)
                break
            if bad:
                break
        if bad is None:
            print(f"[tol  ] {name}: {len(got_rows)} rows equal only within 1e-9 "
                  f"(driver may hash-mismatch!)")
            n_fail += 1
        else:
            i, cn, gc, ec = bad
            print(f"[FAIL ] {name}: row {i} col {cn}: got {gc!r} exp {ec!r}")
            n_fail += 1
    # declared queries whose result dir never appeared (Verify threw) —
    # without this check a broken query silently drops out of the compare
    written = {p.name for p in out_dir.iterdir() if p.is_dir()}
    failures_file = out_dir / "_failures.json"
    verify_failures = (json.loads(failures_file.read_text())
                       if failures_file.is_file() else {})
    for name, err in verify_failures.items():
        print(f"[FAIL ] {name}: verify threw: {err[:150]}")
        n_fail += 1
    for name in sorted(set(oracle) - written - set(verify_failures)):
        print(f"[FAIL ] {name}: declared oracle but no result written")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
