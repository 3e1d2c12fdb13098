#!/usr/bin/env python3
"""Times each declared oracle SQL individually in DuckDB (dev tool only).

Usage: python3 tools/oracle_profile.py <verify_out_dir> <sf_dir> [min_sec]

Prints per-query wall seconds sorted descending, then the total — the
budget the driver-side compare has to fit in."""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    times = {}
    total0 = time.time()
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"[ERR ] {name}: {e}", flush=True)
    total = time.time() - total0
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        if t >= min_sec:
            print(f"{t:8.2f}  {name}", flush=True)
    print(f"== total {total:.1f} s over {len(times)} oracles")


if __name__ == "__main__":
    main()
