#!/usr/bin/env python3
"""DuckDB side of the scan-floor layout A/B (see gen_layouts.py and
graft.ProfileScanFloor): times count(*) and the scan_floor 2-column
aggregate on each layout, min-of-3 after a warm pass, so the committed
artifact carries both engines' walls per layout.

Usage: scanfloor_oracle.py <layouts_base_dir>
Prints ONE JSON line.
(Driver-side python env; the Scala library never depends on this.)
"""
import glob
import json
import os
import sys
import time

import duckdb

base = sys.argv[1]
con = duckdb.connect()
out = {}
for l in ["rg20k_1file", "rg122k_1file", "rg122k_multi", "rg20k_multi"]:
    p = f"{base}/{l}/lineitem.parquet"
    if not os.path.exists(p):
        continue
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    rel = f"read_parquet('{src}')"
    walls = {}
    for name, q in [
        ("count_star_s", f"SELECT count(*) FROM {rel}"),
        ("agg_2col_s", f"SELECT sum(l_extendedprice), avg(l_quantity), count(*) FROM {rel}"),
    ]:
        con.execute(q).fetchall()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            con.execute(q).fetchall()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
    out[l] = walls
    print(f"[scanfloor-duckdb] {l}: {walls}", file=sys.stderr)
print(json.dumps({"metric": "scanfloor_layout_ab_duckdb", "layouts": out}))
