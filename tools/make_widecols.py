#!/usr/bin/env python
"""Build the SCHEMA-WIDTH axis slice (round 16, 9th axis): the SAME
rows as the source SF, but documents, events, and orders each gain K
extra int64 columns `w_000..w_{K-1}` with varying (incompressible-ish)
values — the feature-store / telemetry wide-table shape, where a 300-
column table serves queries that each touch 4 of them. At 100 TB the
bytes are dominated by columns a given query never reads; the engine's
defense is COLUMN PRUNING: a parquet scan reads only the projected
column chunks, so query cost must track the projection, not the table
width. Every catalog contract names its columns explicitly (no entry
is `df.columns`-driven), so all results are unchanged on this slice by
construction — parity holds with zero contract edits, and any wall
ratio >> 1 on a pruned-projection entry is a pruning failure.

Values are `(row_ordinal * (j + 1)) % 100003` — per-row varying so the
decoy columns neither RLE away to nothing on disk nor vanish from scan
cost if something DOES read them.

All other tables are copied unchanged; schemas of original columns are
preserved exactly via pyarrow.

Usage:
    python tools/make_widecols.py [--sf-dir DIR] [--out DIR] [--cols K]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
WIDENED = ("orders", "events", "documents")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_widecols"
    k = 192
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    if "--cols" in args:
        i = args.index("--cols")
        k = int(args[i + 1])
        del args[i : i + 2]

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t not in WIDENED:
            shutil.copyfile(src, f"{out}/{t}.parquet")
            continue
        tbl = pq.read_table(src)
        n = tbl.num_rows
        ordinal = np.arange(n, dtype=np.int64)
        for j in range(k):
            tbl = tbl.append_column(
                f"w_{j:03d}",
                pa.array((ordinal * (j + 1)) % 100003, type=pa.int64()),
            )
        pq.write_table(tbl, f"{out}/{t}.parquet")
        mb = os.path.getsize(f"{out}/{t}.parquet") / 2**20
        src_mb = os.path.getsize(src) / 2**20
        print(
            f"{t}: {n} rows, {tbl.num_columns - k} -> {tbl.num_columns} "
            f"cols, {src_mb:.1f} -> {mb:.1f} MiB on disk",
            flush=True,
        )
    print(f"slice at {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
