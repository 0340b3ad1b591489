#!/usr/bin/env python
"""Build the INPUT-LAYOUT axis slice (round 16): the SAME rows and
schema as the source SF, but the four scan-dominant tables (lineitem,
orders, events, documents) are each shattered into N tiny parquet part
files inside a `{table}.parquet/` DIRECTORY — the classic object-store
small-files pathology. At 100 TB the input is never one tidy file per
table: streaming ingestion and per-hour partition commits land
thousands of KB-to-MB files, and an engine whose per-file cost is not
amortized (listing, footer reads, one task per file) falls over on
layout alone, with ZERO change in data volume.

Spark's defense is declarative and this slice measures it: the
FileSourceScanExec packs many small files into one input split up to
`spark.sql.files.maxPartitionBytes`, charging
`spark.sql.files.openCostInBytes` (default 4 MB) per extra file, so
task count stays bounded by bytes, not by file count. The oracle reads
the same directories via a `/*.parquet` glob
(lenses_topology_example_spark.tables.parquet_source).

All other tables are copied unchanged; schemas are preserved exactly
via pyarrow (the events.ts TIMESTAMP caveat, tools/make_nulls.py).
Row ORDER within each table is preserved (file i holds rows
[i*chunk, (i+1)*chunk)), so order-sensitive derivations (none in the
catalog — contracts are order-insensitive) and dedup keeper rules see
the same multiset either way.

Usage:
    python tools/make_smallfiles.py [--sf-dir DIR] [--out DIR]
                                    [--files N]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SHATTERED = ("lineitem", "orders", "events", "documents")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_smallfiles"
    n_files = 512
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    if "--files" in args:
        i = args.index("--files")
        n_files = int(args[i + 1])
        del args[i : i + 2]

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t not in SHATTERED:
            shutil.copyfile(src, f"{out}/{t}.parquet")
            continue
        tbl = pq.read_table(src)
        n = tbl.num_rows
        chunk = max(1, -(-n // n_files))  # ceil div; >=1 row per file
        d = f"{out}/{t}.parquet"
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
        k = 0
        for start in range(0, n, chunk):
            piece = tbl.slice(start, chunk)
            pq.write_table(piece, f"{d}/part-{k:05d}.parquet")
            k += 1
        sizes = [
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ]
        print(
            f"{t}: {n} rows -> {k} files, "
            f"{min(sizes)//1024}-{max(sizes)//1024} KiB each",
            flush=True,
        )
    print(f"slice at {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
