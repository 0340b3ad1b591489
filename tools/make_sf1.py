#!/usr/bin/env python
"""Build a deterministic sf1.0 slice for the 2^53 decimal-exposure
measurement (r11 VERDICT ask #2).

The driver testdata stops at sf0.1; the dsum4 class (BASELINE.md
round-10 latent-class note) only FIRES when a decimal sum's integer
units cross 2^53, which needs sf1.0 magnitudes. Cross-engine parity
(Spark vs DuckDB) is a same-data property, so provenance does not
matter — what matters is magnitude. This tool replicates the sf0.1
tables 10x with disjoint key offsets (orderkey +150000/copy, custkey
+15000, partkey +20000, suppkey +1000), preserving every value
distribution exactly while scaling all sums by exactly 10x:

    lineitem 600k -> 6M rows; whole-table extendedprice sum
    3.18e10 -> 3.18e11 (3.18e17 units at scale 6 — 35x past the
    2^53 = 9.0e15 line; scale-4 dsum4 units 3.18e15 stay under it).

nation/region are fixed-cardinality dims (copied as-is); events/
documents/embeddings are copied unscaled so driver_sim's ten views
resolve (no allowlisted 2^53 crosser reads them). Output is OUTSIDE
the read-only /root/testdata (default /tmp/spark_graft_sf1).

Round 13 (r12 VERDICT ask #3): generalized to N copies so the decimal
frontier can be MEASURED a decade past sf1.0 — `--copies 100` builds an
sf10 slice (60 M-row lineitem, whole-table extendedprice units 3.18e18
at scale 6 / 3.18e16 at scale 4 — the latter 3.5x PAST the 2^53 line,
so the dsum4 allowlist is genuinely exercised at its documented
escalation boundary, not just below it).

Usage:
    python tools/make_sf1.py [outdir] [--copies N]   # default 10
    SPARK_GRAFT_DRIVER_SF_DIR=/tmp/spark_graft_sf1 \
        python tools/driver_sim.py agg_revenue rollup_sales ...
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10  # default; override with --copies

# table -> [(column, per-copy offset)]; all other columns pass through.
SCALED: dict[str, list[tuple[str, int]]] = {
    "lineitem": [
        ("l_orderkey", 150_000),
        ("l_partkey", 20_000),
        ("l_suppkey", 1_000),
    ],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "customer": [("c_custkey", 15_000)],
    "part": [("p_partkey", 20_000)],
    "supplier": [("s_suppkey", 1_000)],
}

# Price columns gain a deterministic per-copy cent offset. A plain 10x
# replication makes every aggregate sum an exact 10x multiple of its
# sf0.1 value — one spare trailing decimal digit of slack that HIDES
# rounding-boundary behavior. +copy cents keeps the 2dp shape while
# making low-order digits vary across copies, so the 2^53 double-cast
# boundary is actually exercised, not dodged.
CENTS: dict[str, list[str]] = {
    "lineitem": ["l_extendedprice"],
    "orders": ["o_totalprice"],
}
COPIED = [
    "nation",
    "region",
    "events",
    "documents",
    "embeddings",
]


def build(outdir: str, copies: int = COPIES) -> None:
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    for table, offsets in SCALED.items():
        src = f"{SRC}/{table}.parquet"
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        shifted = dict(offsets)
        cents = set(CENTS.get(table, []))
        proj = ", ".join(
            f"{c} + i.copy * {shifted[c]} AS {c}"
            if c in shifted
            else (
                # exact decimal arithmetic, re-emitted as the source's
                # DOUBLE dtype (2dp values round-trip exactly)
                f"CAST(CAST({c} AS DECIMAL(18,2)) + i.copy * "
                f"CAST(0.01 AS DECIMAL(18,2)) AS DOUBLE) AS {c}"
                if c in cents
                else c
            )
            for c in cols
        )
        dst = f"{outdir}/{table}.parquet"
        con.sql(
            f"COPY (SELECT {proj} FROM '{src}' CROSS JOIN "
            f"(SELECT unnest(range({copies})) AS copy) i) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)
    for table in COPIED:
        shutil.copyfile(
            f"{SRC}/{table}.parquet", f"{outdir}/{table}.parquet"
        )
        print(f"{table}: copied", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    n = COPIES
    if "--copies" in args:
        i = args.index("--copies")
        n = int(args[i + 1])
        del args[i : i + 2]
    build(args[0] if args else "/tmp/spark_graft_sf1", copies=n)
