#!/usr/bin/env python
"""Build a null-bearing copy of a testdata SF directory (the partial-
NULL density axis, r14 VERDICT ask #4 — committed form of the r14
exploratory sweep's ad-hoc slice so the axis is reproducible).

Usage:
    python tools/make_nulls.py [--sf-dir DIR] [--out DIR] [--pct P]

NULLs are injected into MEASURE columns only (keys, dates, and
categoricals stay intact — referential integrity and grouping
cardinality by construction):

    lineitem:  l_quantity, l_extendedprice, l_discount, l_tax
    orders:    o_totalprice
    supplier:  s_acctbal
    part:      p_retailprice
    customer:  c_acctbal
    events:    value
    documents: n_chars

Selection is md5-deterministic per (table, column, row ordinal) — the
same convention as every seeded statistic in the repo — so two builds
of the same slice are byte-identical and the Spark and DuckDB legs of
any parity run read the same NULLs. All other tables (region, nation,
embeddings) are copied unchanged. Schemas are preserved EXACTLY via
pyarrow (critical for events.ts, which has shipped as TIMESTAMP(NANOS)
— a round-trip through an engine would rewrite it).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
NULL_COLS: dict[str, list[str]] = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "customer": ["c_acctbal"],
    "events": ["value"],
    "documents": ["n_chars"],
}


def _mask(table: str, col: str, n: int, pct: int) -> pa.Array:
    """Deterministic boolean mask: True = NULL this row."""
    sel = [
        int(
            hashlib.md5(f"{table}:{col}:{i}".encode()).hexdigest()[:8], 16
        ) % 100 < pct
        for i in range(n)
    ]
    return pa.array(sel, type=pa.bool_())


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    out = "/tmp/spark_graft_nulls"
    pct = 10
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    if "--pct" in args:
        i = args.index("--pct")
        pct = int(args[i + 1])
        del args[i : i + 2]

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        cols = NULL_COLS.get(t)
        if not cols:
            shutil.copyfile(src, dst)
            print(f"{t}: copied unchanged", flush=True)
            continue
        tab = pq.read_table(src)
        n = tab.num_rows
        for c in cols:
            idx = tab.schema.get_field_index(c)
            col = tab.column(c).combine_chunks()
            mask = _mask(t, c, n, pct)
            # if_else(NULL-mask, typed nulls, original) keeps the exact
            # arrow type (decimal/float/int alike)
            import pyarrow.compute as pc

            nulled = pc.if_else(
                mask, pa.nulls(n, type=col.type), col
            )
            tab = tab.set_column(idx, tab.schema.field(c), nulled)
        pq.write_table(tab, dst)
        nulled_counts = {
            c: tab.column(c).null_count for c in cols
        }
        print(f"{t}: {n} rows, nulls {nulled_counts}", flush=True)
    print(f"wrote {out} at pct={pct} from {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
