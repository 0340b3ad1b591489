#!/usr/bin/env python
"""Build the KEY-CARDINALITY axis slice (round 15): same event rows as
the source SF, but `events.user_id` remapped to the row ordinal — every
event belongs to a DISTINCT user (sf0.1: 1,500 users x ~67 events/user
-> 100,000 users x 1 event). The inverse of tools/make_events100.py's
density axis: per-key frames shrink to ~1 row while the DISTINCT KEY
COUNT explodes 67x, stressing exactly what density does not — shuffle
key volume, map-side combine that can no longer collapse anything,
window/session operators over millions of tiny frames, and the
events->customer join at maximum key fan-out.

`customer` is expanded to cover the new user_id range (whole-table
replicas with offset c_custkey, trimmed to max_user_id+1 rows) so the
events->customer join keeps referential integrity by construction.
All other tables are copied unchanged; schemas are preserved exactly
via pyarrow (the events.ts TIMESTAMP caveat, tools/make_nulls.py).

Usage:
    python tools/make_hikey.py [--sf-dir DIR] [--out DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_hikey"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]

    os.makedirs(out, exist_ok=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet")
    n = ev.num_rows
    idx = ev.schema.get_field_index("user_id")
    ordinal = pa.array(range(n), type=ev.schema.field("user_id").type)
    ev = ev.set_column(idx, ev.schema.field("user_id"), ordinal)
    pq.write_table(ev, f"{out}/events.parquet")
    print(f"events: {n} rows, user_id -> ordinal (all distinct)", flush=True)

    cust = pq.read_table(f"{sf_dir}/customer.parquet")
    copies = []
    base = cust.num_rows
    need = n  # user ids are 0..n-1
    k = 0
    import pyarrow.compute as pc

    while k * base < need:
        c = cust
        if k:
            ck = c.schema.get_field_index("c_custkey")
            shifted = pc.add(c.column("c_custkey"), k * base)
            c = c.set_column(ck, c.schema.field("c_custkey"), shifted)
        copies.append(c)
        k += 1
    big = pa.concat_tables(copies).slice(0, need)
    pq.write_table(big, f"{out}/customer.parquet")
    print(
        f"customer: {base} -> {big.num_rows} rows "
        f"({k} offset replicas, trimmed to the user range)",
        flush=True,
    )

    for t in TABLES:
        if t in ("events", "customer"):
            continue
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"wrote {out} from {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
