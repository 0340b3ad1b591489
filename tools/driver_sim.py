#!/usr/bin/env python
"""Faithful replica of the external driver's correctness gate, as a
committed tool (the recipe in .claude/skills/verify/SKILL.md, runnable
directly).

Usage:
    python tools/driver_sim.py                 # every oracle entry
    python tools/driver_sim.py --window        # DRIVER_WINDOW only
    python tools/driver_sim.py name1 name2 ... # specific entries
    ... --split-build-collect  # build ALL plans first, THEN collect

--split-build-collect (round 14): reproduce the build/collect
sequencing the r13 driver apparently used when it recorded the
round's one red row (sink_parquet hash_match=false, not reproducible
interleaved). Interleaved build+collect can hide an entry whose BUILD
has side effects that a LATER build disturbs (shared scratch dirs,
module-global memos): building every entry first and collecting in a
second phase makes that class fail HERE before the driver sees it.

Builds a VANILLA SparkSession (no session.py tuning — semantics-
critical confs must come from the contract itself, or the real driver
will crash where this passes), loads __spark_entry__.py the way the
driver does, runs entry(), and compares each query against its DuckDB
oracle at sf0.01 with the dtype-strict canon. Exit 1 on any mismatch."""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.canon import canon_rows as rows  # the ONE dtype-strict canon
from lenses_topology_example_spark.tables import parquet_source
SF = os.environ.get("SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    from pyspark.sql import SparkSession

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    window_only = "--window" in sys.argv[1:]

    builder = SparkSession.builder.master("local[8]").appName("driver-sim")
    # Memory-only override for big-slice audits (docs10/sf10): the
    # round-13 docs10 parity run OOM'd the vanilla 1g heap collecting
    # 100x-duplicated pair outputs. Heap size is NOT contract
    # semantics — the session stays vanilla in every conf that is —
    # so this env knob does not weaken the "no session.py tuning"
    # discipline (set e.g. SPARK_GRAFT_SIM_DRIVER_MEM=64g).
    mem = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    print("entry rows:", len(mod.entry(spark).collect()), flush=True)

    qs, osql = mod.queries(), mod.oracle_sql()
    if window_only:
        sys.path.insert(0, ROOT)
        from lenses_topology_example_spark.catalog import DRIVER_WINDOW

        names = list(DRIVER_WINDOW)
    elif args:
        names = args
    else:
        names = sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{parquet_source(SF, t)}'")

    split = "--split-build-collect" in sys.argv[1:]
    bad = []
    t0 = time.time()
    built: dict[str, object] = {}
    if split:
        for name in names:
            try:
                built[name] = qs[name](spark, SF)
            except Exception as e:  # noqa: BLE001
                built[name] = e
        print(f"built {len(built)} plans; collecting...", flush=True)
    for name in names:
        if name not in osql:
            # mirror the osql path (r14 ADVICE): in split mode a
            # rows-only entry whose BUILD raised is stored as an
            # Exception — re-raise inside the try so the run reports
            # it and continues to later entries instead of aborting
            try:
                df = built.get(name)
                if isinstance(df, Exception):
                    raise df
                if df is None:
                    df = qs[name](spark, SF)
                print(f"{name} rows-only: {df.count()}", flush=True)
            except Exception as e:  # noqa: BLE001 — report, don't die
                bad.append(name)
                print(
                    f"{name} ERROR {type(e).__name__}: {str(e)[:150]}",
                    flush=True,
                )
            continue
        try:
            df = built.get(name)
            if isinstance(df, Exception):
                raise df
            if df is None:
                df = qs[name](spark, SF)
            got = rows(df.toPandas())
            want = rows(con.sql(osql[name]).df())
            ok = got == want
            if not ok:
                bad.append(name)
            print(name, "MATCH" if ok else "MISMATCH", flush=True)
        except Exception as e:  # noqa: BLE001 — report, don't die
            bad.append(name)
            print(f"{name} ERROR {type(e).__name__}: {str(e)[:150]}", flush=True)
    print(f"DONE {len(names)} entries in {time.time()-t0:.0f}s, BAD: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
