"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen to also be the right default on a 1000-executor
cluster reading ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy
  switches) — at 100 TB static shuffle-partition counts are always wrong.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE's coalescing makes the initial number a ceiling, not a
  tuning knob.
- Arrow enabled so any Pandas-UDF fallback paths move data in columnar
  batches instead of pickled rows.
- Session timezone pinned to UTC so event-time semantics are stable across
  drivers/executors (and match the DuckDB oracle used in tests).
- Broadcast threshold left at default 10 MB; operators that KNOW a side is
  a small dimension pass an explicit ``F.broadcast`` hint instead of
  relying on stats (stats may be missing on fresh parquet at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "lenses-topology-example-spark",
    *,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    cpus = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Files >128MB split; tiny test files coalesce — both sides covered
        # by AQE + this default at cluster scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns type, so
        # read as long and floor to µs in tables.load_table — exactly what
        # µs-native engines (and the DuckDB oracle) do with ns parquet.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if os.environ.get("SPARK_GRAFT_PYDAEMON", "1") != "0":
        # Fork workers from a daemon that PRE-IMPORTS pandas/pyarrow —
        # see pydaemon.py: the JVM SIGKILLs (never pools) any Python
        # worker whose task output was not fully drained, so a long
        # session's worker pool decays and wide Arrow stages pay a
        # concurrent import storm per fresh worker (measured r18:
        # 7.9 s vs 0.8 s for the first 32-task mapInPandas after ~120
        # JVM-only entries). The repo root rides PYTHONPATH so the
        # daemon module resolves inside the forked daemon process.
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        if here not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{here}{os.pathsep}{pp}" if pp else here
            )
        builder = builder.config(
            "spark.python.daemon.module",
            "lenses_topology_example_spark.pydaemon",
        )
    conf = dict(extra_conf or {})
    if driver_memory:
        builder = builder.config("spark.driver.memory", driver_memory)
        # Fixed-size, pre-touched heap: -Xms == -Xmx stops G1 from
        # committing/uncommitting pages all run (a full-suite GC log
        # showed 74.5 CPU-s of kernel time inside pauses from commit
        # churn on a growable heap), AlwaysPreTouch moves first-touch
        # page faults into startup, and the explicit 32m region size
        # keeps the humongous threshold at 16 MB independent of heap
        # size (at 32g G1 would pick 16m regions and double the
        # humongous-allocation GC triggers). Standard practice for any
        # long-lived throughput JVM; identical reasoning on a cluster
        # executor. SPARK_GRAFT_HEAP_PIN=0 disables the pin (r17
        # ADVICE: -Xms + AlwaysPreTouch commits the full heap at JVM
        # launch, which fails outright on a host with less free RAM
        # than driver_memory where an unsized heap degrades
        # gracefully); caller-supplied extraJavaOptions are APPENDED
        # after the pin flags (JVM last-wins) instead of replacing
        # them.
        if os.environ.get("SPARK_GRAFT_HEAP_PIN", "1") != "0":
            pin = (
                f"-Xms{driver_memory} -XX:+AlwaysPreTouch "
                "-XX:G1HeapRegionSize=32m"
            )
            caller = conf.pop("spark.driver.extraJavaOptions", "")
            builder = builder.config(
                "spark.driver.extraJavaOptions",
                f"{pin} {caller}".strip(),
            )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
