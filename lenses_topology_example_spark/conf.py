"""Runtime session-conf guard.

The driver (and any embedding application) passes its OWN SparkSession to
the query callables — none of session.get_spark's tuning is guaranteed to
be present. Everything semantics-critical is therefore (re)applied here at
runtime, at every contract entry point:

- nanosAsLong: events.parquet is TIMESTAMP(NANOS); without this flag the
  scan throws PARQUET_TYPE_ILLEGAL on Spark 4.
- UTC session timezone: event-time semantics must not depend on the host
  timezone (and the DuckDB oracle compares naive-UTC timestamps).
- Arrow: keeps any mapInPandas path on the columnar transfer.

All three are runtime-settable SQL confs (no JVM restart needed).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    return spark
