"""Object-storage sink (S7, SURVEY.md §2.1).

Reference: S3StorageService.java:61 / S3StorageServiceApp.java:34 — a
consumer named "StorageAwsService" draining `payments_xchg` for S3
archival (handler body is a stub). Spark-native form: the converted
payments stream written as partitioned parquet — at 100 TB the layout IS
the operator: partitionBy(currency) gives partition pruning to every
downstream reader, and file sizes are governed by the shuffle
partitioning upstream, not the sink.

The batch query writes to a local scratch dir then returns the read-back
frame (rows-only driver check: count/schema stability). The streaming
twin is streaming/pipelines.start_payments_fanout's parquet branch with
exactly-once checkpointing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from .payments import q_fx_convert

_SINK_DIR: str | None = None


def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fx-converted payments -> partitionBy(currency) parquet -> read
    back. Deterministic content; no oracle (side-effecting operator,
    driver does the rows-only check).

    CONTRACT EXCEPTION: unlike every other catalog entry, BUILDING this
    query executes the write (a sink has no lazy form whose read-back
    reflects it). Plan-only consumers must skip it — see
    tests/test_topology.py::test_topology_covers_every_catalog_query."""
    global _SINK_DIR
    if _SINK_DIR is None:
        _SINK_DIR = tempfile.mkdtemp(prefix="spark_graft_sink_")
    out = f"{_SINK_DIR}/payments_xchg"
    converted = q_fx_convert(spark, sf_dir)
    (
        converted.write.mode("overwrite")
        .partitionBy("currency")
        .parquet(out)
    )
    return spark.read.parquet(out).select(
        "event_id", "currency", "amount_xchg", "ts"
    )
