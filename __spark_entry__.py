"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship payments pipeline at sf0.001 (SURVEY.md §3.3).
queries()     -> every implemented operator from SURVEY.md §2.
oracle_sql()  -> DuckDB oracle twins (same column names/aliases).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lenses_topology_example_spark import catalog  # noqa: E402
from lenses_topology_example_spark.conf import ensure_runtime_confs  # noqa: E402
from lenses_topology_example_spark.operators.payments import (  # noqa: E402
    q_payments_pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the §3.3 payments
    pipeline (decode -> broadcast FX join -> convert -> suspicious filter
    -> per-currency count + exact sum)."""
    ensure_runtime_confs(spark)
    return q_payments_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
