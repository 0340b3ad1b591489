"""PySpark worker daemon with pre-imported heavy modules (guide §4.5,
extended to the fork boundary).

Workers are forked from the daemon process, so anything imported HERE
before the fork loop is inherited by every worker via copy-on-write —
paid once per executor, not once per worker. Without this, each fresh
worker runs `import pandas` + `import pyarrow` on its first Arrow task
(~0.65 s single, multi-second wall when a wide stage forks 30+ workers
at once under CPU contention).

Why workers are fresh at all with `spark.python.worker.reuse=true`:
the JVM SIGKILLs a worker instead of pooling it whenever its task's
output iterator was not fully drained (limit / top-k operators above a
Python node stop consuming early), so a long session's worker pool
decays — measured r18 on the 287-entry bench: 67 pooled workers after
the warmup, 4 left ~120 JVM-only entries later, and the next 32-task
mapInPandas stage paid a 28-fork import storm (7.9 s vs 0.8 s warm,
GC delta 0 ms; the asset_png_meta in-suite mystery).

Wired via `spark.python.daemon.module` in session.py (opt-out
SPARK_GRAFT_PYDAEMON=0). Cluster-honest: on a real deployment the
same decay applies per long-lived executor and the same pre-import
amortizes it; the daemon module mechanism is the standard Spark conf
for exactly this.

The pre-imports are best-effort: a worker environment missing pandas
must degrade to vanilla daemon behavior, not fail to launch (workers
that never touch Arrow paths don't need pandas).
"""

from __future__ import annotations

try:  # pragma: no cover - import side effects only
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # the Arrow serializer stack every mapInPandas/pandas-UDF task loads
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # noqa: BLE001 - any failure degrades to vanilla daemon
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
