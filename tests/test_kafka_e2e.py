"""Broker-gated Kafka end-to-end test (r6 verdict ask #6).

The reference's actual runtime is Kafka->Kafka
(`lenses-topology-example-sparkstreaming/.../App.java:66-85`:
readStream from the input topic, update-mode wordcount, writeStream to
the output topic; the corpus producer at `:99-122`). The sandbox has no
broker (port 9092 refuses, probed every round) and no
spark-sql-kafka connector jar, so this module gates on BOTH and skips
today; when the environment provides them, the e2e runs with no code
change:

1. produce the 15-line reference corpus to `wordcount-input` (batch
   kafka write — the producer loop's bounded twin),
2. run the streaming wordcount Kafka->Kafka with checkpoint (S1 + A1 +
   S5, exactly the reference pipeline),
3. read `wordcount-output` back (batch kafka read) and assert the final
   per-word counts equal the golden batch answer,
4. publish one `__topology`-style payload for the running query.

Until then, the option/payload wiring is pinned broker-free by
tests/test_kafka_contract.py (reader/writer options, checkpoint, update
mode) and tests/test_topology.py (payload shape).
"""

from __future__ import annotations

import socket

import pytest

from pyspark.sql import functions as F

BROKER = "localhost:9092"


def _broker_reachable() -> bool:
    s = socket.socket()
    s.settimeout(1.0)
    try:
        s.connect(("localhost", 9092))
        return True
    except OSError:
        return False
    finally:
        s.close()


def _kafka_connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKER
        ).option("subscribe", "__probe").load()
        return True
    except Exception as ex:  # DATA_SOURCE_NOT_FOUND when the jar is absent
        return "DATA_SOURCE_NOT_FOUND" not in str(ex)


@pytest.fixture(scope="module")
def kafka_env(spark):
    if not _broker_reachable():
        pytest.skip("no Kafka broker on localhost:9092 (env-blocked; "
                    "probed every round)")
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    return BROKER


def test_kafka_wordcount_end_to_end(spark, kafka_env, tmp_path):
    from lenses_topology_example_spark.datamodel import CORPUS_LINES
    from lenses_topology_example_spark.operators.wordcount import tokenize
    from lenses_topology_example_spark.streaming.pipelines import (
        kafka_text_stream,
        start_wordcount_to_kafka,
    )

    # 1. produce the corpus (bounded twin of App.java:117-122's loop)
    spark.createDataFrame(
        [(None, line) for line in CORPUS_LINES], "key string, value string"
    ).write.format("kafka").option(
        "kafka.bootstrap.servers", kafka_env
    ).option("topic", "wordcount-input").save()

    # 2. the reference pipeline: S1 -> A1 -> S5
    lines = kafka_text_stream(spark, kafka_env, "wordcount-input")
    q = start_wordcount_to_kafka(
        lines, kafka_env, "wordcount-output", str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # 3. final counts (last update per key) must equal the batch answer
    out = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("subscribe", "wordcount-output")
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr(
            "CAST(key AS STRING) AS word",
            "CAST(value AS STRING) AS count",
            "offset",
        )
    )
    from pyspark.sql import Window as W

    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("word").orderBy(F.col("offset").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("word", F.col("count").cast("long").alias("count"))
    )
    got = {r["word"]: r["count"] for r in latest.collect()}
    corpus = spark.createDataFrame([(l,) for l in CORPUS_LINES], "value string")
    want = {
        r["word"]: r["count"]
        for r in tokenize(corpus, "value").groupBy("word").count().collect()
    }
    assert got == want

    # 4. one topology payload for the (now stopped) query's plan
    from lenses_topology_example_spark.plans.topology import topology_of

    payload = topology_of(latest, app_name="kafka-e2e")
    assert payload["nodes"], "topology payload must describe the plan"
