"""Golden word-count fixtures (FIXTURES.md F3/F4): the 15-line corpus
with both reference tokenizers, cross-checked against a pure-Python
computation."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from lenses_topology_example_spark.datamodel import CORPUS_LINES, corpus_df
from lenses_topology_example_spark.operators.wordcount import wordcount_on


def _golden_regex() -> Counter:
    # kstreams/App.java:68,102 tokenizer: lowercase, split \W+
    c: Counter = Counter()
    for line in CORPUS_LINES:
        c.update(t for t in re.split(r"\W+", line.lower()) if t)
    return c


def _golden_ws() -> Counter:
    # sparkstreaming/App.java:75 tokenizer: split on single space, as-is
    c: Counter = Counter()
    for line in CORPUS_LINES:
        c.update(t for t in line.split(" ") if t)
    return c


def test_wordcount_regex_tokenizer(spark):
    got = {
        r["word"]: r["count"]
        for r in wordcount_on(corpus_df(spark)).collect()
    }
    assert got == dict(_golden_regex())


def test_wordcount_whitespace_tokenizer(spark):
    df = (
        corpus_df(spark)
        .select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    got = {r["word"]: r["count"] for r in df.collect()}
    assert got == dict(_golden_ws())


def test_corpus_is_reference_fixture(spark):
    # 15 lines, known totals keep the fixture honest
    assert len(CORPUS_LINES) == 15
    golden = _golden_regex()
    assert golden["the"] >= 5
    assert sum(golden.values()) == sum(
        len([t for t in re.split(r"\W+", l.lower()) if t]) for l in CORPUS_LINES
    )
