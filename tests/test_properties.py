"""Property-based contracts (hypothesis): the shared expression library
must agree with independent Python reimplementations on arbitrary
printable-ASCII input, not just the fixtures. Examples are batched into
one DataFrame per case so each hypothesis example costs one Spark job."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from lenses_topology_example_spark.functions.texthash import MIX, MOD
from lenses_topology_example_spark.operators.wordcount import tokens_col

_ascii_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"\W+", s.lower()) if t]


@_SETTINGS
@given(st.lists(_ascii_line, min_size=1, max_size=30))
def test_tokenizer_agrees_with_python(spark, lines):
    df = spark.createDataFrame([(s,) for s in lines], "text string")
    got = [r["t"] for r in df.select(tokens_col(F.col("text")).alias("t")).collect()]
    assert got == [_py_tokens(s) for s in lines]


def _py_poly_fp(tokens: list[str]) -> int:
    acc = 0
    for t in tokens:
        acc = (acc * MIX + (len(t) * 131 + ord(t[0]))) % MOD
    return acc


@_SETTINGS
@given(st.lists(_ascii_line, min_size=1, max_size=30))
def test_polynomial_fingerprint_agrees_with_python(spark, lines):
    from lenses_topology_example_spark.functions.texthash import (
        polynomial_fingerprint,
    )

    df = spark.createDataFrame([(s,) for s in lines], "text string")
    toks = tokens_col(F.col("text"))
    got = [
        r["fp"]
        for r in df.select(polynomial_fingerprint(toks).alias("fp")).collect()
    ]
    assert got == [_py_poly_fp(_py_tokens(s)) for s in lines]
