"""Edge-case contracts for the shared expression library: the behaviors
every operator builds on (tokenizer, shingles, vector math) at the
degenerate inputs a 100 TB corpus WILL contain."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lenses_topology_example_spark.operators.dedup import shingles_col
from lenses_topology_example_spark.operators.similarity import cosine, dot
from lenses_topology_example_spark.operators.wordcount import tokens_col

# ASCII adversarial corpus (the driver testdata is ASCII; unicode \W
# semantics differ between engines and are out of contract).
CASES = [
    "",
    " ",
    "...",
    "a",
    "hello world",
    "  leading and trailing  ",
    "tabs\tand\nnewlines",
    "digits 123 mix3d t0kens",
    "punct!!!heavy???text",
    "repeated    spaces",
    "UPPER lower MiXeD",
    "a.b.c.d.e",
]


def test_tokenizer_matches_python_contract(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "text string")
    got = [
        r["t"]
        for r in df.select(tokens_col(F.col("text")).alias("t")).collect()
    ]
    want = [[t for t in re.split(r"\W+", s.lower()) if t] for s in CASES]
    assert got == want


def test_shingles_under_n_tokens_empty(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "text string")
    rows = df.select(
        F.size(tokens_col(F.col("text"))).alias("n"),
        F.size(shingles_col(tokens_col(F.col("text")))).alias("n_sh"),
    ).collect()
    for r in rows:
        if r["n"] < 3:
            assert r["n_sh"] == 0
        else:
            assert r["n_sh"] == r["n"] - 2


def test_dot_and_cosine_degenerate(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 0.0],), ([],)], "v array<double>"
    )
    rows = df.select(
        F.col("v"),
        dot(F.col("v"), F.col("v")).alias("d"),
        cosine(F.col("v"), F.col("v")).alias("c"),
    ).collect()
    # zero vector: dot 0, cosine NULL (try_divide; ANSI mode would throw
    # DIVIDE_BY_ZERO with plain `/` — matches DuckDB 0.0/0.0 -> NULL)
    zero = [r for r in rows if r["v"] == [0.0, 0.0]][0]
    assert zero["d"] == 0.0 and zero["c"] is None
    # empty vector: fold over nothing = 0.0, cosine NULL
    empty = [r for r in rows if r["v"] == []][0]
    assert empty["d"] == 0.0 and empty["c"] is None
    unit = [r for r in rows if r["v"] == [1.0, 0.0]][0]
    assert unit["d"] == 1.0 and abs(unit["c"] - 1.0) < 1e-12


def test_text_metrics_null_on_degenerate_docs(spark):
    """Token-less and empty docs flow through token counting and quality
    scoring as NULLs — never an ANSI DIVIDE_BY_ZERO job abort."""
    from lenses_topology_example_spark.operators.wordcount import tokens_col as tc

    df = spark.createDataFrame(
        [(1, "..."), (2, ""), (3, "real words here")], "doc_id long, text string"
    )
    toks = tc(F.col("text"))
    rows = df.select(
        "doc_id",
        F.try_divide(F.length("text"), F.size(toks)).alias("cpt"),
        F.try_divide(
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")),
            F.length("text"),
        ).alias("alpha"),
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["cpt"] is None  # punct-only: 0 tokens
    assert by_id[2]["alpha"] is None  # empty text
    assert by_id[3]["cpt"] is not None and by_id[3]["alpha"] is not None


def test_type_system_parquet_roundtrip(spark, tmp_path):
    """Every type the engine's data model uses (SURVEY.md §1) survives a
    parquet write/read bit-exactly: decimal(38,18), timestamp, arrays,
    maps, binary, nested struct."""
    from datetime import datetime
    from decimal import Decimal

    row = (
        1,
        Decimal("12345.678901234567890123"),
        datetime(2024, 1, 2, 3, 4, 5, 678901),
        [1.5, -2.25],
        {"k": 7},
        b"\x00\x01\xff",
        (42, "nested"),
    )
    schema = (
        "id long, amount decimal(38,18), ts timestamp, vec array<double>, "
        "m map<string,int>, payload binary, s struct<a:int,b:string>"
    )
    df = spark.createDataFrame([row], schema)
    path = str(tmp_path / "types_rt")
    df.write.parquet(path)
    back = spark.read.parquet(path).collect()[0]
    orig = df.collect()[0]
    assert back["amount"] == orig["amount"] == Decimal("12345.678901234567890123")
    assert back["ts"] == orig["ts"]
    assert back["vec"] == [1.5, -2.25]
    assert back["m"] == {"k": 7}
    assert bytes(back["payload"]) == b"\x00\x01\xff"
    assert back["s"]["a"] == 42 and back["s"]["b"] == "nested"


def test_exact_dedup_groups_identical_only(spark):
    """md5-fingerprint dedup must not conflate near-identical docs."""
    from lenses_topology_example_spark.operators.dedup import q_dedup_exact  # noqa: F401

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text "), (4, "Same text")],
        "doc_id long, text string",
    )
    grouped = (
        df.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .count()
        .collect()
    )
    counts = sorted(r["count"] for r in grouped)
    assert counts == [1, 1, 2], "trailing space / case must NOT merge"


def test_grouped_map_norm_null_value_stays_null(spark):
    """A NULL events.value must surface as NULL pct_of_max (the DuckDB
    value/MAX() OVER convention), not NaN — the pandas path would bake
    NaN in if it ran on plain float64 (ADVICE round 1)."""
    from lenses_topology_example_spark.operators.sketches import (
        q_grouped_map_norm,
    )

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 5.0), ("b", 4, None)],
        "event_type string, event_id long, value double",
    )
    # run the real catalog query against a stand-in events table
    import lenses_topology_example_spark.operators.sketches as sk

    orig = sk.load_table
    sk.load_table = lambda _s, _d, _t: df
    try:
        out = {
            r["event_id"]: r["pct_of_max"]
            for r in q_grouped_map_norm(spark, "ignored").collect()
        }
    finally:
        sk.load_table = orig
    assert out[1] == 1.0
    assert out[3] == 0.5
    assert out[2] is None, f"null value must stay null, got {out[2]}"
    assert out[4] is None, "all-null group must yield null, not NaN"


def test_new_wave_ops_on_empty_tables(spark, tmp_path):
    """The round-7 wave must degrade gracefully on EMPTY inputs (a
    filtered-out partition at scale): empty result frames with the
    right schema, never a crash (ANSI division, element_at, or a
    window over nothing are the usual traps)."""
    from lenses_topology_example_spark.catalog import _CATALOG

    d = tmp_path / "empty"
    for t, schema in (
        (
            "documents",
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        (
            "lineitem",
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ),
        (
            "orders",
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        (
            "events",
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ),
    ):
        spark.createDataFrame([], schema).write.parquet(f"{d}/{t}.parquet")

    for name, want_rows in (
        ("token_budget_plan", 0),
        ("source_concentration", 1),  # one row of NULL/zero aggregates
        ("order_backlog", 0),
        ("interval_merge", 0),
        ("markov_transitions", 0),
        ("top_paths", 0),
        ("seasonality_profile", 0),
        ("zipf_fit", 1),
    ):
        rows = _CATALOG[name][0](spark, str(d)).collect()
        assert len(rows) == want_rows, (name, rows)
