"""Semantic tests for the round-8 operator wave, beyond oracle parity:
crafted-input invariants an oracle twin that shares the formula cannot
catch."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
)
from lenses_topology_example_spark.tables import load_table


def test_hard_negatives_never_share_query_label(spark, sf_dir):
    """Every mined negative must carry a label different from its
    query's, and each query must surface at most TOP_K of them in
    strictly non-increasing similarity order."""
    out = _CATALOG["hard_negative_mining"][0](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    qlabels = {
        r.vec_id: r.label
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    }
    per_q: dict[int, list] = {}
    for r in out:
        assert r.neighbor_label != qlabels[r.query_id], r
        per_q.setdefault(r.query_id, []).append(r.cos_sim)
    assert set(per_q) == set(qlabels)
    for sims in per_q.values():
        assert len(sims) <= TOP_K
        assert sims == sorted(sims, reverse=True)


def test_hard_negatives_are_the_true_top_k(spark, sf_dir):
    """Brute-force replica: for one query, the mined set must equal the
    exact top-k different-label neighbors by cosine (numpy, float64)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb}
    labels = {r.vec_id: r.label for r in emb}
    qid = 0
    qv = vecs[qid]
    scored = []
    for vid, v in vecs.items():
        if labels[vid] == labels[qid]:
            continue
        cos = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        scored.append((-cos, vid))
    want = {vid for _, vid in sorted(scored)[:TOP_K]}
    out = _CATALOG["hard_negative_mining"][0](spark, sf_dir)
    got = {
        r.neighbor_id
        for r in out.filter(F.col("query_id") == qid).collect()
    }
    assert got == want


def test_interarrival_stats_crafted_stream(spark, sf_dir):
    """Hand-computable stream: one user with gaps 10s and 20s, another
    with a single 5s gap — per-type stats must match exactly, and
    cross-user pairs must contribute nothing."""
    import datetime as dt

    from lenses_topology_example_spark.operators.windows import (
        q_interarrival_stats,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "a"),
        (2, t0 + dt.timedelta(seconds=10), 10, "b"),
        (3, t0 + dt.timedelta(seconds=30), 10, "b"),
        (4, t0 + dt.timedelta(seconds=1), 20, "b"),
        (5, t0 + dt.timedelta(seconds=6), 20, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    import lenses_topology_example_spark.operators.windows as wmod

    orig = wmod.load_table
    wmod.load_table = lambda _s, _d, _t: df
    try:
        got = {
            r.event_type: (r.n_gaps, r.mean_gap_s, r.min_gap_s, r.max_gap_s)
            for r in q_interarrival_stats(spark, sf_dir).collect()
        }
    finally:
        wmod.load_table = orig
    # user 10: gaps 10 (->b), 20 (->b); user 20: gap 5 (->b); the mean
    # is DECIMAL(38,6)-round-tripped by contract: 35/3 -> 11.666667
    assert got == {"b": (3, 11.666667, 5.0, 20.0)}


def test_small_qty_revenue_threshold_semantics(spark, sf_dir):
    """The Q17 filter must keep exactly the brand lineitems whose
    quantity is under 20% of their part's mean quantity — checked by an
    independent pandas recomputation of both the means and the sum."""
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    part = load_table(spark, sf_dir, "part").toPandas()
    keys = set(part[part.p_brand == "Brand#11"].p_partkey)
    b = li[li.l_partkey.isin(keys)]
    means = b.groupby("l_partkey").l_quantity.mean()
    kept = b[b.l_quantity < 0.2 * b.l_partkey.map(means)]
    want = kept.l_extendedprice.sum() / 7.0
    got = _CATALOG["small_qty_revenue"][0](spark, sf_dir).collect()[0].avg_yearly
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))


def test_sales_opportunity_members_are_dormant(spark, sf_dir):
    """Independent membership check: every counted segment total must
    equal the pandas-side count of above-mean-balance customers with
    zero orders after the cutoff."""
    import pandas as pd

    cust = load_table(spark, sf_dir, "customer").toPandas()
    orders = load_table(spark, sf_dir, "orders").toPandas()
    avg_bal = cust[cust.c_acctbal > 0].c_acctbal.mean()
    recent = set(
        orders[orders.o_orderdate >= pd.Timestamp("1999-01-01")].o_custkey
    )
    elig = cust[
        (cust.c_acctbal > avg_bal) & (~cust.c_custkey.isin(recent))
    ]
    want = elig.groupby("c_mktsegment").size().to_dict()
    got = {
        r.c_mktsegment: r.n_cust
        for r in _CATALOG["sales_opportunity"][0](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_interarrival_matches_batch(spark, sf_dir, tmp_path):
    """Replay the events table in two time-ordered micro-batches: the
    streaming gap log aggregated through the SHARED windows.gap_report
    must equal the batch operator's stats frame EXACTLY (bitwise: the
    stateful emitter performs the same divide-then-subtract IEEE
    sequence as the batch lag window)."""
    import os
    import time

    from lenses_topology_example_spark.operators.windows import gap_report
    from lenses_topology_example_spark.streaming.pipelines import (
        start_interarrival_stream,
    )

    events = load_table(spark, sf_dir, "events")
    # split purely on ts: all rows with an identical ts land in the same
    # file, so cross-batch arrival order == (ts, event_id) event order
    med_ts = events.agg(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")
    ).collect()[0][0]
    src = tmp_path / "ia_src"
    # coalesce(1): exactly ONE part file per half — same-mtime sibling
    # part files would drain as separate micro-batches in unspecified
    # order and break the cross-batch (ts, event_id) ordering the
    # bitwise parity claim needs
    events.filter(F.col("ts").cast("double") <= med_ts).coalesce(
        1
    ).write.parquet(f"{src}/f0")
    events.filter(F.col("ts").cast("double") > med_ts).coalesce(
        1
    ).write.parquet(f"{src}/f1")
    now = time.time()
    for sub, off in (("f0", 0), ("f1", 60)):
        d = f"{src}/{sub}"
        for fn in os.listdir(d):
            os.utime(f"{d}/{fn}", (now + off, now + off))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out = tmp_path / "ia_gaps"
    q = start_interarrival_stream(
        stream, str(out), str(tmp_path / "ia_ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_type: (r.n_gaps, r.mean_gap_s, r.min_gap_s, r.max_gap_s)
        for r in gap_report(spark.read.parquet(str(out))).collect()
    }
    want = {
        r.event_type: (r.n_gaps, r.mean_gap_s, r.min_gap_s, r.max_gap_s)
        for r in _CATALOG["interarrival_stats"][0](spark, sf_dir).collect()
    }
    assert got == want


def test_temperature_mix_compresses_head_to_tail(spark, sf_dir):
    """tau=0.7 must boost tail sources and damp the head: every
    below-average source's temp_share exceeds its raw_share, every
    above-average source's is below, share ordering is preserved, and
    the temperature shares sum to ~1 with allocations within budget."""
    rows = _CATALOG["temperature_mix"][0](spark, sf_dir).collect()
    assert len(rows) >= 2
    total = sum(r.n_tokens for r in rows)
    budget = total * 3 // 5
    assert sum(r.temp_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.alloc_tokens for r in rows) <= budget
    mean = total / len(rows)
    for r in rows:
        if r.n_tokens < mean:
            assert r.temp_share > r.raw_share, r
        elif r.n_tokens > mean * 1.05:
            assert r.temp_share < r.raw_share, r
    by_raw = sorted(rows, key=lambda r: r.n_tokens)
    shares = [r.temp_share for r in by_raw]
    assert shares == sorted(shares), "temperature must preserve ordering"
