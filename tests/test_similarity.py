"""Similarity-search invariants beyond oracle parity: exactness of the
brute-force tier, ANN recall, and vector-math sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lenses_topology_example_spark.operators.similarity import (
    TOP_K,
    as_double,
    cosine,
    q_sim_ann_ivf,
    q_sim_ann_lsh,
    q_sim_topk,
)
from lenses_topology_example_spark.tables import load_table


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<double>")
    r = df.select(cosine(F.col("v"), F.col("v")).alias("c")).collect()[0]
    assert abs(r["c"] - 1.0) < 1e-12


def test_topk_shape_and_bounds(spark, sf_dir):
    rows = q_sim_topk(spark, sf_dir).collect()
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9
    assert set(by_query) == {0, 1, 2, 3, 4}
    for q, rs in by_query.items():
        assert len(rs) == TOP_K
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_ann_is_subset_quality(spark, sf_dir):
    """ANN results can't beat exact top-1, and every ANN hit must be a
    genuine corpus vector with correct cosine (spot-check one)."""
    exact = q_sim_topk(spark, sf_dir).collect()
    ann = q_sim_ann_lsh(spark, sf_dir).collect()
    best_exact = {}
    for r in exact:
        best_exact[r["query_id"]] = max(
            best_exact.get(r["query_id"], -2.0), r["cos_sim"]
        )
    for r in ann:
        assert r["cos_sim"] <= best_exact[r["query_id"]] + 1e-12
    # recall@k against the exact answer — LSH with 8 planes on 64-dim
    # synthetic data is approximate; just require nonzero overlap overall
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ann_set = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert ann_set & exact_set, "ANN found none of the exact top-k"


def test_ivf_quality(spark, sf_dir):
    """IVF invariants: k results per query, no self-matches, scores never
    beat the exact answer, and the probed cells recover a nonzero share
    of the exact top-k."""
    exact = q_sim_topk(spark, sf_dir).collect()
    ivf = q_sim_ann_ivf(spark, sf_dir).collect()
    by_query: dict[int, list] = {}
    for r in ivf:
        by_query.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    assert set(by_query) == {0, 1, 2, 3, 4}
    best_exact = {}
    for r in exact:
        best_exact[r["query_id"]] = max(
            best_exact.get(r["query_id"], -2.0), r["cos_sim"]
        )
    for r in ivf:
        assert r["cos_sim"] <= best_exact[r["query_id"]] + 1e-12
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert ivf_set & exact_set, "IVF found none of the exact top-k"


def test_embedding_dim(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in n] == [64]
