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


def test_embed_threshold_sweep_monotone(spark, sf_dir):
    """Tightening the threshold must monotonically shrink every count,
    and the 0.30 row must agree with the embed_neardup pair count at
    the catalog threshold."""
    from lenses_topology_example_spark.catalog import _CATALOG

    rows = _CATALOG["embed_threshold_sweep"][0](spark, sf_dir).collect()
    assert [r.threshold for r in rows] == [0.20, 0.25, 0.30, 0.35, 0.40]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_pairs >= hi.n_pairs
        assert lo.n_docs_matched >= hi.n_docs_matched
        assert lo.n_removable >= hi.n_removable
    for r in rows:
        assert r.n_removable <= r.n_docs_matched
        assert 0.0 <= r.removal_fraction <= 1.0

    n_pairs_030 = _CATALOG["embed_neardup"][0](spark, sf_dir).count()
    assert rows[2].n_pairs == n_pairs_030
