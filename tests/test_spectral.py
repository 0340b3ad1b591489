"""Semantics checks for the spectral/frequency-structure wave: the
power-iteration output must match an independent numpy replica of the
same two-matvec algorithm, and the Zipf fit must recover the synthetic
corpus's negative frequency slope. Oracle parity runs separately in
test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pytest

from lenses_topology_example_spark.catalog import _CATALOG


def test_embed_pca_power_matches_numpy(spark, sf_dir):
    rows = _CATALOG["embed_pca_power"][0](spark, sf_dir).collect()
    got = np.array([r.component for r in sorted(rows, key=lambda r: r.dim)])
    lam = rows[0].eigenvalue

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    E = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    v = E.T @ (E @ np.ones(E.shape[1]))
    v = v / np.linalg.norm(v)
    w = E.T @ (E @ v)
    lam_np = np.linalg.norm(w)
    v2 = w / lam_np
    if v2[0] < 0:
        v2 = -v2
    # decimal(38,6) rounding inside the distributed sums perturbs each
    # component by O(1e-6); the directions must agree far tighter than
    # any eigengap
    assert np.linalg.norm(got - v2) < 1e-3
    assert abs(lam - lam_np) / lam_np < 1e-3
    # unit vector out
    assert abs(np.linalg.norm(got) - 1.0) < 1e-6
    # and it actually concentrates variance: Rayleigh quotient of the
    # reported direction ~ lambda
    assert lam > 0


def test_embed_pca_power_shape(spark, sf_dir):
    df = _CATALOG["embed_pca_power"][0](spark, sf_dir)
    rows = df.collect()
    dims = [r.dim for r in rows]
    assert dims == sorted(dims) and len(dims) == len(set(dims))
    assert rows[0].component >= 0  # sign fix pins dim 0 non-negative


def test_zipf_fit_recovers_negative_slope(spark, sf_dir):
    row = _CATALOG["zipf_fit"][0](spark, sf_dir).collect()[0]
    assert row.n_tokens > 10
    assert row.zipf_slope < 0, "frequency must fall with rank"
    assert 0.0 <= row.r2 <= 1.0


def test_zipf_fit_single_row(spark, sf_dir):
    df = _CATALOG["zipf_fit"][0](spark, sf_dir)
    assert df.count() == 1
    assert [f.name for f in df.schema.fields] == [
        "n_tokens",
        "zipf_slope",
        "intercept",
        "r2",
    ]
