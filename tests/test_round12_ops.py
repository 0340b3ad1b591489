"""Round-12 depth artifacts (r11 VERDICT ask #8): the Lloyd fixpoint
composition — kmeans_fit run to convergence — pinned step-for-step
against a sequential pure-Python replica. The point is not one
iteration's output (q_kmeans_refine's oracle covers that every run)
but the ITERATION TRAJECTORY: the deterministic fold/decimal
discipline must make every round's assignment bit-reproducible, or a
fixpoint loop on a real cluster would converge to different states on
different runs."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from lenses_topology_example_spark.operators.embed_stats import (
    KMEANS_K,
    kmeans_fit,
)

_Q6 = Decimal("0.000001")


def _fold_dot(a, b):
    # similarity.dot: zip_with multiply, then sequential left-fold add
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _d6(x: float) -> Decimal:
    # Spark's double->DECIMAL(38,6) cast goes through the SHORTEST
    # decimal representation (BigDecimal.valueOf), not the exact binary
    # expansion — Decimal(repr(x)) is the established replica idiom
    # (tests/test_round10_ops.py).
    return Decimal(repr(x)).quantize(_Q6, rounding=ROUND_HALF_UP)


def _lloyd_replica(sf_dir: str, k: int, max_iters: int):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    vecs = {}
    for vid, emb in rows:
        v = [float(x) for x in emb]
        nrm = math.sqrt(_fold_dot(v, v))
        if nrm > 0.0:
            vecs[vid] = (v, nrm)

    def assign(cents):
        lab = {}
        for vid, (v, nrm) in vecs.items():
            best = None
            for cid in sorted(cents):
                cv, cnrm = cents[cid]
                cos = _fold_dot(v, cv) / (nrm * cnrm)
                key = (-cos, cid)
                if best is None or key < best[0]:
                    best = (key, cid)
            lab[vid] = best[1]
        return lab

    def recompute(lab):
        groups: dict[int, list[int]] = {}
        for vid, cid in lab.items():
            groups.setdefault(cid, []).append(vid)
        cents = {}
        for cid, members in groups.items():
            dims = len(vecs[members[0]][0])
            cv = []
            for d in range(dims):
                s = Decimal(0)
                for vid in members:
                    s += _d6(vecs[vid][0][d])
                # decimal sum -> double (correctly rounded), ONE double
                # division by the exact count — the Spark expression
                cv.append(float(s) / len(members))
            cnrm = math.sqrt(_fold_dot(cv, cv))
            if cnrm > 0.0:
                cents[cid] = (cv, cnrm)
        return cents

    seed = {
        vid: (v, nrm) for vid, (v, nrm) in vecs.items() if vid < k
    }
    lab = assign(seed)
    for it in range(1, max_iters + 1):
        cur = assign(recompute(lab))
        changed = sum(1 for vid in lab if cur[vid] != lab[vid])
        lab = cur
        if changed == 0:
            return lab, it, True
    return lab, max_iters, False


def test_kmeans_fit_converges_and_matches_replica(spark, sf_dir):
    labels_df, n_iters, converged = kmeans_fit(spark, sf_dir, max_iters=25)
    got = {
        r.vec_id: r.centroid_id for r in labels_df.collect()
    }
    want, want_iters, want_converged = _lloyd_replica(sf_dir, KMEANS_K, 25)

    assert converged, "Lloyd did not reach the assignment fixpoint in 25"
    assert want_converged
    assert n_iters == want_iters, (
        f"iteration-count drift: spark={n_iters} replica={want_iters} — "
        "some round's assignment was not bit-reproducible"
    )
    assert got == want, (
        "fixpoint membership differs from the sequential replica: "
        f"{sum(1 for v in got if got[v] != want.get(v))} of {len(got)} "
        "vectors disagree"
    )
    # the fixpoint really is one: a further iteration must not move
    # (implied by the loop's exit condition, restated as a contract)
    assert n_iters >= 1


def test_kmeans_fit_respects_max_iters(spark, sf_dir):
    # max_iters=1 must stop after exactly one refine pass and report
    # convergence honestly (it may or may not have converged in one).
    labels_df, n_iters, _ = kmeans_fit(spark, sf_dir, max_iters=1)
    assert n_iters == 1
    # every surviving vector keeps exactly one assignment
    n = labels_df.count()
    assert labels_df.select("vec_id").distinct().count() == n
