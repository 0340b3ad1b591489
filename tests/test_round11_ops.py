"""Semantic replicas for the round-11 additions: label_noise_knn,
silhouette_report, temporal_split, conformal_threshold, bandit_ucb.
Each is checked against an independent pure-Python/numpy computation
over the same inputs (oracle parity is covered separately by
tests/test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
import math

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.tables import load_table


def _md5_64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cos(a, b):
    dot = nn = mm = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        nn += float(x) * float(x)
    for y in b:
        mm += float(y) * float(y)
    return dot / (math.sqrt(nn) * math.sqrt(mm))


def test_label_noise_knn_matches_bruteforce(spark, sf_dir):
    from lenses_topology_example_spark.operators.similarity import (
        LABEL_AUDIT_N,
        TOP_K,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in rows}
    got = {
        r.query_id: r
        for r in _CATALOG["label_noise_knn"][0](spark, sf_dir).collect()
    }
    audited = [v for v in vecs if v < LABEL_AUDIT_N]
    assert set(got) == set(audited)
    for qid in audited:
        qlabel, qv = vecs[qid]
        scored = sorted(
            (
                (-_cos(qv, v), nid, lab)
                for nid, (lab, v) in vecs.items()
                if nid != qid
            ),
        )[:TOP_K]
        n_disagree = sum(1 for _, _, lab in scored if lab != qlabel)
        r = got[qid]
        assert r.own_label == qlabel
        assert r.n_neighbors == len(scored)
        assert r.n_disagree == n_disagree
        assert abs(r.noise_frac - n_disagree / len(scored)) < 1e-12
        assert r.suspect == (n_disagree * 10 > len(scored) * 6)


def test_silhouette_report_matches_python(spark, sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    from lenses_topology_example_spark.operators.embed_stats import KMEANS_K

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    cents = {k: vecs[k] for k in vecs if k < KMEANS_K}
    per_cluster: dict[int, list] = {}
    for vid, v in vecs.items():
        if not any(x != 0.0 for x in v):
            continue
        sims = sorted(
            ((-_cos(v, cv), cid) for cid, cv in cents.items())
        )
        (_, c1), (_, c2) = sims[0], sims[1]
        cos1, cos2 = -sims[0][0], -sims[1][0]
        a, b = 1.0 - cos1, 1.0 - cos2
        denom = max(a, b)
        s = (cos1 - cos2) / denom if denom != 0.0 else None
        per_cluster.setdefault(c1, []).append(s)
    got = {
        r.centroid_id: r
        for r in _CATALOG["silhouette_report"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(per_cluster)
    for cid, sils in per_cluster.items():
        r = got[cid]
        assert r.n_assigned == len(sils)
        nonnull = [s for s in sils if s is not None]
        want_mean = (
            float(
                sum(
                    (
                        Decimal(f"{s:.6f}")
                        for s in nonnull
                    ),
                    Decimal(0),
                )
            )
            / len(nonnull)
            if nonnull
            else None
        )
        if want_mean is None:
            assert r.mean_sil is None
        else:
            assert abs(r.mean_sil - want_mean) < 1e-6
        assert abs(r.min_sil - min(nonnull)) < 1e-12
        # simplified silhouette under nearest-assignment is in [0, 1]
        assert -1e-12 <= r.min_sil and r.mean_sil <= 1.0 + 1e-12


def test_temporal_split_counts_and_boundaries(spark, sf_dir):
    rows = _CATALOG["temporal_split"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts")
        .collect()
    )
    n_by_type: dict[str, int] = {}
    for r in ev:
        n_by_type[r.event_type] = n_by_type.get(r.event_type, 0) + 1
    by_type: dict[str, dict] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.split] = r
    for et, n in n_by_type.items():
        splits = by_type[et]
        train_cut = int(n * 0.8)
        val_cut = int(n * 0.9)
        want = {
            "train": train_cut,
            "val": val_cut - train_cut,
            "test": n - val_cut,
        }
        got_counts = {s: r.n_events for s, r in splits.items()}
        assert got_counts == {k: v for k, v in want.items() if v > 0}
        # time ordering: train ends no later than val starts, etc.
        order = [s for s in ("train", "val", "test") if s in splits]
        for a, b in zip(order, order[1:]):
            assert splits[a].ts_max <= splits[b].ts_min
        assert sum(got_counts.values()) == n


def test_conformal_threshold_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.analytics import (
        CALIB_WEIGHTS,
        CONF_ALPHA,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    cal, ev = [], []
    for r in rows:
        z = sum(w * float(x) for w, x in zip(CALIB_WEIGHTS, r.embedding))
        s = round(1.0 / (1.0 + math.exp(-z)), 6)
        nc = 1.0 - s if (r.label % 2) == 1 else s
        (cal if _md5_64(str(r.vec_id)) % 2 == 0 else ev).append(nc)
    got = _CATALOG["conformal_threshold"][0](spark, sf_dir).collect()[0]
    assert got.n_cal == len(cal)
    assert got.n_eval == len(ev)
    q_index = math.ceil((len(cal) + 1) * (1.0 - CONF_ALPHA))
    if q_index <= len(cal):
        q_hat = sorted(cal)[q_index - 1]
    else:
        q_hat = 1.0
    assert abs(got.q_hat - q_hat) < 1e-12
    covered = sum(1 for nc in ev if nc <= q_hat)
    assert got.n_covered == covered
    assert abs(got.coverage - covered / len(ev)) < 1e-12
    # the conformal guarantee holds on the calibration construction
    assert got.q_hat <= 1.0 and 0.0 <= got.coverage <= 1.0


def test_bandit_ucb_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import (
        BANDIT_ARMS,
        BANDIT_CONV_THRESHOLD,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "value")
        .collect()
    )
    n = [0] * BANDIT_ARMS
    conv = [0] * BANDIT_ARMS
    for r in ev:
        arm = _md5_64("bandit|" + str(r.user_id)) % BANDIT_ARMS
        n[arm] += 1
        if r.value >= BANDIT_CONV_THRESHOLD:
            conv[arm] += 1
    total = sum(n)
    rows = {r.arm: r for r in _CATALOG["bandit_ucb"][0](spark, sf_dir).collect()}
    assert set(rows) == {a for a in range(BANDIT_ARMS) if n[a] > 0}
    ucbs = {}
    for a, r in rows.items():
        assert r.n == n[a]
        assert r.n_conv == conv[a]
        assert abs(r.conv_rate - conv[a] / n[a]) < 1e-12
        want_ucb = conv[a] / n[a] + math.sqrt(2.0 * math.log(total) / n[a])
        assert abs(r.ucb_score - want_ucb) < 1e-9
        ucbs[a] = (r.ucb_score, a)
    best = min(ucbs.values(), key=lambda t: (-t[0], t[1]))[1]
    for a, r in rows.items():
        assert r.chosen == (a == best)
