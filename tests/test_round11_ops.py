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


def test_source_ablation_matches_python(spark, sf_dir):
    from decimal import Decimal

    from pyspark.sql import functions as F

    from lenses_topology_example_spark.operators.text import (
        quality_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = quality_components(F.col("text"))["quality"]
    rows = docs.select("source", q.alias("q")).collect()
    sums: dict[str, Decimal] = {}
    counts: dict[str, int] = {}
    for r in rows:
        if r.q is None:
            continue
        sums[r.source] = sums.get(r.source, Decimal(0)) + Decimal(
            f"{r.q:.6f}"
        )
        counts[r.source] = counts.get(r.source, 0) + 1
    total_q, total_n = sum(sums.values()), sum(counts.values())
    got = {
        r.source: r
        for r in _CATALOG["source_ablation"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for src, r in got.items():
        assert r.n_docs == counts[src]
        assert abs(r.mean_quality - float(sums[src]) / counts[src]) < 1e-9
        assert abs(r.mean_overall - float(total_q) / total_n) < 1e-9
        rest_n = total_n - counts[src]
        if rest_n:
            want_without = float(total_q - sums[src]) / rest_n
            assert abs(r.mean_without - want_without) < 1e-9
            assert abs(
                r.delta_without - (want_without - float(total_q) / total_n)
            ) < 1e-9
        else:
            assert r.mean_without is None


def test_hill_tail_index_matches_python(spark, sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    from lenses_topology_example_spark.operators.analytics import HILL_K

    vals = sorted(
        (
            r.o_totalprice
            for r in load_table(spark, sf_dir, "orders")
            .select("o_totalprice")
            .collect()
        ),
        reverse=True,
    )[:HILL_K]
    x_k = min(vals)
    log_sum = float(
        sum(
            (
                Decimal(f"{math.log(x / x_k):.6f}".replace("-0.000000", "0.000000"))
                for x in vals
            ),
            Decimal(0),
        )
    )
    r = _CATALOG["hill_tail_index"][0](spark, sf_dir).collect()[0]
    assert r.k == len(vals)
    assert r.threshold == x_k
    assert abs(r.log_sum - log_sum) < 1e-6
    assert abs(r.hill_alpha - (len(vals) - 1) / log_sum) < 1e-6
    assert r.hill_alpha > 0


def test_forecast_backtest_matches_python_holt(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    from pyspark.sql import functions as F

    from lenses_topology_example_spark.operators.windows import (
        BT_CUTOFFS,
        HOLT_ALPHA,
        HOLT_BETA,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.date_format(
                F.trunc(F.to_date("o_orderdate"), "month"), "yyyy-MM"
            ).alias("m"),
            "o_totalprice",
        )
        .collect()
    )
    monthly: dict[str, Decimal] = defaultdict(Decimal)
    for r in orders:
        monthly[r.m] += Decimal(f"{r.o_totalprice:.6f}")
    hist = [(m, float(v)) for m, v in sorted(monthly.items())]
    rows = _CATALOG["forecast_backtest"][0](spark, sf_dir).collect()
    want = {}
    L = len(hist)
    for o in range(1, BT_CUTOFFS + 1):
        p = L - BT_CUTOFFS + o
        if p < 3:
            continue
        xs = [x for _, x in hist[: p - 1]]
        level, trend = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            level_new = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + trend)
            trend = (
                HOLT_BETA * (level_new - level) + (1 - HOLT_BETA) * trend
            )
            level = level_new
        f = level + trend
        want[hist[p - 1][0]] = (hist[p - 1][1], f)
    assert {r.target_month for r in rows} == set(want)
    for r in rows:
        actual, f = want[r.target_month]
        assert abs(r.actual - actual) < 1e-6
        assert abs(r.forecast - f) < 1e-6
        assert abs(r.ape - abs(f - actual) / actual) < 1e-9


# --- streaming bandit twin (round-11 infra) ----------------------------------


def test_streaming_bandit_matches_batch(spark, sf_dir, tmp_path):
    """The final micro-batch's cumulative UCB report must equal the
    batch operator over the whole event set — exact equality, with
    maxFilesPerTrigger=1 forcing the cumulative state to carry across
    micro-batch boundaries."""
    from lenses_topology_example_spark.streaming.pipelines import (
        start_bandit_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = tmp_path / "bandit_src"
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "a"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "a"))

    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "a"))
    )
    out = str(tmp_path / "bandit_out")
    q = start_bandit_stream(stream, out, str(tmp_path / "bandit_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob as _glob

    last = max(
        int(p.rsplit("=", 1)[1])
        for p in _glob.glob(f"{out}/report/batch_id=*")
    )
    assert last >= 1  # the state actually crossed a batch boundary
    streamed = {
        r.arm: (r.n, r.n_conv, r.conv_rate, r.ucb_score, r.chosen)
        for r in spark.read.parquet(f"{out}/report/batch_id={last}").collect()
    }
    want = {
        r.arm: (r.n, r.n_conv, r.conv_rate, r.ucb_score, r.chosen)
        for r in _CATALOG["bandit_ucb"][0](spark, sf_dir).collect()
    }
    assert streamed == want


def test_mrl_truncation_audit_matches_bruteforce(spark, sf_dir):
    from lenses_topology_example_spark.operators.similarity import (
        MRL_DIMS,
        N_QUERIES,
        TOP_K,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def topk(qid, d):
        qv = vecs[qid][:d] if d else vecs[qid]
        scored = sorted(
            (-_cos(qv, (v[:d] if d else v)), nid)
            for nid, v in vecs.items()
            if nid != qid
        )[:TOP_K]
        return {nid for _, nid in scored}

    got = {
        r.dim: r
        for r in _CATALOG["mrl_truncation_audit"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(MRL_DIMS)
    queries = [q for q in vecs if q < N_QUERIES]
    for d in MRL_DIMS:
        hits = ranked = 0
        for qid in queries:
            truth = topk(qid, None)
            tr = topk(qid, d)
            ranked += len(tr)
            hits += len(tr & truth)
        r = got[d]
        assert r.n_ranked == ranked
        assert r.n_hits == hits
        assert abs(r.recall_at_k - hits / ranked) < 1e-12
    # recall should not decrease with more dimensions (weak sanity;
    # allow equality)
    rs = [got[d].recall_at_k for d in sorted(MRL_DIMS)]
    assert rs[-1] >= rs[0]


def test_weighted_sample_ares_matches_python(spark, sf_dir):
    from pyspark.sql import functions as F

    from lenses_topology_example_spark.operators.quality import (
        ARES_K,
        ARES_U_GRID,
        ARES_W_FLOOR,
    )
    from lenses_topology_example_spark.operators.text import (
        quality_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = quality_components(F.col("text"))["quality"]
    rows = docs.select("doc_id", q.alias("q")).collect()
    keyed = []
    for r in rows:
        u = (
            _md5_64(f"ares|{r.doc_id}") % ARES_U_GRID + 0.5
        ) / ARES_U_GRID
        w = max(r.q, ARES_W_FLOOR) if r.q is not None else ARES_W_FLOOR
        keyed.append((round(math.log(u) / w, 6), -r.doc_id, r.doc_id, w))
    keyed.sort(reverse=True)
    want = keyed[:ARES_K]
    got = _CATALOG["weighted_sample_ares"][0](spark, sf_dir).collect()
    assert len(got) == min(ARES_K, len(rows))
    assert [r.doc_id for r in got] == [d for _, _, d, _ in want]
    for r, (k, _, d, w) in zip(got, want):
        assert abs(r.sample_key - k) < 1e-6
        assert abs(r.weight - w) < 1e-12


def test_streaming_conformal_matches_batch(spark, sf_dir, tmp_path):
    """The final micro-batch's cumulative conformal report must equal
    the batch operator over the whole embedding set — exact equality,
    with maxFilesPerTrigger=1 forcing the histogram state across
    micro-batch boundaries."""
    from lenses_topology_example_spark.streaming.pipelines import (
        start_conformal_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = tmp_path / "conf_src"
    emb.filter("vec_id % 2 = 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "a"))
    emb.filter("vec_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "a"))

    stream = (
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "a"))
    )
    out = str(tmp_path / "conf_out")
    q = start_conformal_stream(stream, out, str(tmp_path / "conf_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob as _glob

    last = max(
        int(p.rsplit("=", 1)[1])
        for p in _glob.glob(f"{out}/report/batch_id=*")
    )
    assert last >= 1
    sr = spark.read.parquet(f"{out}/report/batch_id={last}").collect()[0]
    br = _CATALOG["conformal_threshold"][0](spark, sf_dir).collect()[0]
    assert (
        sr.n_cal,
        sr.n_eval,
        sr.q_hat,
        sr.n_covered,
        sr.coverage,
    ) == (br.n_cal, br.n_eval, br.q_hat, br.n_covered, br.coverage)


def test_theil_sen_matches_python(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    from pyspark.sql import functions as F

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("x"),
            "o_totalprice",
        )
        .collect()
    )
    monthly: dict[int, Decimal] = defaultdict(Decimal)
    for r in orders:
        monthly[r.x] += Decimal(f"{r.o_totalprice:.6f}")
    pts = sorted((x, int(v * 1_000_000)) for x, v in monthly.items())
    slopes = sorted(
        ((yj - yi) / (xj - xi), xi, xj)
        for i, (xi, yi) in enumerate(pts)
        for xj, yj in pts[i + 1 :]
    )

    def median(vals):
        n = len(vals)
        lo, hi = (n + 1) // 2 - 1, (n + 2) // 2 - 1
        return (vals[lo] + vals[hi]) / 2.0

    slope = median([s for s, _, _ in slopes])
    resid = sorted(
        (y - slope * x, x) for x, y in pts
    )
    intercept = median([r for r, _ in resid])
    got = _CATALOG["theil_sen_trend"][0](spark, sf_dir).collect()[0]
    assert got.n_months == len(pts)
    assert got.n_pairs == len(slopes)
    assert abs(got.slope - slope / 1e6) < 1e-6 * max(1.0, abs(slope / 1e6))
    assert abs(got.intercept - intercept / 1e6) < 1e-6 * max(
        1.0, abs(intercept / 1e6)
    )


def test_group_rare_collapse_partition_and_coverage(spark, sf_dir):
    from lenses_topology_example_spark.operators.analytics import (
        RARE_MIN_COUNT,
    )

    cats = {}
    for r in (
        load_table(spark, sf_dir, "part").select("p_type").collect()
    ):
        cats[r.p_type] = cats.get(r.p_type, 0) + 1
    rows = _CATALOG["group_rare_collapse"][0](spark, sf_dir).collect()
    total = sum(cats.values())
    assert sum(r.n_parts for r in rows) == total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    by_level = {r.level: r for r in rows}
    kept = {c for c, n in cats.items() if n >= RARE_MIN_COUNT}
    rare = {c for c, n in cats.items() if n < RARE_MIN_COUNT}
    for c in kept:
        assert by_level[c].n_parts == cats[c]
        assert by_level[c].n_source_categories == 1
    if rare:
        o = by_level["OTHER"]
        assert o.n_parts == sum(cats[c] for c in rare)
        assert o.n_source_categories == len(rare)


# --- wave 6: permutation test / spearman / kfold / oov -------------------------


def _q6(x: float):
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def test_permutation_test_matches_python(spark, sf_dir):
    from decimal import Decimal

    from lenses_topology_example_spark.operators.windows import PERM_B

    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "value")
        .collect()
    )

    def diff(coin_prefix):
        s = {0: Decimal(0), 1: Decimal(0)}
        n = {0: 0, 1: 0}
        for r in rows:
            arm = _md5_64(f"{coin_prefix}{r.user_id}") % 2
            s[arm] += _q6(float(r.value))
            n[arm] += 1
        if n[0] == 0 or n[1] == 0:
            return n, None
        d = float(s[1]) / n[1] - float(s[0]) / n[0]
        return n, float(_q6(d))

    n_obs, obs_diff = diff("ab|")
    extremes = 0
    for b in range(PERM_B):
        _, d_b = diff(f"perm|{b}|")
        if (
            d_b is not None
            and obs_diff is not None
            and abs(d_b) >= abs(obs_diff)
        ):
            extremes += 1
    got = _CATALOG["permutation_test"][0](spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_0 == n_obs[0] and r.n_1 == n_obs[1]
    assert abs(r.obs_diff - obs_diff) < 1e-12
    assert r.n_perms == PERM_B
    assert r.n_extreme == extremes
    assert abs(r.p_value - (extremes + 1) / (PERM_B + 1)) < 1e-12


def test_spearman_corr_matches_python(spark, sf_dir):
    import re

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "n_chars", "text")
        .collect()
    )
    per_source: dict[str, list] = {}
    for r in rows:
        toks = [t for t in re.split(r"\W+", r.text.lower()) if t]
        per_source.setdefault(r.source, []).append(
            (int(r.n_chars), len(set(toks)))
        )

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    got = {
        r.source: r
        for r in _CATALOG["spearman_corr"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(per_source)
    for src, pts in per_source.items():
        rx = midranks([p[0] for p in pts])
        ry = midranks([p[1] for p in pts])
        n = len(pts)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        r = got[src]
        assert r.n_docs == n
        if vx * vy == 0:
            assert r.spearman_rho is None
        else:
            want = cov / math.sqrt(vx * vy)
            assert abs(r.spearman_rho - want) < 1e-6


def test_kfold_assign_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.quality import KFOLD_K

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    cells: dict[tuple, list] = {}
    for r in rows:
        fold = _md5_64(f"fold|{r.doc_id}") % KFOLD_K
        cells.setdefault((r.lang, fold), []).append(int(r.n_chars))
    got = {
        (r.lang, r.fold): r
        for r in _CATALOG["kfold_assign"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for (lang, fold), chars in cells.items():
        r = got[(lang, fold)]
        assert r.n_docs == len(chars)
        assert r.n_chars == sum(chars)
        lang_counts = [
            len(v) for (lg, _), v in cells.items() if lg == lang
        ]
        assert abs(r.fold_share - len(chars) / sum(lang_counts)) < 1e-12
        assert (
            abs(
                r.stratum_balance_ratio
                - max(lang_counts) / min(lang_counts)
            )
            < 1e-12
        )


def test_oov_rate_matches_python(spark, sf_dir):
    import re
    from collections import Counter

    from lenses_topology_example_spark.operators.text import OOV_VOCAB_SIZE

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    freq: Counter = Counter()
    per_source: dict[str, list] = {}
    for r in rows:
        toks = [t for t in re.split(r"\W+", r.text.lower()) if t]
        freq.update(toks)
        per_source.setdefault(r.source, []).extend(toks)
    vocab = {
        w
        for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_SIZE
        ]
    }
    got = {
        r.source: r for r in _CATALOG["oov_rate"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(per_source)
    for src, toks in per_source.items():
        oov = [t for t in toks if t not in vocab]
        r = got[src]
        assert r.n_tokens == len(toks)
        assert r.n_oov == len(oov)
        assert r.n_oov_types == len(set(oov))
        if toks:
            assert abs(r.oov_rate - len(oov) / len(toks)) < 1e-12
        else:
            assert r.oov_rate is None


def test_fdr_bh_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import FDR_Z_SCALE

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .collect()
    )
    cells: dict[str, dict] = {}
    for r in rows:
        arm = _md5_64(f"ab|{r.user_id}") % 2
        c = cells.setdefault(
            r.event_type, {"n": [0, 0], "s": [0.0, 0.0], "ss": [0.0, 0.0]}
        )
        c["n"][arm] += 1
        c["s"][arm] += float(_q6(float(r.value)))
        c["ss"][arm] += float(_q6(float(r.value) * float(r.value)))
    scored = {}
    for et, c in cells.items():
        n0, n1 = c["n"]
        s0, s1 = c["s"]
        ss0, ss1 = c["ss"]
        z = p = None
        if n0 > 1 and n1 > 1:
            se = math.sqrt(
                (ss0 - s0 * s0 / n0) / (n0 - 1) / n0
                + (ss1 - s1 * s1 / n1) / (n1 - 1) / n1
            )
            if se > 0.0:
                z = float(_q6((s1 / n1 - s0 / n0) / se))
                p = float(
                    _q6(2.0 / (1.0 + math.exp(FDR_Z_SCALE * abs(z))))
                )
        scored[et] = (n0, n1, z, p)
    tested = sorted(
        ((p, et) for et, (_, _, _, p) in scored.items() if p is not None)
    )
    m = len(tested)
    qs = {}
    run_min = None
    for i in range(m - 1, -1, -1):
        val = min(1.0, tested[i][0] * m / (i + 1))
        run_min = val if run_min is None else min(run_min, val)
        qs[tested[i][1]] = (i + 1, float(_q6(run_min)))
    got = {r.event_type: r for r in _CATALOG["fdr_bh"][0](spark, sf_dir).collect()}
    assert set(got) == set(scored)
    for et, (n0, n1, z, p) in scored.items():
        r = got[et]
        assert (r.n_0, r.n_1) == (n0, n1)
        if z is None:
            assert r.z_score is None and r.p_value is None
            assert r.p_rank is None and r.q_value is None
            assert r.reject_05 is False  # never a nullable boolean
        else:
            assert abs(r.z_score - z) < 1e-9
            assert abs(r.p_value - p) < 1e-9
            rank, q = qs[et]
            assert r.p_rank == rank
            assert abs(r.q_value - q) < 1e-9
            assert r.reject_05 == (q <= 0.05)


def test_jl_projection_audit_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.similarity import (
        JL_AUDIT_N,
        JL_K,
        JL_SIGNS,
        _jl_signs,
    )

    assert JL_SIGNS == _jl_signs()  # literal table is reproducible
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    ratios = []
    n_degen = 0
    for vid in sorted(vecs):
        if vid >= JL_AUDIT_N or (vid + 1) not in vecs:
            continue
        d = [a - b for a, b in zip(vecs[vid], vecs[vid + 1])]
        d2 = 0.0
        for x in d:
            d2 += x * x
        if d2 <= 0.0:
            n_degen += 1
            continue
        p2 = 0.0
        for j in range(JL_K):
            pj = 0.0
            for x, s in zip(d, JL_SIGNS[j]):
                pj += x * s
            p2 += pj * pj
        ratios.append(float(_q6(p2 / (JL_K * d2))))
    r = _CATALOG["jl_projection_audit"][0](spark, sf_dir).collect()[0]
    assert r.n_pairs == len(ratios)
    assert r.n_degenerate == n_degen
    if ratios:
        from decimal import Decimal

        mean = float(
            _q6(
                float(sum((Decimal(repr(x)) for x in ratios), Decimal(0)))
                / len(ratios)
            )
        )
        assert abs(r.mean_ratio - mean) < 1e-9
        assert abs(r.min_ratio - min(ratios)) < 1e-12
        assert abs(r.max_ratio - max(ratios)) < 1e-12
        in_band = sum(1 for x in ratios if 0.5 <= x <= 1.5)
        assert abs(r.frac_in_band - in_band / len(ratios)) < 1e-12
        assert 0.5 < r.mean_ratio < 1.5  # JL concentration sanity


def test_heaps_law_fit_matches_python(spark, sf_dir):
    import re

    from lenses_topology_example_spark.operators.text import HEAPS_GRID

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    max_id = max((r.doc_id for r in rows), default=0) or 1
    n_new = [0] * (HEAPS_GRID + 1)
    v_first: dict[str, int] = {}
    for r in rows:
        toks = [t for t in re.split(r"\W+", r.text.lower()) if t]
        g = max(1, math.ceil(r.doc_id * HEAPS_GRID / max_id))
        n_new[g] += len(toks)
        for t in set(toks):
            if t not in v_first or r.doc_id < v_first[t]:
                v_first[t] = r.doc_id
    v_new = [0] * (HEAPS_GRID + 1)
    for d in v_first.values():
        v_new[max(1, math.ceil(d * HEAPS_GRID / max_id))] += 1
    pts = []
    cn = cv = 0
    for g in range(1, HEAPS_GRID + 1):
        cn += n_new[g]
        cv += v_new[g]
        if cn > 0 and cv > 0:
            pts.append(
                (float(_q6(math.log(cn))), float(_q6(math.log(cv))), g, cn, cv)
            )
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    r = _CATALOG["heaps_law_fit"][0](spark, sf_dir).collect()[0]
    assert r.n_cells == n
    n_tokens = cn
    assert r.n_tokens == n_tokens and r.n_vocab == cv
    denom = n * sxx - sx * sx
    beta = float(_q6((n * sxy - sx * sy) / denom))
    assert abs(r.beta - beta) < 1e-9
    ln_k = float(_q6((sy - beta * sx) / n))
    assert abs(r.k - float(_q6(math.exp(ln_k)))) < 1e-9
    ln10n = float(_q6(math.log(10.0 * n_tokens)))
    assert (
        abs(r.v_pred_10x - float(_q6(math.exp(ln_k + beta * ln10n)))) < 1e-9
    )
    # the synthetic corpus draws from a small FIXED vocabulary, so the
    # growth curve saturates (beta ~ 0); real text sits in 0.4-0.6 —
    # the sanity bound here is only "sub-linear, non-negative"
    assert 0.0 <= r.beta < 1.0


def test_term_burstiness_matches_python(spark, sf_dir):
    import re
    from collections import Counter

    from lenses_topology_example_spark.operators.text import BURST_TOP

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    n_docs = len(rows)
    cf: Counter = Counter()
    df: Counter = Counter()
    ssq: Counter = Counter()
    for r in rows:
        c = Counter(t for t in re.split(r"\W+", r.text.lower()) if t)
        for w, k in c.items():
            cf[w] += k
            df[w] += 1
            ssq[w] += k * k
    top = sorted(cf, key=lambda w: (-cf[w], w))[:BURST_TOP]
    got = list(_CATALOG["term_burstiness"][0](spark, sf_dir).collect())
    assert [r.word for r in got] == top
    for i, r in enumerate(got):
        w = top[i]
        assert r.rank == i + 1
        assert (r.cf, r.df) == (cf[w], df[w])
        assert abs(r.mean_per_doc - cf[w] / n_docs) < 1e-12
        assert abs(r.vmr - (ssq[w] / cf[w] - cf[w] / n_docs)) < 1e-12
        assert abs(r.df_cf_ratio - df[w] / cf[w]) < 1e-12


def test_token_coverage_curve_matches_python(spark, sf_dir):
    import re
    from collections import Counter

    from lenses_topology_example_spark.operators.text import COVERAGE_GRID

    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    cf: Counter = Counter()
    for r in rows:
        cf.update(t for t in re.split(r"\W+", r.text.lower()) if t)
    total = sum(cf.values())
    ordered = sorted(cf, key=lambda w: (-cf[w], w))
    got = {r.k: r for r in _CATALOG["token_coverage_curve"][0](spark, sf_dir).collect()}
    want_ks = [k for k in COVERAGE_GRID if k <= len(ordered)]
    assert sorted(got) == want_ks
    for k in want_ks:
        cum = sum(cf[w] for w in ordered[:k])
        assert got[k].top_k_tokens == cum
        assert abs(got[k].coverage - cum / total) < 1e-12
    if want_ks:  # curve must be monotone in both k and coverage
        covs = [got[k].coverage for k in want_ks]
        assert covs == sorted(covs)


def test_brier_decomposition_matches_python(spark, sf_dir):
    from decimal import Decimal

    from lenses_topology_example_spark.operators.analytics import (
        CALIB_BINS,
        CALIB_WEIGHTS,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding", "label")
        .collect()
    )
    bins: dict[int, list] = {}
    for r in rows:
        z = 0.0
        for x, w in zip(r.embedding, CALIB_WEIGHTS):
            z += float(x) * w
        s = float(_q6(1.0 / (1.0 + math.exp(-z))))
        y = r.label % 2
        b = min(int(s * CALIB_BINS), CALIB_BINS - 1)
        bins.setdefault(b, []).append((s, y))
    n_total = sum(len(v) for v in bins.values())
    pos_total = sum(y for v in bins.values() for _, y in v)
    ybar = pos_total / n_total
    ss_total = float(
        sum(
            (
                sum((Decimal(repr(s)) ** 2 for s, _ in v), Decimal(0))
                .quantize(Decimal("0.000001"))
                for v in bins.values()
            ),
            Decimal(0),
        )
    )
    sy_total = float(
        sum(
            (
                sum((Decimal(repr(s)) for s, y in v if y == 1), Decimal(0))
                for v in bins.values()
            ),
            Decimal(0),
        )
    )
    rel = res = Decimal(0)
    for v in bins.values():
        n_b = len(v)
        conf = float(sum((Decimal(repr(s)) for s, _ in v), Decimal(0))) / n_b
        acc = sum(y for _, y in v) / n_b
        rel += _q6((conf - acc) * (conf - acc) * n_b)
        res += _q6((acc - ybar) * (acc - ybar) * n_b)
    r = _CATALOG["brier_decomposition"][0](spark, sf_dir).collect()[0]
    assert r.n == n_total
    brier = float(_q6((ss_total - 2.0 * sy_total + pos_total) / n_total))
    assert abs(r.brier - brier) < 1e-9
    assert abs(r.reliability - float(_q6(float(rel) / n_total))) < 1e-9
    assert abs(r.resolution - float(_q6(float(res) / n_total))) < 1e-9
    assert abs(r.uncertainty - float(_q6(ybar * (1 - ybar)))) < 1e-9
    # Murphy identity: BRIER = REL - RES + UNC (up to the 6dp rounds)
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 1e-4


def test_group_sequential_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import GS_C_OBF

    from pyspark.sql import functions as F

    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select(F.to_date("ts").alias("d"), "user_id", "value")
        .collect()
    )
    days: dict = {}
    for r in rows:
        arm = _md5_64(f"ab|{r.user_id}") % 2
        c = days.setdefault(
            str(r.d), {"n": [0, 0], "s": [0.0, 0.0], "ss": [0.0, 0.0]}
        )
        c["n"][arm] += 1
        c["s"][arm] += float(_q6(float(r.value)))
        c["ss"][arm] += float(_q6(float(r.value) * float(r.value)))
    got = {
        r.event_date: r
        for r in _CATALOG["group_sequential"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(days)
    n_final = sum(c["n"][0] + c["n"][1] for c in days.values())
    cn = [0, 0]
    cs = [0.0, 0.0]
    css = [0.0, 0.0]
    crossed_days = 0
    for d in sorted(days):
        c = days[d]
        for a in (0, 1):
            cn[a] += c["n"][a]
            cs[a] += c["s"][a]
            css[a] += c["ss"][a]
        r = got[d]
        assert (r.n_cum_0, r.n_cum_1) == (cn[0], cn[1])
        info = (cn[0] + cn[1]) / n_final
        assert abs(r.info_frac - info) < 1e-12
        boundary = float(_q6(GS_C_OBF / math.sqrt(info)))
        assert abs(r.boundary - boundary) < 1e-9
        if cn[0] > 1 and cn[1] > 1:
            se = math.sqrt(
                (css[0] - cs[0] * cs[0] / cn[0]) / (cn[0] - 1) / cn[0]
                + (css[1] - cs[1] * cs[1] / cn[1]) / (cn[1] - 1) / cn[1]
            )
            if se > 0.0:
                z = float(_q6((cs[1] / cn[1] - cs[0] / cn[0]) / se))
                assert abs(r.z_cum - z) < 1e-9
                assert r.crossed == (abs(z) > boundary)
                crossed_days += 1
                continue
        assert r.z_cum is None
        assert r.crossed is False
    assert crossed_days > 0  # the fixture exercises live test days


def test_streaming_group_sequential_matches_batch(spark, sf_dir, tmp_path):
    """The final micro-batch's cumulative boundary readout must equal
    the LAST row of the batch operator (n_planned = realized total, so
    the information denominators agree) — exact equality, with
    maxFilesPerTrigger=1 forcing the six-sum state across micro-batch
    boundaries."""
    from lenses_topology_example_spark.streaming.pipelines import (
        start_gs_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_planned = ev.filter("event_type = 'purchase'").count()
    src = tmp_path / "gs_src"
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "a"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "a"))

    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "a"))
    )
    out = str(tmp_path / "gs_out")
    q = start_gs_stream(stream, n_planned, out, str(tmp_path / "gs_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob as _glob

    last = max(
        int(p.rsplit("=", 1)[1])
        for p in _glob.glob(f"{out}/report/batch_id=*")
    )
    assert last >= 1  # the state actually crossed a batch boundary
    s = spark.read.parquet(f"{out}/report/batch_id={last}").collect()[0]
    want = _CATALOG["group_sequential"][0](spark, sf_dir).collect()[-1]
    assert (s.cn0, s.cn1) == (want.n_cum_0, want.n_cum_1)
    assert s.z_cum == want.z_cum
    assert s.info_frac == want.info_frac == 1.0
    assert s.boundary == want.boundary
    assert s.crossed == want.crossed


def test_power_mde_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import MDE_Z_SUM

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .collect()
    )
    cells: dict[str, dict] = {}
    for r in rows:
        arm = _md5_64(f"ab|{r.user_id}") % 2
        c = cells.setdefault(
            r.event_type, {"n": [0, 0], "s": [0.0, 0.0], "ss": [0.0, 0.0]}
        )
        c["n"][arm] += 1
        c["s"][arm] += float(_q6(float(r.value)))
        c["ss"][arm] += float(_q6(float(r.value) * float(r.value)))
    got = {
        r.event_type: r
        for r in _CATALOG["power_mde"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for et, c in cells.items():
        r = got[et]
        n0, n1 = c["n"]
        assert (r.n_0, r.n_1) == (n0, n1)
        if n0 > 0:
            assert abs(r.mean_0 - float(_q6(c["s"][0] / n0))) < 1e-9
        if n0 > 1 and n1 > 1:
            se = math.sqrt(
                (c["ss"][0] - c["s"][0] ** 2 / n0) / (n0 - 1) / n0
                + (c["ss"][1] - c["s"][1] ** 2 / n1) / (n1 - 1) / n1
            )
            if se > 0.0:
                mde = float(_q6(MDE_Z_SUM * se))
                assert abs(r.mde_abs - mde) < 1e-9
                mean0 = c["s"][0] / n0
                assert abs(r.mde_rel - float(_q6(mde / mean0))) < 1e-9
                # MDE must exceed the plain 2-sigma width (power > 0.5)
                assert r.mde_abs > 1.96 * se * 0.99


def test_fisher_separability_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            [float(_q6(float(x))) for x in r.embedding]
        )
    mats = {lab: np.array(v) for lab, v in by_label.items()}
    n = sum(m.shape[0] for m in mats.values())
    dims = next(iter(mats.values())).shape[1]
    got = {
        r.dim: r
        for r in _CATALOG["fisher_separability"][0](spark, sf_dir).collect()
    }
    assert sorted(got) == list(range(dims))
    for d in range(dims):
        mu = sum(m[:, d].sum() for m in mats.values()) / n
        bt = sum(
            m.shape[0] * (m[:, d].mean() - mu) ** 2 for m in mats.values()
        )
        wt = sum(
            ((m[:, d] - m[:, d].mean()) ** 2).sum() for m in mats.values()
        )
        r = got[d]
        assert r.n == n
        assert r.n_classes == len(mats)
        assert abs(r.between_var - bt / n) < 1e-5
        assert abs(r.within_var - wt / n) < 1e-5
        if r.within_var > 0:
            assert abs(r.fisher_ratio - (bt / n) / (wt / n)) < 1e-4
        # total variance identity: between + within = population var
        var = ((np.concatenate([m[:, d] for m in mats.values()]) - mu) ** 2).sum() / n
        assert abs((r.between_var + r.within_var) - var) < 1e-5


def test_neyman_allocation_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.quality import (
        NEYMAN_BUDGET,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    )
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(int(r.n_chars))
    sigmas = {}
    for src, xs in per_src.items():
        n = len(xs)
        var = max(
            (sum(x * x for x in xs) - sum(xs) ** 2 / n) / n, 0.0
        )
        sigmas[src] = float(_q6(math.sqrt(var)))
    ws = {s: float(_q6(len(per_src[s]) * sigmas[s])) for s in per_src}
    from decimal import Decimal

    tot_w = float(sum((Decimal(repr(w)) for w in ws.values()), Decimal(0)))
    tot_n = sum(len(v) for v in per_src.values())
    got = {
        r.source: r
        for r in _CATALOG["neyman_allocation"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(per_src)
    budget_used = 0
    for src in per_src:
        r = got[src]
        assert r.n_docs == len(per_src[src])
        assert abs(r.sigma - sigmas[src]) < 1e-9
        share = ws[src] / tot_w
        assert abs(r.neyman_share - share) < 1e-12
        assert r.n_neyman == math.floor(share * NEYMAN_BUDGET)
        assert r.n_prop == math.floor(
            len(per_src[src]) / tot_n * NEYMAN_BUDGET
        )
        budget_used += r.n_neyman
    assert budget_used <= NEYMAN_BUDGET  # floor never overspends


def test_entropy_rate_matches_python(spark, sf_dir):
    import re
    from collections import Counter
    from decimal import Decimal

    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    bi: Counter = Counter()
    uni: Counter = Counter()
    for r in rows:
        toks = [t for t in re.split(r"\W+", r.text.lower()) if t]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    prev_tot: Counter = Counter()
    for (p, _), c in bi.items():
        prev_tot[p] += c
    t_sum = Decimal(0)
    for (p, _), c in bi.items():
        t_sum += _q6(math.log(c / prev_tot[p])) * c
    u_tot = sum(uni.values())
    u_sum = Decimal(0)
    for c in uni.values():
        u_sum += _q6(math.log(c / u_tot)) * c
    r = _CATALOG["entropy_rate"][0](spark, sf_dir).collect()[0]
    n_bi = sum(bi.values())
    assert r.n_distinct_bigrams == len(bi)
    assert r.n_bigrams == n_bi
    assert r.n_tokens == u_tot
    h_rate = float(_q6(-float(t_sum) / n_bi))
    h_uni = float(_q6(-float(u_sum) / u_tot))
    assert abs(r.entropy_rate - h_rate) < 1e-9
    assert abs(r.unigram_entropy - h_uni) < 1e-9
    assert abs(r.conditional_ratio - float(_q6(h_rate / h_uni))) < 1e-9
    # conditioning can only reduce entropy
    assert r.entropy_rate <= r.unigram_entropy + 1e-9


def test_good_turing_mass_matches_python(spark, sf_dir):
    import re
    from collections import Counter

    from lenses_topology_example_spark.operators.text import GT_MAX_R

    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    cf: Counter = Counter()
    for r in rows:
        cf.update(t for t in re.split(r"\W+", r.text.lower()) if t)
    fof: Counter = Counter(c for c in cf.values() if c <= GT_MAX_R)
    total = sum(cf.values())
    types = len(cf)
    got = {r.r: r for r in _CATALOG["good_turing_mass"][0](spark, sf_dir).collect()}
    assert set(got) == set(fof)
    for r_val, n_r in fof.items():
        row = got[r_val]
        assert row.n_r == n_r
        assert row.n_types == types
        assert abs(row.mass_share - r_val * n_r / total) < 1e-12
        assert abs(row.type_share - n_r / types) < 1e-12


def test_mann_whitney_matches_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        arm = _md5_64(f"ab|{r.user_id}") % 2
        by_type.setdefault(r.event_type, []).append((float(r.value), arm))
    got = {
        r.event_type: r
        for r in _CATALOG["mann_whitney"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for et, pts in by_type.items():
        vals = sorted(x for x, _ in pts)
        # mid-ranks via tie groups
        rank_of = {}
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            rank_of[vals[i]] = (i + 1 + j) / 2.0
            i = j
        n1 = sum(a for _, a in pts)
        n0 = len(pts) - n1
        r1 = sum(rank_of[x] for x, a in pts if a == 1)
        r = got[et]
        assert (r.n_0, r.n_1) == (n0, n1)
        if n0 == 0 or n1 == 0:
            assert r.u_stat is None
            continue
        u = r1 - n1 * (n1 + 1) / 2.0
        assert abs(r.u_stat - float(_q6(u))) < 1e-9
        n = n0 + n1
        from collections import Counter

        ties = Counter(vals)
        tie_term = sum(t**3 - t for t in ties.values())
        var = n0 * n1 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
        if var > 0 and n > 1:
            z = float(_q6((u - n0 * n1 / 2.0) / math.sqrt(var)))
            assert abs(r.z_score - z) < 1e-9
        delta = float(_q6(2.0 * u / (n0 * n1) - 1.0))
        assert abs(r.cliffs_delta - delta) < 1e-9
        assert -1.0 - 1e-9 <= r.cliffs_delta <= 1.0 + 1e-9


def test_median_ci_matches_python(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import MEDIAN_CI_Z

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", "event_id")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (float(r.value), r.event_id)
        )
    got = {
        r.event_type: r
        for r in _CATALOG["median_ci"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for et, pts in by_type.items():
        pts.sort()
        n = len(pts)
        xs = [x for x, _ in pts]
        med = float(
            _q6(
                (
                    xs[math.floor((n + 1) / 2.0) - 1]
                    + xs[math.ceil((n + 1) / 2.0) - 1]
                )
                / 2.0
            )
        )
        lo_r = max(1, math.floor((n - MEDIAN_CI_Z * math.sqrt(n)) / 2.0))
        hi_r = min(n, math.ceil(1.0 + (n + MEDIAN_CI_Z * math.sqrt(n)) / 2.0))
        r = got[et]
        assert r.n == n
        assert abs(r.median - med) < 1e-9
        assert r.ci_lo == xs[lo_r - 1]
        assert r.ci_hi == xs[hi_r - 1]
        assert r.ci_lo <= r.median <= r.ci_hi


def test_effect_size_report_matches_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .collect()
    )
    cells: dict[str, dict] = {}
    for r in rows:
        arm = _md5_64(f"ab|{r.user_id}") % 2
        c = cells.setdefault(
            r.event_type, {"n": [0, 0], "s": [0.0, 0.0], "ss": [0.0, 0.0]}
        )
        c["n"][arm] += 1
        c["s"][arm] += float(_q6(float(r.value)))
        c["ss"][arm] += float(_q6(float(r.value) * float(r.value)))
    got = {
        r.event_type: r
        for r in _CATALOG["effect_size_report"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for et, c in cells.items():
        r = got[et]
        n0, n1 = c["n"]
        assert (r.n_0, r.n_1) == (n0, n1)
        if n0 > 1 and n1 > 1:
            sq0 = c["ss"][0] - c["s"][0] ** 2 / n0
            sq1 = c["ss"][1] - c["s"][1] ** 2 / n1
            sp = math.sqrt((sq0 + sq1) / (n0 + n1 - 2))
            if sp > 0:
                d = (c["s"][1] / n1 - c["s"][0] / n0) / sp
                assert abs(r.cohens_d - float(_q6(d))) < 1e-9
                j = 1.0 - 3.0 / (4.0 * (n0 + n1 - 2) - 1.0)
                assert abs(r.hedges_g - float(_q6(j * d))) < 1e-9
                # the small-sample correction always shrinks |d|
                assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-12


def test_acf_monthly_matches_python(spark, sf_dir):
    from decimal import Decimal

    from lenses_topology_example_spark.operators.windows import ACF_MAX_LAG

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    monthly: dict[int, Decimal] = {}
    for r in rows:
        x = r.o_orderdate.year * 12 + r.o_orderdate.month - 1
        monthly[x] = monthly.get(x, Decimal(0)) + (
            Decimal(str(r.o_totalprice)) * 1_000_000
        )
    ys = {x: int(v) for x, v in monthly.items()}
    n = len(ys)
    sy = sum(ys.values())
    syy = sum(v * v for v in ys.values())
    ybar = float(sy) / n
    denom = float(syy) - float(sy) * ybar
    got = {r.lag: r for r in _CATALOG["acf_monthly"][0](spark, sf_dir).collect()}
    assert sorted(got) == list(range(1, ACF_MAX_LAG + 1))
    q_run = Decimal(0)
    for k in range(1, ACF_MAX_LAG + 1):
        pairs = [(x, x + k) for x in ys if x + k in ys]
        sab = sum(ys[a] * ys[b] for a, b in pairs)
        sa = sum(ys[a] for a, _ in pairs)
        sb = sum(ys[b] for _, b in pairs)
        num = (
            float(sab) - ybar * (float(sa) + float(sb))
            + len(pairs) * ybar * ybar
        )
        r = got[k]
        assert r.n_pairs == len(pairs)
        acf = float(_q6(num / denom))
        assert abs(r.acf - acf) < 1e-9
        assert abs(r.acf) <= 1.0 + 1e-6
        if n > k:
            q_run += _q6(acf * acf / (n - k))
        lb = float(_q6(n * (n + 2) * float(q_run)))
        assert abs(r.lb_q - lb) < 1e-9


def test_runs_test_matches_python(spark, sf_dir):
    from decimal import Decimal

    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("ts", "value")
        .collect()
    )
    daily: dict = {}
    for r in rows:
        d = str(r.ts.date())
        daily[d] = daily.get(d, Decimal(0)) + _q6(float(r.value))
    days = sorted(daily)
    revs = sorted((daily[d], d) for d in days)
    n = len(revs)
    m_lo = revs[math.floor((n + 1) / 2.0) - 1][0]
    m_hi = revs[math.ceil((n + 1) / 2.0) - 1][0]
    med = float(m_lo + m_hi) / 2.0
    signs = [1 if float(daily[d]) > med else 0 for d in days
             if float(daily[d]) != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    r = _CATALOG["runs_test"][0](spark, sf_dir).collect()[0]
    assert (r.n_above, r.n_below) == (n1, n2)
    assert r.n_runs == runs
    if n1 > 0 and n2 > 0 and n1 + n2 > 1:
        nn = n1 + n2
        e = 2.0 * n1 * n2 / nn + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (nn * nn * (nn - 1))
        )
        assert abs(r.expected_runs - float(_q6(e))) < 1e-9
        if var > 0:
            assert abs(r.z_score - float(_q6((runs - e) / math.sqrt(var)))) < 1e-9
    # runs bounded by the sequence structure
    assert 1 <= r.n_runs <= len(signs)


def test_sign_test_matches_python(spark, sf_dir):
    from decimal import Decimal

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    monthly: dict[int, Decimal] = {}
    for r in rows:
        x = r.o_orderdate.year * 12 + r.o_orderdate.month - 1
        monthly[x] = monthly.get(x, Decimal(0)) + (
            Decimal(str(r.o_totalprice)) * 1_000_000
        )
    xs = sorted(monthly)
    n_up = n_down = 0
    for a, b in zip(xs, xs[1:]):
        if b - a != 1:
            continue
        d = monthly[b] - monthly[a]
        if d > 0:
            n_up += 1
        elif d < 0:
            n_down += 1
    r = _CATALOG["sign_test"][0](spark, sf_dir).collect()[0]
    assert (r.n_up, r.n_down) == (n_up, n_down)
    n = n_up + n_down
    if n > 0:
        z = float(_q6((n_up - n / 2.0) / math.sqrt(n / 4.0)))
        assert abs(r.z_score - z) < 1e-9


def test_kappa_agreement_matches_python(spark, sf_dir):
    rows = (
        _CATALOG["lang_confusion"][0](spark, sf_dir)
        .select("lang", "pred_lang", "n_docs")
        .collect()
    )
    n = sum(r.n_docs for r in rows)
    agree = sum(r.n_docs for r in rows if r.lang == r.pred_lang)
    row_tot: dict = {}
    col_tot: dict = {}
    for r in rows:
        row_tot[r.lang] = row_tot.get(r.lang, 0) + r.n_docs
        col_tot[r.pred_lang] = col_tot.get(r.pred_lang, 0) + r.n_docs
    rk = sum(
        row_tot.get(c, 0) * col_tot.get(c, 0)
        for c in set(row_tot) | set(col_tot)
    )
    got = _CATALOG["kappa_agreement"][0](spark, sf_dir).collect()[0]
    assert got.n == n
    assert got.n_agree == agree
    po = agree / n
    pe = rk / (n * n)
    assert abs(got.p_observed - float(_q6(po))) < 1e-9
    assert abs(got.p_expected - float(_q6(pe))) < 1e-9
    if pe < 1.0:
        assert abs(got.kappa - float(_q6((po - pe) / (1 - pe)))) < 1e-9
        assert got.kappa <= 1.0 + 1e-9  # kappa never exceeds 1


def test_cramers_v_matches_python(spark, sf_dir):
    from decimal import Decimal

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    seg_of = {r.c_custkey: r.c_mktsegment for r in c}
    cells: dict = {}
    for r in o:
        if r.o_custkey not in seg_of:
            continue
        key = (seg_of[r.o_custkey], r.o_orderpriority)
        cells[key] = cells.get(key, 0) + 1
    n = sum(cells.values())
    row_tot: dict = {}
    col_tot: dict = {}
    for (s, p), v in cells.items():
        row_tot[s] = row_tot.get(s, 0) + v
        col_tot[p] = col_tot.get(p, 0) + v
    chi2 = Decimal(0)
    for (s, p), v in cells.items():
        exp = row_tot[s] * col_tot[p] / n
        chi2 += _q6((v - exp) * (v - exp) / exp)
    got = _CATALOG["cramers_v"][0](spark, sf_dir).collect()[0]
    assert got.n == n
    assert got.n_rows == len(row_tot)
    assert got.n_cols == len(col_tot)
    assert abs(got.chi2_total - float(_q6(float(chi2)))) < 1e-9
    mind = min(len(row_tot), len(col_tot)) - 1
    if mind > 0:
        v = float(_q6(math.sqrt(float(chi2) / (n * mind))))
        assert abs(got.cramers_v - v) < 1e-9
        assert 0.0 <= got.cramers_v <= 1.0 + 1e-9


def test_seasonal_strength_matches_python(spark, sf_dir):
    from decimal import Decimal

    comp = [
        r
        for r in _CATALOG["seasonal_decompose"][0](spark, sf_dir).collect()
        if r.residual is not None
    ]
    n = len(comp)
    r6 = [_q6(r.residual) for r in comp]
    sr6 = [_q6(r.revenue - r.trend) for r in comp]
    tr6 = [_q6(r.revenue - r.seasonal) for r in comp]

    def var(vals):
        s = float(sum(vals, Decimal(0)))
        ss = float(
            sum((_q6(float(v) * float(v)) for v in vals), Decimal(0))
        )
        return ss - s * s / n

    got = _CATALOG["seasonal_strength"][0](spark, sf_dir).collect()[0]
    assert got.n_months == n
    if n > 1 and var(sr6) > 0:
        ft = float(_q6(max(0.0, 1.0 - var(r6) / var(sr6))))
        assert abs(got.trend_strength - ft) < 1e-9
        assert 0.0 <= got.trend_strength <= 1.0
    if n > 1 and var(tr6) > 0:
        fs = float(_q6(max(0.0, 1.0 - var(r6) / var(tr6))))
        assert abs(got.seasonal_strength - fs) < 1e-9
        assert 0.0 <= got.seasonal_strength <= 1.0
