"""Semantic tests for the round-9 third-wave operators, beyond oracle
parity: invariants an oracle twin that shares the formula cannot catch
(leg-membership of fused results, nested-centroid monotonicity, privacy
release bounds, quartile population conservation)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.operators.governance import (
    L_DIV,
    NOISE_HALF,
    RELEASE_K,
    ROUND_BASE,
)
from lenses_topology_example_spark.operators.retrieval import (
    BM25_TOP_K,
    HYBRID_TOP_K,
    RRF_K,
)
from lenses_topology_example_spark.tables import load_table


# --- hybrid_rrf --------------------------------------------------------------


def test_hybrid_rrf_results_come_from_a_leg(spark, sf_dir):
    """Every fused doc must be a candidate of at least one leg (its leg
    rank columns cannot both be 0), the score must equal the RRF formula
    over those ranks, and each query emits exactly HYBRID_TOP_K rows
    with ranks 1..k."""
    rows = _CATALOG["hybrid_rrf"][0](spark, sf_dir).collect()
    per_q = defaultdict(list)
    for r in rows:
        assert r.lex_rank > 0 or r.sem_rank > 0, r
        want = (1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (RRF_K + r.sem_rank) if r.sem_rank else 0.0
        )
        assert abs(r.rrf_score - want) < 1e-12, r
        per_q[r.query_id].append(r)
    for q, rs in per_q.items():
        assert sorted(x.rank for x in rs) == list(range(1, HYBRID_TOP_K + 1))
        # fused order is non-increasing in score
        rs = sorted(rs, key=lambda x: x.rank)
        for a, b in zip(rs, rs[1:]):
            assert a.rrf_score >= b.rrf_score


def test_hybrid_rrf_both_leg_docs_outrank_single_leg(spark, sf_dir):
    """A doc retrieved by BOTH legs at rank r scores strictly above any
    doc retrieved by one leg at the same rank — the fusion property that
    makes RRF prefer cross-evidence."""
    rows = _CATALOG["hybrid_rrf"][0](spark, sf_dir).collect()
    both = [r for r in rows if r.lex_rank > 0 and r.sem_rank > 0]
    single = [r for r in rows if (r.lex_rank > 0) != (r.sem_rank > 0)]
    for b in both:
        for s in single:
            if (
                s.query_id == b.query_id
                and max(s.lex_rank, s.sem_rank)
                >= max(b.lex_rank, b.sem_rank)
            ):
                assert b.rrf_score > s.rrf_score
    # leg ranks never exceed the leg depth
    for r in rows:
        assert 0 <= r.lex_rank <= BM25_TOP_K
        assert 0 <= r.sem_rank <= BM25_TOP_K


# --- l_diversity -------------------------------------------------------------


def test_l_diversity_bounds_and_verdict(spark, sf_dir):
    rows = _CATALOG["l_diversity"][0](spark, sf_dir).collect()
    assert rows, "QI classes expected"
    cust = load_table(spark, sf_dir, "customer")
    n_cust = cust.count()
    assert sum(r.class_size for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.l_distinct <= r.class_size
        assert r.is_l_diverse == (r.l_distinct >= L_DIV)


# --- private_release ---------------------------------------------------------


def test_private_release_suppression_and_bounds(spark, sf_dir):
    rows = _CATALOG["private_release"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -NOISE_HALF <= r.noise <= NOISE_HALF
        assert r.suppressed == (r.true_count < RELEASE_K)
        if r.suppressed:
            assert r.released_count is None
        else:
            assert r.released_count is not None
            assert r.released_count % ROUND_BASE == 0
            assert r.released_count >= 0
            # perturbation + rounding moves a cell by at most
            # NOISE_HALF + ROUND_BASE/2
            assert (
                abs(r.released_count - r.true_count)
                <= NOISE_HALF + ROUND_BASE // 2
            )


def test_private_release_totals_conserve_population(spark, sf_dir):
    """Suppressed + released true counts partition the customer table —
    the release never drops or double-counts a row."""
    rows = _CATALOG["private_release"][0](spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.true_count for r in rows) == n_cust


# --- rfm_segments ------------------------------------------------------------


def test_rfm_segments_conserve_customers(spark, sf_dir):
    rows = _CATALOG["rfm_segments"][0](spark, sf_dir).collect()
    assert rows
    n_with_orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_with_orders
    for r in rows:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
        assert r.n_customers >= 1
        assert r.segment_revenue > 0.0


def test_rfm_quartiles_balance_within_nation(spark, sf_dir):
    """NTILE's equal-fill contract: within a nation, quartile
    populations along each axis differ by at most one customer."""
    rows = _CATALOG["rfm_segments"][0](spark, sf_dir).collect()
    for axis in ("r_q", "f_q", "m_q"):
        per = defaultdict(lambda: defaultdict(int))
        for r in rows:
            per[r.c_nationkey][getattr(r, axis)] += r.n_customers
        for nation, buckets in per.items():
            sizes = [buckets.get(q, 0) for q in (1, 2, 3, 4)]
            present = [s for s in sizes if s > 0]
            assert max(present) - min(present) <= 1, (axis, nation, sizes)


# --- kmeans_elbow ------------------------------------------------------------


def test_kmeans_elbow_monotone_in_k(spark, sf_dir):
    """Nested centroid prefixes make inertia non-increasing in K, and
    the improvement column is exactly the successive difference."""
    rows = sorted(
        _CATALOG["kmeans_elbow"][0](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [2, 4, 8, 16]
    n = {r.n_vectors for r in rows}
    assert len(n) == 1 and n.pop() > 0
    for a, b in zip(rows, rows[1:]):
        assert b.inertia <= a.inertia + 1e-9
        assert abs(b.improvement - (a.inertia - b.inertia)) < 1e-9
    assert rows[0].improvement == 0.0
    # cosine distance to the nearest centroid is in [0, 2] per vector
    assert 0.0 <= rows[-1].inertia <= 2.0 * rows[-1].n_vectors


# --- ivf_probe_sweep ---------------------------------------------------------


def test_ivf_probe_sweep_monotone_in_depth(spark, sf_dir):
    """Probing more cells can only add candidates and hits (nested
    probe prefixes), and recall stays a valid fraction."""
    from lenses_topology_example_spark.operators.similarity import (
        PROBE_SWEEP,
    )

    rows = sorted(
        _CATALOG["ivf_probe_sweep"][0](spark, sf_dir).collect(),
        key=lambda r: r.probe,
    )
    assert [r.probe for r in rows] == list(PROBE_SWEEP)
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates >= a.n_candidates
        assert b.n_hits >= a.n_hits
        assert b.recall >= a.recall
    for r in rows:
        assert 0 <= r.n_hits <= r.n_candidates or r.n_candidates == 0
        assert 0.0 <= r.recall <= 1.0


# --- bpe_merge_candidates ----------------------------------------------------


def test_bpe_merge_candidates_are_real_bigrams(spark, sf_dir):
    from lenses_topology_example_spark.operators.text import (
        BPE_MERGE_TOPK,
    )

    rows = _CATALOG["bpe_merge_candidates"][0](spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_MERGE_TOPK
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2
        assert 1 <= r.n_words <= r.pair_count


def test_bpe_merge_counts_match_pure_python(spark, sf_dir):
    """Replica check on the raw corpus: weighted bigram counts from a
    pure-Python tokenizer fold must equal the top rows."""
    import re as _re
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freq = Counter()
    for row in docs:
        for tok in _re.split(r"\W+", row.text.lower()):
            if tok:
                freq[tok] += 1
    pairs = Counter()
    words = {}
    for tok, f in freq.items():
        if len(tok) < 2:
            continue
        for i in range(len(tok) - 1):
            p = tok[i : i + 2]
            pairs[p] += f
            words.setdefault(p, set()).add(tok)
    for r in _CATALOG["bpe_merge_candidates"][0](spark, sf_dir).collect():
        assert pairs[r.pair] == r.pair_count, r.pair
        assert len(words[r.pair]) == r.n_words, r.pair


# --- attribution_revenue -----------------------------------------------------


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    """Both models must attribute every purchase exactly once: counts
    and revenue totals agree across models and equal the raw purchase
    aggregate; shares sum to 1."""
    rows = _CATALOG["attribution_revenue"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    n_purch = ev.count()
    assert sum(r.n_first for r in rows) == n_purch
    assert sum(r.n_last for r in rows) == n_purch
    total = float(
        ev.agg(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
        ).collect()[0][0]
    )
    assert abs(sum(r.rev_first for r in rows) - total) < 1e-6
    assert abs(sum(r.rev_last for r in rows) - total) < 1e-6
    assert abs(sum(r.share_first for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share_last for r in rows) - 1.0) < 1e-4
    assert all(r.channel != "purchase" for r in rows)


# --- cms_join_cardinality ----------------------------------------------------


def test_cms_join_estimate_never_underestimates(spark, sf_dir):
    """The CMS inner product only ADDS collision mass: every depth
    row's estimate bounds the exact join size from above, and the
    published estimate is the min across rows."""
    rows = _CATALOG["cms_join_cardinality"][0](spark, sf_dir).collect()
    assert len(rows) == 4
    exact = {r.exact_pairs for r in rows}
    assert len(exact) == 1
    exact = exact.pop()
    for r in rows:
        assert r.row_estimate >= exact
        assert r.cms_estimate == min(x.row_estimate for x in rows)
        assert r.over_ratio >= 1.0


# --- streaming attribution twin ----------------------------------------------


def test_streaming_attribution_matches_batch(spark, sf_dir, tmp_path):
    """Replay the events table in two time-ordered micro-batches: the
    streaming touch log aggregated through the SHARED
    windows.attribution_report must equal the batch operator's report
    EXACTLY (the stateful emitter performs no arithmetic — channels
    and values pass through untouched)."""
    import os
    import time

    from lenses_topology_example_spark.operators.windows import (
        attribution_report,
    )
    from lenses_topology_example_spark.streaming.pipelines import (
        start_attribution_stream,
    )

    events = load_table(spark, sf_dir, "events")
    med_ts = events.agg(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")
    ).collect()[0][0]
    src = tmp_path / "at_src"
    # one part file per half: same-mtime siblings would drain in
    # unspecified order and break cross-batch per-user time order
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
    out = tmp_path / "at_touches"
    q = start_attribution_stream(
        stream, str(out), str(tmp_path / "at_ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.channel: (
            r.n_first, r.rev_first, r.share_first,
            r.n_last, r.rev_last, r.share_last,
        )
        for r in attribution_report(
            spark.read.parquet(str(out))
        ).collect()
    }
    want = {
        r.channel: (
            r.n_first, r.rev_first, r.share_first,
            r.n_last, r.rev_last, r.share_last,
        )
        for r in _CATALOG["attribution_revenue"][0](spark, sf_dir).collect()
    }
    assert got == want


# --- ltv_curve ---------------------------------------------------------------


def test_ltv_curve_accumulates_and_conserves(spark, sf_dir):
    """Revenue cells sum to total order revenue; cumulative revenue is
    the running prefix per cohort and never decreases; LTV times cohort
    size re-derives the cumulative (to rounding)."""
    rows = _CATALOG["ltv_curve"][0](spark, sf_dir).collect()
    assert rows
    total = float(
        load_table(spark, sf_dir, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"))
        .collect()[0][0]
    )
    assert abs(sum(r.revenue for r in rows) - total) < 1e-4
    per_cohort = defaultdict(list)
    for r in rows:
        assert r.age_months >= 0
        per_cohort[r.cohort_month].append(r)
    for rs in per_cohort.values():
        rs = sorted(rs, key=lambda r: r.age_months)
        run = 0.0
        for r in rs:
            run += r.revenue
            assert abs(r.cum_revenue - run) < 1e-4
            assert (
                abs(r.ltv_per_customer * r.n_customers - r.cum_revenue)
                < r.n_customers * 1e-5
            )


# --- ab_test_report ----------------------------------------------------------


def test_ab_test_matches_pure_python(spark, sf_dir):
    """Full replica: arms from the md5 coin, Welch z from exact
    moments, computed in Python over the collected purchases."""
    import hashlib
    import math

    rows = _CATALOG["ab_test_report"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .collect()
    )
    arms = {0: [], 1: []}
    for e in ev:
        h = int(hashlib.md5(f"ab|{e.user_id}".encode()).hexdigest()[:15], 16)
        arms[h % 2].append(e.value)
    assert (r.n_0, r.n_1) == (len(arms[0]), len(arms[1]))
    m0 = sum(arms[0]) / len(arms[0])
    m1 = sum(arms[1]) / len(arms[1])
    assert abs(r.mean_0 - m0) < 1e-4 and abs(r.mean_1 - m1) < 1e-4
    v0 = sum((x - m0) ** 2 for x in arms[0]) / (len(arms[0]) - 1)
    v1 = sum((x - m1) ** 2 for x in arms[1]) / (len(arms[1]) - 1)
    z = (m1 - m0) / math.sqrt(v0 / len(arms[0]) + v1 / len(arms[1]))
    assert abs(r.z_score - z) < 1e-3


# --- cusum_changepoint -------------------------------------------------------


def test_cusum_ends_at_zero_and_flags_argmax(spark, sf_dir):
    """By construction the CUSUM of deviations from the global mean
    returns exactly to 0 on the last day, counts conserve the event
    total, and the flag marks exactly the max-|S| days."""
    rows = sorted(
        _CATALOG["cusum_changepoint"][0](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    assert rows[-1].cusum == 0.0
    mx = max(abs(r.cusum) for r in rows)
    for r in rows:
        assert r.is_changepoint == (abs(r.cusum) == mx)
    assert any(r.is_changepoint for r in rows)


# --- bootstrap_stderr --------------------------------------------------------


def test_bootstrap_matches_pure_python(spark, sf_dir):
    """Full replica of the md5 multiplier weights and replica means in
    Python; stderr equals the spread of those means."""
    import hashlib
    import math

    from lenses_topology_example_spark.operators.sketches import BOOT_B

    rows = sorted(
        _CATALOG["bootstrap_stderr"][0](spark, sf_dir).collect(),
        key=lambda r: r.replica,
    )
    assert [r.replica for r in rows] == list(range(BOOT_B))
    od = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    means = []
    for b in range(BOOT_B):
        n_eff, s = 0, 0.0
        for o in od:
            h = int(
                hashlib.md5(f"{b}|boot|{o.o_orderkey}".encode()).hexdigest()[
                    :15
                ],
                16,
            ) % 4
            w = 0 if h == 0 else (2 if h == 3 else 1)
            n_eff += w
            s += w * o.o_totalprice
        assert rows[b].n_eff == n_eff
        m = s / n_eff
        assert abs(rows[b].mean_b - m) < 1e-4
        means.append(m)
    mbar = sum(means) / BOOT_B
    se = math.sqrt(sum((m - mbar) ** 2 for m in means) / (BOOT_B - 1))
    for r in rows:
        assert abs(r.boot_stderr - se) < 1e-2


# --- topic_keywords ----------------------------------------------------------


def test_topic_keywords_z_matches_pure_python(spark, sf_dir):
    """Full replica of the Fightin' Words z-score from raw counts."""
    import math
    import re as _re
    from collections import Counter

    rows = _CATALOG["topic_keywords"][0](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    counts = Counter()
    for d in docs:
        for tok in _re.split(r"\W+", d.text.lower()):
            if tok:
                counts[(d.source, tok)] += 1
    vocab = {t for _, t in counts}
    v = len(vocab)
    n = sum(counts.values())
    n_s = Counter()
    y_all = Counter()
    for (s_, t), y in counts.items():
        n_s[s_] += y
        y_all[t] += y
    a = 0.5
    for r in rows:
        y = counts[(r.source, r.token)]
        assert y == r.y
        yr = y_all[r.token] - y
        nr = n - n_s[r.source]
        delta = math.log((y + a) / (n_s[r.source] + a * v - y - a)) - math.log(
            (yr + a) / (nr + a * v - yr - a)
        )
        z = delta / math.sqrt(1.0 / (y + a) + 1.0 / (yr + a))
        assert abs(r.z_score - z) < 1e-5, (r.source, r.token)
    # per source: TOPIC_TOPK rows, ranks 1..k, z non-increasing
    per_s = defaultdict(list)
    for r in rows:
        per_s[r.source].append(r)
    for rs in per_s.values():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for x, yy in zip(rs, rs[1:]):
            assert x.z_score >= yy.z_score


# --- basket_lift -------------------------------------------------------------


def test_basket_lift_supports_match_recount(spark, sf_dir):
    """Support and per-part counts re-derive from the distinct
    (order, part) table; lift recomputes from them."""
    from lenses_topology_example_spark.operators.relational2 import (
        BASKET_MIN_SUPPORT,
        BASKET_TOPK,
    )

    rows = _CATALOG["basket_lift"][0](spark, sf_dir).collect()
    assert 0 < len(rows) <= BASKET_TOPK
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict as dd

    orders = dd(set)
    part_orders = dd(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
        part_orders[r.l_partkey].add(r.l_orderkey)
    n_orders = len(orders)
    for r in rows:
        assert r.part_a < r.part_b
        support = len(
            part_orders[r.part_a] & part_orders[r.part_b]
        )
        assert support == r.support >= BASKET_MIN_SUPPORT
        assert r.cnt_a == len(part_orders[r.part_a])
        assert r.cnt_b == len(part_orders[r.part_b])
        want = r.support * n_orders / (r.cnt_a * r.cnt_b)
        assert abs(r.lift - want) < 1e-4


# --- retrieval_eval ----------------------------------------------------------


def test_retrieval_eval_metric_ranges_and_fusion_sanity(spark, sf_dir):
    rows = {r.method: r for r in
            _CATALOG["retrieval_eval"][0](spark, sf_dir).collect()}
    assert set(rows) == {"bm25", "cosine", "rrf"}
    for r in rows.values():
        assert r.n_queries >= 1
        for m in (r.mean_p_at_k, r.mean_mrr, r.mean_ndcg):
            assert 0.0 <= m <= 1.0
    # the fused ranker must not be strictly worse than BOTH legs on
    # every metric (rrf >= min(legs) per metric is the sanity floor)
    for metric in ("mean_p_at_k", "mean_mrr", "mean_ndcg"):
        legs_min = min(
            getattr(rows["bm25"], metric), getattr(rows["cosine"], metric)
        )
        assert getattr(rows["rrf"], metric) >= legs_min - 1e-9


# --- histogram_quantiles -----------------------------------------------------


def test_histogram_quantiles_error_bounded_by_bin_width(spark, sf_dir):
    """The interpolated estimate can never miss the exact quantile by
    more than one bin width (the estimator's a-priori guarantee)."""
    from lenses_topology_example_spark.operators.sketches import HIST_BINS

    rows = _CATALOG["histogram_quantiles"][0](spark, sf_dir).collect()
    assert rows
    rng = {
        r.event_type: (r.lo, r.hi)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = rng[r.event_type]
        w = (hi - lo) / HIST_BINS
        assert r.abs_err <= w + 1e-9, (r.event_type, r.pct, r.abs_err, w)
        assert lo <= r.estimate <= hi + 1e-9


# --- mmr_rerank --------------------------------------------------------------


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    """Full replica: cosine pool, pairwise sims, and the greedy MMR
    loop in numpy — the unrolled dataframe stages must pick the same
    docs in the same order."""
    import numpy as np

    from lenses_topology_example_spark.operators.retrieval import (
        HYBRID_QUERY_VECS,
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAMBDA,
    )

    rows = _CATALOG["mmr_rerank"][0](spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    nrm = {k: float(np.sqrt(v @ v)) for k, v in emb.items() if np.sqrt(v @ v) > 0}

    def cos(a, b):
        return float(emb[a] @ emb[b]) / (nrm[a] * nrm[b])

    got = defaultdict(list)
    for r in rows:
        got[r.query_id].append((r.step, r.doc_id))
    for qid, qv in HYBRID_QUERY_VECS:
        rel = sorted(
            ((cos(qv, d), -d) for d in nrm),
            reverse=True,
        )[:MMR_CANDIDATES]
        pool = [(-negd, s) for s, negd in rel]
        picked = []
        rel_map = dict(pool)
        # step 1: max rel
        first = max(pool, key=lambda t: (t[1], -t[0]))[0]
        picked.append(first)
        for _step in range(2, MMR_K + 1):
            best, best_score = None, None
            for d, rl in sorted(pool):
                if d in picked:
                    continue
                red = max(cos(d, p) for p in picked)
                sc = MMR_LAMBDA * rl - (1 - MMR_LAMBDA) * red
                if best_score is None or sc > best_score + 1e-12:
                    best, best_score = d, sc
            picked.append(best)
        want = list(enumerate(picked, start=1))
        assert sorted(got[qid]) == want, (qid, got[qid], want)


def test_mmr_picks_are_distinct_pool_members(spark, sf_dir):
    from lenses_topology_example_spark.operators.retrieval import MMR_K

    rows = _CATALOG["mmr_rerank"][0](spark, sf_dir).collect()
    per_q = defaultdict(list)
    for r in rows:
        per_q[r.query_id].append(r)
    for rs in per_q.values():
        assert sorted(r.step for r in rs) == list(range(1, MMR_K + 1))
        assert len({r.doc_id for r in rs}) == MMR_K


# --- table_profile -----------------------------------------------------------


def test_table_profile_matches_recount(spark, sf_dir):
    rows = {r.column: r for r in
            _CATALOG["table_profile"][0](spark, sf_dir).collect()}
    od = load_table(spark, sf_dir, "orders")
    n = od.count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    }
    for col, r in rows.items():
        assert r.n_rows == n
        assert r.n_null == od.filter(F.col(col).isNull()).count()
        assert r.n_distinct == od.select(col).distinct().count()
        assert r.min_display is not None and r.max_display is not None


# --- streaming value-bin twin ------------------------------------------------


def test_streaming_value_bins_match_batch(spark, sf_dir, tmp_path):
    """The streaming bin-counter table (update mode, bounded state,
    static calibrated bounds) must converge to exactly the batch
    counter table over the same events."""
    from lenses_topology_example_spark.operators.sketches import (
        value_bin_counts,
    )
    from lenses_topology_example_spark.streaming.pipelines import (
        streaming_value_bins,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").cast("double").alias("x")
    )
    bounds = ev.groupBy("event_type").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    bounds.persist().count()

    src = tmp_path / "vb_src"
    load_table(spark, sf_dir, "events").write.parquet(str(src))
    stream = spark.readStream.schema(
        load_table(spark, sf_dir, "events").schema
    ).parquet(str(src))
    q = (
        streaming_value_bins(stream, bounds)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("vb_stream_test")
        .option("checkpointLocation", str(tmp_path / "vb_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed: dict = {}
    for r in spark.sql("SELECT * FROM vb_stream_test").collect():
        streamed[(r["event_type"], r["bin"])] = r["c"]
    batch = {
        (r["event_type"], r["bin"]): r["c"]
        for r in value_bin_counts(ev, bounds).collect()
    }
    assert streamed == batch
    bounds.unpersist()


# --- dedup_tfidf_cosine ------------------------------------------------------


def test_tfidf_cosine_pairs_match_pure_python(spark, sf_dir):
    """Full replica: tf, df-capped weights, dot/norm cosine in Python
    over the raw corpus."""
    import math
    import re as _re
    from collections import Counter, defaultdict as dd

    from lenses_topology_example_spark.operators.dedup import (
        TFIDF_COS_DF_CAP,
        TFIDF_COS_THRESHOLD,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    tf = dd(Counter)
    for d in docs:
        toks = [t for t in _re.split(r"\W+", d.text.lower()) if t]
        for i in range(len(toks) - 2):
            tf[d.doc_id][" ".join(toks[i : i + 3])] += 1
    df = Counter()
    for c in tf.values():
        for sh in c:
            df[sh] += 1
    n = len(docs)
    w = {
        doc: {
            sh: round(c * math.log(n / df[sh]), 4)
            for sh, c in cnt.items()
            if df[sh] <= TFIDF_COS_DF_CAP
        }
        for doc, cnt in tf.items()
    }
    rows = _CATALOG["dedup_tfidf_cosine"][0](spark, sf_dir).collect()
    assert rows, "non-empty pair set expected at test SF"
    for r in rows:
        wa, wb = w[r.doc_a], w[r.doc_b]
        dot = sum(wa[s] * wb[s] for s in set(wa) & set(wb))
        na = sum(x * x for x in wa.values())
        nb = sum(x * x for x in wb.values())
        want = dot / math.sqrt(na * nb)
        assert abs(r.cos_sim - want) < 1e-5, (r.doc_a, r.doc_b)
        assert r.cos_sim >= TFIDF_COS_THRESHOLD
        assert r.doc_a < r.doc_b


# --- holt_forecast -----------------------------------------------------------


def test_holt_matches_pure_python_recurrence(spark, sf_dir):
    from lenses_topology_example_spark.operators.windows import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
    )

    rows = sorted(
        _CATALOG["holt_forecast"][0](spark, sf_dir).collect(),
        key=lambda r: r.h,
    )
    assert [r.h for r in rows] == list(range(1, HOLT_HORIZON + 1))
    monthly = sorted(
        (r.m, r.x)
        for r in load_table(spark, sf_dir, "orders")
        .select(
            F.trunc(F.to_date("o_orderdate"), "month").alias("m"),
            "o_totalprice",
        )
        .groupBy("m")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("x")
        )
        .collect()
    )
    xs = [x for _, x in monthly]
    a, b = HOLT_ALPHA, HOLT_BETA
    level, trend = xs[0], (xs[1] - xs[0] if len(xs) >= 2 else 0.0)
    for x in xs[1:]:
        ln = a * x + (1 - a) * (level + trend)
        trend = b * (ln - level) + (1 - b) * trend
        level = ln
    for r in rows:
        assert abs(r.level - level) < 1e-6
        assert abs(r.trend - trend) < 1e-6
        assert abs(r.forecast - (level + r.h * trend)) < 1e-6


# --- cuped_ab_report ---------------------------------------------------------


def test_cuped_matches_pure_python(spark, sf_dir):
    """Full replica of CUPED: pre/post split, md5 arms, pooled theta,
    adjusted means and variances in Python."""
    import hashlib
    import math
    from collections import defaultdict as dd

    from lenses_topology_example_spark.operators.windows import (
        CUPED_SPLIT_TS,
    )

    rows = _CATALOG["cuped_ab_report"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    import datetime as dt

    split = dt.datetime.fromisoformat(CUPED_SPLIT_TS)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    pre_n, pre_s, post_y = dd(int), dd(float), dd(float)
    users = set()
    for e in ev:
        users.add(e.user_id)
        if e.ts < split:
            pre_n[e.user_id] += 1
            pre_s[e.user_id] += e.value
        elif e.event_type == "purchase":
            post_y[e.user_id] += e.value
    xs, ys, arms = [], [], []
    for u in sorted(users):
        if pre_n[u] == 0:
            continue
        h = int(hashlib.md5(f"ab|{u}".encode()).hexdigest()[:15], 16) % 2
        arms.append(h)
        xs.append(pre_s[u] / pre_n[u])
        ys.append(post_y[u])
    n = len(xs)
    assert (r.n_0, r.n_1) == (arms.count(0), arms.count(1))
    xbar = sum(xs) / n
    var_x = sum(x * x for x in xs) / n - xbar * xbar
    cov = sum(x * y for x, y in zip(xs, ys)) / n - xbar * (sum(ys) / n)
    theta = cov / var_x
    assert abs(r.theta - theta) < 1e-3
    y0 = [y for a, y in zip(arms, ys) if a == 0]
    y1 = [y for a, y in zip(arms, ys) if a == 1]
    assert abs(r.diff_raw - (sum(y1) / len(y1) - sum(y0) / len(y0))) < 1e-3
    adj = [y - theta * (x - xbar) for x, y in zip(xs, ys)]
    a0 = [v for a, v in zip(arms, adj) if a == 0]
    a1 = [v for a, v in zip(arms, adj) if a == 1]
    assert abs(r.diff_adj - (sum(a1) / len(a1) - sum(a0) / len(a0))) < 1e-3

    def svar(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / (len(v) - 1)

    se_raw = math.sqrt(svar(y0) / len(y0) + svar(y1) / len(y1))
    se_adj = math.sqrt(svar(a0) / len(a0) + svar(a1) / len(a1))
    assert abs(r.var_reduction_pct - (1 - se_adj**2 / se_raw**2) * 100) < 0.1


# --- quantile_treatment_effect -----------------------------------------------


def test_qte_matches_sorted_quantiles(spark, sf_dir):
    import hashlib

    from lenses_topology_example_spark.operators.windows import QTE_PCTS

    rows = sorted(
        _CATALOG["quantile_treatment_effect"][0](spark, sf_dir).collect(),
        key=lambda r: r.pct,
    )
    assert [r.pct for r in rows] == list(QTE_PCTS)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value")
        .collect()
    )
    arms = {0: [], 1: []}
    for e in ev:
        h = int(hashlib.md5(f"ab|{e.user_id}".encode()).hexdigest()[:15], 16)
        arms[h % 2].append((e.value, e.event_id))
    for a in (0, 1):
        arms[a].sort()
    import math

    for r in rows:
        assert r.n_control == len(arms[0])
        assert r.n_treatment == len(arms[1])
        v0 = arms[0][math.ceil(len(arms[0]) * r.pct / 100.0) - 1][0]
        v1 = arms[1][math.ceil(len(arms[1]) * r.pct / 100.0) - 1][0]
        assert r.v_control == v0 and r.v_treatment == v1
        assert abs(r.qte - (v1 - v0)) < 1e-12


# --- drift_psi ---------------------------------------------------------------


def test_drift_psi_bins_conserve_and_verdict_bands(spark, sf_dir):
    rows = _CATALOG["drift_psi"][0](spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.c_base + r.c_batch for r in rows) == n_docs
    psis = {r.psi for r in rows}
    assert len(psis) == 1
    psi = psis.pop()
    want = "stable" if psi < 0.1 else ("moderate" if psi < 0.25 else "major")
    assert all(r.verdict == want for r in rows)
    # PSI of an md5 parity split of one population must read stable
    assert want == "stable", psi
    assert abs(sum(r.psi_term for r in rows) - psi) < 1e-5


# --- auc_report --------------------------------------------------------------


def test_auc_matches_sklearn_free_rank_sum(spark, sf_dir):
    """Replica: rank-sum AUC in Python; also AUC of a perfect and an
    anti-perfect synthetic check of the formula itself."""
    rows = _CATALOG["auc_report"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    import numpy as np

    from lenses_topology_example_spark.operators.embed_stats import (
        AUC_CENTROID,
        AUC_POS_LABEL,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {e.vec_id: np.array(e.embedding, dtype=np.float64) for e in emb}
    labels = {e.vec_id: e.label for e in emb}
    nrm = {k: float(np.sqrt(v @ v)) for k, v in vecs.items()}
    keep = [k for k in vecs if nrm[k] > 0]
    cv, cn = vecs[AUC_CENTROID], nrm[AUC_CENTROID]
    scored = sorted(
        (float(vecs[k] @ cv) / (nrm[k] * cn), k) for k in keep
    )
    rank_sum = sum(
        i + 1
        for i, (_, k) in enumerate(scored)
        if labels[k] == AUC_POS_LABEL
    )
    n_pos = sum(1 for k in keep if labels[k] == AUC_POS_LABEL)
    n_neg = len(keep) - n_pos
    assert (r.n_pos, r.n_neg, r.rank_sum_pos) == (n_pos, n_neg, rank_sum)
    want = (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert abs(r.auc - want) < 1e-5
    assert 0.0 <= r.auc <= 1.0
