"""Semantic tests for the round-10 first-wave operators, beyond oracle
parity: invariants an oracle twin that shares the formula cannot catch
(dominance completeness of the skyline, count conservation of the
Benford screen, a numpy least-squares cross-check of the closed-form
OLS, a pure-Python calibration replica, and blocking completeness of
the ER candidate generator)."""

from __future__ import annotations

import math

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.operators.analytics import (
    BENFORD_SHARES,
    CALIB_BINS,
    CALIB_WEIGHTS,
    ER_SIM_THRESHOLD,
)
from lenses_topology_example_spark.tables import load_table


# --- pareto_frontier ---------------------------------------------------------


def _dominates(q, p) -> bool:
    return (
        q.p_retailprice <= p.p_retailprice
        and q.p_size <= p.p_size
        and (q.p_retailprice < p.p_retailprice or q.p_size < p.p_size)
    )


def test_pareto_frontier_is_exactly_the_nondominated_set(spark, sf_dir):
    """The sort-based skyline must equal the brute-force O(n²)
    dominance filter: every returned part is non-dominated within its
    type, and every omitted part is dominated by some part of the same
    type."""
    parts = (
        load_table(spark, sf_dir, "part")
        .select("p_type", "p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in parts:
        by_type.setdefault(r.p_type, []).append(r)
    want = set()
    for t, rows in by_type.items():
        for p in rows:
            if not any(_dominates(q, p) for q in rows if q is not p):
                want.add((t, p.p_partkey))
    got = {
        (r.p_type, r.p_partkey)
        for r in _CATALOG["pareto_frontier"][0](spark, sf_dir).collect()
    }
    assert got == want


def test_pareto_frontier_no_internal_dominance(spark, sf_dir):
    """No frontier member may dominate another frontier member of the
    same type (the frontier is an antichain)."""
    rows = _CATALOG["pareto_frontier"][0](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.p_type, []).append(r)
    for rs in by_type.values():
        for p in rs:
            assert not any(_dominates(q, p) for q in rs if q is not p)


# --- benford_digits ----------------------------------------------------------


def test_benford_counts_conserve_and_shares_sum(spark, sf_dir):
    rows = _CATALOG["benford_digits"][0](spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    # every order with a nonzero totalprice contributes exactly once
    assert sum(r.n for r in rows) == n_orders
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-12
    assert abs(sum(BENFORD_SHARES.values()) - 1.0) < 1e-12
    for r in rows:
        assert r.exp_share == BENFORD_SHARES[r.digit]


def test_benford_first_digit_matches_python(spark, sf_dir):
    prices = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    ]
    want: dict[int, int] = {}
    for p in prices:
        s = f"{p:.2f}"
        d = next((c for c in s if c in "123456789"), None)
        if d is not None:
            want[int(d)] = want.get(int(d), 0) + 1
    got = {
        r.digit: r.n
        for r in _CATALOG["benford_digits"][0](spark, sf_dir).collect()
    }
    assert got == want
    # chi-square terms recompute from (n, exp_share, N)
    n_total = sum(want.values())
    for r in _CATALOG["benford_digits"][0](spark, sf_dir).collect():
        e = r.exp_share * n_total
        assert abs(r.chi2_term - (r.n - e) ** 2 / e) < 1e-9


# --- ols_trend ---------------------------------------------------------------


def test_ols_trend_matches_numpy_lstsq(spark, sf_dir):
    """The closed-form decimal-exact OLS must agree with numpy's
    QR-based least squares on the same monthly frame."""
    import numpy as np

    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    frame = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_mktsegment",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("x"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("y"))
        .collect()
    )
    by_seg: dict[str, list] = {}
    for r in frame:
        by_seg.setdefault(r.c_mktsegment, []).append((r.x, float(r.y)))
    got = {
        r.c_mktsegment: r
        for r in _CATALOG["ols_trend"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(by_seg)
    for seg, pts in by_seg.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        A = np.vstack([xs, np.ones_like(xs)]).T
        (slope, intercept), res, *_ = np.linalg.lstsq(A, ys, rcond=None)
        r = got[seg]
        assert r.n_months == len(pts)
        # slope/intercept run at WHOLE-DOLLAR grain since round 12
        # (sub-2^53 casts; see the r2 note below) — compare tightly
        # against lstsq on the same dollar-rounded cells, and sanity
        # against the float fit at the grain-noise level
        ydol = np.floor(ys + 0.5)
        (slope_d, intercept_d), *_ = np.linalg.lstsq(
            np.vstack([xs, np.ones_like(xs)]).T, ydol, rcond=None
        )
        assert abs(r.slope - slope_d) < 1e-6 * max(1.0, abs(slope_d))
        assert abs(r.intercept - intercept_d) < 1e-6 * max(
            1.0, abs(intercept_d)
        )
        assert abs(r.slope - slope) < 1e-4 * max(1.0, abs(slope))
        assert abs(r.intercept - intercept) < 1e-4 * max(
            1.0, abs(intercept)
        )
        # R² runs on CENTERED kilo-dollar deviations since round 12
        # (keeps every int->double cast under 2^53 through ~sf30,
        # where the round-12 sf1.0 sweep found DuckDB's negative
        # HUGEINT->DOUBLE mis-rounding); replicate the exact integer
        # chain: ybar = HALF_UP(syd/n), dyk = HALF_UP((yd-ybar)/1000),
        # r2 = num_d^2 / (n * den * sum(dyk^2) * 1e6).
        ydi = [int(v) for v in ydol]
        n_m = len(ydi)
        syd_i, sx_i = sum(ydi), int(xs.sum())
        sxyd_i = sum(int(x) * y for x, y in zip(xs, ydi))
        sxx_i = int((xs * xs).sum())
        ybar = (2 * syd_i + n_m) // (2 * n_m)
        syyk_c = sum(((y - ybar + 500) // 1000) ** 2 for y in ydi)
        num_i = n_m * sxyd_i - sx_i * syd_i
        den_i = n_m * sxx_i - sx_i * sx_i
        want_r2 = (
            float(num_i) * float(num_i)
            / (float(n_m) * float(den_i) * float(syyk_c) * 1e6)
        )
        assert abs(r.r2 - want_r2) < 1e-12
        # and the grain change stays in the noise: at sf0.001 monthly
        # sums are ~5e5 dollars, so kilo-rounding perturbs each cell
        # by up to 1e-3 relative — R² (here ~1e-2) moves by ~1e-5;
        # at sf0.1+ the cells are 100x larger and the bound tightens
        ss_res_f = float(np.sum((ys - (slope * xs + intercept)) ** 2))
        ss_tot_f = float(np.sum((ys - ys.mean()) ** 2))
        assert abs(r.r2 - (1.0 - ss_res_f / ss_tot_f)) < 1e-4


# --- calibration_bins --------------------------------------------------------


def test_calibration_bins_match_pure_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding", "label")
        .collect()
    )
    bins: dict[int, list] = {}
    for r in rows:
        z = 0.0
        for w, e in zip(CALIB_WEIGHTS, r.embedding):
            z += w * float(e)
        s = round(1.0 / (1.0 + math.exp(-z)), 6)
        b = min(int(s * CALIB_BINS), CALIB_BINS - 1)
        bins.setdefault(b, []).append((s, r.label % 2))
    n_total = len(rows)
    got = {
        r.bin: r
        for r in _CATALOG["calibration_bins"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(bins)
    from decimal import ROUND_HALF_UP, Decimal

    for b, members in bins.items():
        r = got[b]
        assert r.n == len(members)
        # the engine sums exact 6dp decimals then re-rounds to scale 4
        # before the double cast (the 2^53 rule — r10 ADVICE)
        s_sum = sum(
            (Decimal(f"{s:.6f}") for s, _ in members), Decimal(0)
        ).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        conf = float(s_sum) / len(members)
        acc = sum(y for _, y in members) / len(members)
        assert abs(r.conf - conf) < 1e-9
        assert abs(r.acc - acc) < 1e-12
        assert abs(
            r.ece_term - len(members) / n_total * abs(acc - conf)
        ) < 1e-12


def test_calibration_bins_cover_population(spark, sf_dir):
    rows = _CATALOG["calibration_bins"][0](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == n
    for r in rows:
        assert 0 <= r.bin < CALIB_BINS
        assert 0.0 <= r.conf <= 1.0 and 0.0 <= r.acc <= 1.0


# --- er_part_names -----------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_er_part_names_matches_python_blocked_dp(spark, sf_dir):
    """Blocking completeness + score correctness: the result is exactly
    the set of distinct-name pairs that share a last-token block and
    clear the normalized-Levenshtein threshold, with the counts of the
    underlying parts conserved."""
    parts = load_table(spark, sf_dir, "part").select("p_name").collect()
    counts: dict[str, int] = {}
    for r in parts:
        counts[r.p_name] = counts.get(r.p_name, 0) + 1
    names = sorted(counts)
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if a.split()[-1] != b.split()[-1]:
                continue
            lev = _lev(a, b)
            sim = 1.0 - lev / max(len(a), len(b))
            if sim >= ER_SIM_THRESHOLD:
                want[(a, b)] = (lev, sim)
    got = _CATALOG["er_part_names"][0](spark, sf_dir).collect()
    assert {(r.name_a, r.name_b) for r in got} == set(want)
    for r in got:
        lev, sim = want[(r.name_a, r.name_b)]
        assert r.lev == lev
        assert abs(r.sim - sim) < 1e-12
        assert r.n_a == counts[r.name_a] and r.n_b == counts[r.name_b]
        assert r.block == r.name_a.split()[-1] == r.name_b.split()[-1]


# --- target_encode (wave 2) ---------------------------------------------------


def test_target_encode_matches_replica_and_shrinks(spark, sf_dir):
    """Exact m-estimate replica, plus the shrinkage property: every
    encoded value lies between the category's raw rate and the global
    prior (that interpolation IS the point of the encoder)."""
    from lenses_topology_example_spark.operators.analytics import (
        TE_SMOOTHING_M,
    )

    rows = (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_acctbal")
        .collect()
    )
    per = {}
    for r in rows:
        n, p = per.get(r.c_nationkey, (0, 0))
        per[r.c_nationkey] = (n + 1, p + (1 if r.c_acctbal > 0 else 0))
    n_tot = sum(n for n, _ in per.values())
    pos_tot = sum(p for _, p in per.values())
    prior = pos_tot / n_tot
    got = {
        r.c_nationkey: r
        for r in _CATALOG["target_encode"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for k, (n, p) in per.items():
        r = got[k]
        assert (r.n, r.n_pos) == (n, p)
        want = (p + TE_SMOOTHING_M * prior) / (n + TE_SMOOTHING_M)
        assert abs(r.encoded - want) < 1e-12
        lo, hi = sorted((p / n, prior))
        assert lo - 1e-12 <= r.encoded <= hi + 1e-12


# --- woe_iv (wave 2) ------------------------------------------------------------


def test_woe_iv_matches_python_replica(spark, sf_dir):
    """NTILE bin fills differ by at most one within a segment, class
    distributions sum to 1, and woe / iv_term recompute exactly from
    the counts."""
    rows = _CATALOG["woe_iv"][0](spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, rs in by_seg.items():
        fills = [r.n_good + r.n_bad for r in rs]
        assert max(fills) - min(fills) <= 1
        G = sum(r.n_good for r in rs)
        B = sum(r.n_bad for r in rs)
        if G:
            assert abs(sum(r.dist_good for r in rs) - 1.0) < 1e-12
        if B:
            assert abs(sum(r.dist_bad for r in rs) - 1.0) < 1e-12
        for r in rs:
            if G and B:
                import math as _m

                arg = ((r.n_good + 0.5) * B) / ((r.n_bad + 0.5) * G)
                # decimal(38,6) round-trip truncates toward the 6dp grid
                # identically on both engines; replicate via round
                assert abs(r.woe - _m.log(arg)) < 1e-5
                assert abs(
                    r.iv_term - (r.dist_good - r.dist_bad) * r.woe
                ) < 1e-12
            else:
                assert r.woe is None and r.iv_term is None


# --- mad_outliers (wave 2) -----------------------------------------------------


def test_mad_outliers_matches_python_replica(spark, sf_dir):
    import math as _m

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
    got = {
        r.event_type: r
        for r in _CATALOG["mad_outliers"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        med = vals[_m.ceil(n / 2) - 1][0]
        devs = sorted(
            (abs(v - med), eid) for v, eid in vals
        )
        mad = devs[_m.ceil(n / 2) - 1][0]
        n_out = sum(1 for d, _ in devs if d > 3.0 * 1.4826 * mad)
        r = got[t]
        assert r.n == n
        assert r.median == med
        assert r.mad == mad
        assert r.n_outliers == n_out
        assert abs(r.outlier_rate - n_out / n) < 1e-15


# --- copurchase_triangles (wave 2) ----------------------------------------------


def test_copurchase_triangles_matches_python_replica(spark, sf_dir):
    from lenses_topology_example_spark.operators.analytics import (
        TRI_MIN_SUPPORT,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    orders = {}
    for r in li:
        orders.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    sup = {}
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                sup[(a, b)] = sup.get((a, b), 0) + 1
    edges = {e for e, s in sup.items() if s >= TRI_MIN_SUPPORT}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        # count c adjacent to both with a < b < c to match orientation
        tri += sum(1 for c in adj[a] & adj[b] if c > b)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    r = _CATALOG["copurchase_triangles"][0](spark, sf_dir).collect()[0]
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(edges)
    assert r.n_wedges == wedges
    assert r.n_triangles == tri
    if wedges:
        assert abs(r.clustering_coef - 3.0 * tri / wedges) < 1e-15


# --- asset_gif_meta / survival_curve (wave 3) -----------------------------------


def test_asset_gif_meta_matches_codec_replica(spark, sf_dir):
    """Recompute a sample of rows by running the codec in-process —
    the operator's mapInPandas kernel must agree with a direct
    encode/decode, and every n_bytes with the arithmetic formula."""
    from lenses_topology_example_spark.functions.codecs import (
        gif_total_bytes,
        make_gif,
        parse_gif,
    )

    rows = _CATALOG["asset_gif_meta"][0](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows[:50]:
        w, h = 1 + r.doc_id % 16, 1 + docs[r.doc_id] % 16
        payload = make_gif(w, h, r.doc_id % 251)
        pw, ph, nc, raster = parse_gif(payload)
        assert (r.width, r.height, r.n_colors) == (pw, ph, nc)
        assert r.n_pixels == len(raster)
        assert r.pixel_sum == sum(raster)
        assert r.n_bytes == len(payload) == gif_total_bytes(w * h)


def test_survival_curve_matches_python_km(spark, sf_dir):
    """Pure-Python Kaplan-Meier replica: durations/censoring from the
    raw orders, classic product-limit estimator."""
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(
            (r.o_orderdate.date(), r.o_orderkey)
        )
    d_end = max(d for v in by_cust.values() for d, _ in v)
    subj = []
    for v in by_cust.values():
        v.sort()
        if len(v) >= 2:
            subj.append(((v[1][0] - v[0][0]).days, 1))
        else:
            subj.append(((d_end - v[0][0]).days, 0))
    times = {}
    for t, ev in subj:
        d, c = times.get(t, (0, 0))
        times[t] = (d + ev, c + (1 - ev))
    got = _CATALOG["survival_curve"][0](spark, sf_dir).collect()
    n_at_risk = len(subj)
    s = 1.0
    want = []
    for t in sorted(times):
        d, c = times[t]
        if d > 0:
            s = s * (1.0 - d / n_at_risk)
            want.append((t, n_at_risk, d, c, s))
        n_at_risk -= d + c
    assert [(r.t_days, r.n_risk, r.d_events, r.c_censored) for r in got] == [
        w[:4] for w in want
    ]
    for r, w in zip(got, want):
        assert abs(r.survival - w[4]) < 1e-12
    # survival is a proper non-increasing step function in (0, 1]
    for a, b in zip(got, got[1:]):
        assert b.survival <= a.survival
    assert all(0.0 <= r.survival <= 1.0 for r in got)


# --- negative_sampling_plan / ewma_anomaly / chi2_independence (wave 4) ---------


def test_negative_sampling_matches_python(spark, sf_dir):
    """Replica over the exact vocabulary counts; shares sum to 1 and
    the subsample keep-probability is monotone non-increasing in
    frequency (the whole point of Mikolov subsampling)."""
    import math as _m

    from lenses_topology_example_spark.operators.dedup import _doc_tokens

    toks = _doc_tokens(spark, sf_dir).select("t").collect()
    freq: dict[str, int] = {}
    for r in toks:
        for t in r.t:
            freq[t] = freq.get(t, 0) + 1
    n_total = sum(freq.values())
    wsum = sum(
        float(f"{(f ** 0.75):.6f}".rstrip())  # decimal(38,6) round-trip
        for f in freq.values()
    )
    rows = _CATALOG["negative_sampling_plan"][0](spark, sf_dir).collect()
    assert {r.token for r in rows} == set(freq)
    assert abs(sum(r.p_negative for r in rows) - 1.0) < 1e-4
    by_f = sorted(rows, key=lambda r: r.f)
    for a, b in zip(by_f, by_f[1:]):
        assert b.keep_prob <= a.keep_prob + 1e-12
    for r in rows:
        assert r.f == freq[r.token]
        tn = 0.001 * n_total
        want_keep = min(1.0, (_m.sqrt(r.f / tn) + 1.0) * tn / r.f)
        assert abs(r.keep_prob - want_keep) < 1e-5
        assert abs(r.p_negative - (r.f ** 0.75) / wsum) < 1e-4


def test_ewma_anomaly_matches_python_recurrence(spark, sf_dir):
    from collections import defaultdict

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) AS day")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.day] += 1
    got = {}
    for r in _CATALOG["ewma_anomaly"][0](spark, sf_dir).collect():
        got[(r.event_type, r.day)] = r
    n_expected = 0
    for t, days in daily.items():
        ds = sorted(days)
        ewma = float(days[ds[0]])
        for d in ds[1:]:
            n = days[d]
            key = (t, d.isoformat())
            r = got[key]
            assert r.n == n
            assert abs(r.ewma_forecast - ewma) < 1e-9
            assert abs(r.resid - (n - ewma)) < 1e-9
            assert r.flagged == (abs(n - ewma) > 3.0 * ewma ** 0.5)
            ewma = 0.2 * n + 0.8 * ewma
            n_expected += 1
    assert len(got) == n_expected


def test_chi2_cells_margins_and_terms(spark, sf_dir):
    rows = _CATALOG["chi2_independence"][0](spark, sf_dir).collect()
    n_total = sum(r.n for r in rows)
    # margins recompute from the cells themselves
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r in rows:
        row_tot[r.c_mktsegment] = row_tot.get(r.c_mktsegment, 0) + r.n
        col_tot[r.o_orderpriority] = col_tot.get(r.o_orderpriority, 0) + r.n
    for r in rows:
        assert r.row_tot == row_tot[r.c_mktsegment]
        assert r.col_tot == col_tot[r.o_orderpriority]
        e = r.row_tot * r.col_tot / n_total
        assert abs(r.expected - e) < 1e-9
        assert abs(r.chi2_term - (r.n - e) ** 2 / e) < 1e-9
        assert abs(r.std_residual - (r.n - e) / e ** 0.5) < 1e-9
    # expected counts conserve the total within each row margin
    for seg in row_tot:
        exp_sum = sum(r.expected for r in rows if r.c_mktsegment == seg)
        assert abs(exp_sum - row_tot[seg]) < 1e-6


# --- zonemap_prune_audit (wave 5) ------------------------------------------------


def test_zonemap_audit_matches_python_replica(spark, sf_dir):
    from datetime import date

    from lenses_topology_example_spark.operators.governance import (
        ZM_FILE_KEYS,
        ZM_PRUNE_HI,
        ZM_PRUNE_LO,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS ship")
        .collect()
    )
    files = {}
    for r in li:
        fid = r.l_orderkey // ZM_FILE_KEYS
        n, mn, mx = files.get(fid, (0, r.ship, r.ship))
        files[fid] = (n + 1, min(mn, r.ship), max(mx, r.ship))
    lo = date.fromisoformat(ZM_PRUNE_LO)
    hi = date.fromisoformat(ZM_PRUNE_HI)
    got = {
        r.file_id: r
        for r in _CATALOG["zonemap_prune_audit"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(files)
    total_rows = 0
    for fid, (n, mn, mx) in files.items():
        r = got[fid]
        assert r.n_rows == n
        assert r.min_ship == mn.isoformat()
        assert r.max_ship == mx.isoformat()
        assert r.span_days == (mx - mn).days
        assert r.prunable == (mx < lo or mn >= hi)
        total_rows += n
    assert total_rows == len(li)  # zone maps cover every row exactly once


# --- winsorized_stats / mutual_information / bloom_join_audit (wave 6) ----------


def test_winsorized_stats_matches_python_replica(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .collect()
    )
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(
            (r.o_totalprice, r.o_orderkey)
        )
    got = {
        r.c_mktsegment: r
        for r in _CATALOG["winsorized_stats"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        lo_r = math.ceil(n * 5 / 100.0)
        hi_r = math.ceil(n * 95 / 100.0)
        lo_cut, hi_cut = vals[lo_r - 1][0], vals[hi_r - 1][0]
        xs = [v for v, _ in vals]
        r = got[seg]
        assert r.n == n
        assert r.lo_cut == lo_cut and r.hi_cut == hi_cut
        assert abs(r.mean_raw - sum(xs) / n) < 1e-6
        wins = [min(max(x, lo_cut), hi_cut) for x in xs]
        assert abs(r.mean_winsor - sum(wins) / n) < 1e-6
        inner = xs[lo_r:hi_r]
        assert abs(r.mean_trimmed - sum(inner) / len(inner)) < 1e-6
        # robustness ordering: winsorized/trimmed pull toward the middle
        assert r.lo_cut <= r.mean_trimmed <= r.hi_cut


def test_mutual_information_matches_python_and_bounds(spark, sf_dir):
    cells = {
        (r.c_mktsegment, r.o_orderpriority): r.n
        for r in _CATALOG["chi2_independence"][0](spark, sf_dir).collect()
    }
    N = sum(cells.values())
    row_tot, col_tot = {}, {}
    for (s, p), n in cells.items():
        row_tot[s] = row_tot.get(s, 0) + n
        col_tot[p] = col_tot.get(p, 0) + n

    def rln(x):  # decimal(38,6) round-trip ~ round half-up at 6dp
        from decimal import Decimal, ROUND_HALF_UP

        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    mi = (
        sum(
            n * rln(math.log(n * N / (row_tot[s] * col_tot[p])))
            for (s, p), n in cells.items()
        )
        / N
    )
    h_row = sum(t * rln(math.log(N / t)) for t in row_tot.values()) / N
    h_col = sum(t * rln(math.log(N / t)) for t in col_tot.values()) / N
    r = _CATALOG["mutual_information"][0](spark, sf_dir).collect()[0]
    assert r.n_total == N and r.n_cells == len(cells)
    assert abs(r.mi_nats - mi) < 1e-6
    assert abs(r.h_row - h_row) < 1e-6
    assert abs(r.h_col - h_col) < 1e-6
    # information-theory bounds: 0 <= MI <= min(H_row, H_col)
    assert -1e-9 <= r.mi_nats <= min(r.h_row, r.h_col) + 1e-9
    assert abs(r.u_row_given_col - r.mi_nats / r.h_row) < 1e-12
    assert abs(r.u_col_given_row - r.mi_nats / r.h_col) < 1e-12


def test_bloom_join_audit_no_false_negatives(spark, sf_dir):
    """The invariant the oracle twin shares and therefore cannot check
    alone: n_pass >= n_match (no false negatives), counts conserve
    against direct recounts, and the derived rates recompute."""
    r = _CATALOG["bloom_join_audit"][0](spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = {
        x.o_orderkey
        for x in orders.filter("o_orderpriority = '1-URGENT'")
        .select("o_orderkey")
        .collect()
    }
    keys = [x.l_orderkey for x in li.select("l_orderkey").collect()]
    assert r.n_build == len(urgent)
    assert r.n_probe == len(keys)
    assert r.n_match == sum(1 for k in keys if k in urgent)
    assert r.n_pass >= r.n_match  # one-sided error
    assert r.n_false_pos == r.n_pass - r.n_match
    assert abs(r.pass_rate - r.n_pass / r.n_probe) < 1e-12
    if r.n_probe > r.n_match:
        assert abs(
            r.fp_rate - r.n_false_pos / (r.n_probe - r.n_match)
        ) < 1e-12
        assert r.fp_rate < 0.2  # an 8KB bitmap over this build side


# --- streaming EWMA twin (wave 7 infra) -------------------------------------------


def test_streaming_ewma_matches_batch(spark, sf_dir, tmp_path):
    """The streamed per-completed-day chart rows must equal the batch
    operator's rows for every day except each type's LAST (in-flight,
    never closed) — exact equality, including across micro-batch
    boundaries (maxFilesPerTrigger=1 forces the state to carry days
    over batches)."""
    from lenses_topology_example_spark.streaming.pipelines import (
        streaming_ewma_forecast,
    )
    from lenses_topology_example_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    # two files split by time so the second batch continues the state
    split = ev.selectExpr("CAST(ts AS DATE) AS d").agg(
        {"d": "max"}
    ).collect()[0][0]
    import datetime

    mid = split - datetime.timedelta(days=30)
    src = tmp_path / "ewma_src"
    ev.filter(f"CAST(ts AS DATE) <= '{mid}'").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "a"))
    ev.filter(f"CAST(ts AS DATE) > '{mid}'").coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "a"))

    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "a"))
    )
    q = (
        streaming_ewma_forecast(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_stream_test")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.event_type, r.day): (r.n, r.ewma_forecast, r.resid, r.flagged)
        for r in spark.sql("SELECT * FROM ewma_stream_test").collect()
    }
    batch_rows = _CATALOG["ewma_anomaly"][0](spark, sf_dir).collect()
    last_day = {}
    for r in batch_rows:
        last_day[r.event_type] = max(last_day.get(r.event_type, ""), r.day)
    want = {
        (r.event_type, r.day): (r.n, r.ewma_forecast, r.resid, r.flagged)
        for r in batch_rows
        if r.day != last_day[r.event_type]
    }
    assert streamed == want


# --- ks_drift / quantile_normalize / gains_curve (wave 7) -------------------------


def test_ks_drift_matches_python_grid_ks(spark, sf_dir):
    from lenses_topology_example_spark.functions.texthash import md5_hash64
    from lenses_topology_example_spark.operators.quality import (
        KS_C_05,
        KS_GRID,
    )
    from lenses_topology_example_spark.operators.text import (
        quality_components,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    q = quality_components(F.col("text"))["quality"]
    rows = docs.select(
        (md5_hash64(F.col("doc_id").cast("string")) % 2).alias("p"),
        q.alias("q"),
    ).collect()
    a, b = {}, {}
    for r in rows:
        if r.q is None:
            continue
        cell = min(int(r.q * KS_GRID), KS_GRID - 1)
        tgt = a if r.p == 0 else b
        tgt[cell] = tgt.get(cell, 0) + 1
    na, nb = sum(a.values()), sum(b.values())
    ca = cb = 0
    d = 0.0
    for cell in sorted(set(a) | set(b)):
        ca += a.get(cell, 0)
        cb += b.get(cell, 0)
        d = max(d, abs(ca / na - cb / nb))
    r = _CATALOG["ks_drift"][0](spark, sf_dir).collect()[0]
    assert (r.n_base, r.n_batch) == (na, nb)
    assert abs(r.d_stat - d) < 1e-9
    crit = KS_C_05 * ((na + nb) / (na * nb)) ** 0.5
    assert abs(r.critical_05 - crit) < 1e-12
    assert r.drifted == (d > crit)
    assert 0.0 <= r.d_stat <= 1.0


def test_ks_drift_null_quality_doc_drops_on_both_engines(spark, sf_dir, tmp_path):
    """r10 ADVICE (medium): a NULL-quality doc (token-less text) must
    drop on BOTH engines. Spark F.least SKIPS NULLs, so without the
    NULL gate on the quality expression the doc would pin to the top
    cell while the oracle's WHERE quality IS NOT NULL drops it —
    divergent n_base/n_batch and CDFs. Built corpus: sf parquet plus
    one punctuation-only doc (zero tokens → NULL stop_ratio → NULL
    quality)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lenses_topology_example_spark.catalog import oracle_sql
    from lenses_topology_example_spark.tables import TABLES
    from tests.oracle import compare

    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")
    base = pq.read_table(f"{sf_dir}/documents.parquet")
    null_q = pa.table(
        {
            "doc_id": pa.array([10_000_001], pa.int64()),
            "text": pa.array(["!!! ??? ..."], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["synthetic"], pa.string()),
            "n_chars": pa.array([11], pa.int64()),
        }
    )
    pq.write_table(
        pa.concat_tables([base.select(null_q.column_names), null_q]),
        tmp_path / "documents.parquet",
    )
    got = _CATALOG["ks_drift"][0](spark, str(tmp_path))
    compare(got, oracle_sql()["ks_drift"], str(tmp_path))
    r = got.collect()[0]
    # the NULL-quality doc is excluded from both sides' counts
    base_counts = _CATALOG["ks_drift"][0](spark, sf_dir).collect()[0]
    assert r.n_base + r.n_batch == base_counts.n_base + base_counts.n_batch


def test_quantile_normalize_is_uniform_within_source(spark, sf_dir):
    rows = _CATALOG["quantile_normalize"][0](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(len(v) for v in by_src.values()) == n_docs
    for src, rs in by_src.items():
        n = len(rs)
        # the multiset of quantiles is exactly {(k-0.5)/n : k=1..n}
        got = sorted(r.q_uniform for r in rs)
        want = [(k - 0.5) / n for k in range(1, n + 1)]
        assert all(abs(g - w) < 1e-12 for g, w in zip(got, want))
        # monotone against the feature under the total order
        rs2 = sorted(rs, key=lambda r: (r.n_chars, r.doc_id))
        for x, y in zip(rs2, rs2[1:]):
            assert x.q_uniform < y.q_uniform


def test_gains_curve_accumulates_and_ends_at_one(spark, sf_dir):
    rows = _CATALOG["gains_curve"][0](spark, sf_dir).collect()
    # descending cells; cumulative shares are non-decreasing, end at 1
    assert all(
        a.cell > b.cell for a, b in zip(rows, rows[1:])
    )
    for a, b in zip(rows, rows[1:]):
        assert b.cum_share_pop >= a.cum_share_pop - 1e-12
        assert b.cum_share_pos >= a.cum_share_pos - 1e-12
    assert abs(rows[-1].cum_share_pop - 1.0) < 1e-12
    assert abs(rows[-1].cum_share_pos - 1.0) < 1e-12
    assert abs(rows[-1].cum_lift - 1.0) < 1e-12
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == n
    # lift recomputes from the shares on every row
    for r in rows:
        if r.cum_share_pop > 0:
            assert abs(r.cum_lift - r.cum_share_pos / r.cum_share_pop) < 1e-9


# --- seasonal_decompose / decayed_revenue (wave 8) --------------------------------


def test_seasonal_decompose_matches_python(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    from pyspark.sql import functions as F

    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("m"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("r"))
        .collect()
    )
    series = sorted((r.m, Decimal(r.r)) for r in monthly)
    revs = [float(v) for _, v in series]
    n = len(series)
    trend = [None] * n
    for i in range(6, n - 6):
        trend[i] = float(sum(v for _, v in series[i - 6 : i + 7])) / 13.0
    det = [
        (revs[i] - trend[i]) if trend[i] is not None else None
        for i in range(n)
    ]
    by_moy = defaultdict(list)
    for i, (m, _) in enumerate(series):
        if det[i] is not None:
            by_moy[m.month].append(det[i])
    seas = {k: sum(v) / len(v) for k, v in by_moy.items()}
    got = {
        r.month: r
        for r in _CATALOG["seasonal_decompose"][0](spark, sf_dir).collect()
    }
    assert len(got) == n
    for i, (m, _) in enumerate(series):
        r = got[m.strftime("%Y-%m")]
        assert abs(r.revenue - revs[i]) < 1e-6
        if trend[i] is None:
            assert r.trend is None and r.detrended is None
        else:
            assert abs(r.trend - trend[i]) < 1e-6
            assert abs(r.detrended - det[i]) < 1e-6
            if m.month in seas:
                assert abs(r.seasonal - seas[m.month]) < 1e-4
                assert abs(r.residual - (det[i] - r.seasonal)) < 1e-9
    # additivity: revenue == trend + seasonal + residual where defined
    for r in got.values():
        if r.residual is not None:
            assert (
                abs(r.revenue - (r.trend + r.seasonal + r.residual)) < 1e-6
            )


def test_decayed_revenue_matches_python_and_bounds(spark, sf_dir):
    from decimal import Decimal

    from lenses_topology_example_spark.operators.windows import (
        DECAY_ANCHOR,
        DECAY_FRAC,
    )
    import datetime

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderdate", "o_totalprice")
        .collect()
    )
    anchor = datetime.date.fromisoformat(DECAY_ANCHOR)
    agg = {}
    for r in rows:
        age = (anchor - r.o_orderdate.date()).days
        w = DECAY_FRAC[age % 180] / float(1 << (age // 180))
        wd = Decimal(f"{w:.6f}") if False else None
        # replicate decimal(9,6) HALF_UP of the exact double expansion
        from decimal import ROUND_HALF_UP

        wdec = Decimal(w).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        wv = wdec * Decimal(f"{r.o_totalprice:.2f}")
        n, raw, dec = agg.get(r.c_mktsegment, (0, Decimal(0), Decimal(0)))
        agg[r.c_mktsegment] = (
            n + 1,
            raw + Decimal(f"{r.o_totalprice:.2f}"),
            dec + wv,
        )
    got = {
        r.c_mktsegment: r
        for r in _CATALOG["decayed_revenue"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    from decimal import ROUND_HALF_UP

    for seg, (n, raw, dec) in agg.items():
        r = got[seg]
        assert r.n_orders == n
        assert abs(r.revenue_raw - float(raw)) < 1e-6
        dec4 = dec.quantize(Decimal("0.0001"), ROUND_HALF_UP)
        assert abs(r.revenue_decayed - float(dec4)) < 1e-9
        # decay strictly discounts: 0 < decayed < raw
        assert 0.0 < r.revenue_decayed < r.revenue_raw
        assert 0.0 < r.decay_ratio < 1.0


# --- streaming PSI drift twin (wave 9 infra) ---------------------------------------


def test_streaming_drift_psi_matches_batch(spark, sf_dir, tmp_path):
    """Stream the md5-parity-1 slice against the parity-0 base: the
    per-batch PSI report must equal q_drift_psi's rows EXACTLY (same
    bins, counts, terms, psi, verdict) — the builder is shared, so
    this pins the wiring (full-outer bin alignment, zero-fills)."""
    from pyspark.sql import functions as F

    from lenses_topology_example_spark.functions.texthash import md5_hash64
    from lenses_topology_example_spark.streaming.pipelines import (
        doc_quality_bins,
        start_drift_psi_stream,
    )
    from lenses_topology_example_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    parity = md5_hash64(F.col("doc_id").cast("string")) % 2
    base = docs.filter(parity == 0)
    batch = docs.filter(parity == 1)
    base_counts = (
        doc_quality_bins(base)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c_base"))
    )

    src = tmp_path / "drift_src"
    batch.select("doc_id", "text").write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    out = tmp_path / "drift_out"
    q = start_drift_psi_stream(
        stream, base_counts, str(out), str(tmp_path / "drift_ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cols = ("bin", "c_base", "c_batch", "psi_term", "psi", "verdict")
    streamed = {
        r["bin"]: tuple(r[c] for c in cols)
        for r in spark.read.parquet(str(out)).collect()
    }
    want = {
        r["bin"]: tuple(r[c] for c in cols)
        for r in _CATALOG["drift_psi"][0](spark, sf_dir).collect()
    }
    assert streamed == want


# --- interp_quantiles (wave 10) ------------------------------------------------------


def test_interp_quantiles_matches_numpy(spark, sf_dir):
    """numpy.percentile with interpolation='linear' implements the same
    SQL-standard definition; replicate per type and compare, plus the
    bracketing invariants (monotone in p, value between bracket
    values)."""
    import numpy as np

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
    got = {}
    for r in _CATALOG["interp_quantiles"][0](spark, sf_dir).collect():
        got[(r.event_type, r.p)] = r
    for t, vals in by_type.items():
        vals.sort()
        xs = np.array([v for v, _ in vals])
        prev = None
        for p in (0.25, 0.5, 0.75, 0.9):
            r = got[(t, p)]
            want = float(np.percentile(xs, p * 100, method="linear"))
            assert abs(r.value - want) < 1e-9, (t, p)
            assert r.n == len(xs)
            assert r.lo_rank <= r.hi_rank <= r.lo_rank + 1
            if prev is not None:
                assert r.value >= prev - 1e-12  # monotone in p
            prev = r.value
