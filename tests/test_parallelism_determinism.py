"""The repo's central determinism claim — decimal-disciplined sums,
round-tripped ratios, and tie-broken orders are IDENTICAL at any
parallelism — tested directly: repartition every input to different
partition counts (changing partial-aggregation accumulation order) and
require bit-identical results.

The single-row-group testdata means scan splits never vary locally, so
the lever is an input-side repartition injected through each operator
module's load_table binding (modules import the symbol, so the patch is
per-module)."""

from __future__ import annotations

import math

import pytest

from lenses_topology_example_spark import tables


def _canon_rows(df):
    rows = []
    for r in df.collect():
        vals = []
        for c in sorted(df.columns):
            v = r[c]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append((type(v).__name__, v))
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


def _run_with_parts(spark, sf_dir, module, fn_name, n_parts):
    """Run module.fn with its input binding wrapped to repartition(n_parts).

    Modules that scan tables directly are patched through their
    load_table import. embed_stats consumers read through the shared,
    memo-persisted similarity.emb_base frame (round 17), so the
    repartition is injected AFTER that frame instead — same lever
    (partial-aggregation accumulation order downstream of the input),
    and it sidesteps the memo, which would otherwise serve the first
    run's partitioning to every later run."""
    if hasattr(module, "load_table"):
        orig = module.load_table

        def repartitioned(s, d, t):
            df = tables.load_table(s, d, t)
            return df.repartition(n_parts) if n_parts else df

        module.load_table = repartitioned
        try:
            return _canon_rows(getattr(module, fn_name)(spark, sf_dir))
        finally:
            module.load_table = orig

    from lenses_topology_example_spark.operators import similarity

    orig = module.emb_base

    def repartitioned_base(s, d):
        df = similarity.emb_base(s, d)
        return df.repartition(n_parts) if n_parts else df

    module.emb_base = repartitioned_base
    try:
        return _canon_rows(getattr(module, fn_name)(spark, sf_dir))
    finally:
        module.emb_base = orig


# (module path, query fn) — the accumulation-order-sensitive classes:
# decimal sums over doubles, round-tripped ratios/logs, exact moments,
# per-edge-rounded fixed-iteration propagation, centroid means.
_CASES = [
    ("lenses_topology_example_spark.operators.relational", "q_agg_revenue"),
    ("lenses_topology_example_spark.operators.text", "q_lm_score"),
    ("lenses_topology_example_spark.operators.sketches", "q_corr_text_embedding"),
    ("lenses_topology_example_spark.operators.dedup", "q_source_pagerank"),
    ("lenses_topology_example_spark.operators.embed_stats", "q_kmeans_refine"),
    ("lenses_topology_example_spark.operators.windows", "q_interarrival_stats"),
    # round 9: scalar-threshold shapes — a decimal-exact sum feeds a
    # double-divide average whose 1.2x/1.25x comparison must admit the
    # SAME boundary rows at any accumulation order
    ("lenses_topology_example_spark.operators.relational3", "q_important_parts"),
    ("lenses_topology_example_spark.operators.relational3", "q_shipping_priority"),
]


@pytest.mark.parametrize("modpath,fn", _CASES)
def test_bit_identical_across_partitionings(spark, sf_dir, modpath, fn):
    import importlib

    module = importlib.import_module(modpath)
    base = _run_with_parts(spark, sf_dir, module, fn, None)
    one = _run_with_parts(spark, sf_dir, module, fn, 1)
    seven = _run_with_parts(spark, sf_dir, module, fn, 7)
    assert base == one, f"{fn}: 1-partition run diverged"
    assert base == seven, f"{fn}: 7-partition run diverged"
