"""The 2^53 decimal-boundary audit (r10 VERDICT ask #2).

The round-10 latent class (BASELINE.md): when an exact decimal sum's
integer units exceed 2^53, CAST(sum AS DOUBLE) is single-rounded by
Spark (BigDecimal) but DOUBLE-ROUNDED by DuckDB (int128 → double,
then / 10^scale) — a real 1-ulp cross-engine divergence. The hazard
follows the STORED decimal scale (DECIMAL(38,6) divides by 1e6 even
when the value happens to be 4dp-clean), so the fix of record
re-rounds the sum to scale 4 — which REDUCES the stored scale on both
engines (probed: DuckDB ROUND(DECIMAL(38,6),4) returns a scale-4
decimal) — before the double cast (dsum4 / the decayed_revenue rule).

Enforcement, two layers:
1. Value sweep: run every oracle in DuckDB at the test SF; for each
   double output column that is decimal-derived (every value shows
   ≤ 6 fractional digits in shortest repr), project its max magnitude
   to sf1.0 (linear in SF). Columns projecting past 2^53/1e6 ≈ 9.0e9
   must be in the DSUM4_FIXED allowlist — a NEW whole-table revenue
   sum added with plain dsum trips this immediately.
2. Fingerprint check: every allowlisted entry's oracle SQL must still
   carry the dsum4 fingerprint "), 4) AS DOUBLE" (value inspection
   alone cannot distinguish a rounded sum from an unrounded sum whose
   data is coincidentally 4dp-clean — price×(1−discount) products are
   mathematically 4dp), and its values must project under the scale-4
   line 2^53/1e4 ≈ 9.0e11.

Limitations (documented, reviewed by hand in round 11): ratio columns
(averages, shares) carry no inferable grain and are skipped — their
inner sums were audited by review; important_parts' whole-lineitem
threshold sum was the one hidden crosser, fixed the same way.
DuckDB-only: no Spark session needed, so the audit costs seconds.
"""

from __future__ import annotations

import math
import os
import re
from decimal import Decimal

from lenses_topology_example_spark.catalog import oracle_sql
from tests.oracle import duck_connection, oracle_result

TWO_53 = float(2**53)
SCALE6_LINE = TWO_53 / 1e6  # ~9.0e9: plain dsum's safe ceiling
SCALE4_LINE = TWO_53 / 1e4  # ~9.0e11: dsum4's safe ceiling
MAX_DECIMAL_SCALE = 6  # the house discipline's finest grain (dsum)

# (entry, column) pairs fixed with the scale-4 re-round in round 11
# (plus decayed_revenue, the round-10 fix of record). Each must keep
# the ROUND fingerprint in its oracle SQL — layer 2 below.
DSUM4_FIXED = {
    ("agg_revenue", "sum_base_price"),
    ("agg_revenue", "sum_disc_price"),
    ("agg_revenue", "sum_charge"),
    ("rollup_sales", "revenue"),
    ("join_orders_customer", "revenue"),
    ("region_revenue", "revenue"),
    ("ltv_curve", "cum_revenue"),
    ("agg_delta_merge", "revenue"),
    ("decayed_revenue", "revenue_raw"),
    ("decayed_revenue", "revenue_decayed"),
    # round 13: the sink read-back audit's whole-currency revenue sum
    # (operators/sinks.py) — dsum4 on both engines from registration
    ("sink_parquet", "sum_amount_xchg"),
}
DSUM4_FINGERPRINT = re.compile(r",\s*4\s*\)\s*AS\s+DOUBLE", re.IGNORECASE)


def _decimal_scale(values: list[float]) -> int | None:
    """Max fractional-digit count across values (shortest repr), or
    None past MAX_DECIMAL_SCALE (ratio-like column, skipped)."""
    col_scale = 0
    for v in values:
        exp = Decimal(repr(v)).normalize().as_tuple().exponent
        s = max(0, -exp)
        if s > MAX_DECIMAL_SCALE:
            return None
        col_scale = max(col_scale, s)
    return col_scale


def test_no_unrounded_sum_crosses_2_53_at_sf1(sf_dir):
    from tests.oracle import warm_cache

    # concurrent 8-thread cache fill (r15 VERDICT ask #3): this test
    # is alphabetically the suite's FIRST full-catalog oracle consumer,
    # so it used to pay the ~22 s serial DuckDB sweep that parity then
    # read from cache
    warm_cache(sf_dir)
    sf = float(re.search(r"sf([0-9.]+)", os.path.basename(sf_dir)).group(1))
    projection = 1.0 / sf  # test SF -> sf1.0
    con = duck_connection(sf_dir)
    offenders = []
    seen_allowlisted = set()
    for name, sql in sorted(oracle_sql().items()):
        # session-memoized execution shared with the parity tier (r14
        # VERDICT ask #5): type strings come from the DuckDB plan, so
        # DECIMAL/HUGEINT (float64 in pandas) still read as themselves
        df, cols, types = oracle_result(sql, sf_dir, con=con)
        dbl_cols = [
            c for c, t in zip(cols, types) if t.upper() == "DOUBLE"
        ]
        if not dbl_cols:
            continue
        for c in dbl_cols:
            vals = [
                v
                for v in df[c].tolist()
                if v is not None and math.isfinite(v)
            ]
            if not vals or _decimal_scale(vals) is None:
                continue
            projected = max(abs(v) for v in vals) * projection
            if projected <= SCALE6_LINE:
                continue
            if (name, c) in DSUM4_FIXED:
                seen_allowlisted.add((name, c))
                if projected > SCALE4_LINE:
                    offenders.append(
                        f"{name}.{c}: projects to {projected:.3g} at "
                        f"sf1.0 — past even the scale-4 line; round to "
                        f"a coarser scale"
                    )
                continue
            offenders.append(
                f"{name}.{c}: decimal-derived, projects to "
                f"{projected:.3g} at sf1.0 (> {SCALE6_LINE:.3g}) — "
                f"re-round via dsum4 / ROUND(...,4) before the double "
                f"cast, then add to DSUM4_FIXED"
            )
    # layer 2: every allowlisted entry keeps its ROUND fingerprint
    sqls = oracle_sql()
    for name in sorted({n for n, _ in DSUM4_FIXED}):
        if not DSUM4_FINGERPRINT.search(sqls[name]):
            offenders.append(
                f"{name}: in DSUM4_FIXED but its oracle SQL has no "
                f"ROUND(...,4) AS DOUBLE fingerprint — the re-round "
                f"was removed?"
            )
    con.close()
    assert not offenders, "\n".join(offenders)
