"""The ONE dtype-strict canonicalization used by both local replicas of
the driver's correctness gate — tests/oracle.py (pytest, sf0.001) and
tools/driver_sim.py (driver replica, sf0.01/0.1). Previously each
carried its own copy kept in sync by comment discipline only (r8
VERDICT ask #6); a drift between them would let pytest pass a value the
driver hashes differently.

Semantics (round 2): carries a numeric-class tag so that int64 `1` vs
float64 `1.0` MISMATCH, exactly like the driver's hash — DuckDB HUGEINT
window-SUMs land in pandas as float64 and the loose Python `==` canon
passed two queries the driver failed.

Decimal (round 15, r14 VERDICT ask #1): decimal.Decimal carries its OWN
class tag, distinct from float. The pre-r15 canon folded Decimal into
float-class "because duckdb.df() renders DECIMAL as float64" — but that
forgave exactly the divergence the driver punishes: Spark toPandas
yields object decimal.Decimal for DecimalType outputs, DuckDB yields
float64, and the driver's dtype-strict hash split on it two rounds in a
row (sink_parquet) while both replicas MATCHed. A Decimal on either
side now mismatches a float64 on the other, so the replica reproduces
the driver's verdict instead of masking the class.
"""

from __future__ import annotations

import math
from decimal import Decimal

import numpy as np


def canon(v):
    """Dtype-strict canonical value (see module docstring)."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, Decimal):
        # distinct class tag: a Decimal must NOT compare equal to the
        # float64 the other engine landed — that is the driver's
        # behavior (see module docstring). Normalize NaN like the float
        # branch (r15 ADVICE: Decimal('NaN') != itself, so the raw
        # value would spuriously mismatch), and compare >2^53
        # magnitudes by exact normalized string — float(v) collapses
        # distinct integers above 2^53 into one double.
        if v.is_nan():
            return ("dec", "NaN")
        if v.is_finite():
            # exact normalized string for EVERY finite Decimal (r16
            # ADVICE): float(v) collapsed values differing only beyond
            # double precision — integers >2^53 (fixed r15) but also
            # fractional scale (1.00000000000000001 vs 1.0). The class
            # tag already prevents cross-class equality, so float
            # comparability is not needed. Zero-sign normalized first
            # (r17 ADVICE): Decimal('-0').normalize() stringifies as
            # '-0' and would spuriously mismatch '0'; the float path
            # treated them equal, so the decimal path must too.
            if v == 0:
                v = abs(v)
            return ("dec", str(v.normalize()))
        return ("dec", float(v))
    if isinstance(v, float):
        return ("f", "NaN") if math.isnan(v) else ("f", v)
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, np.generic):
        return canon(v.item())
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(canon(x) for x in v))
    return v


def canon_rows(pdf) -> list[tuple]:
    """Column-name-sorted, canonicalized, deterministically ordered rows
    of a pandas frame. Both replicas compare sorted lists for equality,
    so any total order shared by the two sides is equivalent to the
    driver's order-insensitive multiset hash; the str-keyed sort below
    is total even when a column mixes None with tuples."""
    cols = sorted(pdf.columns)
    out = [
        tuple(canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    ]
    return sorted(
        out, key=lambda r: tuple((str(type(x)), str(x)) for x in r)
    )
