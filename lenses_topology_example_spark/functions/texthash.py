"""Deterministic, engine-portable hashing expressions.

Spark's native hash()/xxhash64() are Murmur3/xxHash with Spark-specific
seeds — not reproducible in other engines. For oracle-checked operators
(MinHash, fingerprints) we derive integer hashes from md5, which every
engine computes identically, then do all downstream mixing in explicit
int64 arithmetic kept below 2^63 by modding with a 1e9-scale prime.

All expressions here are built-in Catalyst functions — whole-stage
codegen applies; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Large primes for mixing; products stay < 2^63 because operands are
# first reduced mod MOD (< 2^30 * ~2) and multipliers are < 2^21.
MOD = 1_000_000_007
MIX = 1_000_003


def md5_hash64(col: Column) -> Column:
    """First 15 hex digits of md5 -> int64 in [0, 2^60). Engine-portable:
    DuckDB twin is ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash_mod(col: Column) -> Column:
    """md5-derived hash reduced mod MOD — safe operand for mixing."""
    return md5_hash64(col) % MOD


def minhash_component(hashes: Column, a: int, b: int) -> Column:
    """min over the shingle-hash array under the affine map
    h -> (a*h + b) mod MOD. a,b < 2^21 keeps a*h < 2^51."""
    return F.array_min(
        F.transform(hashes, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MOD))
    )


def polynomial_fingerprint(tokens: Column) -> Column:
    """Rolling polynomial hash over a token array:
    acc = (acc*MIX + tokval) mod MOD, tokval = len(t)*131 + ascii(t[0]).

    DuckDB twin: list_reduce(list_prepend(0, list_transform(...)), ...).
    """
    tokval = lambda t: (F.length(t) * F.lit(131) + F.ascii(F.substring(t, 1, 1)))
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(MIX) + tokval(t)) % F.lit(MOD),
    )


# SQL twins (DuckDB) -----------------------------------------------------------

SQL_MD5_HASH64 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
SQL_MD5_HASH_MOD = f"({SQL_MD5_HASH64} % {MOD})"


def sql_minhash_component(hashes_expr: str, a: int, b: int) -> str:
    return (
        f"list_min(list_transform({hashes_expr}, "
        f"h -> (h * {a} + {b}) % {MOD}))"
    )


def sql_polynomial_fingerprint(tokens_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_expr}, "
        f"t -> CAST(length(t) * 131 + ascii(substr(t, 1, 1)) AS BIGINT))), "
        f"(acc, v) -> (acc * {MIX} + v) % {MOD})"
    )
