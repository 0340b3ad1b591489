"""Pins for the mechanized rotation protocol (tools/rotation_plan.py,
head detection mechanized round 14 per r13 ADVICE). Pure-Python — no
Spark session."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.rotation_plan import (  # noqa: E402
    FINGERPRINT_FILE,
    contract_fingerprint,
    is_clean,
)


def test_hash_false_is_red():
    """The r13 sink_parquet form: rows+schema green, hash_match=false
    — the OLD tool's cleanliness check looked only at rows_match/err
    and would have aged it out instead of holding it in-window."""
    assert not is_clean(
        {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    )


def test_rows_only_and_green_rows_are_clean():
    assert is_clean(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    )
    # rows-only / property-paired entries have no hash key at all
    assert is_clean({"rows_match": True, "schema_match": True, "err": None})
    assert not is_clean({"rows_match": False, "schema_match": True, "err": None})
    assert not is_clean(
        {"rows_match": True, "schema_match": True, "err": "boom"}
    )


def test_fingerprint_ignores_comments_but_not_code():
    def f1(spark, sf):
        return spark.range(1)

    def f2(spark, sf):  # a comment that must not change the hash
        return spark.range(1)

    def f3(spark, sf):
        return spark.range(2)

    # same normalized source modulo comments/def name? def name differs,
    # so compare each against itself and a code change
    a = contract_fingerprint(f1, "SELECT 1")
    assert a == contract_fingerprint(f1, "SELECT 1")
    assert a != contract_fingerprint(f1, "SELECT 2")  # oracle change
    assert contract_fingerprint(f3, "SELECT 1") != contract_fingerprint(
        f1, "SELECT 1"
    )  # code change


def test_fingerprint_sees_edits_after_hash_inside_string_literal():
    """r14 ADVICE: the old ln.split('#') comment stripper truncated
    code at a '#' INSIDE a string literal (F.concat_ws("#", ...)), so
    a contract edit anywhere after the '#' on that line was invisible
    to head detection. The tokenize-based stripper must see it."""

    def g1(spark, sf):
        return spark.sql("SELECT concat_ws('#', a, b) AS k FROM t")

    def g2(spark, sf):
        return spark.sql("SELECT concat_ws('#', a, c) AS k FROM t")

    assert contract_fingerprint(g1, "SELECT 1") != contract_fingerprint(
        g2, "SELECT 1"
    )


def test_fingerprint_snapshot_covers_every_catalog_entry():
    """The committed snapshot must stay total over the catalog: a new
    registration missing from it would be headed as 'no verdict'
    anyway, but a STALE file silently disables contract-change
    detection for renamed entries."""
    from lenses_topology_example_spark.catalog import _CATALOG

    recorded = json.load(open(FINGERPRINT_FILE))
    missing = [n for n in _CATALOG if n not in recorded]
    stale = [n for n in recorded if n not in _CATALOG]
    assert not missing, f"entries without a fingerprint: {missing[:5]}"
    assert not stale, f"fingerprints for unregistered entries: {stale[:5]}"
