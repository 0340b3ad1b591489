"""Semantic pins for the round-6 operators beyond oracle parity:
invariants the hash-match can't articulate (subset/equality relations
between variants, status partitioning, balance-ratio algebra)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lenses_topology_example_spark.operators.dedup import (
    MAX_SEG_BLOCK_DF,
    q_dedup_incremental,
    q_dedup_lines_near,
    q_dedup_lines_near_capped,
)
from lenses_topology_example_spark.operators.text import (
    N_OUTPUT_SHARDS,
    q_corpus_rebalance,
    q_shard_plan,
)
from lenses_topology_example_spark.tables import load_table


def _pairs(df):
    return {
        (r["doc_a"], r["pos_a"], r["doc_b"], r["pos_b"]) for r in df.collect()
    }


def test_capped_seg_neardup_is_subset_and_equal_at_low_df(spark, sf_dir):
    """The df-cap can only REMOVE pairs (hot-key-only candidates are
    lost, never added), and at the test SF the max block-key frequency
    (7, measured) is under MAX_SEG_BLOCK_DF, so the capped output must
    equal the provably-complete uncapped one exactly."""
    uncapped = _pairs(q_dedup_lines_near(spark, sf_dir))
    capped = _pairs(q_dedup_lines_near_capped(spark, sf_dir))
    assert capped <= uncapped
    assert MAX_SEG_BLOCK_DF == 20
    assert capped == uncapped, (
        "cap bit at test SF — key frequencies grew past MAX_SEG_BLOCK_DF; "
        "re-probe and update the subset-only expectation"
    )


def test_dedup_incremental_partitions_incoming(spark, sf_dir):
    out = q_dedup_incremental(spark, sf_dir)
    rows = out.collect()
    statuses = {r["status"] for r in rows}
    assert statuses <= {"exact", "near_dup", "new"}
    # one classification per incoming doc (the md5-parity split)
    n_inc = (
        load_table(spark, sf_dir, "documents")
        .filter(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
            == 1
        )
        .count()
    )
    assert len(rows) == n_inc
    assert len({r["doc_id"] for r in rows}) == n_inc


def test_dedup_incremental_exact_status(spark, tmp_path_factory):
    """A crafted corpus where parity is known: text copied across the
    parity split must classify as 'exact'; a unique incoming text with
    no shingle overlap as 'new'."""
    d = tmp_path_factory.mktemp("inc")
    # find doc_ids of each parity deterministically via the same md5 rule
    import hashlib

    def parity(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 2

    base_ids = [i for i in range(40) if parity(i) == 0]
    inc_ids = [i for i in range(40) if parity(i) == 1]
    shared = "the quick brown fox jumps over the lazy dog again and again"
    unique = "zzz qqq xxx vvv kkk jjj www uuu yyy ttt rrr eee"
    rows = [(base_ids[0], shared, "en", "s", len(shared))]
    rows += [(inc_ids[0], shared, "en", "s", len(shared))]  # exact dup
    rows += [(inc_ids[1], unique, "en", "s", len(unique))]  # brand new
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r["doc_id"]: r["status"]
        for r in q_dedup_incremental(spark, str(d)).collect()
    }
    assert out[inc_ids[0]] == "exact"
    assert out[inc_ids[1]] == "new"
    assert base_ids[0] not in out  # base side is never classified


def test_shard_plan_balance_algebra(spark, sf_dir):
    rows = q_shard_plan(spark, sf_dir).collect()
    assert len(rows) <= N_OUTPUT_SHARDS
    assert all(0 <= r["shard"] < N_OUTPUT_SHARDS for r in rows)
    # load_ratio is n_tokens*N/total, so the ratios sum to N (when all
    # shards are non-empty, which they are at every test SF)
    assert sum(r["load_ratio"] for r in rows) == pytest.approx(
        N_OUTPUT_SHARDS, rel=1e-9
    )


def test_corpus_rebalance_rates(spark, sf_dir):
    rows = q_corpus_rebalance(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0 < r["sample_rate"] <= 1.0
        assert r["sampled_tokens"] <= r["n_tokens"] + 1e-9
        if r["n_tokens"] <= target:
            assert r["sample_rate"] == 1.0
        else:
            assert r["sampled_tokens"] == pytest.approx(target, rel=1e-9)
    # down-sample-only rebalance never exceeds the uniform budget
    assert sum(r["sampled_tokens"] for r in rows) <= total + 1e-6


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom membership has one-sided error: every doc the exact pass
    flags must be flagged by the bloom pass with n_flagged >= n_shared
    (a truly shared shingle probes only set bits). The reverse need not
    hold (false positives are the documented price)."""
    from lenses_topology_example_spark.operators.dedup import (
        q_decontaminate,
        q_decontaminate_bloom,
    )

    exact = {
        r["doc_id"]: r["n_shared"]
        for r in q_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in q_decontaminate_bloom(spark, sf_dir).collect()
    }
    assert exact, "exact pass found nothing — fixture drift?"
    for doc, n_shared in exact.items():
        assert doc in bloom, f"bloom missed exact-flagged doc {doc}"
        assert bloom[doc] >= n_shared
