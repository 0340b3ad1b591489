"""dedup_keeper_quality semantics: same cluster membership as
dedup_cluster, and the keeper really is the argmax-quality member."""

from __future__ import annotations

from collections import defaultdict

from lenses_topology_example_spark.catalog import _CATALOG


def test_keeper_is_cluster_quality_argmax(spark, sf_dir):
    keepers = _CATALOG["dedup_keeper_quality"][0](spark, sf_dir).collect()
    clusters = _CATALOG["dedup_cluster"][0](spark, sf_dir).collect()
    quality = {
        r.doc_id: round(r.quality, 6)
        for r in _CATALOG["quality_score"][0](spark, sf_dir).collect()
    }

    members = defaultdict(list)
    for r in clusters:
        members[r.cluster_id].append(r.doc_id)

    assert {r.cluster_id for r in keepers} == set(members)
    for r in keepers:
        docs = members[r.cluster_id]
        assert r.n_members == len(docs)
        best = min(docs, key=lambda d: (-quality[d], d))
        assert r.keeper_id == best
        assert r.keeper_id in docs
        assert abs(r.keeper_quality - quality[best]) < 1e-9
        assert r.min_quality <= r.keeper_quality
