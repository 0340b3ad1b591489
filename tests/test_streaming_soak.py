"""Round-12 depth artifact (r11 VERDICT ask #8b): multi-batch soak of
the four round-11 stateful streaming twins ACROSS A CHECKPOINT
RECOVERY. The round-11 twin tests pin final-batch parity within one
query instance; what they cannot see is the restart path — a new
query instance resuming from the checkpoint must (a) continue the
batch_id sequence instead of resetting, (b) rehydrate cumulative
state from the per-batch-id parquet layout, and (c) land on exactly
the batch operator's answer for the full input. All three failed
silently in designs that keep state in a foreachBatch closure; these
tests make the restart contract executable.

Shape shared by all four: the input is written as SIX single-file
appends; phase one streams the first three (maxFilesPerTrigger=1 →
batches 0..2), the query STOPS, the remaining three files appear, and
a brand-new query instance on the SAME checkpoint drains them
(batches 3..5)."""

from __future__ import annotations

import glob as _glob

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.tables import load_table

N_SLICES = 6
CUT = 3  # restart boundary: slices [0, CUT) before, [CUT, N) after


def _write_slices(df, key_col, src, lo, hi):
    """Append per-slice single files so maxFilesPerTrigger=1 yields one
    micro-batch per slice. Only [lo, hi) is written — phase two must
    APPEND the new slices, never rewrite the old ones (an overwrite
    mints new filenames the file source would reprocess as fresh
    batches, double-counting the cumulative state)."""
    for i in range(lo, hi):
        mode = "overwrite" if i == 0 else "append"
        df.filter(f"{key_col} % {N_SLICES} = {i}").coalesce(1).write.mode(
            mode
        ).parquet(str(src))


def _batch_ids(out_glob: str) -> list[int]:
    return sorted(
        int(p.rsplit("=", 1)[1]) for p in _glob.glob(out_glob)
    )


def test_soak_bandit_recovers_state_across_restart(spark, sf_dir, tmp_path):
    from lenses_topology_example_spark.streaming.pipelines import (
        start_bandit_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = tmp_path / "soak_bandit_src"
    out = str(tmp_path / "soak_bandit_out")
    ckpt = str(tmp_path / "soak_bandit_ckpt")
    schema = (
        "event_id bigint, user_id bigint, event_type string, value double"
    )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = start_bandit_stream(stream, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_slices(ev, "event_id", src, 0, CUT)
    drain()
    ids_before = _batch_ids(f"{out}/report/batch_id=*")
    assert ids_before == [0, 1, 2]

    _write_slices(ev, "event_id", src, CUT, N_SLICES)  # reveal slices 3..5
    drain()  # NEW query instance, same checkpoint
    ids_after = _batch_ids(f"{out}/report/batch_id=*")
    assert ids_after == [0, 1, 2, 3, 4, 5], (
        "restart reset or skipped batch ids — checkpoint recovery broke"
    )

    streamed = {
        r.arm: (r.n, r.n_conv, r.conv_rate, r.ucb_score, r.chosen)
        for r in spark.read.parquet(f"{out}/report/batch_id=5").collect()
    }
    want = {
        r.arm: (r.n, r.n_conv, r.conv_rate, r.ucb_score, r.chosen)
        for r in _CATALOG["bandit_ucb"][0](spark, sf_dir).collect()
    }
    assert streamed == want


def test_soak_conformal_recovers_state_across_restart(
    spark, sf_dir, tmp_path
):
    from lenses_topology_example_spark.streaming.pipelines import (
        start_conformal_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = tmp_path / "soak_conf_src"
    out = str(tmp_path / "soak_conf_out")
    ckpt = str(tmp_path / "soak_conf_ckpt")
    schema = "vec_id bigint, embedding array<float>, label int"

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = start_conformal_stream(stream, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_slices(emb, "vec_id", src, 0, CUT)
    drain()
    assert _batch_ids(f"{out}/report/batch_id=*") == [0, 1, 2]

    _write_slices(emb, "vec_id", src, CUT, N_SLICES)
    drain()
    assert _batch_ids(f"{out}/report/batch_id=*") == [0, 1, 2, 3, 4, 5]

    s = spark.read.parquet(f"{out}/report/batch_id=5").collect()[0]
    b = _CATALOG["conformal_threshold"][0](spark, sf_dir).collect()[0]
    assert (s.n_cal, s.n_eval, s.q_hat, s.n_covered, s.coverage) == (
        b.n_cal,
        b.n_eval,
        b.q_hat,
        b.n_covered,
        b.coverage,
    )


def test_soak_gs_recovers_state_across_restart(spark, sf_dir, tmp_path):
    from lenses_topology_example_spark.streaming.pipelines import (
        start_gs_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_planned = ev.filter("event_type = 'purchase'").count()
    src = tmp_path / "soak_gs_src"
    out = str(tmp_path / "soak_gs_out")
    ckpt = str(tmp_path / "soak_gs_ckpt")
    schema = (
        "event_id bigint, user_id bigint, event_type string, value double"
    )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = start_gs_stream(stream, n_planned, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_slices(ev, "event_id", src, 0, CUT)
    drain()
    assert _batch_ids(f"{out}/report/batch_id=*") == [0, 1, 2]

    _write_slices(ev, "event_id", src, CUT, N_SLICES)
    drain()
    assert _batch_ids(f"{out}/report/batch_id=*") == [0, 1, 2, 3, 4, 5]

    s = spark.read.parquet(f"{out}/report/batch_id=5").collect()[0]
    want = _CATALOG["group_sequential"][0](spark, sf_dir).collect()[-1]
    assert (s.cn0, s.cn1) == (want.n_cum_0, want.n_cum_1)
    assert s.z_cum == want.z_cum
    assert s.info_frac == want.info_frac == 1.0
    assert s.boundary == want.boundary
    assert s.crossed == want.crossed


def test_soak_oov_continues_batch_ids_and_counts_add_up(
    spark, sf_dir, tmp_path
):
    """OOV's state is the frozen vocab (per-batch reports, no carry),
    so the restart contract is: batch ids continue, and the ADDITIVE
    columns (n_tokens, n_oov) summed over every per-batch report equal
    the whole-corpus report — rates are ratios and n_oov_types is a
    distinct-count, neither is additive, so they are excluded by
    design."""
    from lenses_topology_example_spark.operators.text import (
        corpus_head_vocab,
        oov_source_report,
    )
    from lenses_topology_example_spark.streaming.pipelines import (
        start_oov_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    vocab = corpus_head_vocab(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    src = tmp_path / "soak_oov_src"
    out = str(tmp_path / "soak_oov_out")
    ckpt = str(tmp_path / "soak_oov_ckpt")
    schema = "doc_id long, text string, source string"

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = start_oov_stream(stream, vocab, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_slices(docs, "doc_id", src, 0, CUT)
    drain()
    assert _batch_ids(f"{out}/batch_id=*") == [0, 1, 2]

    _write_slices(docs, "doc_id", src, CUT, N_SLICES)
    drain()
    assert _batch_ids(f"{out}/batch_id=*") == [0, 1, 2, 3, 4, 5]

    per_batch = spark.read.option("basePath", out).parquet(
        *(f"{out}/batch_id={i}" for i in range(N_SLICES))
    )
    got = {
        r.source: (r.tok, r.oov)
        for r in per_batch.groupBy("source")
        .agg({"n_tokens": "sum", "n_oov": "sum"})
        .withColumnRenamed("sum(n_tokens)", "tok")
        .withColumnRenamed("sum(n_oov)", "oov")
        .collect()
    }
    want = {
        r.source: (r.n_tokens, r.n_oov)
        for r in oov_source_report(docs, vocab).collect()
    }
    assert got == want
