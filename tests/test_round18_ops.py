"""Round-18 optimization equivalence pins.

Two catalog entries were restructured for plan shape this round
(OPTIMIZATION_r18.md §1-§2); their outputs are oracle-proved at two
SFs, but the *internal* equivalences the rewrites rest on are pinned
here so a future edit cannot silently drift them:

1. dedup_tfidf_cosine's weighted index: df established as a window
   count over the single (doc_id, shingle, tf) pass must equal the old
   aggregate-then-join form.
2. embed_pca_power's per-row decimal(38,6) array fold must equal the
   grouped decimal SUM over the exploded rows (the matvec's dot leg).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from lenses_topology_example_spark.operators.dedup import (
    TFIDF_COS_DF_CAP,
    _doc_tokens,
    shingles_col,
)
from lenses_topology_example_spark.operators.similarity import emb_base
from lenses_topology_example_spark.tables import load_table


def test_tfidf_index_window_df_equals_agg_join(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    sh = (
        toks.select(
            "doc_id", F.explode(shingles_col(F.col("t"))).alias("shingle")
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    def weighted(frame):
        return frame.filter(
            F.col("df") <= F.lit(TFIDF_COS_DF_CAP)
        ).crossJoin(F.broadcast(n_docs)).select(
            "doc_id",
            "shingle",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")),
                4,
            ).alias("w"),
        )

    old = weighted(
        sh.join(
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")),
            "shingle",
        )
    )
    new = weighted(
        sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
    )
    assert old.exceptAll(new).isEmpty()
    assert new.exceptAll(old).isEmpty()


def test_pca_array_fold_equals_exploded_decimal_sum(spark, sf_dir):
    emb = emb_base(spark, sf_dir).select("vec_id", "v")
    folded = emb.select(
        "vec_id",
        F.aggregate(
            "v",
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: acc + x.cast("decimal(38,6)"),
        )
        .cast("double")
        .alias("dot"),
    )
    exploded = (
        emb.select("vec_id", F.posexplode("v").alias("dim", "val"))
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("val").cast("decimal(38,6)"))
            .cast("double")
            .alias("dot")
        )
    )
    assert folded.exceptAll(exploded).isEmpty()
    assert exploded.exceptAll(folded).isEmpty()
