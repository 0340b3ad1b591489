"""Hybrid retrieval (training-data tier, SURVEY.md §2.6): reciprocal-
rank fusion of the lexical (BM25) and semantic (cosine ANN) rankers —
the standard production retrieval stack (lexical recall + embedding
recall fused rank-wise, e.g. Elasticsearch/Vespa hybrid search, RRF per
Cormack & Clarke SIGIR'09). A curation pipeline uses exactly this to
pull topical slices whose phrasing differs from the query terms: BM25
alone misses paraphrases, cosine alone misses rare exact terms; RRF
needs no score calibration between the two scales because it consumes
only the RANKS.

Reference scope note: the reference (lensesio/lenses-topology-example)
exhibits only Kafka topology plumbing (kafka/App.java, PaymentsService
.java); retrieval operators are part of this repo's §2.6 extension
surface, built Spark-first.

Determinism contract (repo standard): both legs produce integer ranks
from total orders (score DESC, doc_id ASC — bit-identical scores, see
text.q_bm25_search and similarity.q_sim_topk whose plans these legs
reuse); the fused score is a fixed two-term double expression over
integer ranks (1/(K+r_lex) + 1/(K+r_sem), each term or 0.0, same
operation order both engines), so it is bit-identical cross-engine; the
final ordering tie-breaks on doc_id.

Scale shape (100 TB): each leg ends in a WindowGroupLimit partial top-k
over |queries| partitions, so the fusion join sees two |Q|·k-row
bounded frames — never corpus-scale. The BM25 leg's corpus-scale work
is one term-filtered explode (the IN-list evaluates in codegen ahead of
the shuffle); the semantic leg is the sim_topk broadcast join (fixed
plan size however many query vectors). The fusion itself is a bounded
full-outer hash join on (query_id, doc_id) + one rank window over |Q|
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..tables import load_table
from .similarity import as_double, cosine_prenorm, dot
from .text import (
    BM25_QUERIES,
    BM25_TOP_K,
    SQL_BM25_SEARCH,
    q_bm25_search,
)

# RRF smoothing constant (the canonical k=60 of Cormack & Clarke).
RRF_K = 60
# fused list depth; both legs feed their own top-BM25_TOP_K candidates
HYBRID_TOP_K = 5
# query_id -> the embedding that represents the query in the semantic
# leg. vec_id and doc_id are the aligned corpus ids (TESTDATA.md), so
# query i is embodied by vector i — deterministic and oracle-visible.
HYBRID_QUERY_VECS = tuple(
    (qid, i) for i, (qid, _terms) in enumerate(BM25_QUERIES)
)


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-k per query: rrf = Σ_leg 1/(RRF_K + rank_leg), summed
    over the legs that retrieved the doc (absent leg contributes 0.0).
    Emits the fused rank plus each leg's rank (0 = not retrieved by
    that leg) so downstream consumers can see WHY a doc surfaced."""
    lex = q_bm25_search(spark, sf_dir).select(
        "query_id",
        "doc_id",
        F.col("rank").alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    emb = emb.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v")))).filter(
        F.col("nrm") > F.lit(0.0)
    )
    qmap = spark.createDataFrame(
        list(HYBRID_QUERY_VECS), "query_id string, qvec_id long"
    )
    qvec = qmap.join(
        emb.select(
            F.col("vec_id").alias("qvec_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        ),
        "qvec_id",
    ).select("query_id", "qv", "qnrm")
    wsem = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc()
    )
    sem = (
        emb.crossJoin(F.broadcast(qvec))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(wsem))
        .filter(F.col("rn") <= F.lit(BM25_TOP_K))
        .select("query_id", "doc_id", F.col("rn").alias("sem_rank"))
    )

    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("lex_rank"), F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce(F.col("sem_rank"), F.lit(0)).cast("int").alias("sem_rank"),
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("lex_rank")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("sem_rank")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    wf = W.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= F.lit(HYBRID_TOP_K))
        .select(
            "query_id", "rank", "doc_id", "rrf_score", "lex_rank", "sem_rank"
        )
    )


_SQL_QVECS = ", ".join(f"('{q}', {i})" for q, i in HYBRID_QUERY_VECS)


def _build_sql_hybrid_rrf() -> str:
    from .similarity import sql_dot

    return f"""
    WITH lex AS (
        SELECT query_id, doc_id, rank AS lex_rank
        FROM ({SQL_BM25_SEARCH})
    ), qmap(query_id, qvec_id) AS (VALUES {_SQL_QVECS}),
    emb AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), nrmd AS (
        SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM emb
    ), f AS (SELECT * FROM nrmd WHERE nrm > 0),
    qvec AS (
        SELECT qmap.query_id, f.v AS qv, f.nrm AS qnrm
        FROM qmap JOIN f ON f.vec_id = qmap.qvec_id
    ), sem AS (
        SELECT query_id, doc_id, rn AS sem_rank
        FROM (
            SELECT qvec.query_id, f.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qvec.query_id
                       ORDER BY {sql_dot('qvec.qv', 'f.v')}
                                / (qvec.qnrm * f.nrm) DESC,
                                f.vec_id ASC) AS rn
            FROM f CROSS JOIN qvec
        )
        WHERE rn <= {BM25_TOP_K}
    ), fused AS (
        SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
               COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               CAST(COALESCE(lex.lex_rank, 0) AS INTEGER) AS lex_rank,
               CAST(COALESCE(sem.sem_rank, 0) AS INTEGER) AS sem_rank,
               COALESCE(1.0::DOUBLE / ({RRF_K}.0::DOUBLE + lex.lex_rank),
                        0.0::DOUBLE)
                   + COALESCE(1.0::DOUBLE
                              / ({RRF_K}.0::DOUBLE + sem.sem_rank),
                              0.0::DOUBLE)
                   AS rrf_score
        FROM lex FULL OUTER JOIN sem
          ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
    )
    SELECT query_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER) AS rank,
           doc_id, rrf_score, lex_rank, sem_rank
    FROM fused
    QUALIFY rank <= {HYBRID_TOP_K}
"""


SQL_HYBRID_RRF = _build_sql_hybrid_rrf()
