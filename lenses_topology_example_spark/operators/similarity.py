"""Embedding similarity search (north-star extension, SURVEY.md §2.6).

Embeddings arrive as array<float> (multimodal-opaque columns with typed
metadata — TESTDATA.md `embeddings`); all math is done in double after an
explicit element cast so Spark and the DuckDB oracle compute identical
IEEE sequences (dot product = sequential left-fold in both engines).

Three tiers:
- `q_sim_topk`      exact brute-force top-k for a small query set. Each
                    query's top-k compiles to TakeOrderedAndProject
                    (per-partition heap + driver merge of k rows), so no
                    global sort/shuffle of the scored corpus ever happens.
- `q_sim_ann_lsh`   sign-random-hyperplane LSH buckets: corpus hashed once
                    (8-bit bucket), candidates only within the query's
                    bucket — the 100 TB path. Hyperplanes are
                    deterministic integer grids so the oracle reproduces
                    the exact bucketing.
- `q_embed_neardup` all-pairs cosine >= threshold within a bucketed join
                    (embedding-cosine near-dup dedup).

No Python UDFs anywhere — zip_with/aggregate keep vector math in codegen.
At real scale the same plans hold: the corpus side is scanned once,
bucketed joins replace the cross join, and k rows per query cross the
wire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.texthash import SQL_MD5_HASH64, md5_hash64
from ..tables import load_table

N_QUERIES = 5  # query set = vec_id < 5
TOP_K = 5
# Production near-dup semantic: vectors this close are the same content.
NEARDUP_COS = 0.999
# Catalog/verification threshold: the synthetic testdata embeddings are
# i.i.d. Gaussian (max pairwise cosine ~0.41 at sf0.01), so a 0.999 cut
# returns 0 rows at every test scale and the driver's green row compares
# two empty sets — a check that cannot fail (round-2 VERDICT). 0.3 keeps
# the result non-empty (44/35/540 rows at sf0.001/0.01/0.1) and bounded,
# so bucketing + pair join + cosine + filter are all actually exercised.
NEARDUP_COS_CATALOG = 0.3


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same association order as the
    oracle's explicit list_reduce, so results are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """try_divide, not `/`: Spark 4 runs ANSI mode by default, so a
    zero-norm vector (real corpora contain them) would crash the whole
    job with DIVIDE_BY_ZERO mid-shuffle. NULL matches DuckDB's division
    convention (0.0/0.0 -> NULL) and drops cleanly from top-k/threshold
    comparisons."""
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_prenorm(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine with precomputed norms: at pair-scoring time each vector's
    sqrt(dot(v,v)) is a column read, not a 64-element fold — the score
    loop does 1 fold/pair instead of 3. Bit-identical to cosine(): the
    norm value is the same IEEE sequence, just computed once per vector.
    Same try_divide null-on-zero-norm contract as cosine()."""
    return F.try_divide(dot(a, b), norm_a * norm_b)


def emb_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v: array<double>, label, norm) — THE shared embedding
    corpus frame, parallelism-guarded and memo-persisted (round 17).

    Every similarity/embed-stats/retrieval consumer used to rebuild
    this projection from the parquet scan independently: the cast to
    double and the 64-element norm fold re-ran per consumer, and —
    because scan parallelism comes from file splits and the testdata
    ships each table as ONE single-row-group file — all of that per-row
    vector math ran on ONE task (r17 measurement: the corpus-side
    scoring of every embedding entry was single-threaded at sf0.1;
    `_parallel_scan`'s round-robin repartition spreads it across the
    cluster's default parallelism). The memoized persist is the
    in-session equivalent of the write-once normalized-embedding table
    a production pipeline materializes before its similarity passes
    (the `_doc_tokens` contract, applied to vectors).

    norm is the same left-fold sqrt(dot(v,v)) every consumer computed
    inline — same IEEE sequence, computed once per vector. Consumers
    that filter zero norms or rename to `nrm` select from here.
    """
    from .dedup import _memo_persist, _parallel_scan

    def build() -> DataFrame:
        emb = _parallel_scan(spark, load_table(spark, sf_dir, "embeddings"))
        return emb.select(
            "vec_id",
            as_double(F.col("embedding")).alias("v"),
            "label",
        ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))

    return _memo_persist(spark, sf_dir, "emb_base", build)


# DuckDB twin of dot(): explicit left-fold, NOT list_dot_product (whose
# internal accumulation order is an implementation detail).
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id <
    N_QUERIES), excluding self — the join-form plan.

    The query set stays a DataFrame: one broadcast join of queries to
    the corpus, prenorm cosine scoring, then a rank window capped at
    TOP_K. The plan is lazy and FIXED-SIZE no matter how many query
    vectors there are (round 1 unrolled one sub-plan per collected query
    vector — a driver bottleneck and plan-size explosion at |Q| >> 5).
    Catalyst's WindowGroupLimit rewrites the rn <= k filter into a
    per-partition partial top-k BEFORE the exchange, so only ~k rows per
    query per input partition cross the shuffle — 24-byte triples, not
    vectors.

    Scale bound (r15 VERDICT ask #5 — the honest version): the PLAN is
    fixed-size in |Q|, but `F.broadcast(q)` is not free-scaling — the
    broadcast side is materialized on the driver and shipped to every
    executor, so at ~8 KB per 1k-dim double vector the query set stops
    being broadcastable around |Q| ≈ 10^5–10^6 (0.8–8 GB, past any sane
    `spark.sql.autoBroadcastJoinThreshold` and driver heap). Beyond
    that, drop the broadcast hint and let the theta-join shuffle both
    sides — or, the real at-scale form, switch to the bucketed paths
    `q_sim_ann_lsh` / `q_sim_ann_ivf` below, which partition the corpus
    by hash/cell so each query only meets its candidate bucket and
    recall@k is measured by `ann_recall` / `ann_recall_ivf`."""
    from pyspark.sql import Window as W

    # norm computed once per corpus vector (same left-fold the oracle
    # uses); pair scoring then does one fold per row, not three —
    # both served by the shared emb_base memo (r17)
    emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


SQL_SIM_TOPK = f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               {sql_cosine('qv', 'e.v')} AS cos_sim
        FROM q JOIN emb e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) <= {TOP_K}
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification over the embedding corpus: each query
    vector takes the majority label of its TOP_K cosine neighbors
    (ties break to the smallest label — deterministic on any engine).
    The standard label-propagation / weak-supervision primitive for
    embedding-labeled corpora.

    Scale shape: reuses the sim_topk join-form plan (fixed-size, lazy,
    WindowGroupLimit partial top-k), then BROADCASTS the |Q| x k
    neighbor triples — bounded by construction, never corpus-sized —
    into the label lookup join, so the corpus-side label fetch is a
    broadcast hash join with no shuffle; the vote count + argmax window
    run on |Q| x k rows."""
    from pyspark.sql import Window as W

    topk = q_sim_topk(spark, sf_dir)
    labels = emb_base(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = (
        labels.join(F.broadcast(topk), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


SQL_KNN_CLASSIFY = f"""
    WITH topk AS ({SQL_SIM_TOPK}),
    v AS (
        SELECT t.query_id, e.label, COUNT(*) AS n_votes
        FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
        GROUP BY t.query_id, e.label
    )
    SELECT query_id, label AS pred_label, n_votes FROM v
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, label ASC) = 1
"""


LABEL_AUDIT_N = 100  # audited slice = vec_id < 100
# flag when strictly more than 60% of neighbors disagree (6-of-10 rule
# at k=5: > 3 of 5)
NOISE_FLAG_NUM = 6
NOISE_FLAG_DEN = 10


def q_label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-noise audit (the Confident-Learning-style screen,
    Northcutt et al., JAIR 2021): for each audited vector (vec_id <
    LABEL_AUDIT_N), the fraction of its TOP_K cosine neighbors whose
    label DISAGREES with its own — high-disagreement rows are the
    mislabeled-example candidates a training-data quality pass routes
    to re-annotation. knn_classify predicts labels; this op audits the
    labels we already have. (Reference has no label surface; extends
    SURVEY.md §2.6's similarity tier.)

    Determinism: cosines are the shared bit-identical prenorm fold;
    ranks break ties on neighbor_id; counts are exact ints; noise_frac
    is one integer division to double; the suspect flag is a pure
    integer comparison (n_disagree·10 > n_neighbors·6 — no float
    threshold at all).

    Scale shape (100 TB): the audit slice broadcasts (bounded by
    construction — an audit is a sample, never the corpus); the corpus
    side pays one prenorm fold per (vector, audited) pair with no
    shuffle; Catalyst's WindowGroupLimit keeps ~k rows per audited id
    per partition ahead of the exchange; the aggregate runs on
    |audit| × k rows."""
    from pyspark.sql import Window as W

    emb = emb_base(spark, sf_dir).select("vec_id", "label", "v", "norm")
    q = emb.filter(F.col("vec_id") < LABEL_AUDIT_N).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("own_label"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    topk = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "own_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
    )
    agg = topk.groupBy("query_id", "own_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.sum(
            F.when(F.col("neighbor_label") != F.col("own_label"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_disagree"),
    )
    return agg.select(
        "query_id",
        "own_label",
        "n_neighbors",
        "n_disagree",
        (
            F.col("n_disagree").cast("double")
            / F.col("n_neighbors").cast("double")
        ).alias("noise_frac"),
        (
            F.col("n_disagree") * F.lit(NOISE_FLAG_DEN)
            > F.col("n_neighbors") * F.lit(NOISE_FLAG_NUM)
        ).alias("suspect"),
    ).orderBy("query_id")


SQL_LABEL_NOISE_KNN = f"""
    WITH emb AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), nn AS (
        SELECT vec_id, label, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM emb
    ), q AS (
        SELECT vec_id AS query_id, label AS own_label, v AS qv,
               nrm AS qnrm
        FROM nn WHERE vec_id < {LABEL_AUDIT_N}
    ), scored AS (
        SELECT q.query_id, q.own_label, e.vec_id AS neighbor_id,
               e.label AS neighbor_label,
               {sql_dot('q.qv', 'e.v')} / (q.qnrm * e.nrm) AS cos_sim
        FROM q JOIN nn e ON e.vec_id <> q.query_id
    ), topk AS (
        SELECT * FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC,
                                            neighbor_id ASC) <= {TOP_K}
    )
    SELECT query_id, own_label,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(CASE WHEN neighbor_label <> own_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
           CAST(SUM(CASE WHEN neighbor_label <> own_label
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS noise_frac,
           SUM(CASE WHEN neighbor_label <> own_label THEN 1 ELSE 0 END)
               * {NOISE_FLAG_DEN}
               > COUNT(*) * {NOISE_FLAG_NUM} AS suspect
    FROM topk
    GROUP BY query_id, own_label
    ORDER BY query_id
"""


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id < N_QUERIES), the TOP_K most-similar corpus vectors
    whose label DIFFERS from the query's — the highest-similarity
    wrong-class examples, i.e. the negatives a contrastive or
    metric-learning objective gains the most from. (The reference has
    no ANN/labels surface; this extends SURVEY.md §2.6's similarity
    tier the same way knn_classify does.)

    Plan shape = q_sim_topk's join-form: one broadcast of the bounded
    query set (vectors + labels), prenorm cosine scoring in codegen,
    and the rn <= k filter rewritten by Catalyst into WindowGroupLimit
    — only ~k (query, neighbor, label, score) quads per query per
    input partition cross the shuffle. The label-mismatch predicate
    rides INSIDE the join condition, so same-class pairs are dropped
    at probe time, never scored rows materialized then filtered."""
    from pyspark.sql import Window as W

    emb = emb_base(spark, sf_dir).select("vec_id", "label", "v", "norm")
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    ).filter(F.col("query_id") < N_QUERIES)
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        emb.join(F.broadcast(q), F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "cos_sim")
    )


SQL_HARD_NEGATIVE_MINING = f"""
    WITH emb AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, label AS qlabel, v AS qv
        FROM emb WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               e.label AS neighbor_label,
               {sql_cosine('qv', 'e.v')} AS cos_sim
        FROM q JOIN emb e ON e.label <> q.qlabel
    )
    SELECT query_id, neighbor_id, neighbor_label, cos_sim FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)
            <= {TOP_K}
"""


# --- LSH (sign random hyperplanes) --------------------------------------------

N_PLANES = 8
_DIM = 64


def _plane_weight(p: int, d: int) -> int:
    # Deterministic integer "pseudo-random" hyperplanes in [-9, 9]:
    # identical literals on the Spark and SQL sides.
    return ((p * 97 + d * 31 + 13) % 19) - 9


def _bucket_col(v: Column) -> Column:
    """8-bit sign bucket: bit p set iff dot(v, plane_p) >= 0."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        w = F.array(*[F.lit(float(_plane_weight(p, d))) for d in range(_DIM)])
        bit = F.when(dot(v, w) >= F.lit(0.0), F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def _sql_plane(p: int) -> str:
    return "[" + ", ".join(f"{float(_plane_weight(p, d))!r}::DOUBLE" for d in range(_DIM)) + "]"


def _sql_bucket(v: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN {sql_dot(v, _sql_plane(p))} >= 0.0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"({bits})"


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH: score ONLY corpus vectors in the same
    hyperplane-sign bucket as the query. At 100 TB the bucket column is
    precomputed/partitioned-by at ingest, so a query touches 1/2^8 of the
    corpus; here it's derived on the fly. Recall vs exact top-k is
    validated in tests (tests/test_similarity.py)."""
    emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
    bucketed = emb.withColumn("bucket", _bucket_col(F.col("v")))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("norm").alias("qnorm"),
    )
    joined = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


SQL_SIM_ANN_LSH = f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_sql_bucket('embedding::DOUBLE[]')} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
        FROM emb WHERE vec_id < {N_QUERIES}
    )
    SELECT query_id, e.vec_id AS neighbor_id,
           {sql_cosine('qv', 'e.v')} AS cos_sim
    FROM q JOIN emb e ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) <= {TOP_K}
"""


# --- IVF (inverted-file index, fixed coarse codebook) -----------------------------

K_CELLS = 16  # codebook size
N_PROBE = 3  # cells scanned per query
_CB_LO = N_QUERIES  # codebook = corpus vectors [5, 21) — the deterministic
_CB_HI = N_QUERIES + K_CELLS  # stand-in for an offline-trained quantizer


def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF: every corpus vector is assigned to its nearest
    codebook centroid (one inverted list per cell); a query scores only
    the N_PROBE cells whose centroids are closest to it.

    This is the production ANN layout at 100 TB: the cell id is a
    partition column written at ingest, so a query reads N_PROBE/K of the
    corpus via partition pruning — no index structure beyond parquet
    layout. The codebook here is a fixed slice of the corpus (real
    deployments train it offline with k-means; a fixed codebook keeps the
    operator deterministic and oracle-checkable — recall depends on
    codebook quality, not plan correctness, see tests/test_similarity.py).

    Assignment = broadcast nested-loop join against K_CELLS rows + one
    row_number per vector: O(N*K) fused scoring, no shuffle of the corpus
    beyond the final per-query top-k.
    """
    from pyspark.sql import Window as W

    emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
    cent = (
        emb.filter((F.col("vec_id") >= _CB_LO) & (F.col("vec_id") < _CB_HI))
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
    )
    by_vec = W.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cent_id").asc()
    )
    assigned = (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id",
            "v",
            "norm",
            "cent_id",
            cosine_prenorm(
                F.col("cv"), F.col("v"), F.col("cnorm"), F.col("norm")
            ).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(by_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "norm", F.col("cent_id").alias("cell"))
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            "cent_id",
            cosine_prenorm(
                F.col("cv"), F.col("v"), F.col("cnorm"), F.col("norm")
            ).alias("cos_c"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cos_c").desc(), F.col("cent_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qv", "qnorm", F.col("cent_id").alias("cell"))
    )
    by_query = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(by_query))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


SQL_SIM_ANN_IVF = f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cent AS (
        SELECT vec_id AS cent_id, v AS cv FROM emb
        WHERE vec_id >= {_CB_LO} AND vec_id < {_CB_HI}
    ), assigned AS (
        SELECT vec_id, v, cent_id AS cell
        FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {sql_cosine('c.cv', 'e.v')} DESC, c.cent_id ASC
                   ) AS rn
            FROM emb e CROSS JOIN cent c
        ) WHERE rn = 1
    ), probes AS (
        SELECT query_id, qv, cent_id AS cell
        FROM (
            SELECT e.vec_id AS query_id, e.v AS qv, c.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {sql_cosine('c.cv', 'e.v')} DESC, c.cent_id ASC
                   ) AS rn
            FROM emb e CROSS JOIN cent c
            WHERE e.vec_id < {N_QUERIES}
        ) WHERE rn <= {N_PROBE}
    )
    SELECT query_id, a.vec_id AS neighbor_id,
           {sql_cosine('p.qv', 'a.v')} AS cos_sim
    FROM probes p JOIN assigned a USING (cell)
    WHERE a.vec_id <> p.query_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) <= {TOP_K}
"""


def q_embed_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = NEARDUP_COS
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are only
    scored within a bucket (vectors this similar agree on every
    hyperplane sign with overwhelming probability — same contract as any
    LSH dedup). Replaces the O(N^2) cross join with per-bucket joins.

    The default is the PRODUCTION threshold NEARDUP_COS (0.999); the
    catalog registers a wrapper pinned to NEARDUP_COS_CATALOG so the
    loosened verification cut stays confined to the catalog/oracle pair
    (round-3 ADVICE: a loosened default silently changes every existing
    caller)."""
    emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
    bucketed = emb.withColumn("bucket", _bucket_col(F.col("v")))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_prenorm(
                F.col("a.v"), F.col("b.v"), F.col("a.norm"), F.col("b.norm")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


def q_embed_neardup_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog/driver entry: q_embed_neardup pinned to
    NEARDUP_COS_CATALOG (0.3) so the check is non-vacuous on the
    i.i.d.-Gaussian testdata (see NEARDUP_COS_CATALOG). Production
    callers use q_embed_neardup directly and get 0.999."""
    return q_embed_neardup(spark, sf_dir, NEARDUP_COS_CATALOG)


SQL_EMBED_NEARDUP = f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_sql_bucket('embedding::DOUBLE[]')} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_cosine('a.v', 'b.v')} AS cos_sim
    FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {sql_cosine('a.v', 'b.v')} >= {NEARDUP_COS_CATALOG}
"""


# --- SemDeDup-shaped semantic dedup (cluster keeper selection) ---------------------


def q_embed_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup keeper selection (SemDeDup-shaped, Abbas et al.
    2023, arXiv:2303.09540): connected components over the embedding
    near-dup pair graph, min-vec_id label per component, keeper = the
    labeling vector. The embedding twin of q_dedup_cluster — pairwise
    near-dup output alone can't drive dedup (A~B, B~C must collapse
    {A,B,C} to ONE keeper).

    Uses the catalog verification threshold (q_embed_neardup_catalog)
    so the component structure is non-trivial on the i.i.d.-Gaussian
    testdata; production callers chain q_embed_neardup (0.999 cut) into
    dedup.resolve_clusters the same way.

    Scale shape: the pair graph is tiny vs the corpus (only vectors
    with a near-identical twin appear); resolve_clusters converges in
    O(component diameter) rounds of one hash join + one partial-agg
    shuffle of 8-byte ids each, lineage truncated per round. The pair
    frame is MATERIALIZED first (same memo contract as dedup's
    neardup_pairs): without it every fixpoint round would re-run the
    bucketed corpus self-join that produced the edges — measured 11.4 s
    -> ~3 s at sf0.1."""
    from .dedup import _memo_get, _memo_persist, resolve_clusters

    # label memo (r17): resolve_clusters is EAGER, so without this every
    # invocation re-ran the whole fixpoint job chain (the cluster_labels
    # contract, embed side)
    labels = _memo_get(spark, sf_dir, "embed_cluster_labels")
    if labels is None:
        pairs = _memo_persist(
            spark,
            sf_dir,
            "embed_neardup_pairs",
            lambda: q_embed_neardup_catalog(spark, sf_dir).select(
                "vec_a", "vec_b"
            ),
        )
        labels = _memo_persist(
            spark,
            sf_dir,
            "embed_cluster_labels",
            resolve_clusters(
                pairs.select(
                    F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
                )
            ),
        )
    return labels.select(
        F.col("doc").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_keeper"),
    )


SQL_EMBED_DEDUP_CLUSTER = f"""
    WITH RECURSIVE pairs AS (
        SELECT vec_a, vec_b FROM ({SQL_EMBED_NEARDUP})
    ), edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT vec_b AS src, vec_a AS dst FROM pairs
    ), reach(v, label) AS (
        SELECT DISTINCT src AS v, src AS label FROM edges
        UNION
        SELECT e.dst AS v, r.label
        FROM reach r JOIN edges e ON e.src = r.v
    )
    SELECT v AS vec_id, MIN(label) AS cluster_id,
           (MIN(label) = v) AS is_keeper
    FROM reach GROUP BY v
"""


# --- ANN self-audit: LSH recall vs the exact top-k ---------------------------------


def sim_topk_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE shared exact-top-k truth frame (query_id, neighbor_id),
    memo-persisted under one key and built HERE only (the r15 ADVICE
    one-construction-site rule). Three audit entries consume the exact
    brute-force ranking as ground truth — q_ann_recall twice
    (semi-join probe + per-query denominator), q_ann_recall_ivf twice,
    q_ivf_probe_sweep once — and Spark reuses none of the exchanges
    across those consumers (r16 standing plan-audit gate: embeddings
    scanned 12-16x per audit, the full |corpus|x|Q| scoring pass and
    its WindowGroupLimit recomputed per consumer, zero ReusedExchange).
    The frame is |Q|·k rows of integer ids — at ANY corpus scale it is
    the write-once ground-truth table every recall audit reads, which
    is exactly how a production eval harness stores it."""
    from .dedup import _memo_persist

    return _memo_persist(
        spark,
        sf_dir,
        "sim_topk_truth",
        lambda: q_sim_topk(spark, sf_dir).select("query_id", "neighbor_id"),
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the sign-LSH ANN path against the exact brute-force
    top-k, per query — the measurement that decides whether a bucketed
    ANN layout is good enough to replace the exact scan at scale
    ("measure, don't guess" as a catalog operator, not just a test
    assertion; tests/test_similarity.py pins a lower bound once, this
    reports the actual number every run).

    Both branches are the existing catalog plans (q_sim_topk /
    q_sim_ann_lsh); the audit is a left-semi join of exact hits against
    approx hits on (query_id, neighbor_id) plus two |Q|-bounded
    aggregates. n_exact can fall below TOP_K only when the corpus
    itself is smaller than k. The exact truth comes from the shared
    sim_topk_memo frame (r16 plan-audit gate: this entry consumed the
    brute-force ranking twice with zero exchange reuse — embeddings
    scanned 12x; the memoized |Q|·k truth table is scanned instead)."""
    exact = sim_topk_memo(spark, sf_dir)
    approx = q_sim_ann_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    n_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
            F.try_divide(
                F.coalesce(F.col("n_hit"), F.lit(0)), F.col("n_exact")
            ).alias("recall"),
        )
    )


SQL_ANN_RECALL = f"""
    WITH exact AS ({SQL_SIM_TOPK}),
    approx AS ({SQL_SIM_ANN_LSH}),
    hits AS (
        SELECT e.query_id, e.neighbor_id
        FROM exact e
        WHERE EXISTS (SELECT 1 FROM approx a
                      WHERE a.query_id = e.query_id
                        AND a.neighbor_id = e.neighbor_id)
    )
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           COALESCE(h.n_hit, 0) / COUNT(*) AS recall
    FROM exact e
    LEFT JOIN (SELECT query_id, COUNT(*) AS n_hit
               FROM hits GROUP BY query_id) h USING (query_id)
    GROUP BY e.query_id, h.n_hit
"""


def q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_recall's twin for the IVF path: recall@k of the
    N_PROBE-cell inverted-file scan against the exact top-k, per
    query — the partition-pruning ANN layout's quality number (the LSH
    audit and this one together choose between the two bucketed
    layouts at scale). Ground truth reads the shared sim_topk_memo
    frame (r16 plan-audit gate — same class as q_ann_recall)."""
    exact = sim_topk_memo(spark, sf_dir)
    approx = q_sim_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    n_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
            F.try_divide(
                F.coalesce(F.col("n_hit"), F.lit(0)), F.col("n_exact")
            ).alias("recall"),
        )
    )


SQL_ANN_RECALL_IVF = f"""
    WITH exact AS ({SQL_SIM_TOPK}),
    approx AS ({SQL_SIM_ANN_IVF}),
    hits AS (
        SELECT e.query_id, e.neighbor_id
        FROM exact e
        WHERE EXISTS (SELECT 1 FROM approx a
                      WHERE a.query_id = e.query_id
                        AND a.neighbor_id = e.neighbor_id)
    )
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           COALESCE(h.n_hit, 0) / COUNT(*) AS recall
    FROM exact e
    LEFT JOIN (SELECT query_id, COUNT(*) AS n_hit
               FROM hits GROUP BY query_id) h USING (query_id)
    GROUP BY e.query_id, h.n_hit
"""


SWEEP_THRESHOLDS = (0.20, 0.25, 0.30, 0.35, 0.40)


def q_embed_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup threshold calibration: for each candidate cosine cut,
    how many within-bucket pairs qualify, how many distinct vectors are
    touched, and how many would be REMOVED under the keep-lowest-id
    greedy (a vector is removable iff some LOWER-id bucket-mate clears
    the cut — exactly the per-pair keeper rule, an upper bound on
    cluster-fixpoint removal). The embedding-side twin of
    dedup.minhash_band_sweep: measure the layout knob before committing
    a production threshold (too loose melts the corpus, too tight keeps
    the near-dups you built the pass to drop).

    One bucketed pair join scores every candidate ONCE — literally: the
    scored pair frame is memo-persisted (r16 standing plan-audit gate
    found it consumed FOUR times — the pair sums, both legs of the
    touched-docs union, and the removable aggregate — with zero
    exchange reuse, embeddings scanned 18x); all thresholds then fold
    as conditional sums over that one cached frame and two per-doc max
    aggregates (|vectors| keys) — adding a threshold costs one more
    CASE column, never another join. At production scale the scored
    pair frame is the write-once candidate table every calibration
    reads (bounded by bucket co-occurrence, not |corpus|²). Cosines are
    the established prenormalized fold (identical IEEE chain both
    engines), compared against exact decimal literals."""
    from .dedup import _memo_persist

    def build_pairs() -> DataFrame:
        emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
        bucketed = emb.withColumn("bucket", _bucket_col(F.col("v")))
        a = bucketed.alias("a")
        b = bucketed.alias("b")
        return a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_prenorm(
                F.col("a.v"), F.col("b.v"), F.col("a.norm"), F.col("b.norm")
            ).alias("cos_sim"),
        )

    pairs = _memo_persist(spark, sf_dir, "embed_sweep_pairs", build_pairs)
    # coalesce each conditional sum to 0: on an EMPTY corpus (or an
    # empty bucket-pair frame) SUM is NULL, and the sweep must report
    # 0 pairs/docs/removals like the oracle's COUNT subqueries do
    # (round-8 empty-input sweep)
    czero = lambda c: F.coalesce(c, F.lit(0))
    pair_aggs = pairs.agg(
        *[
            czero(
                F.sum(F.when(F.col("cos_sim") >= F.lit(t), 1).otherwise(0))
            ).alias(f"p{i}")
            for i, t in enumerate(SWEEP_THRESHOLDS)
        ]
    )
    touched = (
        pairs.select(F.col("vec_a").alias("doc"), "cos_sim")
        .unionByName(pairs.select(F.col("vec_b").alias("doc"), "cos_sim"))
        .groupBy("doc")
        .agg(F.max("cos_sim").alias("mc"))
        .agg(
            *[
                czero(
                    F.sum(F.when(F.col("mc") >= F.lit(t), 1).otherwise(0))
                ).alias(f"d{i}")
                for i, t in enumerate(SWEEP_THRESHOLDS)
            ]
        )
    )
    removable = (
        pairs.select(F.col("vec_b").alias("doc"), "cos_sim")
        .groupBy("doc")
        .agg(F.max("cos_sim").alias("mcl"))
        .agg(
            *[
                czero(
                    F.sum(F.when(F.col("mcl") >= F.lit(t), 1).otherwise(0))
                ).alias(f"r{i}")
                for i, t in enumerate(SWEEP_THRESHOLDS)
            ]
        )
    )
    n = emb_base(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), p{i}, d{i}, r{i}"
        for i, t in enumerate(SWEEP_THRESHOLDS)
    )
    wide = (
        pair_aggs.crossJoin(F.broadcast(touched))
        .crossJoin(F.broadcast(removable))
        .crossJoin(F.broadcast(n))
    )
    return (
        wide.selectExpr(
            "n_vecs",
            f"stack({len(SWEEP_THRESHOLDS)}, {stack_args}) AS "
            "(threshold, n_pairs, n_docs_matched, n_removable)",
        )
        .select(
            "threshold",
            "n_pairs",
            "n_docs_matched",
            "n_removable",
            F.try_divide(
                F.col("n_removable").cast("double"),
                F.col("n_vecs").cast("double"),
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("removal_fraction"),
        )
        .orderBy("threshold")
    )


def _sql_embed_threshold_sweep() -> str:
    rows = []
    for t in SWEEP_THRESHOLDS:
        rows.append(
            f"""
        SELECT CAST({t} AS DOUBLE) AS threshold,
               CAST((SELECT COUNT(*) FROM pairs WHERE cos_sim >= {t})
                   AS BIGINT) AS n_pairs,
               CAST((SELECT COUNT(*) FROM touched WHERE mc >= {t})
                   AS BIGINT) AS n_docs_matched,
               CAST((SELECT COUNT(*) FROM removable WHERE mcl >= {t})
                   AS BIGINT) AS n_removable,
               CAST(CAST(CAST((SELECT COUNT(*) FROM removable
                               WHERE mcl >= {t}) AS DOUBLE)
                         / CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE)
                    AS DECIMAL(38,6)) AS DOUBLE) AS removal_fraction"""
        )
    body = "\n        UNION ALL\n".join(rows)
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_sql_bucket('embedding::DOUBLE[]')} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {sql_cosine('a.v', 'b.v')} AS cos_sim
        FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), touched AS (
        SELECT doc, MAX(cos_sim) AS mc FROM (
            SELECT vec_a AS doc, cos_sim FROM pairs
            UNION ALL
            SELECT vec_b AS doc, cos_sim FROM pairs
        ) GROUP BY doc
    ), removable AS (
        SELECT vec_b AS doc, MAX(cos_sim) AS mcl FROM pairs GROUP BY vec_b
    )
    SELECT * FROM ({body})
    ORDER BY threshold
    """


SQL_EMBED_THRESHOLD_SWEEP = _sql_embed_threshold_sweep()


def q_embed_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion SEMANTIC dedup: classify each INCOMING
    vector against the EXISTING corpus as near_dup (some base
    bucket-mate's cosine clears the catalog threshold) or new — the
    embedding twin of dedup.q_dedup_incremental (same md5-parity
    batch/base split so the oracle reproduces the partition; same
    "cost scales with the batch, not the corpus" contract).

    Scale shape: the base side's bucketed vectors are a PRECOMPUTED
    artifact of prior runs (the IVF/LSH layout similarity.py already
    documents); the incoming batch joins only within its LSH buckets —
    incoming x base, never base x base — and the verdict returns to
    the incoming frame as a left-semi-derived flag, no row explosion.
    Cosines are the established prenormalized fold."""
    emb = emb_base(spark, sf_dir).select(
        "vec_id",
        "v",
        "norm",
        (md5_hash64(F.col("vec_id").cast("string")) % 2).alias("p"),
    )
    bucketed = emb.withColumn("bucket", _bucket_col(F.col("v")))
    base = bucketed.filter(F.col("p") == 0).select(
        F.col("vec_id").alias("base_id"),
        F.col("v").alias("bv"),
        F.col("norm").alias("bnorm"),
        "bucket",
    )
    inc = bucketed.filter(F.col("p") == 1).select(
        "vec_id", "v", "norm", "bucket"
    )
    hits = (
        inc.join(base, "bucket")
        .filter(
            cosine_prenorm(
                F.col("v"), F.col("bv"), F.col("norm"), F.col("bnorm")
            )
            >= F.lit(NEARDUP_COS_CATALOG)
        )
        .select("vec_id")
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    return (
        inc.select("vec_id")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
        .orderBy("vec_id")
    )


def _sql_embed_dedup_incremental() -> str:
    bucket = _sql_bucket("embedding::DOUBLE[]")
    par = SQL_MD5_HASH64.format(x="CAST(vec_id AS VARCHAR)")
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket,
               {par} % 2 AS p
        FROM embeddings
    ), base AS (
        SELECT vec_id AS base_id, v AS bv, bucket FROM emb WHERE p = 0
    ), inc AS (
        SELECT vec_id, v, bucket FROM emb WHERE p = 1
    ), hits AS (
        SELECT DISTINCT inc.vec_id
        FROM inc JOIN base USING (bucket)
        WHERE {sql_cosine('inc.v', 'base.bv')} >= {NEARDUP_COS_CATALOG}
    )
    SELECT inc.vec_id,
           CASE WHEN hits.vec_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS status
    FROM inc LEFT JOIN hits ON inc.vec_id = hits.vec_id
    ORDER BY inc.vec_id
    """


SQL_EMBED_DEDUP_INCREMENTAL = _sql_embed_dedup_incremental()


# --- IVF probe-depth sweep (round 9) -----------------------------------------

# probe depths measured by the sweep; N_PROBE (=3) sits inside the range
# so the sweep directly justifies (or indicts) the production setting
PROBE_SWEEP = (1, 2, 4, 8)


def q_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k AND scan cost of the IVF layout for probe
    depths 1/2/4/8 — the calibration audit that chooses N_PROBE the way
    minhash_band_sweep chooses the LSH banding: from data, not folklore.
    Per depth p: how many candidate vectors a query scans (the cost the
    partition-pruning layout exists to bound) and what fraction of the
    exact top-k survives.

    One scored frame answers every depth: candidates are scored against
    the max probe depth once, and the rank of a candidate at depth p is
    the CUMULATIVE count of candidates from cells ranked <= p, taken in
    the one total (cos_sim DESC, neighbor_id ASC) window order — so all
    four depth curves are conditional sums inside a single window pass,
    never four re-joins. (Nested probe sets: cells at depth p are a
    prefix of depth p', p < p', which is what makes the cumulative-rank
    trick exact.)

    Determinism: cosines are the bit-identical prenorm expressions of
    q_sim_ann_ivf; ranks are integer cumulative counts over a total
    order; recall is one decimal-rounded division of exact int64 sums.

    Scale shape: assignment and probe selection are the q_sim_ann_ivf
    broadcast plans; the candidate frame is bounded by the max-depth
    probe fraction of the corpus (p_max/K of it); the final report is a
    |sweep|-row aggregate."""
    from pyspark.sql import Window as W

    p_max = max(PROBE_SWEEP)
    emb = emb_base(spark, sf_dir).select("vec_id", "v", "norm")
    cent = emb.filter(
        (F.col("vec_id") >= _CB_LO) & (F.col("vec_id") < _CB_HI)
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    by_vec = W.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cent_id").asc()
    )
    assigned = (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id",
            "v",
            "norm",
            "cent_id",
            cosine_prenorm(
                F.col("cv"), F.col("v"), F.col("cnorm"), F.col("norm")
            ).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(by_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "norm", F.col("cent_id").alias("cell"))
    )
    qcells = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            "cent_id",
            cosine_prenorm(
                F.col("cv"), F.col("v"), F.col("cnorm"), F.col("norm")
            ).alias("cos_c"),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cos_c").desc(), F.col("cent_id").asc()
                )
            ),
        )
        .filter(F.col("cell_rank") <= F.lit(p_max))
        .select(
            "query_id", "qv", "qnorm", F.col("cent_id").alias("cell"),
            "cell_rank",
        )
    )
    # shared memoized ground truth (r16 plan-audit gate; one cache
    # serves all three recall audits)
    truth = sim_topk_memo(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_exact")
    )
    cands = (
        assigned.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell_rank",
            cosine_prenorm(
                F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")
            ).alias("cos_sim"),
        )
        .join(truth, ["query_id", "neighbor_id"], "left")
    )
    wcum = (
        W.partitionBy("query_id")
        .orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = cands.select(
        "query_id",
        "neighbor_id",
        "cell_rank",
        F.coalesce(F.col("is_exact"), F.lit(0)).alias("is_exact"),
        *[
            F.sum(
                F.when(F.col("cell_rank") <= F.lit(p), 1).otherwise(0)
            )
            .over(wcum)
            .alias(f"rank_p{p}")
            for p in PROBE_SWEEP
        ],
    )
    n_exact_total = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_total")
    )
    per_p = ranked.agg(
        *[
            F.sum(
                F.when(F.col("cell_rank") <= F.lit(p), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"cand_p{p}")
            for p in PROBE_SWEEP
        ],
        *[
            F.sum(
                F.when(
                    (F.col("cell_rank") <= F.lit(p))
                    & (F.col(f"rank_p{p}") <= F.lit(TOP_K))
                    & (F.col("is_exact") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"hit_p{p}")
            for p in PROBE_SWEEP
        ],
    )
    stack_args = ", ".join(
        f"{p}, cand_p{p}, hit_p{p}" for p in PROBE_SWEEP
    )
    rows = per_p.crossJoin(F.broadcast(n_exact_total)).select(
        F.expr(
            f"stack({len(PROBE_SWEEP)}, {stack_args})"
            " AS (probe, n_candidates, n_hits)"
        ),
        "n_exact_total",
    )
    return rows.select(
        F.col("probe").cast("int").alias("probe"),
        "n_candidates",
        "n_hits",
        F.try_divide(F.col("n_hits"), F.col("n_exact_total"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("recall"),
    ).orderBy("probe")


def _build_sql_ivf_probe_sweep() -> str:
    p_max = max(PROBE_SWEEP)
    rank_cols = ",\n                   ".join(
        f"SUM(CASE WHEN cell_rank <= {p} THEN 1 ELSE 0 END) OVER ("
        f"PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC "
        f"ROWS UNBOUNDED PRECEDING) AS rank_p{p}"
        for p in PROBE_SWEEP
    )
    aggs = ",\n               ".join(
        f"CAST(SUM(CASE WHEN cell_rank <= {p} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cand_p{p},\n               "
        f"CAST(SUM(CASE WHEN cell_rank <= {p} AND rank_p{p} <= {TOP_K}"
        f" AND is_exact = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hit_p{p}"
        for p in PROBE_SWEEP
    )
    unions = "\n        UNION ALL ".join(
        f"SELECT {p} AS probe, cand_p{p} AS n_candidates,"
        f" hit_p{p} AS n_hits FROM agg"
        for p in PROBE_SWEEP
    )
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), nrm AS (
        SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS norm FROM emb
    ), cent AS (
        SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM nrm
        WHERE vec_id >= {_CB_LO} AND vec_id < {_CB_HI}
    ), assigned AS (
        SELECT vec_id, v, norm, cent_id AS cell
        FROM (
            SELECT n.vec_id, n.v, n.norm, c.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {sql_dot('c.cv', 'n.v')}
                                / (c.cnorm * n.norm) DESC,
                                c.cent_id ASC) AS rn
            FROM nrm n CROSS JOIN cent c
        ) WHERE rn = 1
    ), qcells AS (
        SELECT query_id, qv, qnorm, cell, cell_rank
        FROM (
            SELECT n.vec_id AS query_id, n.v AS qv, n.norm AS qnorm,
                   c.cent_id AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {sql_dot('c.cv', 'n.v')}
                                / (c.cnorm * n.norm) DESC,
                                c.cent_id ASC) AS cell_rank
            FROM nrm n CROSS JOIN cent c
            WHERE n.vec_id < {N_QUERIES}
        ) WHERE cell_rank <= {p_max}
    ), truth AS (
        SELECT query_id, neighbor_id, 1 AS is_exact FROM ({SQL_SIM_TOPK})
    ), cands AS (
        SELECT q.query_id, a.vec_id AS neighbor_id, q.cell_rank,
               {sql_dot('q.qv', 'a.v')} / (q.qnorm * a.norm) AS cos_sim,
               COALESCE(t.is_exact, 0) AS is_exact
        FROM assigned a JOIN qcells q USING (cell)
        LEFT JOIN truth t
          ON t.query_id = q.query_id AND t.neighbor_id = a.vec_id
        WHERE a.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cell_rank, is_exact,
                   {rank_cols}
        FROM cands
    ), agg AS (
        SELECT {aggs}
        FROM ranked
    ), rows_p AS (
        {unions}
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_total FROM truth
    )
    SELECT CAST(probe AS INTEGER) AS probe, n_candidates, n_hits,
           CAST(CAST(CAST(n_hits AS DOUBLE) / CAST(n_exact_total AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS recall
    FROM rows_p CROSS JOIN tot
    ORDER BY probe
"""


SQL_IVF_PROBE_SWEEP = _build_sql_ivf_probe_sweep()


# --- Matryoshka truncation audit (round 11) ----------------------------------

MRL_DIMS = (8, 16, 32, 64)
_MRL_FULL = 0  # marker row: the full-dimension truth ranking


def q_mrl_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit (Kusupati et al., NeurIPS
    2022): recall@k of top-k cosine retrieval using only the FIRST d
    dimensions (d = 8/16/32/64) against the full-dimension truth — the
    measure-don't-guess input for choosing a truncated serving
    dimension (memory/latency ∝ d) exactly as ivf_probe_sweep chooses
    a probe depth. All dims score in ONE pair pass; nothing reranks.

    Determinism: every truncated cosine is the shared left-fold over a
    prefix slice (identical association order both engines); rankings
    tie-break on neighbor_id; recall is exact-int division.

    Scale shape (100 TB): the bounded query set broadcasts once; the
    corpus side pays |dims|+1 prefix folds per pair in one projection
    (no re-scan per dim); each (query, dim) ranking is WindowGroupLimit
    partial top-k; the hit join runs on |Q|·k·|dims| rows. The top-k
    frame itself is memo-persisted (r16 standing plan-audit gate: it
    fed truth, trunc, and the two per-dim aggregates with zero exchange
    reuse — embeddings scanned 12x, the full pair-scoring pass and its
    per-dim windows recomputed per consumer; cached it is |Q|·k·|dims|
    integer rows, the write-once ranking table the audit reads)."""
    from pyspark.sql import Window as W

    from .dedup import _memo_persist

    def build_topk() -> DataFrame:
        emb = emb_base(spark, sf_dir).select("vec_id", "v")
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))

        def cos_d(d: int | None):
            a = F.col("qv") if d is None else F.slice(F.col("qv"), 1, d)
            b = F.col("v") if d is None else F.slice(F.col("v"), 1, d)
            return F.try_divide(
                dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
            )

        scored = pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(_MRL_FULL).alias("dim"), cos_d(None).alias("cos")
                    ),
                    *[
                        F.struct(F.lit(d).alias("dim"), cos_d(d).alias("cos"))
                        for d in MRL_DIMS
                    ],
                )
            ).alias("s"),
        ).select(
            "query_id",
            "neighbor_id",
            F.col("s.dim").alias("dim"),
            F.col("s.cos").alias("cos"),
        )
        w = W.partitionBy("query_id", "dim").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id", "dim")
        )

    topk = _memo_persist(spark, sf_dir, "mrl_topk", build_topk)
    truth = topk.filter(F.col("dim") == _MRL_FULL).select(
        "query_id", "neighbor_id"
    )
    trunc = topk.filter(F.col("dim") != _MRL_FULL)
    hits = trunc.join(
        F.broadcast(truth), ["query_id", "neighbor_id"], "left_semi"
    )
    per_dim = (
        trunc.groupBy("dim")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ranked"))
        .join(
            F.broadcast(
                hits.groupBy("dim").agg(
                    F.count(F.lit(1)).cast("long").alias("n_hits")
                )
            ),
            "dim",
            "left",
        )
    )
    return per_dim.select(
        "dim",
        "n_ranked",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        (
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
            / F.col("n_ranked").cast("double")
        ).alias("recall_at_k"),
    ).orderBy("dim")


def _sql_cos_slice(a: str, b: str, d: int | None) -> str:
    aa = a if d is None else f"{a}[1:{d}]"
    bb = b if d is None else f"{b}[1:{d}]"
    return (
        f"({sql_dot(aa, bb)} / (sqrt({sql_dot(aa, aa)})"
        f" * sqrt({sql_dot(bb, bb)})))"
    )


def _build_sql_mrl() -> str:
    structs = ", ".join(
        [
            f"struct_pack(dim := {_MRL_FULL}, "
            f"cos := {_sql_cos_slice('q.qv', 'e.v', None)})"
        ]
        + [
            f"struct_pack(dim := {d}, "
            f"cos := {_sql_cos_slice('q.qv', 'e.v', d)})"
            for d in MRL_DIMS
        ]
    )
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM emb
        WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               unnest([{structs}], recursive := true)
        FROM q JOIN emb e ON e.vec_id <> q.query_id
    ), topk AS (
        SELECT query_id, neighbor_id, dim FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id, dim
                                   ORDER BY cos DESC,
                                            neighbor_id ASC) <= {TOP_K}
    ), truth AS (
        SELECT query_id, neighbor_id FROM topk WHERE dim = {_MRL_FULL}
    ), trunc AS (SELECT * FROM topk WHERE dim <> {_MRL_FULL}),
    hits AS (
        SELECT t.dim, COUNT(*) AS n_hits
        FROM trunc t
        WHERE EXISTS (SELECT 1 FROM truth u
                      WHERE u.query_id = t.query_id
                        AND u.neighbor_id = t.neighbor_id)
        GROUP BY t.dim
    )
    SELECT t.dim,
           CAST(COUNT(*) AS BIGINT) AS n_ranked,
           CAST(COALESCE(MAX(h.n_hits), 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(MAX(h.n_hits), 0) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
    FROM trunc t LEFT JOIN hits h ON h.dim = t.dim
    GROUP BY t.dim
    ORDER BY t.dim
"""


SQL_MRL_TRUNCATION_AUDIT = _build_sql_mrl()


# --- Johnson-Lindenstrauss projection distortion audit (round 11) --------------

JL_K = 16  # projected dimensionality
JL_DIM = 64  # source embedding dimensionality
JL_AUDIT_N = 512  # consecutive-id pairs audited


def _jl_signs() -> list[list[int]]:
    """The +/-1 projection matrix, derived row-by-row from md5 so both
    engines see the SAME literal table (the decayed_revenue precomputed
    literal-factor discipline — no query-time hashing, no plan-time
    engine divergence): s[j][i] = +1 iff md5('jl|j|i') is even."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl|{j}|{i}".encode()).hexdigest()[:15], 16)
            % 2
            == 0
            else -1
            for i in range(JL_DIM)
        ]
        for j in range(JL_K)
    ]


JL_SIGNS = _jl_signs()


def q_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection audit (Johnson & Lindenstrauss 1984, Achlioptas
    2003 ±1 variant): project the 64-d embeddings to JL_K=16 dims with
    the fixed ±1 sign matrix and measure, over a bounded audit set of
    consecutive-id pairs, how well squared distances survive —
    ratio = ||S(u−v)||² / (K·||u−v||²), which concentrates around 1.
    The measure-don't-guess input to a "project before ANN" decision
    (ann_recall's cheaper cousin: distance distortion, not recall).

    Determinism: the sign matrix is a module-level literal (identical
    text in both engines); projections use the bit-identical left-fold
    dot; each pair's ratio is rounded to 6dp before the DECIMAL(38,6)
    mean (the silhouette convention); min/max operate on the rounded
    values. Zero-distance pairs (exact duplicate vectors) are excluded
    and counted separately.

    Scale shape (100 TB): the audit set is id-bounded (< JL_AUDIT_N) —
    the broadcast side of one equi-join; projection is 16 fixed folds
    per audited row, applied to the DIFFERENCE vector only (linearity:
    S(u−v) = Su − Sv, so one projection per pair, not two); the report
    is a 1-row aggregate. Projecting the full corpus for production use
    is the same expression without the audit filter."""
    emb = emb_base(spark, sf_dir).select("vec_id", "v")
    a = emb.filter(F.col("vec_id") < JL_AUDIT_N).select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = emb.select((F.col("vec_id") - 1).alias("id_a"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), "id_a").select(
        "id_a", F.zip_with("va", "vb", lambda x, y: x - y).alias("d")
    )
    # ONE F.expr for the whole 16-fold projection, not JL_K x 64 F.lit
    # calls plus JL_K aggregate/zip_with lambda constructions: the
    # Column-API form cost ~1.3 s of py4j roundtrips per build at r18
    # (the entry's whole driver-side construction); the SQL text parses
    # to the IDENTICAL expression tree in one call — `1.0D` is the same
    # DoubleType literal, `aggregate(zip_with(...), 0.0D, ...)` the same
    # left-fold dot() compiles to (oracle MATCH at sf0.01 + sf0.1), and
    # the `+` chain is left-associated exactly like the Python loop was.
    def pj_sql(j: int) -> str:
        arr = "array(" + ", ".join(f"{float(s)}D" for s in JL_SIGNS[j]) + ")"
        return (
            f"aggregate(zip_with(d, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )

    proj_sq = F.expr(
        " + ".join(f"({pj_sql(j)} * {pj_sql(j)})" for j in range(JL_K))
    )
    scored = pairs.select(
        "id_a",
        dot(F.col("d"), F.col("d")).alias("d2"),
        proj_sq.alias("p2"),
    )
    rnd = lambda c: c.cast("decimal(38,6)").cast("double")  # noqa: E731
    ratio = rnd(F.col("p2") / (F.lit(float(JL_K)) * F.col("d2")))
    rated = scored.select(
        "id_a",
        (F.col("d2") > F.lit(0.0)).alias("live"),
        F.when(F.col("d2") > F.lit(0.0), ratio).alias("ratio"),
    )
    agg = rated.agg(
        F.sum(F.when(F.col("live"), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.sum(F.when(~F.col("live"), 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate"),
        F.sum(F.col("ratio").cast("decimal(38,6)"))
        .cast("double")
        .alias("ratio_sum"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.sum(
            F.when(
                (F.col("ratio") >= 0.5) & (F.col("ratio") <= 1.5), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_in_band"),
    )
    live_n = F.col("n_pairs")
    return agg.select(
        "n_pairs",
        "n_degenerate",
        F.when(
            live_n > 0, rnd(F.col("ratio_sum") / live_n.cast("double"))
        ).alias("mean_ratio"),
        "min_ratio",
        "max_ratio",
        F.when(
            live_n > 0,
            F.col("n_in_band").cast("double") / live_n.cast("double"),
        ).alias("frac_in_band"),
    )


def _sql_jl() -> str:
    pcols = []
    for j in range(JL_K):
        lit = "[" + ", ".join(f"{float(s)}" for s in JL_SIGNS[j]) + "]"
        pcols.append(f"{sql_dot('d', lit)} AS p{j}")
    # left-associated sum of squares, same order as the Spark fold
    proj = " + ".join(f"p{j} * p{j}" for j in range(JL_K))
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS id_a,
               list_transform(list_zip(a.v, b.v), p -> p[1] - p[2]) AS d
        FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < {JL_AUDIT_N}
    ), projected AS (
        SELECT id_a, {sql_dot('d', 'd')} AS d2, {', '.join(pcols)}
        FROM pairs
    ), scored AS (
        SELECT id_a, d2, {proj} AS p2 FROM projected
    ), rated AS (
        SELECT id_a, d2 > 0.0 AS live,
               CASE WHEN d2 > 0.0 THEN
                   CAST(CAST(p2 / ({JL_K}.0 * d2) AS DECIMAL(38,6))
                        AS DOUBLE) END AS ratio
        FROM scored
    ), agg AS (
        SELECT CAST(SUM(CASE WHEN live THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pairs,
               CAST(SUM(CASE WHEN NOT live THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_degenerate,
               CAST(SUM(CAST(ratio AS DECIMAL(38,6))) AS DOUBLE)
                   AS ratio_sum,
               MIN(ratio) AS min_ratio,
               MAX(ratio) AS max_ratio,
               CAST(SUM(CASE WHEN ratio >= 0.5 AND ratio <= 1.5
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
        FROM rated
    )
    SELECT n_pairs, n_degenerate,
           CASE WHEN n_pairs > 0 THEN
               CAST(CAST(ratio_sum / CAST(n_pairs AS DOUBLE)
                    AS DECIMAL(38,6)) AS DOUBLE) END AS mean_ratio,
           min_ratio, max_ratio,
           CASE WHEN n_pairs > 0 THEN
               CAST(n_in_band AS DOUBLE) / CAST(n_pairs AS DOUBLE)
           END AS frac_in_band
    FROM agg
"""


SQL_JL_PROJECTION_AUDIT = _sql_jl()
