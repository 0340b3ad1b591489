"""Deduplication operators for training-data pipelines (north-star
extension, SURVEY.md §2.6): exact, n-gram Jaccard near-dup, MinHash+LSH.

All variants are pure Catalyst expressions — no Python UDFs — so the hot
path stays inside whole-stage codegen. Engine-portable hashing
(functions/texthash.py) makes even MinHash oracle-checkable: every hash
is md5-derived + explicit int64 arithmetic, bit-identical in DuckDB.

Scale design (100 TB):
- exact dedup groups by md5(text) (16 bytes), never by the full document
  text — the shuffle moves fingerprints, not bodies;
- near-dup candidate generation goes through an inverted shingle index
  (explode -> self-join on shingle): cost is sum(freq^2) per shingle, so
  a production run caps hot shingles (drop shingles with doc-freq above a
  threshold — they carry ~no Jaccard signal and all the skew). The cap is
  OFF here to keep oracle semantics exact; at 100 TB set
  `max_shingle_freq` and/or rely on AQE skew-join splitting;
- MinHash compresses each doc to a k-int signature before the pair join —
  the LSH band join touches signatures only (k*8 bytes/doc), the classic
  way to make near-dup sub-quadratic.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.texthash import (
    MOD,
    SQL_MD5_HASH64,
    md5_hash64,
    md5_hash_mod,
    minhash_component,
    sql_minhash_component,
)
from ..tables import load_table
from .wordcount import tokens_col

# --- exact dedup --------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: keep min doc_id per md5(text).
    (dropDuplicates() keeps an *arbitrary* row — non-deterministic across
    runs/engines — so the dedup contract is min-id-wins.)"""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT = """
    SELECT md5(text) AS fp, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
"""


# --- shingling (shared by Jaccard + MinHash) -----------------------------------


def shingles_col(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (empty if < n tokens).

    Built from arrays_zip over n offset SLICES, not a per-position
    index lambda: element_at(toks, i) inside a transform lambda
    re-evaluates the WHOLE toks expression once per element, so a
    caller passing the raw tokenization expression paid
    O(tokens * regex-split) per row — measured 5.2 s vs 0.7 s at sf0.1
    on the bigram fan-out (round 12; the zip form touches toks only
    ~2n times per row, making the helper safe to call on unprojected
    expressions). Output is bit-identical to the index form
    (equivalence-checked at rewrite time)."""
    m = F.size(toks) - F.lit(n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, 1 + o, m) for o in range(n)])
    gram = lambda s: F.concat_ws(" ", *[s[str(o)] for o in range(n)])
    return F.when(
        F.size(toks) >= F.lit(n), F.transform(zipped, gram)
    ).otherwise(F.array().cast("array<string>"))


SQL_SHINGLES = r"""
    CASE WHEN len(t) >= 3 THEN
        list_transform(generate_series(1, len(t) - 2),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE []::VARCHAR[] END
"""

SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')"


# Memoized materialized intermediates, keyed by (applicationId, sf_dir,
# table). persist() on a FRESH frame per call would leak cached blocks in
# a long-lived embedding session (every invocation stacks a new copy);
# memoization both fixes the leak and lets jaccard/minhash/simhash share
# one token table. Lock: two threads racing the first call would both
# persist and leak the loser's copy. RLock, not Lock: a memo build may
# itself consult other memoized builders (seg_token_sets reads
# line_segments, shingles reads tokens), so thunk construction inside
# the critical section re-enters from the same thread.
_MATERIALIZED: dict[tuple[str, str, str], DataFrame] = {}
_MATERIALIZED_LOCK = threading.RLock()


def _memo_persist(
    spark: SparkSession,
    sf_dir: str,
    key: str,
    df: DataFrame | Callable[[], DataFrame],
) -> DataFrame:
    """``df`` is a DataFrame or (preferred) a ZERO-ARG CALLABLE building
    one. Prefer the callable: PySpark analyzes eagerly, so constructing
    a memo frame's full build tree costs 47-236 ms of driver-side
    Catalyst work per call at sf0.1 (measured r18) — paid by EVERY
    consumer on a memo HIT just to discard the frame. A thunk defers
    construction to the one call that actually misses."""
    app_id = spark.sparkContext.applicationId
    memo_key = (app_id, sf_dir, key)
    with _MATERIALIZED_LOCK:
        # Evict entries from STOPPED sessions only: a long-lived
        # embedding process that restarts SparkSessions would otherwise
        # accumulate dead DataFrame references forever, but two
        # concurrently live sessions in one process must not thrash each
        # other's memo (eviction keyed on "differs from current app"
        # would re-persist the victim's frames unboundedly).
        for k in [k for k in _MATERIALIZED if k[0] != app_id]:
            cached = _MATERIALIZED[k]
            # Only evict a session that is DEMONSTRABLY stopped: either
            # the gateway handle is gone (classic stop signature) or the
            # JVM says so. A probe failure of unknown cause (e.g. Spark
            # Connect, where _jsc never exists) keeps the entry —
            # leak-on-doubt beats unpersisting a live foreign session's
            # frame and reintroducing cross-session thrash (r3 ADVICE).
            try:
                jsc = cached.sparkSession.sparkContext._jsc
                stopped = jsc is None or jsc.sc().isStopped()
            except Exception:
                stopped = False
            if stopped:
                try:
                    cached.unpersist()
                except Exception:
                    pass
                del _MATERIALIZED[k]
        if memo_key not in _MATERIALIZED:
            frame = df() if callable(df) else df
            _MATERIALIZED[memo_key] = frame.persist()
        return _MATERIALIZED[memo_key]


def _memo_get(spark: SparkSession, sf_dir: str, key: str) -> DataFrame | None:
    """Memo lookup WITHOUT construction — for EAGER frames (the cluster
    fixpoint), whose cost is paid when the DataFrame is BUILT, so the
    usual construct-then-_memo_persist pattern would re-run the jobs on
    every memo hit."""
    app_id = spark.sparkContext.applicationId
    with _MATERIALIZED_LOCK:
        return _MATERIALIZED.get((app_id, sf_dir, key))


def _parallel_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Degenerate-layout guard for expensive derivation stages.

    Scan parallelism comes from file splits, and a parquet row group is
    unsplittable — a corpus delivered as one fat row group (exactly what
    a testdata regeneration produced in round 6: 5 000 docs, 1 row
    group) scans as ONE partition, serializing every tokenize/explode
    that follows and leaving 31 of 32 cores idle through the memoized
    materializations (measured 7.9 s single-threaded vs ~1 s parallel
    at sf0.1). Parallelism of the heavy per-row stages must not depend
    on incidental input file layout, so: if the scan yields fewer than
    half the cluster's default parallelism, round-robin repartition
    BEFORE the per-row work. At production scale the scan already has
    thousands of splits and this is a metadata check, no added
    exchange; the repartition only fires on pathological layouts, where
    shuffling the raw input once is strictly cheaper than serializing
    all downstream work."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, p // 2):
        return df.repartition(p)
    return df


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, t: array<string>) token table, MATERIALIZED (persist).

    Catalyst's CollapseProject would otherwise inline the tokenizer into
    every consumer expression — the shingle lambda's element_at calls
    alone would re-run split+filter ~3x per shingle per doc (measured
    10x+ blowup at sf0.1). At 100 TB the token/shingle tables are written
    to storage once and every dedup pass reads them; a memoized persist()
    is the in-session equivalent of that boundary.
    """
    # `source` rides along (tiny vs the token arrays) so set-scoped
    # passes (decontamination) reuse this table instead of re-joining
    # documents to recover it — consumers that don't need it prune it.
    def build() -> DataFrame:
        docs = _parallel_scan(spark, load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id", "source", tokens_col(F.col("text")).alias("t")
        )

    return _memo_persist(spark, sf_dir, "tokens", build)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) inverted-index rows over distinct 3-gram
    shingles, built from the materialized token table."""
    def build() -> DataFrame:
        toks = _doc_tokens(spark, sf_dir)
        return toks.select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(shingles_col(F.col("t")))).alias(
                "shingle"
            ),
        )

    return _memo_persist(spark, sf_dir, "shingles", build)


# --- n-gram Jaccard near-dup ----------------------------------------------------

JACCARD_THRESHOLD = 0.2


def jaccard_pairs_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE exact-Jaccard pair frame (doc_a, doc_b, jaccard) over every
    doc pair sharing >= 1 shingle, UNthresholded, memo-persisted (r17).
    Three consumers executed this quadratic-in-hot-shingles self-join
    independently with zero exchange reuse (the r16 standing plan-audit
    class): q_dedup_near_jaccard (threshold filter), the
    q_minhash_band_sweep truth side (same filter), and
    q_minhash_est_audit's exact side (unthresholded left join). At
    production scale this is the sampled ground-truth pair table a
    calibration run writes once and every estimator audit reads.

    Inverted-index candidate generation: only doc pairs sharing >= 1
    shingle are ever scored (|A∩B| falls out of the same self-join that
    found the candidates — one shuffle, no second pass over the corpus).
    jaccard = inter / (|A| + |B| - inter): integer counts, one IEEE
    division — deterministic at any parallelism."""
    def build() -> DataFrame:
        s = _doc_shingles(spark, sf_dir)
        sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a = s.alias("a")
        b = s.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        na = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
        )
        nb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
        )
        jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        return (
            inter.join(na, "doc_a")
            .join(nb, "doc_b")
            .withColumn("jaccard", jac)
            .select("doc_a", "doc_b", "jaccard")
        )

    return _memo_persist(spark, sf_dir, "jaccard_pairs_all", build)


def q_dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over distinct 3-gram shingle sets
    (the jaccard_pairs_memo frame, threshold-filtered)."""
    return jaccard_pairs_memo(spark, sf_dir).filter(
        F.col("jaccard") >= F.lit(JACCARD_THRESHOLD)
    )


SQL_DEDUP_NEAR_JACCARD = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS shingle FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           inter / (na.n_sh + nb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE inter / (na.n_sh + nb.n_sh - inter) >= {JACCARD_THRESHOLD}
"""


# --- capped-frequency Jaccard (the 100 TB candidate-generation form) ------------

MAX_SHINGLE_DF = 20  # shingles in more docs than this carry ~no signal


def _capped_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-capped inverted shingle index, MATERIALIZED once: sizes +
    both self-join sides of every consumer (capped Jaccard, containment)
    read it, and without the boundary the df-count + semi-join would
    re-execute per consumer (measured 3x at sf0.1)."""
    def build() -> DataFrame:
        s = _doc_shingles(spark, sf_dir)
        freq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        rare = freq.filter(F.col("df") <= MAX_SHINGLE_DF).select("shingle")
        return s.join(rare, "shingle", "left_semi")

    return _memo_persist(spark, sf_dir, "shingles_capped", build)


def q_dedup_near_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup Jaccard over the capped shingle universe: shingles with
    document frequency > MAX_SHINGLE_DF are dropped BEFORE candidate
    generation (from both the intersection and the set sizes, so the
    measure stays a true Jaccard over informative shingles).

    This is the standard production form of q_dedup_near_jaccard: the
    self-join cost is sum(df^2) per shingle, so the Zipf head ("in the",
    boilerplate headers) contributes quadratic work and near-zero signal.
    The cap bounds per-shingle join fan-out at MAX_SHINGLE_DF^2 — the
    difference between an O(N^2) head blow-up and linear scaling in
    corpus size. Same oracle-checked determinism as the exact variant.
    """
    s2 = _capped_shingles(spark, sf_dir)
    sizes = s2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = s2.alias("a")
    b = s2.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
        .select("doc_a", "doc_b", "jaccard")
    )


SQL_DEDUP_NEAR_CAPPED = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS shingle FROM toks
    ), rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh2 AS (
        SELECT sh.doc_id, sh.shingle FROM sh
        WHERE sh.shingle IN (SELECT shingle FROM rare)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           inter / (na.n_sh + nb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE inter / (na.n_sh + nb.n_sh - inter) >= {JACCARD_THRESHOLD}
"""


# --- directed containment (subset/quote duplication) -------------------------------

CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment |A∩B| / |A| over the capped shingle index —
    the subset-duplication detector Jaccard structurally misses: a short
    document fully quoted inside a long one has containment ~1.0 but
    Jaccard ~|A|/|B| (arbitrarily small), so a Jaccard-only dedup keeps
    the redundant subset. Output is one row per contained doc per host
    above CONTAINMENT_THRESHOLD.

    Scale shape: the SAME single self-join + per-pair aggregate as the
    capped Jaccard pass over the SAME memoized df-capped index (one
    materialization feeds both operators); both directions of each
    undirected pair are emitted from one aggregate via stack() — no
    second join, no doubled candidate generation. The thresholded pair
    frame is itself memoized (late round 7): the catalog entry, the
    cross-source leak matrix, and the source PageRank all consume it,
    and without the boundary each consumer re-ran the self-join +
    aggregate (no cross-branch CSE)."""
    sizes_inter = _containment_pairs(spark, sf_dir)
    return sizes_inter


def _containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host_id, containment) directed pairs above
    CONTAINMENT_THRESHOLD, MATERIALIZED — shared by q_dedup_containment
    and the source-level governance views built on top of it
    (q_cross_source_leak, q_source_pagerank)."""
    def build() -> DataFrame:
        s2 = _capped_shingles(spark, sf_dir)
        sizes = s2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a = s2.alias("a")
        b = s2.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        na = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
        )
        nb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
        )
        return (
            inter.join(na, "doc_a")
            .join(nb, "doc_b")
            # try_divide: long/long must be IEEE double division (matching
            # DuckDB int/int -> DOUBLE), not Spark integer division
            .withColumn("c_ab", F.try_divide(F.col("inter"), F.col("n_a")))
            .withColumn("c_ba", F.try_divide(F.col("inter"), F.col("n_b")))
            .select(
                F.expr(
                    "stack(2, doc_a, doc_b, c_ab, doc_b, doc_a, c_ba) "
                    "AS (doc_id, host_id, containment)"
                )
            )
            .filter(F.col("containment") >= F.lit(CONTAINMENT_THRESHOLD))
        )

    return _memo_persist(spark, sf_dir, "containment_pairs", build)


SQL_DEDUP_CONTAINMENT = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS shingle FROM toks
    ), rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh2 AS (
        SELECT sh.doc_id, sh.shingle FROM sh
        WHERE sh.shingle IN (SELECT shingle FROM rare)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), c AS (
        SELECT doc_a, doc_b,
               inter / na.n_sh AS c_ab,
               inter / nb.n_sh AS c_ba
        FROM inter
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
    )
    SELECT doc_a AS doc_id, doc_b AS host_id, c_ab AS containment
    FROM c WHERE c_ab >= {CONTAINMENT_THRESHOLD}
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS host_id, c_ba AS containment
    FROM c WHERE c_ba >= {CONTAINMENT_THRESHOLD}
"""



# --- MinHash + LSH ---------------------------------------------------------------

# --- SimHash -----------------------------------------------------------------

N_SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over distinct token hashes: bit j is
    set iff sum over tokens of (+1 if bit j of md5-hash set else -1)
    is >= 0. Near-dup docs land at small Hamming distance; dedup then
    buckets on simhash (exact-match buckets here; a production pass also
    bands bit-slices for distance<=k). All integer ops — exact oracle
    parity — and one pass over the materialized token table."""
    from ..functions.texthash import md5_hash64

    hcol = F.col("h")

    def bit_vote(j: int) -> Column:
        return F.aggregate(
            hcol,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)),
        )

    sim = F.lit(0)
    for j in range(N_SIMHASH_BITS):
        sim = sim + F.when(bit_vote(j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))

    def build_hashed() -> DataFrame:
        hashes = F.array_distinct(
            F.transform(F.col("t"), lambda tk: md5_hash64(tk))
        )
        return (
            _doc_tokens(spark, sf_dir)
            .select("doc_id", hashes.alias("h"))
            .filter(F.size("h") > 0)
        )

    hashed = _memo_persist(spark, sf_dir, "token_hashes", build_hashed)
    return hashed.select("doc_id", sim.cast("long").alias("simhash"))


def _sql_bit_vote(j: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(h, x -> ((x >> {j}) & 1) * 2 - 1)), (a, b) -> a + b)"
    )


SQL_DEDUP_SIMHASH = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(t,
                   s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS h
        FROM toks
    )
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN {_sql_bit_vote(j)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(N_SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM hs WHERE len(h) > 0
"""


# --- MinHash + LSH ---------------------------------------------------------------

# 8 affine hash functions (a*h + b) mod MOD; a,b < 2^21 so a*h < 2^51.
MINHASH_AB = (
    (131, 7),
    (8191, 101),
    (524287, 3571),
    (999983, 65537),
    (1299709, 9176),
    (746777, 28657),
    (611953, 514229),
    (104729, 1299721),
)
N_HASHES = len(MINHASH_AB)
MINHASH_EST_THRESHOLD = 0.25


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> array<long> MinHash signature over distinct 3-gram
    shingles (docs with <3 tokens carry no signature)."""
    # Two materialization boundaries: `h` (so the 8 sig components + the
    # size filter evaluate the md5 pipeline ONCE per row instead of 17x —
    # CollapseProject would inline it) and `sig` (reused by the band
    # explode and both sides of the candidate join). The signature table
    # is k*8 bytes/doc — at 100 TB scale it is written out once and
    # reused by every dedup pass; the memoized persist is the in-session
    # form.
    def build_hashed() -> DataFrame:
        sh = F.array_distinct(shingles_col(F.col("t")))
        hashes = F.array_distinct(F.transform(sh, lambda s: md5_hash_mod(s)))
        return (
            _doc_tokens(spark, sf_dir)
            .select("doc_id", hashes.alias("h"))
            .filter(F.size("h") > 0)
        )

    def build_sigs() -> DataFrame:
        hashed = _memo_persist(spark, sf_dir, "shingle_hashes", build_hashed)
        sig = F.array(
            *[minhash_component(F.col("h"), a, b) for a, b in MINHASH_AB]
        )
        return hashed.select("doc_id", sig.alias("sig"))

    return _memo_persist(spark, sf_dir, "signatures", build_sigs)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 8 bands of 1 row (candidate iff
    ANY signature component collides), then estimated Jaccard = fraction
    of equal components. The pair join runs over (band, value) buckets —
    signatures only, never shingle sets — which is what keeps this
    sub-quadratic at corpus scale."""
    sigs = minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.col("sig")).alias("band", "v"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", matches / F.lit(float(N_HASHES)))
        .filter(F.col("est_jaccard") >= F.lit(MINHASH_EST_THRESHOLD))
        .select("doc_a", "doc_b", "est_jaccard")
    )


def _sql_sig_components() -> str:
    comps = ", ".join(
        sql_minhash_component("h", a, b) for a, b in MINHASH_AB
    )
    return f"[{comps}]"


SQL_DEDUP_MINHASH = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(list_distinct({SQL_SHINGLES}),
                   s -> (('0x' || substr(md5(s), 1, 15))::BIGINT) % {MOD})) AS h
        FROM toks
    ), sig AS (
        SELECT doc_id, {_sql_sig_components()} AS sig
        FROM hs WHERE len(h) > 0
    ), bands AS (
        SELECT doc_id,
               unnest(generate_series(0, {N_HASHES - 1})) AS band,
               unnest(sig) AS v
        FROM sig
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           len(list_filter(list_transform(generate_series(1, {N_HASHES}),
               i -> sa.sig[i] = sb.sig[i]), x -> x)) / {float(N_HASHES)}
               AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE len(list_filter(list_transform(generate_series(1, {N_HASHES}),
          i -> sa.sig[i] = sb.sig[i]), x -> x)) / {float(N_HASHES)}
          >= {MINHASH_EST_THRESHOLD}
"""


# --- cluster resolution (connected components over near-dup pairs) ---------------

CLUSTER_PROP_ROUNDS = 8  # covers component diameter <= 8 (see docstring)


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized (doc_a, doc_b) near-dup edges from the capped-Jaccard
    pass — the input every cluster-resolution step shares. At 100 TB the
    pair table is written out by the dedup job; memoized persist is the
    in-session form (same contract as the token/shingle tables)."""
    return _memo_persist(
        spark,
        sf_dir,
        "neardup_pairs",
        lambda: q_dedup_near_capped(spark, sf_dir).select("doc_a", "doc_b"),
    )


def cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (doc, label) connected-component labels over the
    near-dup pair graph — the fixpoint now has THREE consumers
    (q_dedup_cluster, text.q_dedup_keeper_quality,
    quality.q_dataset_split_by_cluster), and resolve_clusters is EAGER,
    so without this memo each consumer re-runs the whole iterate-to-
    convergence job chain. At 100 TB the label table is a stored
    artifact of the dedup job; the memoized persist is the in-session
    form (same contract as neardup_pairs / the token tables)."""
    cached = _memo_get(spark, sf_dir, "neardup_cluster_labels")
    if cached is not None:
        return cached
    pairs = neardup_pairs(spark, sf_dir)
    labels = resolve_clusters(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return _memo_persist(spark, sf_dir, "neardup_cluster_labels", labels)


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: connected components over the
    capped-Jaccard pair graph, min-doc_id label per component, keeper =
    the labeling doc. Pairwise near-dup output alone can't drive dedup —
    if A~B and B~C, dropping per-pair keeps one of {A,B} and one of
    {B,C}; the component (A,B,C) must collapse to ONE keeper.

    Delegates to resolve_clusters(), the iterate-to-fixpoint form, so
    this catalog entry is unconditionally equivalent to its exact
    recursive-CTE oracle at ANY component diameter (round-2 ADVICE: a
    bounded-round plan registered against an exact oracle silently
    diverges on components deeper than its round budget). The bounded
    LAZY plan survives below as q_dedup_cluster_bounded — the fixed-size
    plan for embedding in a lazy sink pipeline when the diameter bound
    is known; parity of both on the real graph is pinned in
    tests/test_dedup.py."""
    labels = cluster_labels(spark, sf_dir)
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_keeper"),
    )


def q_dedup_cluster_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round min-label propagation — a LAZY fixed plan (the sink
    contract, sinks.py), exact only for components of diameter <=
    CLUSTER_PROP_ROUNDS; near-dup components are short chains in
    practice (diameter grows only through chained borderline pairs).

    Plan: min-label propagation over the adjacency WITH SELF-LOOPS, so
    each round is exactly `adj ⋈ labels → groupBy(dst).min(label)` —
    the labels frame is referenced ONCE per round (a labels-join-labels
    round would double the lazy plan every iteration: 2^k sub-plans).
    One hash join + one partial-agg shuffle of 8-byte doc ids per
    round; after k rounds every node holds the min label within k
    hops."""
    # undirected adjacency + self-loops: the self-loop carries a node's
    # own label through the neighbor-min, replacing a second labels ref
    def build_adj() -> DataFrame:
        pairs = neardup_pairs(spark, sf_dir)
        return (
            pairs.select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
            )
            .unionByName(
                pairs.select(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                )
            )
            .unionByName(
                pairs.select(F.col("doc_a").alias("doc"))
                .unionByName(pairs.select(F.col("doc_b").alias("doc")))
                .distinct()
                .select(F.col("doc").alias("src"), F.col("doc").alias("dst"))
            )
        )

    adj = _memo_persist(spark, sf_dir, "neardup_adj", build_adj)
    labels = adj.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("doc"), F.col("src").alias("label")
    )
    for _ in range(CLUSTER_PROP_ROUNDS):
        labels = (
            adj.join(labels, F.col("src") == F.col("doc"))
            .groupBy(F.col("dst"))
            .agg(F.min("label").alias("label"))
            .select(F.col("dst").alias("doc"), "label")
        )
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_keeper"),
    )


# Broadcast the fixpoint's label/neighbor frames only while they are
# demonstrably small: 2M (doc, label) long pairs ≈ 32 MB built — far
# under the 8 GB broadcast cap, safely inside executor memory.
_CLUSTER_BCAST_MAX = 2_000_000


def resolve_clusters(edges: DataFrame) -> DataFrame:
    """Iterate-to-fixpoint connected components over an undirected
    (src, dst) edge frame — the production form for graphs whose
    diameter is unknown. Plain neighbor-min propagation shrinks each
    node's distance-to-label by ONE hop per round, so convergence is
    O(diameter) rounds (no pointer jumping — a labels-to-labels
    short-circuit join would halve distances per round at the cost of
    referencing the label frame twice; near-dup graphs have small
    diameters, so the simpler form wins). Convergence is checked with a
    1-row count (changed labels), and localCheckpoint truncates the
    growing lineage every round (iterative plans otherwise re-derive
    all prior rounds). Eager by contract: returns (doc, label).

    Round structure (r17 rewrite, measured 9 rounds x ~1 s fixed
    per-round cost on a 771-node graph — per-round overhead, not data,
    dominates):

    - one HOP: min over {own label} ∪ {neighbors' labels}, as a single
      join + union + partial-combined min aggregate (the old form used
      a second join to carry old_label through for the convergence
      count);
    - one COMPRESSION: label <- label(label) (pointer jumping), which
      doubles the propagated distance per round, so convergence is
      O(log diameter) rounds instead of O(diameter). Labels are always
      ids of nodes in the same component (induction from self-labels),
      so compressing through them cannot cross components, and the
      fixpoint — min id per component — is unchanged;
    - convergence via the exact DECIMAL(38,0) sum of labels: min-label
      propagation only ever DECREASES labels, so the sum is strictly
      decreasing until the fixpoint and equal sums mean zero changes —
      a 1-row aggregate instead of a join-back + filter count.

    Join strategy is chosen from a MEASURED node count (guide-§3 "pick
    the strategy deliberately"): a localCheckpoint leaf has no catalyst
    statistics, so every per-round join used to default to a full
    SortMergeJoin; the node count is known exactly after round 0's
    materialization, so while it is under _CLUSTER_BCAST_MAX the label
    frames take an explicit broadcast hint; a graph that exceeds the
    bound keeps the shuffle joins unchanged."""
    spark = edges.sparkSession
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        both.select(F.col("src").alias("doc"))
        .distinct()
        .select("doc", F.col("doc").alias("label"))
        .localCheckpoint()
    )
    # the count is a cheap action on the just-materialized checkpoint
    # blocks; it buys exact size knowledge the planner lost with the
    # checkpoint (stats-free LogicalRDD leaf)
    n_nodes = labels.count()
    bcast = n_nodes <= _CLUSTER_BCAST_MAX
    hint = F.broadcast if bcast else (lambda df: df)
    # partition the per-round frames by MEASURED size, not by the
    # session default: a 771-node graph on 32+32-partition inputs pays
    # 64 task launches per stage per round for microseconds of work.
    # ~200k nodes per partition; never below the cluster parallelism
    # for graphs big enough to use it.
    p = max(1, min(spark.sparkContext.defaultParallelism,
                   n_nodes // 200_000 + 1))
    both = both.coalesce(p).localCheckpoint()
    labels = labels.coalesce(p)
    label_sum = None
    while True:
        hop = (
            both.join(
                hint(
                    labels.select(
                        F.col("doc").alias("src_doc"),
                        F.col("label").alias("src_label"),
                    )
                ),
                F.col("src") == F.col("src_doc"),
            )
            .select(
                F.col("dst").alias("doc"), F.col("src_label").alias("label")
            )
            .unionByName(labels)
            .groupBy("doc")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        compressed = (
            hop.alias("x")
            .join(
                hint(
                    hop.select(
                        F.col("doc").alias("lb"), F.col("label").alias("l2")
                    )
                ),
                F.col("x.label") == F.col("lb"),
                "left",
            )
            .select(
                F.col("x.doc").alias("doc"),
                F.least(
                    F.col("x.label"),
                    F.coalesce(F.col("l2"), F.col("x.label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        # 1-row convergence scalar (the sanctioned fixpoint-action
        # class, same as the old per-round count()); NULL sum means an
        # empty node set — trivially converged
        new_sum = compressed.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels = compressed
        if new_sum is None or (
            label_sum is not None and new_sum == label_sum
        ):
            return labels
        label_sum = new_sum


SQL_DEDUP_CLUSTER = f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({SQL_DEDUP_NEAR_CAPPED})
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), reach(doc, label) AS (
        SELECT DISTINCT src AS doc, src AS label FROM edges
        UNION
        SELECT e.dst AS doc, r.label
        FROM reach r JOIN edges e ON e.src = r.doc
    )
    SELECT doc AS doc_id, MIN(label) AS cluster_id,
           (MIN(label) = doc) AS is_keeper
    FROM reach GROUP BY doc
"""


# --- benchmark decontamination -----------------------------------------------------

EVAL_SOURCE = "src0"  # stand-in held-out benchmark slice of the corpus


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one 3-gram shingle with the held-out eval slice
    (source = EVAL_SOURCE), reporting how many of its distinct shingles
    are compromised. Standard pretraining hygiene — eval n-grams leaking
    into the training set inflate benchmark scores.

    Scale shape: the eval side is a fixed benchmark suite (megabytes of
    distinct shingles even when the corpus is 100 TB), so it is
    collect-free BROADCAST-hash-joined against the exploded corpus
    shingles — the corpus side streams through the prebuilt hash map
    with no shuffle for the membership test; the only corpus-scale
    exchange is the per-doc count aggregation (partial map-side combine
    reduces it to one row per doc before the wire). A LEFT join keeps
    clean shingles so total and shared counts come from the SAME
    aggregate (no second pass / no rejoin)."""
    sh = _doc_shingles(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("source") == EVAL_SOURCE)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = sh.filter(F.col("source") != EVAL_SOURCE)
    return (
        corpus.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
        .select(
            "doc_id",
            "n_shared",
            # one bigint/bigint IEEE division — bit-identical in the oracle
            F.try_divide(F.col("n_shared"), F.col("n_shingles")).alias(
                "shared_frac"
            ),
        )
    )


SQL_DECONTAMINATE = f"""
    WITH tok AS (
        SELECT doc_id, source, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, source, list_distinct({SQL_SHINGLES}) AS shl FROM tok
    ), e AS (
        SELECT doc_id, source, unnest(shl) AS shingle FROM sh
    ), ev AS (
        SELECT DISTINCT shingle FROM e WHERE source = '{EVAL_SOURCE}'
    ), per AS (
        SELECT e.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared
        FROM e LEFT JOIN ev USING (shingle)
        WHERE e.source <> '{EVAL_SOURCE}'
        GROUP BY e.doc_id
    )
    SELECT doc_id, n_shared, n_shared / n_shingles AS shared_frac
    FROM per WHERE n_shared > 0
"""


# --- line/segment-grain exact dedup (sub-document dedup) ---------------------------

# Pseudo-line width for the catalog entry: the synthetic corpus has no
# newlines (single-line docs, all distinct), so exact dedup at '\n'
# grain is vacuous on the testdata. Non-overlapping 5-token segments
# repeat across the generated near-dup docs (241 duplicate occurrences
# at sf0.01), so the catalog pair actually exercises the keeper window.
LINE_SEG_TOKENS = 5


def token_segments_col(toks: Column, w: int) -> Column:
    """Non-overlapping w-token segments of a token array (the tail stub
    shorter than w is dropped — a partial segment can't match a full
    one). The pseudo-line segmentation for newline-free corpora.

    The n_seg >= 1 guard is load-bearing: Spark's sequence(1, 0)
    defaults its step to -1 and returns the DESCENDING [1, 0], so an
    unguarded short doc (< w tokens) would emit a stub segment plus an
    empty-string segment — phantom rows the DuckDB oracle's
    generate_series(1, 0) (empty) never produces, and every short
    doc's '' segment would exact-match every other's (same contract as
    shingles_col's < n guard)."""
    n_seg = F.floor(F.size(toks) / F.lit(w)).cast("int")
    return F.when(
        n_seg >= F.lit(1),
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - F.lit(1)) * F.lit(w) + F.lit(1), F.lit(w))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def newline_lines_col(text: Column) -> Column:
    """The production segmentation: '\n'-split, trimmed, empties dropped
    (C4/RefinedWeb-style line grain). Not used by the catalog entry —
    the testdata is newline-free (see LINE_SEG_TOKENS)."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def _line_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, seg) segment table at LINE_SEG_TOKENS grain,
    memoized-persisted: shared by the exact keeper pass (which projects
    it down to md5 triples), the near-dup banding pass (which hashes
    segment tokens), and the rebuild join (which carries the text). At
    100 TB this is the write-the-segment-table-once boundary — every
    sub-document pass reads it instead of re-exploding the corpus; the
    memoized persist() is the in-session form (same contract as the
    token/shingle tables)."""
    def build() -> DataFrame:
        docs = _parallel_scan(spark, load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id",
            F.posexplode(
                token_segments_col(tokens_col(F.col("text")), LINE_SEG_TOKENS)
            ).alias("pos", "seg"),
        )

    return _memo_persist(spark, sf_dir, "line_segments", build)


def line_keep_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, keep) per line/segment: keep iff this occurrence is
    the GLOBAL first (min doc_id, then min pos) of its exact normalized
    content across the whole corpus — the C4-style repeated-line killer
    at sub-document grain. A reconstruction job joins these flags back
    to the exploded lines and re-assembles kept text per doc
    (q_dedup_lines_rebuild below).

    Scale shape: only (doc_id, pos, md5) triples enter the keeper
    window — the line TEXT never shuffles; the one data-scale exchange
    hash-partitions 16-byte digests. Everything upstream is per-row
    explode work inside codegen."""
    from pyspark.sql import Window

    segs = _line_segments(spark, sf_dir)
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    return (
        segs.select("doc_id", "pos", F.md5(F.col("seg")).alias("h"))
        .withColumn("keep", F.row_number().over(w) == F.lit(1))
        .select("doc_id", "pos", "keep")
    )


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document line-dedup summary over line_keep_flags: how many
    lines/segments the doc has, how many it keeps (first global
    occurrence), and the duplicated-line fraction — the screen a
    curation pipeline thresholds on to drop boilerplate-heavy docs.

    Scale shape: keeper window (one md5-keyed exchange of id triples)
    then one doc_id-keyed agg with map-side partial sums."""
    flags = line_keep_flags(spark, sf_dir)
    return (
        flags.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            # single IEEE division, bit-identical in the oracle
            (F.lit(1.0) - F.try_divide(F.col("n_kept"), F.col("n_lines"))).alias(
                "dup_line_frac"
            ),
        )
    )


SQL_DEDUP_LINES = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    seg AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(toks[(i-1)*{LINE_SEG_TOKENS}+1 : i*{LINE_SEG_TOKENS}], ' ') AS seg
        FROM t, unnest(generate_series(1,
                 CAST(floor(len(toks) / {LINE_SEG_TOKENS}.0) AS INT))) AS u(i)
    ), k AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY md5(seg)
                                  ORDER BY doc_id, pos) = 1 AS keep
        FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           1.0 - (CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                  / CAST(COUNT(*) AS BIGINT)) AS dup_line_frac
    FROM k GROUP BY doc_id
"""


# --- line/segment-grain NEAR dedup (deletion-neighborhood blocking) ----------------

# True token-set Jaccard floor for segment pairs. 13/20 = 0.65 admits
# exactly the one-edit family at w=5 grain (substitute one token of
# five -> J = 4/6; drop/add one -> 4/5) and sits ABOVE the delete-one
# blocking completeness bound (w-2)/(w+2) = 3/7 — see
# q_dedup_lines_near. Kept as an exact rational so the Spark-side
# filter can run in pure int64 arithmetic
# (DEN*i >= NUM*(union) <=> i/union >= NUM/DEN) while the oracle
# filters the IEEE double; no attainable J value at this grain
# (i <= 5, union <= 10) ever EQUALS 13/20, so the two forms select
# identical pairs.
SEG_NEAR_JACCARD_NUM = 13
SEG_NEAR_JACCARD_DEN = 20
SEG_NEAR_JACCARD_THRESHOLD = SEG_NEAR_JACCARD_NUM / SEG_NEAR_JACCARD_DEN


def q_dedup_lines_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy line/segment-grain near-dup — the varying-boilerplate
    catcher (navigation chrome, footers with rotating dates/IDs) that
    exact `dedup_lines` misses. Emits distinct-content segment pairs
    with TRUE token-set Jaccard >= SEG_NEAR_JACCARD_THRESHOLD, each
    side identified by the canonical (min doc_id, min pos) occurrence.

    Candidate generation is DELETION-NEIGHBORHOOD blocking (the
    SymSpell construction), not minhash banding: each distinct segment
    emits its full sorted token set plus every delete-one subset as
    16-byte md5 block keys (<= w+1 keys). Two segments with
    |intersect| >= max(|A|,|B|) - 1 share a key BY CONSTRUCTION, and at
    w-token grain |intersect| <= max-2 forces J <= (w-2)/(w+2) = 3/7 <
    0.65 — so blocking loses ZERO qualifying pairs and the oracle can
    be the naive all-pairs quadratic (the word_variants proof pattern).
    Minhash banding was measured and rejected for this grain: an
    8-sample estimate over <= 5-element token sets is so coarse that
    est >= 0.5 passed 367k segment pairs at sf0.01, and banded recall
    is probabilistic (~(1-J)^8 misses), which would force the oracle to
    mirror the bands instead of proving completeness. Banding remains
    the right tool at DOC grain (q_dedup_minhash) and for long
    newline-grain lines, where the completeness bound (L-2)/(L+2)
    exceeds any useful threshold.

    Scale shape, in order of what would kill it at 100 TB:
    (1) exact-dup collapse BEFORE blocking — a boilerplate line
        repeated k times (k reaches 10^6+ on web corpora) would emit
        k^2 pairs; after the keeper window each distinct content
        enters the join once, so multiplicity never amplifies it;
    (2) only (doc_id, pos, md5, sorted-token-set) rows enter the
        keeper window and only (8-byte key, ids, token set) rows enter
        the block join — segment text never shuffles;
    (3) the Jaccard verify runs INSIDE the block join's output
        projection, before any further exchange: candidate pairs are
        filtered to qualifying pairs in codegen as the join streams,
        so the only post-join shuffle (the dedup `distinct`) sees
        qualifying rows, never the raw candidate volume;
    (4) hot block keys (stopword-only segments) carry the same
        sum(freq^2) caveat as the doc-grain inverted index: a
        production run drops keys above a doc-freq cap (they pair
        near-identical boilerplate that EXACT line dedup already
        collapses); uncapped here to keep oracle semantics exact.

    Expression-level design (measured, round 5): the first cut emitted
    RAW candidate (md5_a, md5_b) string pairs, ran `distinct` on them,
    and joined the survivors back to the canon table twice to fetch
    token sets — the distinct + join-backs alone measured 10.4 s wall
    (~100 CPU-s) at sf0.1, the whole query ~17 s, because every raw
    candidate crossed an exchange as a 64-byte string pair before any
    filtering. It also built delete-one keys with a higher-order
    `transform(sequence(...))` lambda around md5 — LambdaFunction
    expressions are not whole-stage-codegen-able, so the key build ran
    interpreted. This version fixes both: token sets ride through the
    block join so the verify filter runs in the join's own codegen'd
    projection (nothing but QUALIFYING pairs ever reaches the dedup
    `distinct`), and the key build is explode-first + `array_remove` +
    an md5-derived int64 of the subset contents — plain codegen-able
    nodes, 8-byte long join keys. Warm sf0.1 runtime dropped
    ~17 s -> ~1.7 s. For THIS uncapped form any injective-in-practice
    hash suffices (block keys never reach the naive all-pairs oracle;
    a collision merely creates a spurious candidate that the exact
    verify filters — completeness needs equal sets to collide,
    guaranteed), but the key build is shared with the capped twin,
    whose df-cap oracle must see identical collisions, so both use the
    portable md5 discipline (r6 ADVICE). The verify filter
    itself runs in pure int64 arithmetic (DEN*i >= NUM*union); the
    output jaccard double is computed only for qualifying rows."""
    return _seg_near_pairs(spark, sf_dir, max_key_df=None)


# Block keys in more distinct segments than this are dropped by the
# capped variant before the self-join. Measured on the synthetic corpus
# (DuckDB probe, round 6): sf0.01 max key df = 7 (cap drops NOTHING —
# capped output == uncapped at driver scale), sf0.1 max df = 30 with
# df>20 keys carrying ~3% of sum(df^2) join work. On a real web corpus
# the dropped keys are stopword-only boilerplate whose exact-dup family
# `dedup_lines` already collapses.
MAX_SEG_BLOCK_DF = 20


def q_dedup_lines_near_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of q_dedup_lines_near: block keys with segment
    frequency > MAX_SEG_BLOCK_DF are dropped BEFORE the self-join —
    the same df-cap discipline as q_dedup_near_capped (doc grain),
    closing the one scale caveat q_dedup_lines_near documents. The
    self-join cost is sum(df^2) per block key, so an uncapped hot key
    (a stopword-only segment family) contributes quadratic work for
    pairs that are near-identical boilerplate; the cap bounds fan-out
    at MAX_SEG_BLOCK_DF^2 per key. Unlike the uncapped twin this is
    NOT provably complete — pairs whose every shared block key is hot
    are lost — which is exactly the documented production trade; the
    oracle mirrors the cap EXACTLY (r6 ADVICE): both engines hash the
    chr(1)-joined subset contents through the portable md5-derived
    int64, so key dfs — collisions included — are identical by
    construction, not merely negligible-probability identical."""
    return _seg_near_pairs(spark, sf_dir, max_key_df=MAX_SEG_BLOCK_DF)


def _seg_near_pairs(
    spark: SparkSession, sf_dir: str, max_key_df: int | None
) -> DataFrame:
    from pyspark.sql import Window

    thr_bound = (LINE_SEG_TOKENS - 2) / (LINE_SEG_TOKENS + 2)
    if SEG_NEAR_JACCARD_THRESHOLD <= thr_bound:
        raise RuntimeError(
            f"threshold {SEG_NEAR_JACCARD_THRESHOLD} <= completeness bound "
            f"{thr_bound}: delete-one blocking would lose pairs"
        )

    def build_canon() -> DataFrame:
        segs = _line_segments(spark, sf_dir)
        w = Window.partitionBy("h").orderBy("doc_id", "pos")
        ts = F.array_sort(F.array_distinct(F.split(F.col("seg"), " ")))
        return (
            segs.select(
                "doc_id", "pos", F.md5(F.col("seg")).alias("h"), ts.alias("ts")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == F.lit(1))
            .drop("rn")
        )

    canon = _memo_persist(spark, sf_dir, "seg_token_sets", build_canon)
    # Block keys: hash of the full sorted set, plus hash of every
    # delete-one subset (ts is distinct, so array_remove(ts, x) is
    # exactly the subset without x). The hash is the repo's PORTABLE
    # md5-derived int64 over the chr(1)-joined subset contents (r6
    # ADVICE): the capped oracle hashes the identical string, so even a
    # cross-set collision that merges two keys and perturbs a df count
    # happens IDENTICALLY in both engines — the one place an
    # engine-private hash could have changed results rather than just
    # candidates. Still an 8-byte long join key in codegen.
    # Memoized (r6 verdict ask #3): the full ∪ delete-one explode feeds
    # THREE consumers in the capped path (the `rare` df-count aggregate
    # and both sides of the a×b self-join) and two in the uncapped one;
    # Spark has no cross-branch CSE, so without materialization the
    # explode + array_remove + md5 key build re-runs per consumer
    # (driver + two clean-host runs all measured the capped form past
    # its 10 s regression bar; the uncapped twin shares the fix).
    def build_keys() -> DataFrame:
        _key = lambda ts_col: md5_hash64(F.concat_ws("\x01", ts_col))
        base = canon.select("doc_id", "pos", "ts")
        full = base.select(
            "doc_id", "pos", "ts", _key(F.col("ts")).alias("k")
        )
        dels = base.select(
            "doc_id", "pos", "ts", F.explode(F.col("ts")).alias("x")
        ).select(
            "doc_id",
            "pos",
            "ts",
            _key(F.array_remove(F.col("ts"), F.col("x"))).alias("k"),
        )
        return full.unionByName(dels)

    keys = _memo_persist(spark, sf_dir, "seg_block_keys", build_keys)
    if max_key_df is not None:
        # df-cap as a WINDOW count over k, not groupBy+left_semi (r17,
        # guide §2.4: a window partitioned by the join key needs no
        # exchange beyond the one the join itself demands). The old
        # agg+semi shape ran the count aggregate plus a LeftSemi merge
        # per join side; the window form establishes the k partitioning
        # once and the a×b self-join below consumes it already
        # partitioned AND sorted — warm sf0.1 A/B: 3.55-3.83 s ->
        # 1.52-2.08 s, output exceptAll-identical both ways. Skew
        # exposure is unchanged: either form must co-locate a hot key's
        # rows once before dropping them; the window drops them after a
        # linear count instead of after a sort-merge probe.
        wdf = Window.partitionBy("k")
        keys = (
            keys.withColumn("df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("df") <= F.lit(max_key_df))
            .drop("df")
        )
    a = keys.alias("a")
    b = keys.alias("b")
    first_lt = (F.col("a.doc_id") < F.col("b.doc_id")) | (
        (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.pos") < F.col("b.pos"))
    )
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter
    qualifies = (
        F.lit(SEG_NEAR_JACCARD_DEN) * inter
        >= F.lit(SEG_NEAR_JACCARD_NUM) * union
    )
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & first_lt)
        .filter(qualifies)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.pos").alias("pos_b"),
            (inter / union.cast("double")).alias("jaccard"),
        )
        .distinct()
    )


_SQL_SEG_CTES = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    seg AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(toks[(i-1)*{LINE_SEG_TOKENS}+1 : i*{LINE_SEG_TOKENS}], ' ') AS seg
        FROM t, unnest(generate_series(1,
                 CAST(floor(len(toks) / {LINE_SEG_TOKENS}.0) AS INT))) AS u(i)
    )"""

# Naive all-pairs oracle — deliberately QUADRATIC over distinct segment
# contents: a hash match proves the delete-one blocking loses zero
# qualifying pairs (the completeness bound above), the same role the
# naive-join oracle plays for word_variants.
SQL_DEDUP_LINES_NEAR = f"""
    {_SQL_SEG_CTES},
    hs AS (
        SELECT doc_id, pos, md5(seg) AS h,
               list_sort(list_distinct(string_split(seg, ' '))) AS ts
        FROM seg
    ), canon AS (
        SELECT doc_id, pos, h, ts FROM hs
        QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) = 1
    )
    SELECT a.doc_id AS doc_a, a.pos AS pos_a,
           b.doc_id AS doc_b, b.pos AS pos_b,
           len(list_intersect(a.ts, b.ts))
             / CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                    AS DOUBLE) AS jaccard
    FROM canon a JOIN canon b
      ON (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos))
    WHERE len(list_intersect(a.ts, b.ts))
            / CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                   AS DOUBLE) >= {SEG_NEAR_JACCARD_THRESHOLD}
"""

# Capped-variant oracle: mirrors the BLOCKING + df-cap exactly (not the
# naive all-pairs form — the cap deliberately loses hot-key-only pairs,
# so completeness-vs-naive no longer holds and the oracle must replicate
# the candidate generation). Block keys are the portable md5-derived
# int64 of the subset CONTENTS joined with chr(1) (never appears in
# \\W+-tokenized words) — the IDENTICAL hash Spark computes, so per-key
# dfs agree collisions-included (r6 ADVICE). DISTINCT matches the
# Spark-side .distinct() — a pair sharing several surviving keys must
# still emit once.
SQL_DEDUP_LINES_NEAR_CAPPED = f"""
    {_SQL_SEG_CTES},
    hs AS (
        SELECT doc_id, pos, md5(seg) AS h,
               list_sort(list_distinct(string_split(seg, ' '))) AS ts
        FROM seg
    ), canon AS (
        SELECT doc_id, pos, ts FROM hs
        QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) = 1
    ), keyed AS (
        SELECT doc_id, pos, ts,
               {SQL_MD5_HASH64.format(x="array_to_string(ts, chr(1))")} AS k
        FROM canon
        UNION ALL
        SELECT doc_id, pos, ts,
               {SQL_MD5_HASH64.format(
                   x="array_to_string(list_filter(ts, e -> e <> x), chr(1))"
               )} AS k
        FROM canon, unnest(ts) AS u(x)
    ), rare AS (
        SELECT k FROM keyed GROUP BY k HAVING COUNT(*) <= {MAX_SEG_BLOCK_DF}
    ), k2 AS (
        SELECT keyed.* FROM keyed WHERE k IN (SELECT k FROM rare)
    )
    SELECT DISTINCT a.doc_id AS doc_a, a.pos AS pos_a,
           b.doc_id AS doc_b, b.pos AS pos_b,
           len(list_intersect(a.ts, b.ts))
             / CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                    AS DOUBLE) AS jaccard
    FROM k2 a JOIN k2 b
      ON a.k = b.k
     AND (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos))
    WHERE {SEG_NEAR_JACCARD_DEN} * len(list_intersect(a.ts, b.ts))
            >= {SEG_NEAR_JACCARD_NUM} *
               (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
"""


# --- document reconstruction from keep flags ---------------------------------------


def q_dedup_lines_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reassemble each document's KEPT text after line-grain dedup —
    the artifact a tokenizer job actually consumes: line_keep_flags
    decides (ids + md5 only), then the kept segments concat back in
    position order.

    Scale shape: the keeper decision never touches text (see
    line_keep_flags); the segment TEXT moves exactly twice, which is
    the floor for reconstruction — once through the (doc_id, pos) join
    of flags onto the memoized segment table, once into the
    doc_id-keyed assembly agg. Docs with zero kept segments (pure
    boilerplate) and docs shorter than one segment emit no row — the
    downstream corpus simply drops them (inner-join semantics, mirrored
    by the oracle)."""
    segs = _line_segments(spark, sf_dir)
    flags = line_keep_flags(spark, sf_dir)
    kept = segs.join(flags, ["doc_id", "pos"]).filter(F.col("keep"))
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("kept_text"),
    )


SQL_DEDUP_LINES_REBUILD = f"""
    {_SQL_SEG_CTES},
    k AS (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY md5(seg)
                                  ORDER BY doc_id, pos) = 1 AS keep
        FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(seg, ' ' ORDER BY pos) AS kept_text
    FROM k WHERE keep GROUP BY doc_id
"""


# --- incremental dedup (new batch vs existing corpus) ------------------------------


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: classify each INCOMING document
    against the EXISTING corpus as exact-dup (byte-identical text
    already indexed), near-dup (MinHash band collision with estimated
    Jaccard >= threshold), or new. The daily-crawl-batch shape — at
    100 TB the existing side's digest table and signature table are
    PRECOMPUTED artifacts of prior runs (minhash_signatures documents
    the signature table as exactly that reusable artifact); here both
    sides derive from one corpus split by a content-stable md5 parity
    of doc_id so the oracle can reproduce the partition.

    Precedence exact > near_dup > new (a byte-identical doc also band-
    collides with itself-in-base; 'exact' wins so the cheap digest path
    decides before any signature work is consulted).

    Scale shape: exact is a left_semi on 16-byte digests (fingerprints
    shuffle, text never does); near is the LSH band join restricted to
    incoming x base — signatures only, sub-quadratic, identical plan
    family to q_dedup_minhash; both flags come back to the incoming
    frame as left_semi-derived joins, no row explosion."""
    from ..functions.texthash import md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    par = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        (md5_hash64(F.col("doc_id").cast("string")) % 2).alias("p"),
    )
    base = par.filter(F.col("p") == 0)
    inc = par.filter(F.col("p") == 1)

    exact = (
        inc.join(base.select("h").distinct(), "h", "left_semi")
        .select("doc_id")
        .withColumn("is_exact", F.lit(True))
    )

    sigs = minhash_signatures(spark, sf_dir)
    bands = sigs.select("doc_id", F.posexplode(F.col("sig")).alias("band", "v"))
    b_inc = bands.join(inc.select("doc_id"), "doc_id", "left_semi")
    b_base = bands.join(base.select("doc_id"), "doc_id", "left_semi")
    cand = (
        b_inc.alias("a")
        .join(
            b_base.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.v") == F.col("b.v")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("base_id")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_id"), F.col("sig").alias("sig_a"))
    sb = sigs.select(
        F.col("doc_id").alias("base_id"), F.col("sig").alias("sig_b")
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    near = (
        cand.join(sa, "doc_id")
        .join(sb, "base_id")
        .filter(
            matches / F.lit(float(N_HASHES)) >= F.lit(MINHASH_EST_THRESHOLD)
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_near", F.lit(True))
    )

    return (
        inc.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


SQL_DEDUP_INCREMENTAL = f"""
    WITH par AS (
        SELECT doc_id, md5(text) AS h,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 2 AS p
        FROM documents
    ), toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(list_distinct({SQL_SHINGLES}),
                   s -> (('0x' || substr(md5(s), 1, 15))::BIGINT) % {MOD})) AS h
        FROM toks
    ), sig AS (
        SELECT doc_id, {_sql_sig_components()} AS sig
        FROM hs WHERE len(h) > 0
    ), bands AS (
        SELECT doc_id,
               unnest(generate_series(0, {N_HASHES - 1})) AS band,
               unnest(sig) AS v
        FROM sig
    ), near AS (
        SELECT DISTINCT a.doc_id
        FROM bands a
        JOIN par pa ON pa.doc_id = a.doc_id AND pa.p = 1
        JOIN bands b ON a.band = b.band AND a.v = b.v
        JOIN par pb ON pb.doc_id = b.doc_id AND pb.p = 0
        JOIN sig sa ON sa.doc_id = a.doc_id
        JOIN sig sb ON sb.doc_id = b.doc_id
        WHERE len(list_filter(list_transform(generate_series(1, {N_HASHES}),
              i -> sa.sig[i] = sb.sig[i]), x -> x)) / {float(N_HASHES)}
              >= {MINHASH_EST_THRESHOLD}
    )
    SELECT i.doc_id,
           CASE WHEN EXISTS (SELECT 1 FROM par b
                             WHERE b.p = 0 AND b.h = i.h) THEN 'exact'
                WHEN i.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
                ELSE 'new' END AS status
    FROM par i
    WHERE i.p = 1
"""


# --- Bloom-filter decontamination (fixed-size broadcast membership) ----------------

# 2^16 bits packed into 1024 int64 words = an 8 KB broadcast constant
# regardless of eval-suite size; k=4 double-hashed probes
# (Kirsch-Mitzenmauer: pos_i = (h1 + i*h2) mod m) from the SAME
# md5-derived int64 the portable-hash tier uses, so the whole filter is
# bit-identical in DuckDB.
BLOOM_BITS = 1 << 16
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 4


def _bloom_positions_exprs(h_sql: str) -> list[str]:
    """SQL fragments for the k probe positions of a shingle whose
    md5-derived int64 is `h_sql` — shared verbatim by the Spark
    expressions and the DuckDB oracle (modulo engine function names)."""
    h1 = f"({h_sql}) % {BLOOM_BITS}"
    h2 = f"((({h_sql}) div {BLOOM_BITS}) % {BLOOM_BITS}) | 1"
    return [f"(({h1}) + {i} * ({h2})) % {BLOOM_BITS}" for i in range(BLOOM_K)]


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through an explicit Bloom filter: flag every
    training document with at least one shingle whose k probe bits are
    ALL set in a bitmap built from the eval slice's shingles.

    Why it exists next to q_decontaminate: the exact pass broadcasts the
    eval shingle SET (a hash relation proportional to the benchmark
    suite); this one broadcasts a FIXED 8 KB bitmap however large the
    suite grows — the membership structure a 100 TB run ships to every
    task when the eval suite stops being small. One-sided error by
    construction: no false negatives (every truly shared shingle probes
    only set bits), so flagged_exact ⊆ flagged_bloom — pinned by
    tests/test_round6_ops.py; false positives are the documented price
    and the reason the exact pass remains the oracle-grade screen.

    Plan shape: the eval-side build aggregates probe bits into ≤1024
    (word, bits) rows and densifies them into ONE array row; the corpus
    side crossJoins that 1-row broadcast (the repo's deliberate 1-row
    broadcast pattern, cf. streaming set-membership) and evaluates all
    k probes as pure row expressions — zero corpus-scale shuffle
    besides the final per-doc aggregate. Everything is md5-derived
    int64 arithmetic, so the DuckDB oracle reproduces the exact same
    bitmap and flags (bit-set membership ≡ probe-position membership)."""
    sh = _doc_shingles(spark, sf_dir)
    h_sql = "conv(substring(md5(shingle), 1, 15), 16, 10)"
    pos = _bloom_positions_exprs(f"cast({h_sql} as bigint)")

    ev_bits = (
        sh.filter(F.col("source") == EVAL_SOURCE)
        .select("shingle")
        .distinct()
        .select(
            F.explode(
                F.array(*[F.expr(f"cast(({p}) as long)") for p in pos])
            ).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    bitmap = ev_bits.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("w"), F.collect_list("bits")
        ).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            "j -> coalesce(wm[cast(j as bigint)], cast(0 as bigint)))"
        ).alias("bm")
    )

    probes = " AND ".join(
        f"(element_at(bm, cast(({p}) div 64 as int) + 1) & "
        f"shiftleft(cast(1 as bigint), cast(({p}) % 64 as int))) != 0"
        for p in pos
    )
    corpus = sh.filter(F.col("source") != EVAL_SOURCE)
    return (
        corpus.crossJoin(F.broadcast(bitmap))
        .select(
            "doc_id",
            F.expr(f"({probes})").alias("hit"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("hit").cast("long")).alias("n_flagged"),
        )
        .filter(F.col("n_flagged") > 0)
        .select(
            "doc_id",
            "n_flagged",
            F.try_divide(F.col("n_flagged"), F.col("n_shingles")).alias(
                "flagged_frac"
            ),
        )
    )


_BLOOM_H = "(('0x' || substr(md5(shingle), 1, 15))::BIGINT)"
_BLOOM_POS = [
    p.replace(" div ", " // ") for p in _bloom_positions_exprs(_BLOOM_H)
]

SQL_DECONTAMINATE_BLOOM = f"""
    WITH tok AS (
        SELECT doc_id, source, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, source, list_distinct({SQL_SHINGLES}) AS shl FROM tok
    ), e AS (
        SELECT doc_id, source, unnest(shl) AS shingle FROM sh
    ), ev_bits AS (
        SELECT DISTINCT p FROM (
            SELECT unnest([{", ".join(_BLOOM_POS)}]) AS p
            FROM (SELECT DISTINCT shingle FROM e WHERE source = '{EVAL_SOURCE}')
        )
    ), corpus AS (
        SELECT doc_id, shingle,
               {" AND ".join(f"(({p}) IN (SELECT p FROM ev_bits))" for p in _BLOOM_POS)}
                 AS hit
        FROM e WHERE source <> '{EVAL_SOURCE}'
    ), per AS (
        SELECT doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM corpus GROUP BY doc_id
    )
    SELECT doc_id, n_flagged, n_flagged / n_shingles AS flagged_frac
    FROM per WHERE n_flagged > 0
"""


def q_eval_leak_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination's REVERSE direction: per eval-slice document, how
    many of its distinct shingles appear anywhere in the training corpus
    — the per-benchmark-item leak report an eval owner reads (a 95%-
    leaked eval doc invalidates that item even if each training doc only
    contains a sliver). Same shared inverted-index memo as
    q_decontaminate, sides swapped: the DISTINCT corpus shingle set is
    the big side here, so membership runs as a left join keyed on the
    shingle (corpus-side distinct collapses multiplicity BEFORE the
    join — the eval side is small, the join output is |eval shingles|
    rows, and the per-doc aggregate is eval-scale, not corpus-scale)."""
    sh = _doc_shingles(spark, sf_dir)
    corpus_sh = (
        sh.filter(F.col("source") != EVAL_SOURCE)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = sh.filter(F.col("source") == EVAL_SOURCE)
    return (
        ev.join(corpus_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias(
                "n_leaked"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_leaked",
            F.try_divide(F.col("n_leaked"), F.col("n_shingles")).alias(
                "leak_frac"
            ),
        )
    )


SQL_EVAL_LEAK_REPORT = f"""
    WITH tok AS (
        SELECT doc_id, source, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, source, list_distinct({SQL_SHINGLES}) AS shl FROM tok
    ), e AS (
        SELECT doc_id, source, unnest(shl) AS shingle FROM sh
    ), corpus_sh AS (
        SELECT DISTINCT shingle FROM e WHERE source <> '{EVAL_SOURCE}'
    )
    SELECT e.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           SUM(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*) AS leak_frac
    FROM e LEFT JOIN corpus_sh c USING (shingle)
    WHERE e.source = '{EVAL_SOURCE}'
    GROUP BY e.doc_id
"""


# --- cross-document n-gram span dedup ----------------------------------------------

# Span width for exact substring-grain dedup. The public result this
# implements (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better") uses 50-token spans over web corpora; the
# synthetic corpus' docs are short, so 5 keeps every doc span-bearing at
# every test SF while the plan is width-independent.
NGRAM_SPAN_W = 5


def _span_hash_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs: array<long>) — per-doc sliding NGRAM_SPAN_W-token
    span hashes in position order, MATERIALIZED (memo-persist). Shared
    by the cross-doc span-frequency pass (q_dedup_ngram_spans, which
    explodes it) and the winnowing fingerprint selector
    (q_winnow_fingerprint, which slices it per-row) — the
    one-materialization-many-consumers contract of the token/segment
    tables: without it, each consumer re-runs the O(L*W) md5 build, and
    any expression referencing `hs` inside a higher-order lambda would
    re-inline the whole construction per element access (the
    CollapseProject blowup pmi_collocations measured). Docs shorter
    than the span width carry an EMPTY array (sequence(1,0) guard, same
    as token_segments_col)."""
    def build() -> DataFrame:
        toks = _doc_tokens(spark, sf_dir).select("doc_id", "t")
        n_spans = F.size(F.col("t")) - F.lit(NGRAM_SPAN_W - 1)
        hs = F.when(
            n_spans >= F.lit(1),
            F.transform(
                F.sequence(F.lit(1), n_spans),
                lambda i: md5_hash64(
                    F.concat_ws(
                        " ", F.slice(F.col("t"), i, F.lit(NGRAM_SPAN_W))
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))
        return toks.select("doc_id", hs.alias("hs"))

    return _memo_persist(spark, sf_dir, "span_hashes", build)


def q_dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span report at n-gram grain: for every
    sliding NGRAM_SPAN_W-token window, count how many of the doc's
    spans also occur elsewhere in the corpus (any document, its own
    included — total occurrence count >= 2). This is the exact
    substring-dedup signal (suffix-array ExactSubstr dedup re-expressed
    at fixed n-gram grain): dup_frac ~ 1 means the doc is assembled
    from boilerplate the corpus already contains; a production pass
    drops or trims the flagged spans.

    Plan: the span table is (doc_id, h) where h = md5-derived int64 of
    the joined window (functions/texthash.py discipline — identical in
    DuckDB, so the oracle matches EXACTLY, collisions included; at
    2^60 hash space a cross-span collision is the same
    injectivity-in-practice bet the digest tier documents). Span
    frequencies come from one groupBy(h); the dup flag joins spans to
    frequencies on h — the same key as the aggregation, so AQE reuses
    the exchange — and the per-doc rollup is keyed by doc_id. Raw text
    reaches neither shuffle: 8-byte hashes and ids only. Token-less
    docs (< W tokens) surface with zero counts via the left join from
    the memoized span-hash table (their `hs` is empty).

    100 TB note: span frequency is Zipf-headed like every corpus
    artifact; the groupBy's partial aggregation bounds the map-side
    and AQE skew handling splits the hot reducers. The W-token window
    explode multiplies rows by ~L, not bytes by W (hashes, not text).
    """
    sh = _span_hash_arrays(spark, sf_dir)
    spans = sh.select("doc_id", F.explode(F.col("hs")).alias("h"))
    freq = spans.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        spans.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("c") >= F.lit(2)).cast("long")).alias("n_dup"),
        )
    )
    return (
        sh.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ngrams"), F.lit(0).cast("long")).alias(
                "n_ngrams"
            ),
            F.coalesce(F.col("n_dup"), F.lit(0).cast("long")).alias("n_dup"),
            F.try_divide(F.col("n_dup"), F.col("n_ngrams")).alias("dup_frac"),
        )
    )


_SQL_SPAN_HASH = SQL_MD5_HASH64.format(
    x=f"array_to_string(toks[i : i + {NGRAM_SPAN_W - 1}], ' ')"
)

SQL_DEDUP_NGRAM_SPANS = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, {_SQL_SPAN_HASH} AS h
        FROM t, unnest(generate_series(1,
                 GREATEST(len(toks) - {NGRAM_SPAN_W - 1}, 0))) AS u(i)
    ), freq AS (
        SELECT h, COUNT(*) AS c FROM g GROUP BY h
    ), per_doc AS (
        SELECT g.doc_id,
               COUNT(*) AS n_ngrams,
               CAST(SUM(CASE WHEN freq.c >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup
        FROM g JOIN freq USING (h)
        GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           COALESCE(per_doc.n_ngrams, 0) AS n_ngrams,
           COALESCE(per_doc.n_dup, 0) AS n_dup,
           CASE WHEN per_doc.n_ngrams > 0
                THEN per_doc.n_dup / per_doc.n_ngrams END AS dup_frac
    FROM t LEFT JOIN per_doc USING (doc_id)
"""


# --- C4-style boilerplate line report ----------------------------------------------

# A segment is boilerplate when its exact normalized content appears in
# at least this many DISTINCT documents. 3 (not 2) keeps the screen
# orthogonal to plain pairwise duplication: df=2 is what dedup_lines
# already handles via keep-first; df>=3 is the nav-bar/footer class C4
# drops EVERY occurrence of.
BOILERPLATE_MIN_DF = 3


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate report at line/segment grain: a segment
    whose exact content occurs in >= BOILERPLATE_MIN_DF distinct docs
    is boilerplate, and — unlike the keep-first rule of q_dedup_lines —
    ALL its occurrences are flagged for removal (C4's repeated-line
    policy: a nav bar is noise in every document, including the first
    one crawled). Output per doc: segment count, boilerplate count,
    boilerplate fraction — the screen that catches template-heavy docs
    the doc-grain dedup tier never pairs up.

    Scale shape: reuses the memoized segment table; only (doc_id, md5)
    digests enter the shuffle — segment text never moves. One
    md5-keyed distinct-doc count (two-phase distinct agg, partially
    aggregated map-side), then the flag joins back on the SAME md5 key
    (AQE exchange reuse), then one doc_id-keyed rollup. Line frequency
    is Zipf-headed; partial aggregation plus AQE skew split carry the
    hot digests, the same contract as wordcount.

    Reference stake: the corpus replay loop (sparkstreaming
    App.java:117-122) re-sends the same 15 lines forever — under this
    screen every line of that corpus is boilerplate at df >= 3, which
    is exactly the property the wordcount topology exploits.
    """
    segs = _line_segments(spark, sf_dir).select(
        "doc_id", F.md5(F.col("seg")).alias("h")
    )
    line_df = segs.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        segs.join(line_df, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("df") >= F.lit(BOILERPLATE_MIN_DF)).cast("long")
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_boiler",
            F.try_divide(F.col("n_boiler"), F.col("n_lines")).alias(
                "boiler_frac"
            ),
        )
    )


SQL_BOILERPLATE_LINES = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    seg AS (
        SELECT doc_id,
               md5(array_to_string(
                   toks[(i-1)*{LINE_SEG_TOKENS}+1 : i*{LINE_SEG_TOKENS}], ' '
               )) AS h
        FROM t, unnest(generate_series(1,
                 CAST(floor(len(toks) / {LINE_SEG_TOKENS}.0) AS INT))) AS u(i)
    ), line_df AS (
        SELECT h, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY h
    )
    SELECT seg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN line_df.df >= {BOILERPLATE_MIN_DF}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN line_df.df >= {BOILERPLATE_MIN_DF}
                         THEN 1 ELSE 0 END) AS BIGINT)
               / CAST(COUNT(*) AS BIGINT) AS boiler_frac
    FROM seg JOIN line_df USING (h)
    GROUP BY seg.doc_id
"""


# --- winnowing fingerprint selection -----------------------------------------------

# Winnowing window width (number of consecutive spans per window). With
# the guarantee that any duplicated run of WINNOW_W + NGRAM_SPAN_W - 1
# tokens shares at least one selected fingerprint, expected density is
# 2/(WINNOW_W+1) (Schleimer, Wilkerson, Aiken 2003, "Winnowing: Local
# Algorithms for Document Fingerprinting").
WINNOW_W = 4


def _winnow_sels_col() -> Column:
    """Selected fingerprint POSITIONS (1-based, distinct) over a column
    named `hs` — the rightmost-min-per-window rule as a per-row array
    expression, shared by the per-doc report (q_winnow_fingerprint) and
    the pair detector (q_winnow_neardup) so the two can never disagree
    about what a fingerprint is. `hs` must be a MATERIALIZED column
    (see _span_hash_arrays) — referencing an unmaterialized expression
    here would re-inline its construction per element access."""
    n_win = F.size(F.col("hs")) - F.lit(WINNOW_W - 1)

    def win_slice(i):
        return F.slice(F.col("hs"), i, F.lit(WINNOW_W))

    return F.when(
        n_win >= F.lit(1),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: (
                    i.cast("long")
                    + F.lit(WINNOW_W)
                    - F.array_position(
                        F.reverse(win_slice(i)), F.array_min(win_slice(i))
                    )
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-winnowing fingerprint report per document: slide a
    WINNOW_W-wide window over the doc's span hashes and select each
    window's RIGHTMOST minimal hash; the distinct selected positions
    are the doc's fingerprints (the MOSS document-fingerprinting
    scheme — a guaranteed-coverage, ~2/(w+1)-density sample of the
    span-hash stream that a plagiarism/overlap index stores instead of
    every span). Output per doc: span count, window count, fingerprint
    count, fingerprint density.

    Determinism: span hashes are md5-derived int64
    (functions/texthash.py) so both engines see identical streams; the
    rightmost-min rule is position arithmetic on those ints — no
    floats anywhere except the final density division.

    Scale shape: ZERO exchanges. The selection runs entirely inside
    per-row array expressions over the MATERIALIZED span-hash table
    (each window evaluates one array_min + one array_position over a
    w-slice — O(L*w) per doc, bounded work per row, whole-stage
    codegen). The alternative window-function formulation would
    shuffle the corpus by doc_id twice; this form never shuffles at
    all — the fingerprint artifact a downstream index consumes is
    (doc_id, selected positions), derived in the same scan.
    """
    sh = _span_hash_arrays(spark, sf_dir)
    sels = _winnow_sels_col()
    n_win = F.size(F.col("hs")) - F.lit(WINNOW_W - 1)
    return sh.select(
        "doc_id",
        F.size(F.col("hs")).cast("long").alias("n_spans"),
        F.greatest(n_win, F.lit(0)).cast("long").alias("n_windows"),
        F.size(sels).cast("long").alias("n_fp"),
        F.try_divide(F.size(sels), F.size(F.col("hs"))).alias("fp_density"),
    )


_SQL_WINNOW_SPAN_HASH = SQL_MD5_HASH64.format(
    x=f"array_to_string(toks[i : i + {NGRAM_SPAN_W - 1}], ' ')"
)
_SQL_WINNOW_SLICE = f"hs[i : i + {WINNOW_W - 1}]"

SQL_WINNOW_FINGERPRINT = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= {NGRAM_SPAN_W} THEN
                   list_transform(generate_series(1,
                       len(toks) - {NGRAM_SPAN_W - 1}),
                       i -> {_SQL_WINNOW_SPAN_HASH})
               ELSE CAST([] AS BIGINT[]) END AS hs
        FROM t
    )
    SELECT doc_id,
           CAST(len(hs) AS BIGINT) AS n_spans,
           CAST(GREATEST(len(hs) - {WINNOW_W - 1}, 0) AS BIGINT)
               AS n_windows,
           CAST(CASE WHEN len(hs) >= {WINNOW_W} THEN
               len(list_distinct(list_transform(
                   generate_series(1, len(hs) - {WINNOW_W - 1}),
                   i -> i + {WINNOW_W} - list_position(
                            list_reverse({_SQL_WINNOW_SLICE}),
                            list_min({_SQL_WINNOW_SLICE})))))
           ELSE 0 END AS BIGINT) AS n_fp,
           CASE WHEN len(hs) > 0 THEN
               CAST(CASE WHEN len(hs) >= {WINNOW_W} THEN
                   len(list_distinct(list_transform(
                       generate_series(1, len(hs) - {WINNOW_W - 1}),
                       i -> i + {WINNOW_W} - list_position(
                                list_reverse({_SQL_WINNOW_SLICE}),
                                list_min({_SQL_WINNOW_SLICE})))))
               ELSE 0 END AS BIGINT) / CAST(len(hs) AS BIGINT)
           END AS fp_density
    FROM h
"""


# --- MinHash band-configuration sweep (LSH calibration as a query) -----------------

# (bands, rows_per_band) layouts over the N_HASHES-component signature.
# The S-curve P(candidate | J) = 1 - (1 - J^r)^b trades recall against
# candidate volume; which point is right depends on the CORPUS, so the
# audit recomputes measured recall/precision on the actual data — the
# same "measure, don't guess" contract as ann_recall for the ANN
# layouts.
SWEEP_BAND_CONFIGS = ((8, 1), (4, 2), (2, 4), (1, 8))


def q_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH calibration: for each (bands, rows-per-band) layout
    of the shared MinHash signature, generate the banded candidate set
    and score it against the EXACT Jaccard >= JACCARD_THRESHOLD truth
    pairs — per config: candidate volume, hits, recall, precision. The
    operator a pipeline runs (on a sample at production scale — the
    truth side is the quadratic-in-hot-shingles exact pass, the same
    caveat its oracle-exactness twin documents) before committing a
    band layout to a 100 TB dedup job.

    Determinism: band keys are md5-derived int64 over the '_'-joined
    decimal rendering of the band's signature components — identical in
    DuckDB, so candidate sets match collisions-included; metrics are
    exact-int divisions.

    Scale shape: all configs explode from the MATERIALIZED signature
    table in one union (k keys per doc total across a config — 8-byte
    keys + ids only); each candidate join buckets on (config, band,
    key); the truth frame joins in once as an indicator (broadcast at
    audit scale); the rollup is |configs| rows."""
    sigs = minhash_signatures(spark, sf_dir)

    def band_frame(n_bands: int, rpb: int) -> DataFrame:
        keys = F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda i: md5_hash64(
                F.concat_ws(
                    "_",
                    F.transform(
                        F.slice(
                            F.col("sig"), i * F.lit(rpb) + F.lit(1), F.lit(rpb)
                        ),
                        lambda x: x.cast("string"),
                    ),
                )
            ),
        )
        return sigs.select(
            F.lit(n_bands).alias("bands"),
            F.lit(rpb).alias("rows_per_band"),
            "doc_id",
            F.posexplode(keys).alias("band", "v"),
        )

    frames = [band_frame(bn, r) for bn, r in SWEEP_BAND_CONFIGS]
    bands = frames[0]
    for f in frames[1:]:
        bands = bands.unionByName(f)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bands") == F.col("b.bands"))
            & (F.col("a.rows_per_band") == F.col("b.rows_per_band"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.bands").alias("bands"),
            F.col("a.rows_per_band").alias("rows_per_band"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    truth = q_dedup_near_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    return (
        cand.join(
            F.broadcast(truth.withColumn("is_true", F.lit(1))),
            ["doc_a", "doc_b"],
            "left",
        )
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
        .crossJoin(F.broadcast(n_true))
        .select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_hits",
            "n_true_pairs",
            F.try_divide(F.col("n_hits"), F.col("n_true_pairs")).alias(
                "recall"
            ),
            F.try_divide(F.col("n_hits"), F.col("n_candidates")).alias(
                "precision"
            ),
        )
    )


def _sql_band_config(n_bands: int, rpb: int) -> str:
    key = SQL_MD5_HASH64.format(
        x=(
            f"array_to_string(list_transform("
            f"sig[i*{rpb}+1 : i*{rpb}+{rpb}], "
            f"x -> CAST(x AS VARCHAR)), '_')"
        )
    )
    return (
        f"SELECT {n_bands} AS bands, {rpb} AS rows_per_band, doc_id,"
        f" i AS band, {key} AS v"
        f" FROM sig, unnest(generate_series(0, {n_bands - 1})) AS u(i)"
    )


_SQL_SWEEP_BANDS = "\n        UNION ALL ".join(
    _sql_band_config(bn, r) for bn, r in SWEEP_BAND_CONFIGS
)

SQL_MINHASH_BAND_SWEEP = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(list_distinct({SQL_SHINGLES}),
                   s -> (('0x' || substr(md5(s), 1, 15))::BIGINT) % {MOD})) AS h
        FROM toks
    ), sig AS (
        SELECT doc_id, {_sql_sig_components()} AS sig
        FROM hs WHERE len(h) > 0
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS shingle
        FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), truth AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
        WHERE inter / (na.n_sh + nb.n_sh - inter) >= {JACCARD_THRESHOLD}
    ), tcount AS (SELECT COUNT(*) AS n_true_pairs FROM truth),
    bands AS (
        {_SQL_SWEEP_BANDS}
    ), cand AS (
        SELECT DISTINCT a.bands, a.rows_per_band,
               a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.bands = b.bands AND a.rows_per_band = b.rows_per_band
         AND a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ), m AS (
        SELECT bands, rows_per_band,
               COUNT(*) AS n_candidates,
               SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        FROM cand c
        LEFT JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
        GROUP BY bands, rows_per_band
    )
    SELECT bands, rows_per_band,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
           CAST(n_hits AS BIGINT) / CAST(n_true_pairs AS BIGINT) AS recall,
           CAST(n_hits AS BIGINT) / CAST(n_candidates AS BIGINT) AS precision
    FROM m CROSS JOIN tcount
"""


# --- cross-source leak matrix ------------------------------------------------------


def q_cross_source_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source content-leak matrix: aggregate the directed
    containment pairs (q_dedup_containment — doc contained in host) by
    the SOURCES of the two documents. A hot (src_from, src_to) cell
    means src_to republishes src_from's content (mirrors, scrapers,
    aggregator sites) — the governance view that decides which source
    to de-prioritize at ingest rather than re-litigating doc pairs one
    at a time. Self-cells (same source) measure internal redundancy.

    Scale shape: rides the SAME memoized df-capped shingle index and
    pair aggregate as the containment/capped-Jaccard operators
    (marginal cost is two id-keyed joins of the pair frame onto the
    (doc_id, source) projection — ids and short strings only), then one
    |sources|^2-bounded aggregate.
    """
    pairs = q_dedup_containment(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id"), F.col("source").alias("src_from")
            ),
            "doc_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("host_id"),
                F.col("source").alias("src_to"),
            ),
            "host_id",
        )
        .groupBy("src_from", "src_to")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs_leaked"),
            F.max("containment").alias("max_containment"),
        )
    )


SQL_CROSS_SOURCE_LEAK = f"""
    WITH pairs AS ({SQL_DEDUP_CONTAINMENT})
    SELECT df.source AS src_from, dh.source AS src_to,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(COUNT(DISTINCT pairs.doc_id) AS BIGINT) AS n_docs_leaked,
           MAX(containment) AS max_containment
    FROM pairs
    JOIN documents df ON df.doc_id = pairs.doc_id
    JOIN documents dh ON dh.doc_id = pairs.host_id
    GROUP BY df.source, dh.source
"""


# --- exact-duplicate family-size histogram -----------------------------------------


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of exact-duplicate family sizes: group documents by
    content digest, then histogram the family sizes — the one-page
    answer to "how duplicated is this corpus?" (family_size=1 rows are
    unique docs; the tail shows how deep the worst boilerplate family
    goes, and n_docs - n_families at each size is exactly the row
    count exact dedup will delete).

    Scale shape: one md5-keyed count (partial agg collapses map-side),
    then a second aggregate over the |families|-row frame keyed by the
    bounded family size. No joins, no text past the first projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    fams = docs.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.count(F.lit(1)).alias("family_size")
    )
    return (
        fams.groupBy("family_size")
        .agg(F.count(F.lit(1)).alias("n_families"))
        .select(
            "family_size",
            "n_families",
            (F.col("family_size") * F.col("n_families")).alias("n_docs"),
        )
    )


SQL_DUP_CLUSTER_SIZES = """
    WITH fams AS (
        SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS family_size
        FROM documents GROUP BY md5(text)
    )
    SELECT family_size,
           CAST(COUNT(*) AS BIGINT) AS n_families,
           CAST(family_size * COUNT(*) AS BIGINT) AS n_docs
    FROM fams GROUP BY family_size
"""


# --- winnowing-fingerprint pair detection ------------------------------------------

WINNOW_SHARED_MIN = 1


def q_winnow_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-pair overlap candidates from the winnowing index: pairs
    sharing >= WINNOW_SHARED_MIN selected fingerprint VALUES, with the
    shared count and the overlap fraction vs the smaller fingerprint
    set — the MOSS-style detection pass the fingerprint selection
    exists for (winnowing guarantees any duplicated run of
    WINNOW_W + NGRAM_SPAN_W - 1 tokens shares >= 1 fingerprint, so
    long-overlap pairs cannot be missed). At production scale the
    threshold rises with corpus size; the audit-grade floor of 1 keeps
    every guaranteed detection visible.

    Scale shape: the fingerprint index is (doc_id, 8-byte value) rows
    derived per-row from the materialized span-hash table (selection
    shared with q_winnow_fingerprint via _winnow_sels_col); the pair
    join buckets on the fingerprint value. Winnowed minima are a
    ~2/(w+1) sample of spans, so the index — and the join's sum(df^2)
    — is a fraction of the full span table's; measured on this corpus
    the value df tops out at 4. A Zipf-headed real corpus would add
    the df-cap discipline (the capped-shingle pattern) on the value."""
    sh = _span_hash_arrays(spark, sf_dir)
    fp_vals = F.array_distinct(
        F.transform(
            _winnow_sels_col(),
            lambda p: F.element_at(F.col("hs"), p.cast("int")),
        )
    )
    fps = sh.select("doc_id", F.explode(fp_vals).alias("v"))
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(WINNOW_SHARED_MIN))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.try_divide(
                F.col("n_shared"), F.least(F.col("n_a"), F.col("n_b"))
            ).alias("overlap"),
        )
    )


_SQL_WINNOW_SELS = f"""CASE WHEN len(hs) >= {WINNOW_W} THEN
        list_distinct(list_transform(
            generate_series(1, len(hs) - {WINNOW_W - 1}),
            i -> hs[i + {WINNOW_W} - list_position(
                     list_reverse({_SQL_WINNOW_SLICE}),
                     list_min({_SQL_WINNOW_SLICE}))]))
    ELSE CAST([] AS BIGINT[]) END"""

SQL_WINNOW_NEARDUP = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= {NGRAM_SPAN_W} THEN
                   list_transform(generate_series(1,
                       len(toks) - {NGRAM_SPAN_W - 1}),
                       i -> {_SQL_WINNOW_SPAN_HASH})
               ELSE CAST([] AS BIGINT[]) END AS hs
        FROM t
    ), fp AS (
        SELECT doc_id, unnest(list_distinct({_SQL_WINNOW_SELS})) AS v
        FROM h
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fp a JOIN fp b ON a.v = b.v AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {WINNOW_SHARED_MIN}
    )
    SELECT doc_a, doc_b, n_shared,
           n_shared / LEAST(na.n_fp, nb.n_fp) AS overlap
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
"""


# --- source-graph PageRank (fixed-iteration, decimal-exact) ------------------------

PAGERANK_D = 0.85
PAGERANK_ITERS = 3


def q_source_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the source-level content-leak graph (edges =
    cross-source containment links, weight = link count): which sources
    are the AUTHORITATIVE origins the rest of the corpus republishes?
    A fixed PAGERANK_ITERS power-iteration unroll — the demonstration
    that iterative graph algorithms compose as plain CTE chains when
    the iteration count is fixed (the dedup_cluster fixpoint pattern
    covers the run-to-convergence form). Dangling mass (sources with no
    outgoing links) is dropped, the simplest deterministic variant —
    ranks then sum to < 1 and still order authority correctly.

    Determinism: edge fractions w/outw and rank products are fixed
    double expressions; each per-edge contribution rounds to
    DECIMAL(38,12) BEFORE the per-node sum (order-free), then one
    (1-d)/N + d*sum expression — both engines bit-identical.

    Scale shape: the edge table is the |sources|^2-bounded leak matrix
    (built once from the shared capped-shingle machinery); every
    iteration is one broadcast join of the |sources|-row rank frame
    onto the edge table plus one bounded aggregate. At web scale
    (|sources| ~ 10^7 domains) the same plan runs with shuffle joins —
    the iteration structure is unchanged."""
    from pyspark.sql import Window as W

    # memo-persisted (r17): `frac` feeds every one of the PAGERANK_ITERS
    # unrolled iterations, and each reference re-derived the whole
    # cross_source_leak chain (shingle explode + containment join) with
    # zero exchange reuse — the r16 standing plan-audit class. The frame
    # is the |sources|²-bounded edge matrix, the write-once graph table
    # any production PageRank iterates over.
    def build_frac() -> DataFrame:
        edges = (
            q_cross_source_leak(spark, sf_dir)
            .filter(F.col("src_from") != F.col("src_to"))
            .select(
                F.col("src_from").alias("u"),
                F.col("src_to").alias("v"),
                F.col("n_links").alias("w"),
            )
        )
        return edges.withColumn(
            "frac", F.col("w") / F.sum("w").over(W.partitionBy("u"))
        )

    frac = _memo_persist(spark, sf_dir, "pagerank_frac", build_frac)
    nodes = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("source").alias("src"))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "src", "n", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            frac.join(
                ranks.select(F.col("src").alias("u"), "rank"), "u"
            )
            .select(
                F.col("v").alias("src"),
                (F.col("rank") * F.col("frac"))
                .cast("decimal(38,12)")
                .alias("c"),
            )
            .groupBy("src")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, "src", "left")
            .select(
                "src",
                "n",
                (
                    (F.lit(1.0) - F.lit(PAGERANK_D)) / F.col("n")
                    + F.lit(PAGERANK_D)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("src", F.col("rank").alias("pagerank"))


# DOUBLE constants spliced as reprs with explicit casts: DuckDB parses
# bare `0.85` as DECIMAL and decimal arithmetic would diverge from the
# JVM's double (1.0 - 0.85 = 0.15000000000000002 in binary); repr
# round-trips the exact Python double and CAST(... AS DOUBLE) parses it
# correctly-rounded on the DuckDB side.
_SQL_PR_D = f"CAST({PAGERANK_D!r} AS DOUBLE)"
_SQL_PR_OMD = f"CAST({(1.0 - PAGERANK_D)!r} AS DOUBLE)"


def _sql_pagerank_iter(prev: str, i: int) -> str:
    return f"""contrib{i} AS (
        SELECT v AS src,
               CAST(SUM(CAST(r.rank * frac AS DECIMAL(38,12))) AS DOUBLE)
                   AS inflow
        FROM frac JOIN {prev} r ON r.src = frac.u
        GROUP BY v
    ), rank{i} AS (
        SELECT nodes.src,
               {_SQL_PR_OMD} / cnt.n
               + {_SQL_PR_D} * COALESCE(contrib{i}.inflow,
                                        CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes CROSS JOIN cnt
        LEFT JOIN contrib{i} ON contrib{i}.src = nodes.src
    )"""


SQL_SOURCE_PAGERANK = f"""
    WITH pairs AS ({SQL_DEDUP_CONTAINMENT}),
    leak AS (
        SELECT df.source AS u, dh.source AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM pairs
        JOIN documents df ON df.doc_id = pairs.doc_id
        JOIN documents dh ON dh.doc_id = pairs.host_id
        WHERE df.source <> dh.source
        GROUP BY df.source, dh.source
    ), frac AS (
        SELECT u, v, w / SUM(w) OVER (PARTITION BY u) AS frac FROM leak
    ), nodes AS (SELECT DISTINCT source AS src FROM documents),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    rank0 AS (
        SELECT src, CAST(1.0 AS DOUBLE) / cnt.n AS rank
        FROM nodes CROSS JOIN cnt
    ),
    {_sql_pagerank_iter('rank0', 1)},
    {_sql_pagerank_iter('rank1', 2)},
    {_sql_pagerank_iter('rank2', 3)}
    SELECT src, rank AS pagerank FROM rank3
"""


# --- MinHash estimator bias audit --------------------------------------------------


def q_minhash_est_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row bias report for the 8-component MinHash Jaccard
    estimator over ALL banding candidates (no est threshold): pair
    count, mean estimated vs mean exact Jaccard, and the mean/max
    absolute estimation error. Completes the measured-layout toolkit —
    minhash_band_sweep chooses the BAND layout by recall/volume; this
    audits the ESTIMATOR the surviving candidates are ranked by (at
    k=8 the per-pair sd is ~0.17, so thresholding decisions should
    lean on the verify pass — the number this report puts on the
    actual corpus).

    Exactness: est is k_matches/8 (exact double); exact Jaccard is one
    int division; a band collision WITHOUT any shared shingle (affine
    map collision) is a real candidate whose exact Jaccard coalesces
    to 0 — included, since that false-candidate mass is precisely what
    the audit measures. Per-pair errors round to DECIMAL(38,6) before
    the order-free sums (lm_score discipline).

    Scale shape: candidates from the memoized signature table's band
    join (signatures only); the exact side reuses the inverted shingle
    index restricted to the candidate pairs via the SAME pair-keyed
    aggregate near_jaccard uses; the report is ONE row out of a global
    aggregate with map-side partials. A production run samples
    candidates first — shape unchanged."""
    sigs = minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id", F.posexplode(F.col("sig")).alias("band", "v")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = cand.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", (matches / F.lit(float(N_HASHES))).alias("est_j")
    )
    # exact side = the shared memo-persisted unthresholded pair frame
    # (r17): same inter/(n_a+n_b-inter) expression, computed once per
    # session instead of re-running the quadratic shingle self-join here
    exact = jaccard_pairs_memo(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("jaccard").alias("exact_j")
    )
    per_pair = est.join(exact, ["doc_a", "doc_b"], "left").select(
        F.col("est_j").cast("decimal(38,6)").alias("est_d"),
        F.coalesce(F.col("exact_j"), F.lit(0.0))
        .cast("decimal(38,6)")
        .alias("exact_d"),
        F.abs(
            F.col("est_j") - F.coalesce(F.col("exact_j"), F.lit(0.0))
        )
        .cast("decimal(38,6)")
        .alias("err_d"),
    )
    return per_pair.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum("est_d").cast("double") / F.count(F.lit(1))).alias("mean_est"),
        (F.sum("exact_d").cast("double") / F.count(F.lit(1))).alias(
            "mean_exact"
        ),
        (F.sum("err_d").cast("double") / F.count(F.lit(1))).alias(
            "mean_abs_err"
        ),
        F.max("err_d").cast("double").alias("max_abs_err"),
    )


SQL_MINHASH_EST_AUDIT = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(list_distinct({SQL_SHINGLES}),
                   s -> (('0x' || substr(md5(s), 1, 15))::BIGINT) % {MOD})) AS h
        FROM toks
    ), sig AS (
        SELECT doc_id, {_sql_sig_components()} AS sig
        FROM hs WHERE len(h) > 0
    ), bands AS (
        SELECT doc_id,
               unnest(generate_series(0, {N_HASHES - 1})) AS band,
               unnest(sig) AS v
        FROM sig
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ), est AS (
        SELECT doc_a, doc_b,
               len(list_filter(list_transform(generate_series(1, {N_HASHES}),
                   i -> sa.sig[i] = sb.sig[i]), x -> x)) / {float(N_HASHES)}
                   AS est_j
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS shingle
        FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), exact AS (
        SELECT doc_a, doc_b,
               inter / (na.n_sh + nb.n_sh - inter) AS exact_j
        FROM inter
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
    ), per_pair AS (
        SELECT CAST(est_j AS DECIMAL(38,6)) AS est_d,
               CAST(COALESCE(exact_j, CAST(0.0 AS DOUBLE))
                    AS DECIMAL(38,6)) AS exact_d,
               CAST(abs(est_j - COALESCE(exact_j, CAST(0.0 AS DOUBLE)))
                    AS DECIMAL(38,6)) AS err_d
        FROM est LEFT JOIN exact USING (doc_a, doc_b)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(est_d) AS DOUBLE) / COUNT(*) AS mean_est,
           CAST(SUM(exact_d) AS DOUBLE) / COUNT(*) AS mean_exact,
           CAST(SUM(err_d) AS DOUBLE) / COUNT(*) AS mean_abs_err,
           CAST(MAX(err_d) AS DOUBLE) AS max_abs_err
    FROM per_pair
"""


# --- TF-IDF-weighted shingle cosine near-dup (round 9) -----------------------

TFIDF_COS_THRESHOLD = 0.35
TFIDF_COS_DF_CAP = MAX_SHINGLE_DF  # same informative-universe cap


def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by TF-IDF-weighted shingle cosine — the weighted
    complement of q_dedup_near_capped: Jaccard treats every shared
    shingle equally, the weighted cosine lets one rare shared passage
    outvote scattered common trigrams (and repeated occurrences count,
    via tf). This is the similarity SpamAssassin-style near-dup and
    many production clustering passes actually rank by; pairs at
    >= TFIDF_COS_THRESHOLD over the df-capped shingle universe.

    Determinism: weights follow the tfidf operator's ROUND(tf ·
    ln(N/df), 4) contract (libm ln ties resolved by rounding the
    identical double on both engines); dot products and norms sum
    DECIMAL(38,8)-rounded term products, so accumulation order cannot
    drift; the final cosine is ONE raw pass-through double expression
    of those exact sums (the histogram_quantiles lesson: no decimal
    round on a constructed value).

    Scale shape: the inverted index is df-capped BEFORE the self-join
    (per-shingle fan-out <= cap², the dedup_near_capped bound); norms
    are a keyed aggregate on the capped index; the pair join carries
    8-byte weight pairs, never text. The capped WEIGHTED index is
    memo-persisted (round 15): it feeds THREE consumers (the norm
    aggregate and both self-join sides) and Spark reuses none of the
    exchanges across them (plan-verified: 0 ReusedExchange, documents
    scanned 5x, the shingle explode+tf aggregate computed three
    times) — the same one-materialization contract
    q_dedup_near_capped's index already carries; at production scale
    this is the write-once weighted-index table every pass reads."""
    from pyspark.sql import Window

    # df as a window count over sh, not a groupBy(shingle) aggregate
    # joined back (r18, guide §2.4 — the seg-block df-cap lesson): the
    # sh subplan is un-persisted, so the agg+join form computed the
    # whole explode + (doc_id, shingle) aggregate TWICE (once per join
    # side) and paid a further exchange pair for the shingle-keyed
    # join. df = COUNT(*) OVER (PARTITION BY shingle) on sh is the
    # identical value (rows of sh per shingle) established with ONE
    # extra exchange on the single sh pass. Interleaved warm A/B of
    # the build (n=5, noop): min 1.18 s -> 0.68 s; output
    # exceptAll-identical both directions (259,105 rows at sf0.1).
    def build_w() -> DataFrame:
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
        return (
            sh.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
            )
            .filter(F.col("df") <= F.lit(TFIDF_COS_DF_CAP))
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id",
                "shingle",
                F.round(
                    F.col("tf")
                    * F.log(F.col("n").cast("double") / F.col("df")),
                    4,
                ).alias("w"),
            )
        )

    w = _memo_persist(spark, sf_dir, "tfidf_cos_weighted_index", build_w)
    norms = w.groupBy("doc_id").agg(
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,8)"))
        .cast("double")
        .alias("nn")
    )
    dots = (
        w.alias("a")
        .join(w.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.sum((F.col("a.w") * F.col("b.w")).cast("decimal(38,8)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nn").alias("nb"))
    cos = F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= F.lit(TFIDF_COS_THRESHOLD))
        .select("doc_a", "doc_b", "cos_sim")
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_TFIDF_COSINE = f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, shingle, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM toks)
        GROUP BY doc_id, shingle
    ), dft AS (
        SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    w AS (
        SELECT doc_id, sh.shingle,
               ROUND(tf * ln(CAST(n AS DOUBLE) / df), 4) AS w
        FROM sh JOIN dft USING (shingle) CROSS JOIN n
        WHERE df <= {TFIDF_COS_DF_CAP}
    ), norms AS (
        SELECT doc_id,
               CAST(SUM(CAST(w * w AS DECIMAL(38,8))) AS DOUBLE) AS nn
        FROM w GROUP BY doc_id
    ), dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(CAST(a.w * b.w AS DECIMAL(38,8))) AS DOUBLE) AS dot
        FROM w a JOIN w b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, dot / sqrt(na.nn * nb.nn) AS cos_sim
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE dot / sqrt(na.nn * nb.nn) >= {TFIDF_COS_THRESHOLD}
    ORDER BY doc_a, doc_b
"""
