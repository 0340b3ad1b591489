"""Multimodal column plumbing (north-star extension, SURVEY.md §2.6).

Design: image/audio/video payloads are opaque `binary` columns + a typed
metadata struct, exactly how a 100 TB multimodal lakehouse stores them
(parquet BYTE_ARRAY, metadata pushdown-able, payload never decoded until
the last possible operator). The driver testdata has no binary table, so
the payload column is derived (utf-8 bytes of `text`) — the schema,
partitioning, Arrow batch shape, and UDF signatures are the real thing;
only the codec is synthetic.

The decode step itself is STUBBED: the container has no image/audio
libraries, so `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic integer-arithmetic fake
"decoder" produces (width, height, n_frames) from the byte stream. The
fake path is what the oracle checks — it exercises the full
mapInPandas/Arrow plumbing with verifiable output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int"
)


def binary_assets(
    spark: SparkSession, sf_dir: str, *, parallel: bool = False
) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the canonical
    multimodal layout. encode() is a native expression; at scale this
    column comes straight off the parquet scan.

    ``parallel`` opt-in (r17, measured): heavy per-row Python decoders
    (image_resize's full raster walk: isolated 2.01 s -> 0.45 s) want
    the single-row-group scan round-robin-repartitioned before the
    mapInPandas; light consumers (header parses, native-expression
    metadata) measured SLOWER with the extra exchange (multimodal_meta
    0.19 -> 0.31 s, audio_features 0.25 -> 0.68 s isolated), so the
    guard is off unless the decode is the dominant cost. On any real
    multi-split scan the guard is a no-op either way."""
    docs = load_table(spark, sf_dir, "documents")
    if parallel:
        from .dedup import _parallel_scan

        docs = _parallel_scan(spark, docs)
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length(F.col("text")).alias("declared_len"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int, int]:
    """Decode an image/video payload -> (width, height, n_frames).

    Real decoding needs PIL/ffmpeg — NOT available in this container, so
    the real path is a clearly-marked stub. The fake path is a
    deterministic pure-integer function of the bytes (no float, no RNG)
    used to exercise the distributed plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio decoding requires PIL/ffmpeg; not present in this "
            "environment — pass fake=True for the deterministic test codec"
        )
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 16 + (checksum % 240)
    height = 16 + ((checksum * 7 + n) % 240)
    n_frames = 1 + (n % 30)
    return width, height, n_frames


def decode_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one pandas frame per partition
    batch — the correct shape for a real decoder (amortizes codec init
    per batch, keeps pixels off the JVM heap). Column pruning still
    applies upstream because we select only (doc_id, payload)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p, fake=fake) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


RESIZE_TARGET_W = 32
RESIZE_TARGET_H = 32

_SQL_RESIZE_IDX = (
    f"(((i // {RESIZE_TARGET_W}) * src_h // {RESIZE_TARGET_H}) * src_w"
    f" + ((i % {RESIZE_TARGET_W}) * src_w // {RESIZE_TARGET_W})) % n"
)

SQL_IMAGE_RESIZE = f"""
    WITH b AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS n,
               {{checksum}} AS checksum
        FROM documents
    ), dims AS (
        SELECT doc_id, text, n,
               CAST(16 + (checksum % 240) AS INTEGER) AS src_w,
               CAST(16 + ((checksum * 7 + n) % 240) AS INTEGER) AS src_h
        FROM b
    )
    SELECT doc_id, src_w, src_h,
           {RESIZE_TARGET_W} AS dst_w, {RESIZE_TARGET_H} AS dst_h,
           CASE WHEN n = 0 THEN md5('')
           ELSE md5(array_to_string(list_transform(
               generate_series(0, {RESIZE_TARGET_W * RESIZE_TARGET_H - 1}),
               i -> substr(text, 1 + {_SQL_RESIZE_IDX}, 1)), ''))
           END AS thumb_md5
    FROM dims
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over binary assets: byte length + content
    hash, all native expressions (no decode)."""
    assets = binary_assets(spark, sf_dir)
    return assets.select(
        "doc_id",
        F.length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_md5"),
        F.col("meta.origin").alias("origin"),
        F.col("meta.declared_len").alias("declared_len"),
    )


SQL_MULTIMODAL_META = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           source AS origin,
           length(text) AS declared_len
    FROM documents
"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline on the fake codec — oracle-checkable
    because the fake decoder is pure integer arithmetic the SQL twin
    reproduces from the utf-8 bytes."""
    return decode_features(binary_assets(spark, sf_dir), fake=True)


def decode_audio(payload: bytes, *, fake: bool = False) -> tuple[int, int, int]:
    """Decode an audio payload -> (n_samples, sample_rate, rms_milli).

    Real decoding needs soundfile/ffmpeg — NOT in this container; the fake
    path is pure integer arithmetic over the bytes (n_samples = byte count,
    a fixed 16 kHz rate, "RMS" = mean byte value x 10) so the plumbing is
    oracle-checkable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "audio decoding requires soundfile/ffmpeg; not present in this "
            "environment — pass fake=True for the deterministic test codec"
        )
    n = len(payload)
    rms_milli = (sum(payload) * 10) // n if n else 0
    return n, 16_000, rms_milli


AUDIO_SCHEMA = "doc_id long, n_samples int, sample_rate int, rms_milli int"


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over opaque binary payloads via
    mapInPandas (Arrow batches; codec init amortized per batch)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms_milli": [f[2] for f in feats],
                }
            )

    assets = binary_assets(spark, sf_dir)
    return assets.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=AUDIO_SCHEMA
    )


# Fake audio decoder in SQL: byte sum over the whole utf-8 payload.
_SQL_BYTESUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "generate_series(1, octet_length(encode(text))), "
    "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, b) -> a + b)"
)

SQL_AUDIO_FEATURES = f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_samples,
           16000 AS sample_rate,
           CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE ({_SQL_BYTESUM} * 10) // octet_length(encode(text))
                END AS INTEGER) AS rms_milli
    FROM documents
"""


FRAME_SAMPLE_EVERY = 7  # keep every 7th frame

FRAME_SCHEMA = "doc_id long, frame_no int, frame_md5 string"


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one input row fans out to its kept frames
    (every FRAME_SAMPLE_EVERY-th of n_frames), each "frame" a byte slice
    of the payload, fingerprinted with md5.

    Built from native exprs only — sequence() + explode does the fan-out
    and substring/md5 the per-frame work, so the whole operator stays in
    codegen (a real frame extractor would swap the slice for an ffmpeg
    call inside mapInPandas, same shape as decode_features)."""
    assets = binary_assets(spark, sf_dir)
    n = F.length(F.col("payload"))
    n_frames = F.lit(1) + F.pmod(n, F.lit(30))  # same rule as decode_image
    frame_w = F.greatest(n / n_frames, F.lit(1)).cast("int")
    return (
        assets.select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_SAMPLE_EVERY))
            ).alias("frame_no"),
            frame_w.alias("w"),
        )
        .select(
            "doc_id",
            "frame_no",
            F.md5(
                F.expr("substring(payload, frame_no * w + 1, w)")
            ).alias("frame_md5"),
        )
    )


# Oracle works on the text twin of the payload (corpus is ASCII, so byte
# slices == character slices; md5 of the same bytes either way).
SQL_FRAME_SAMPLE = f"""
    WITH b AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS n,
               1 + (octet_length(encode(text)) % 30) AS n_frames
        FROM documents
    ), f AS (
        SELECT doc_id, text,
               CAST(GREATEST(n // n_frames, 1) AS INTEGER) AS w,
               UNNEST(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS frame_no
        FROM b
    )
    SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
           md5(substr(text, frame_no * w + 1, w)) AS frame_md5
    FROM f
"""


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, thumb_md5 string"
)


def resize_image(
    payload: bytes, dst_w: int, dst_h: int, *, fake: bool = False
) -> tuple[int, int, bytes]:
    """Resize an image payload to (dst_w, dst_h) -> (src_w, src_h, thumb).

    Real resizing needs PIL — NOT in this container. The fake path is
    nearest-neighbor sampling over the byte stream (pure integer index
    arithmetic): thumb byte (x, y) = payload[(y*src_h_stride + x) mapped
    back to source coordinates], giving a deterministic, oracle-checkable
    "thumbnail" that exercises the real batch shape.
    """
    if not fake:
        raise NotImplementedError(
            "image resizing requires PIL; not present in this environment "
            "— pass fake=True for the deterministic test codec"
        )
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    src_w = 16 + (checksum % 240)  # same dims rule as decode_image
    src_h = 16 + ((checksum * 7 + n) % 240)
    if n == 0:
        return src_w, src_h, b""
    # nearest-neighbor: sample dst_w*dst_h source "pixels" (bytes mod n)
    thumb = bytes(
        payload[((y * src_h // dst_h) * src_w + (x * src_w // dst_w)) % n]
        for y in range(dst_h)
        for x in range(dst_w)
    )
    return src_w, src_h, thumb


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline on the fake codec: mapInPandas batches, one row per
    asset with source dims + md5 of the 32x32 nearest-neighbor thumb.
    The real-PIL swap changes only the body of resize_image."""
    import hashlib

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "src_w": [],
                "src_h": [],
                "dst_w": RESIZE_TARGET_W,
                "dst_h": RESIZE_TARGET_H,
                "thumb_md5": [],
            }
            for p in pdf["payload"]:
                sw, sh, thumb = resize_image(
                    p, RESIZE_TARGET_W, RESIZE_TARGET_H, fake=True
                )
                out["src_w"].append(sw)
                out["src_h"].append(sh)
                out["thumb_md5"].append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(out)

    assets = binary_assets(spark, sf_dir, parallel=True)
    return assets.select("doc_id", "payload").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


# The fake decoder in SQL: checksum = sum of first 64 bytes.
_SQL_CHECKSUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "generate_series(1, LEAST(octet_length(encode(text)), 64)), "
    "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, b) -> a + b)"
)

# _SQL_CHECKSUM is defined below the resize SQL template; splice it in.
SQL_IMAGE_RESIZE = SQL_IMAGE_RESIZE.format(checksum=_SQL_CHECKSUM)

SQL_IMAGE_FEATURES = f"""
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               {_SQL_CHECKSUM} AS checksum
        FROM documents
    )
    SELECT doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(16 + (checksum % 240) AS INTEGER) AS width,
           CAST(16 + ((checksum * 7 + n_bytes) % 240) AS INTEGER) AS height,
           CAST(1 + (n_bytes % 30) AS INTEGER) AS n_frames
    FROM b
"""


def q_asset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-asset dedup accounting: md5 over the OPAQUE payload
    bytes (codec-free — identical images/audio dedupe without ever
    decoding, the first pass every multimodal lake runs), reported as
    per-origin storage savings: asset vs unique counts, total vs
    post-dedup bytes, bytes reclaimed.

    Oracle note: the payload is the utf-8 encoding of `text`, and
    DuckDB's md5(VARCHAR) hashes the string's utf-8 bytes — so
    md5(text) there IS md5(payload) here; byte lengths via
    octet_length(encode(text)).

    Scale shape: one scan computes (digest, bytes) per asset — payloads
    never shuffle (the digest group-by moves 16-byte hashes + int
    lengths); two keyed aggregations, both with map-side partials."""
    assets = binary_assets(spark, sf_dir)
    per = assets.select(
        F.col("meta.origin").alias("origin"),
        F.md5(F.col("payload")).alias("fp"),
        F.octet_length(F.col("payload")).cast("long").alias("nb"),
    )
    groups = per.groupBy("origin", "fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.sum("nb").alias("bytes_all"),
        F.max("nb").alias("bytes_one"),
    )
    return (
        groups.groupBy("origin")
        .agg(
            F.sum("n_copies").alias("n_assets"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("bytes_all").alias("bytes_total"),
            F.sum("bytes_one").alias("bytes_unique"),
            (F.sum("bytes_all") - F.sum("bytes_one")).alias("bytes_saved"),
        )
        .orderBy("origin")
    )


SQL_ASSET_DEDUP = """
    WITH per AS (
        SELECT source AS origin, md5(text) AS fp,
               CAST(octet_length(encode(text)) AS BIGINT) AS nb
        FROM documents
    ), groups AS (
        SELECT origin, fp, COUNT(*) AS n_copies,
               CAST(SUM(nb) AS BIGINT) AS bytes_all,
               MAX(nb) AS bytes_one
        FROM per GROUP BY origin, fp
    )
    SELECT origin,
           CAST(SUM(n_copies) AS BIGINT) AS n_assets,
           COUNT(*) AS n_unique,
           CAST(SUM(bytes_all) AS BIGINT) AS bytes_total,
           CAST(SUM(bytes_one) AS BIGINT) AS bytes_unique,
           CAST(SUM(bytes_all) - SUM(bytes_one) AS BIGINT) AS bytes_saved
    FROM groups
    GROUP BY origin
    ORDER BY origin
"""


# --- real stdlib codecs (round 8): BMP + RIFF/WAV header decode --------------------

ASSET_CODEC_SCHEMA = (
    "doc_id long, fmt string, width long, height long, n_frames long, "
    "sample_rate long, n_bytes long"
)


def q_asset_codec_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-format decoding, no PIL/ffmpeg: each document
    becomes an actual on-disk asset (even doc_id -> a valid 24-bit BMP,
    odd -> a mono 16-bit PCM WAV written by the stdlib wave module),
    and the metadata row is produced by PARSING those bytes back with
    the struct-level codecs in functions/codecs.py — the header-decode
    pass (dimensions / frame counts / sample rates / true byte sizes) a
    curation pipeline runs over a binary asset column before any pixel
    work.

    This is a round trip through two independent implementations for
    WAV (stdlib wave writes, our RIFF chunk walker reads) and through a
    spec-exact writer/parser pair for BMP, so a header-layout bug on
    either side breaks oracle parity: the DuckDB twin recomputes the
    intended dimensions AND the exact container byte sizes (BMP 4-byte
    row padding included) from doc_id/n_chars arithmetic alone.

    Scale shape: one scan, mapInPandas Arrow batches (codec init
    amortized per batch, bytes never touch the JVM heap), zero
    shuffles; output is one row per asset. Full raster decode of
    compressed formats stays env-gated (decode_image above)."""
    from ..functions.codecs import make_bmp, make_wav, parse_bmp, parse_wav

    # no parallel-scan guard here (r17, measured): the BMP/WAV header
    # round trip is a light parse — isolated 0.36 s unguarded vs 0.47 s
    # with the extra exchange; the heavy raster/LZW decoders below
    # (png/gif/quality_screen) keep theirs
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "n_chars", F.encode(F.col("text"), "utf-8").alias("seed")
        )
        .filter(F.col("n_chars").isNotNull())
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                c: []
                for c in (
                    "doc_id",
                    "fmt",
                    "width",
                    "height",
                    "n_frames",
                    "sample_rate",
                    "n_bytes",
                )
            }
            for doc_id, n_chars, seed in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["seed"]
            ):
                seed_b = bytes(seed)
                if doc_id % 2 == 0:
                    payload = make_bmp(
                        1 + int(doc_id) % 16, 1 + int(n_chars) % 16, seed_b
                    )
                    w, h, bpp = parse_bmp(payload)
                    if bpp != 24:
                        raise ValueError(f"doc {doc_id}: bpp {bpp}")
                    row = (doc_id, "bmp", w, h, 1, 0, len(payload))
                else:
                    payload = make_wav(1 + int(n_chars) % 100, 8000, seed_b)
                    ch, sw, rate, frames = parse_wav(payload)
                    if (ch, sw) != (1, 2):
                        raise ValueError(f"doc {doc_id}: layout {ch},{sw}")
                    row = (doc_id, "wav", 0, 0, frames, rate, len(payload))
                for c, v in zip(out, row):
                    out[c].append(v)
            yield pd.DataFrame(out)

    return docs.mapInPandas(decode_batches, schema=ASSET_CODEC_SCHEMA)


SQL_ASSET_CODEC_META = """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16
                ELSE 0 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + n_chars % 16
                ELSE 0 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1
                ELSE 1 + n_chars % 100 END AS BIGINT) AS n_frames,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                ELSE 8000 END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 54 + ((24 * (1 + doc_id % 16) + 31) // 32) * 4
                          * (1 + n_chars % 16)
                ELSE 44 + 2 * (1 + n_chars % 100) END AS BIGINT) AS n_bytes
    FROM documents
    WHERE n_chars IS NOT NULL
"""


# --- round 9: PNG — the compressed-container tier, still pure stdlib ---------

ASSET_PNG_SCHEMA = (
    "doc_id long, fmt string, width long, height long, bit_depth long, "
    "color_type long, n_raw long, pixel_sum long, n_bytes long"
)


def q_asset_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL raster decode of a COMPRESSED image format with no
    PIL/ffmpeg: each document becomes a valid truecolor-8 PNG
    (width 1+doc_id%16, height 1+n_chars%16, every pixel byte
    doc_id%251, scanline filters cycling None/Sub/Up), and the output
    row is produced by completely DECODING those bytes back — chunk
    walk with per-chunk CRC verification, zlib inflate (the C inflate
    is independent of our hand-rolled stored-block deflate writer, so
    the compression layer round-trips across two implementations), and
    full PNG unfiltering. pixel_sum is summed from the DECODED raster,
    so a bug anywhere in the filter/compress/CRC pipeline breaks
    oracle parity: the DuckDB twin recomputes dimensions, raster sum,
    AND the exact container byte size from doc_id/n_chars arithmetic
    alone (the stored-block zlib framing makes the compressed size
    arithmetic: 68 + height * (1 + 3*width) for these dims).

    Scale shape: one scan, mapInPandas Arrow batches, zero shuffles,
    one row per asset; with this the codec tier covers an
    uncompressed container (BMP), a chunked audio container (WAV), and
    a compressed image container (PNG) — only lossy formats (JPEG,
    video) remain env-gated on PIL/ffmpeg in decode_image above."""
    from .dedup import _parallel_scan

    docs = _parallel_scan(
        spark,
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull()),
    )
    return docs.mapInPandas(png_decode_batches, schema=ASSET_PNG_SCHEMA)


def png_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """The encode-then-fully-decode kernel behind q_asset_png_meta —
    module-level so the streaming twin (streaming/pipelines.
    streaming_asset_decode) runs the IDENTICAL mapInPandas plan and can
    never drift from the batch operator."""
    from ..functions.codecs import make_png, parse_png

    for pdf in batches:
        out: dict[str, list] = {
            c: []
            for c in (
                "doc_id",
                "fmt",
                "width",
                "height",
                "bit_depth",
                "color_type",
                "n_raw",
                "pixel_sum",
                "n_bytes",
            )
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            payload = make_png(
                1 + int(doc_id) % 16,
                1 + int(n_chars) % 16,
                int(doc_id) % 251,
            )
            w, h, depth, ctype, raw = parse_png(payload)
            row = (
                doc_id,
                "png",
                w,
                h,
                depth,
                ctype,
                len(raw),
                sum(raw),
                len(payload),
            )
            for c, v in zip(out, row):
                out[c].append(v)
        yield pd.DataFrame(out)


SQL_ASSET_PNG_META = """
    SELECT doc_id,
           'png' AS fmt,
           CAST(1 + doc_id % 16 AS BIGINT) AS width,
           CAST(1 + n_chars % 16 AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(2 AS BIGINT) AS color_type,
           CAST(3 * (1 + doc_id % 16) * (1 + n_chars % 16) AS BIGINT)
               AS n_raw,
           CAST((doc_id % 251) * 3 * (1 + doc_id % 16) * (1 + n_chars % 16)
               AS BIGINT) AS pixel_sum,
           CAST(68 + (1 + n_chars % 16) * (1 + 3 * (1 + doc_id % 16))
               AS BIGINT) AS n_bytes
    FROM documents
    WHERE n_chars IS NOT NULL
"""


# --- decode-validate quality screen (round 9) --------------------------------

ASSET_SCREEN_ROW_SCHEMA = "source string, ok int, n_bytes long"


def q_asset_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-validate screen over a binary asset column — the
    reject-malformed pass a multimodal ingest runs before persisting
    anything: every asset is FULLY decoded (the PNG pipeline of
    q_asset_png_meta) and rejected when the container is corrupt. To
    exercise the rejection path at scale the corruption is synthesized
    deterministically: docs with doc_id % 7 == 0 get one IDAT byte
    flipped, which the decoder's per-chunk CRC verification must catch
    (parse_png raises; the kernel records a rejection instead of
    propagating bad rows downstream). Reports per-source acceptance
    counts, accepted bytes, and the acceptance rate.

    The DuckDB twin recomputes all of it from doc_id arithmetic alone —
    a decoder that either misses the corruption (CRC not actually
    checked) or rejects a VALID container breaks oracle parity in
    opposite directions, pinning both failure modes.

    Scale shape: one scan, mapInPandas Arrow batches, then ONE
    |sources|-bounded keyed aggregate of 3-column rows (the text never
    shuffles; only (source, ok, n_bytes) does). ok_rate is a single
    IEEE division of exact int64 counts, identical on both engines."""
    from ..functions.codecs import make_png, parse_png

    from .dedup import _parallel_scan

    docs = _parallel_scan(
        spark,
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", "source")
        .filter(F.col("n_chars").isNotNull()),
    )

    def screen_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list = []
            oks: list = []
            nbytes: list = []
            for doc_id, n_chars, source in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["source"]
            ):
                payload = bytearray(
                    make_png(
                        1 + int(doc_id) % 16,
                        1 + int(n_chars) % 16,
                        int(doc_id) % 251,
                    )
                )
                if doc_id % 7 == 0:
                    payload[44] ^= 0xA5  # inside the IDAT body: CRC must trip
                try:
                    parse_png(bytes(payload))
                    ok = 1
                except ValueError:
                    ok = 0
                srcs.append(source)
                oks.append(ok)
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {"source": srcs, "ok": oks, "n_bytes": nbytes}
            )

    rows = docs.mapInPandas(screen_batches, schema=ASSET_SCREEN_ROW_SCHEMA)
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("ok").cast("long").alias("n_ok"),
            (F.count(F.lit(1)) - F.sum("ok")).cast("long").alias("n_rejected"),
            F.sum(
                F.when(F.col("ok") == 1, F.col("n_bytes")).otherwise(F.lit(0))
            ).cast("long").alias("bytes_ok"),
            (
                F.sum("ok").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("ok_rate"),
        )
        .orderBy("source")
    )


SQL_ASSET_QUALITY_SCREEN = """
    WITH per AS (
        SELECT source,
               CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS ok,
               68 + (1 + n_chars % 16) * (1 + 3 * (1 + doc_id % 16))
                   AS n_bytes
        FROM documents
        WHERE n_chars IS NOT NULL
    )
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(ok) AS BIGINT) AS n_ok,
           CAST(COUNT(*) - SUM(ok) AS BIGINT) AS n_rejected,
           CAST(SUM(CASE WHEN ok = 1 THEN n_bytes ELSE 0 END) AS BIGINT)
               AS bytes_ok,
           CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ok_rate
    FROM per
    GROUP BY source
    ORDER BY source
"""


# --- GIF full decode (round 10) -----------------------------------------------

ASSET_GIF_SCHEMA = (
    "doc_id long, fmt string, width long, height long, n_colors long, "
    "n_pixels long, pixel_sum long, n_bytes long"
)


def q_asset_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL raster decode of an LZW-COMPRESSED image format with no
    PIL/ffmpeg: each document becomes a valid single-frame 256-color
    GIF89a (width 1+doc_id%16, height 1+n_chars%16, every pixel the
    palette index doc_id%251), and the output row is produced by
    completely DECODING those bytes back — block walk (logical screen
    descriptor, global color table, image descriptor, sub-block
    reassembly) plus a GENERAL LZW decoder (variable code width,
    CLEAR resets, the KwKwK case; functions/codecs.py, round-tripped
    in tests against an independent table-growing LZW encoder).
    pixel_sum is summed from the DECODED raster, so a bug anywhere in
    the LZW/container pipeline breaks oracle parity: the DuckDB twin
    recomputes dimensions, raster sum, AND the exact container byte
    size from doc_id/n_chars arithmetic alone (the writer's
    clear-per-literal LZW framing makes the compressed size
    arithmetic — codecs.gif_total_bytes).

    With this the real-codec tier covers an uncompressed container
    (BMP), a chunked audio container (WAV), a DEFLATE-compressed image
    (PNG), and an LZW-compressed image (GIF); only lossy formats
    (JPEG, video) remain env-gated on PIL/ffmpeg in decode_image.

    Scale shape: one scan, mapInPandas Arrow batches, zero shuffles,
    one row per asset."""
    from .dedup import _parallel_scan

    docs = _parallel_scan(
        spark,
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull()),
    )
    return docs.mapInPandas(gif_decode_batches, schema=ASSET_GIF_SCHEMA)


def gif_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode-then-fully-decode kernel behind q_asset_gif_meta —
    module-level so a streaming twin can run the identical plan."""
    from ..functions.codecs import make_gif, parse_gif

    for pdf in batches:
        out: dict[str, list] = {
            c: []
            for c in (
                "doc_id",
                "fmt",
                "width",
                "height",
                "n_colors",
                "n_pixels",
                "pixel_sum",
                "n_bytes",
            )
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            payload = make_gif(
                1 + int(doc_id) % 16,
                1 + int(n_chars) % 16,
                int(doc_id) % 251,
            )
            w, h, n_colors, raster = parse_gif(payload)
            row = (
                doc_id,
                "gif",
                w,
                h,
                n_colors,
                len(raster),
                sum(raster),
                len(payload),
            )
            for c, v in zip(out, row):
                out[c].append(v)
        yield pd.DataFrame(out)


SQL_ASSET_GIF_META = """
    WITH dims AS (
        SELECT doc_id,
               1 + doc_id % 16 AS w,
               1 + n_chars % 16 AS h,
               doc_id % 251 AS idx
        FROM documents
        WHERE n_chars IS NOT NULL
    ), sized AS (
        -- flat LZW stream: ceil(9*(2*npix+1)/8) data bytes,
        -- one length prefix per 255-byte sub-block, 794 fixed bytes
        SELECT doc_id, w, h, idx, w * h AS npix,
               (18 * (w * h) + 16) // 8 AS data_bytes
        FROM dims
    )
    SELECT doc_id,
           'gif' AS fmt,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(256 AS BIGINT) AS n_colors,
           CAST(npix AS BIGINT) AS n_pixels,
           CAST(idx * npix AS BIGINT) AS pixel_sum,
           CAST(794 + data_bytes + (data_bytes + 254) // 255 AS BIGINT)
               AS n_bytes
    FROM sized
"""
