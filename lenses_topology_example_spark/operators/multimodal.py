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


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the canonical
    multimodal layout. encode() is a native expression; at scale this
    column comes straight off the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
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


# The fake decoder in SQL: checksum = sum of first 64 bytes.
_SQL_CHECKSUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "generate_series(1, LEAST(octet_length(encode(text)), 64)), "
    "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, b) -> a + b)"
)

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
