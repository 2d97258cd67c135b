"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested; the actual media decoding is
STUBBED (this container has no image/audio libraries): the stub
derives deterministic fake metadata from the payload bytes, so the
whole path stays oracle-checkable.

At scale: mapInPandas streams Arrow batches through one Python worker
per core, never materializing a partition; binary payloads should ride
in their own column so column pruning skips them when a query only
touches metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, fmt string"
)


def fake_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text UTF-8-encoded as a stand-in binary payload."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def decode_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode operator: binary column → metadata via mapInPandas.

    The stub is a closure (pickled by value) rather than a module-level
    function: executor Python workers don't necessarily have this repo
    on their PYTHONPATH, and a by-reference pickle would make them try
    to import it. A real implementation would call PIL/av/soundfile on
    each ``payload``; the Arrow batch flow, schema contract, and
    partition behavior are identical."""

    def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    # deterministic fake dimensions from the payload
                    "width": 16 + (n_bytes % 497),
                    "height": 16 + (pdf["doc_id"] * 31) % 497,
                    "fmt": "fake/raw",
                }
            )

    return fake_media_table(spark, sf_dir).mapInPandas(
        decode_stub, schema=DECODE_SCHEMA
    )


def extract_frames_stub(spark: SparkSession, sf_dir: str, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled "frame" offset.

    Real video frame extraction is NotImplemented in this container;
    the explode-with-offsets plan (which is the expensive part at
    scale — it multiplies rows) is exercised for real."""
    media = fake_media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.length("payload") - 1, F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


@query(
    "multimodal_decode_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(16 + octet_length(encode(text)) % 497 AS BIGINT) AS width,
               CAST(16 + (doc_id * 31) % 497 AS BIGINT) AS height,
               'fake/raw' AS fmt
        FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode via Arrow-batched mapInPandas (stubbed
    decoder, real plumbing — see module docstring)."""
    return decode_media(spark, sf_dir)
