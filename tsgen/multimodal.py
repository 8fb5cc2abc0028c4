"""Multimodal-column plumbing (north-star extension).

Images/audio/video are opaque BINARY columns with typed metadata; decode /
feature-extraction runs as Arrow-batched mapInPandas over binary batches.
The actual media decode is STUBBED (no image/audio libs in this container —
see decode_stub): the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested; swapping decode_stub for a PIL/ffmpeg
call is a one-function change.

Scale notes:
- binary payloads stay opaque to the shuffle (never grouped on); feature
  extraction is a narrow mapInPandas — zero shuffles.
- maxRecordsPerBatch bounds Arrow batch memory when payloads are large
  (set spark.sql.execution.arrow.maxRecordsPerBatch for real media).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, payload binary, n_bytes int, declared_lang string"
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").cast("int").alias("n_bytes"),
        F.col("lang").alias("declared_lang"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB for the real media decoder (PIL.Image.open / soundfile / ffmpeg).

    Deterministic fake: derives features from raw bytes so the distributed
    plumbing is fully exercised and value-checkable. A real deployment
    replaces only this function.
    """
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % 1_000_003
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": checksum,
    }


FEATURES_SCHEMA = "doc_id bigint, kind string, byte_len int, first_byte int, checksum bigint"


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas —
    narrow, no shuffle; batch shape (n_rows, payload bytes))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "byte_len": [f["byte_len"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)
