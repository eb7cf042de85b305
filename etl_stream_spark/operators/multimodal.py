"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, byte length, content hash). Decoding /
feature extraction / resizing / frame sampling run as Arrow-batched
``mapInPandas`` operators — the decode kernels themselves are stubbed
(image/audio libraries are not in this container; see
``decode_image_stub``) but the Spark-side plumbing — schema, batch
shape, partitioning — is real and tested.

Scale notes: payloads never pass through a Python row loop — they move
as Arrow buffers into pandas batches; per-batch processing amortizes
serialization. Partition sizing should target
``spark.sql.files.maxPartitionBytes`` so a batch of blobs fits executor
memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_stream_spark.plans.partitioning import ensure_parallelism

MEDIA_SCHEMA = (
    "doc_id long, payload binary, modality string, n_bytes long, content_md5 string"
)

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, content_md5 string, "
    "width int, height int, n_channels int, feature_norm double"
)


def to_media_column(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata
    (for the testdata corpus the 'payload' is the utf-8 encoded text —
    a stand-in for real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB decode: a real deployment would use PIL/ffmpeg here (not in
    this container). Produces deterministic fake dimensions from the
    payload hash so the downstream plumbing is exercised end-to-end."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 64,
        "height": 64 + digest[1] % 64,
        "n_channels": 3,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "content_md5": pdf["content_md5"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_channels": [m["n_channels"] for m in meta],
                }
            )
            # deterministic stand-in for an embedding norm
            out["feature_norm"] = [
                round((m["width"] * m["height"]) ** 0.5, 6) for m in meta
            ]
            yield out

    return ensure_parallelism(media).mapInPandas(_extract, schema=FEATURE_SCHEMA)
