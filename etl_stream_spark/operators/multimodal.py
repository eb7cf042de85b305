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
    "width long, height long, n_channels long, feature_norm double"
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


RESIZED_SCHEMA = (
    "doc_id long, payload binary, modality string, content_md5 string, "
    "width long, height long, scale_x double, scale_y double"
)


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Arrow-batched resize: 1:1 row transform re-emitting the payload
    with target dimensions and the scale factors a real kernel would
    apply. STUB: the pixel resample itself would be PIL/ffmpeg (not in
    this container); payload passes through unchanged, dimensions come
    from the deterministic stub decode."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],  # stub: unresampled bytes
                    "modality": pdf["modality"],
                    "content_md5": pdf["content_md5"],
                    "width": target_w,
                    "height": target_h,
                    "scale_x": [round(target_w / m["width"], 6) for m in meta],
                    "scale_y": [round(target_h / m["height"], 6) for m in meta],
                }
            )

    return ensure_parallelism(media).mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_ts_ms long, frame_md5 string"


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: each input row fans out to
    1-4 frame rows (the flatMap shape — output cardinality decided per
    row inside the batch). STUB kernel: the frame count derives from the
    payload hash (3rd md5 byte, deterministic and SQL-reproducible);
    a real deployment would seek the container every N ms with ffmpeg.
    Frame ids are content-addressed (md5 of content hash + index)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, fmds = [], [], [], []
            for doc_id, payload, cmd5 in zip(
                pdf["doc_id"], pdf["payload"], pdf["content_md5"]
            ):
                n = 1 + hashlib.md5(bytes(payload)).digest()[2] % 4
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000)
                    fmds.append(hashlib.md5(f"{cmd5}_{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame_md5": fmds}
            )

    return ensure_parallelism(media).mapInPandas(_frames, schema=FRAME_SCHEMA)
