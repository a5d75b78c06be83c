"""Multimodal (binary media) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the interleaved-document model's media side.  The Spark-side plumbing
(schemas, batch shapes, Arrow transfer, partition sizing) is real and
tested; the actual codec work (image decode, resampling, frame sampling) is
STUBBED deterministically because no image/audio libraries exist in this
environment — each stub documents the production implementation point.

Pattern: ``mapInPandas`` with a small per-batch budget — media rows are
large, so the iterator-of-batches shape lets one task stream many small
Arrow batches instead of materializing a partition of blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("bytes", IntegerType()),
            StructField("mime", StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("header_hex", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_fake_payload(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Deterministic fake payload for tests: the utf-8 bytes of the ref,
    repeated.  Production: an Iceberg/parquet media table or object-store
    fetch keyed by media_ref."""
    return df.withColumn(
        "payload",
        F.encode(F.repeat(F.col(ref_col), 8), "utf-8"),
    ).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


def _decode_stub(kind: str, payload: bytes) -> list[float]:
    """STUB: deterministic 8-dim 'feature' from the payload bytes.

    Production implementation point: PIL/opencv decode → resize →
    normalized pixel tensor (image); torchaudio/ffmpeg resample (audio);
    frame sampling (video).  Raise if someone relies on real decode."""
    if kind not in ("image", "audio", "video", "table"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    acc = [0.0] * 8
    for i, b in enumerate(payload or b""):
        acc[i % 8] += (b % 64) / 64.0
    n = max(len(payload or b""), 1)
    return [round(a / n * 8, 6) for a in acc]


FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("bytes", IntegerType()),
            StructField("mime", StringType()),
        ])),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_bytes: int = 8, batch_rows: int = 256) -> DataFrame:
    """Evenly-spaced frame sampling over binary payloads: one input row
    fans out to ``n_frames`` output rows.

    The Spark-side shape is the real part (``mapInPandas`` row fan-out with
    bounded Arrow batches — the plan a video pipeline needs at 100 TB where
    one task streams many small frame batches).  The frame EXTRACTION is a
    deterministic byte-slice STUB — the production implementation point is
    ffmpeg keyframe/stride extraction in place of the slicing loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                refs, kinds, idxs, frames = [], [], [], []
                for ref, kind, p in zip(chunk["media_ref"],
                                        chunk["media_kind"],
                                        chunk["payload"]):
                    p = p or b""
                    span = max(len(p) - frame_bytes, 0)
                    for i in range(n_frames):
                        off = (i * span) // max(n_frames - 1, 1)
                        refs.append(ref)
                        kinds.append(kind)
                        idxs.append(i)
                        frames.append(p[off:off + frame_bytes])
                yield pd.DataFrame({
                    "media_ref": refs, "media_kind": kinds,
                    "frame_index": idxs, "frame": frames,
                })

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_media(media: DataFrame, out_bytes: int = 16,
                 batch_rows: int = 256) -> DataFrame:
    """Payload 'resize' keeping the media schema (payload + meta).

    STUB transform: deterministic nearest-neighbor byte downsample —
    production point: PIL/opencv decode → resize → re-encode (image) or
    resample (audio).  Schema, Arrow batching, and meta rewrite are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                resized = []
                for p in chunk["payload"]:
                    p = p or b""
                    if not p:
                        resized.append(b"")
                        continue
                    resized.append(bytes(
                        p[(i * len(p)) // out_bytes]
                        for i in range(out_bytes)
                    ))
                yield pd.DataFrame({
                    "media_ref": chunk["media_ref"].values,
                    "media_kind": chunk["media_kind"].values,
                    "payload": resized,
                    "meta": [
                        {"bytes": len(r), "mime": "application/octet-stream"}
                        for r in resized
                    ],
                })

    return media.mapInPandas(run, RESIZED_SCHEMA)


def extract_media_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams small batches (media rows are heavy), keeping
    executor memory bounded regardless of partition row count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats = [
                    _decode_stub(k, p)
                    for k, p in zip(chunk["media_kind"], chunk["payload"])
                ]
                yield pd.DataFrame(
                    {
                        "media_ref": chunk["media_ref"].values,
                        "media_kind": chunk["media_kind"].values,
                        "n_bytes": [
                            len(p or b"") for p in chunk["payload"]
                        ],
                        "header_hex": [
                            (p or b"")[:4].hex() for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, FEATURE_SCHEMA)
