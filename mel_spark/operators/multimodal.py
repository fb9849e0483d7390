"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures — while the codec step is stubbed behind an import gate (the
image/audio libraries are not in this container). Decode UDFs raise
NotImplementedError unless a deterministic fake decoder is requested
(`fake=True`), which synthesizes pixel/sample arrays from the bytes' sha256 —
fully testable end-to-end without any media library.

Schema contract:

    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _try_import_codecs():
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: sha256-seeded pseudo-content. Keeps the
    whole pipeline (batching, normalization, feature join) executable."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def media_feature_udf(dim: int = 32, fake: bool = False):
    """mapInPandas extractor: media rows → (media_id, kind, feature float[dim]).

    Real path requires codec libs (PIL/librosa/av) and raises
    NotImplementedError here; fake=True uses the deterministic stand-in."""
    have_codecs = _try_import_codecs()

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not have_codecs:
                raise NotImplementedError(
                    "media decode needs PIL/librosa/av — not in this container; "
                    "pass fake=True for the deterministic stand-in decoder"
                )
            decoded = [_fake_decode(p, dim) for p in pdf["payload"]]
            feats = [v / max(1e-9, float(np.linalg.norm(v))) for v in decoded]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return _extract


def extract_features(media: DataFrame, dim: int = 32, fake: bool = False) -> DataFrame:
    """Partition-parallel feature extraction; repartitions by media_id so large
    binary payloads spread evenly (no hot partition of big videos)."""
    return (
        media.repartition("media_id")
        .mapInPandas(media_feature_udf(dim=dim, fake=fake), FEATURE_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes frame indices 0..n_frames step
    every_n as (media_id, frame_idx) — the decode of each sampled frame is the
    stubbed step. Pure Catalyst (sequence + explode)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus for tests (binary payload from seed)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128)
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 90 if kind == "video" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(
        [(int(r.media_id), r.kind, bytes(r.payload),
          (r.meta["width"], r.meta["height"], r.meta["sample_rate"], r.meta["n_frames"]))
         for r in pdf.itertuples()],
        MEDIA_SCHEMA,
    )
