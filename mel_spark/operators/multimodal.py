"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures — and since round 5 the image/audio decode step is real too:
PNG and WAV PCM decode with the standard library (functions/codecs.py,
zlib + struct; golden-tested), no external media library needed.
NotImplementedError is reserved for genuinely absent codecs (JPEG decode,
video frame extraction) — for those, the deterministic fake decoder
(`fake=True`, sha256-seeded pseudo-content) keeps the pipeline executable.

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


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: sha256-seeded pseudo-content. Keeps the
    whole pipeline (batching, normalization, feature join) executable."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _pool_to_dim(x: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic fixed-width summary: mean over ``dim`` contiguous
    chunks (the resize/frame-sample analogue of mean-pooling)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    return np.array(
        [c.mean() for c in np.array_split(x, dim)], dtype=np.float32
    )


def _real_decode(kind: str, payload: bytes, dim: int) -> np.ndarray:
    """Stdlib decode → dim-length feature. PNG images: mean-over-channels
    pixel plane pooled to dim. WAV audio: per-chunk RMS energy envelope.
    Video: genuinely absent codec → NotImplementedError (use fake=True)."""
    from mel_spark.functions import codecs

    if kind == "image":
        px = codecs.decode_png(bytes(payload))  # (h, w, c) uint8
        return _pool_to_dim(px.astype(np.float64).mean(axis=2) / 255.0, dim)
    if kind == "audio":
        samples, _rate = codecs.decode_wav(bytes(payload))
        mono = samples.astype(np.float64).mean(axis=1)
        return np.array(
            [np.sqrt((c**2).mean()) if len(c) else 0.0
             for c in np.array_split(mono, dim)],
            dtype=np.float32,
        )
    raise NotImplementedError(
        f"no stdlib codec for kind={kind!r} (video/JPEG need av/PIL — not in "
        "this container); pass fake=True for the deterministic stand-in"
    )


def media_feature_udf(dim: int = 32, fake: bool = False):
    """mapInPandas extractor: media rows → (media_id, kind, feature float[dim]).

    The real path (default) decodes PNG/WAV with the stdlib codecs and
    raises NotImplementedError only for kinds with no stdlib codec (video);
    fake=True uses the deterministic sha256 stand-in for every kind."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                decoded = [_fake_decode(p, dim) for p in pdf["payload"]]
            else:
                decoded = [
                    _real_decode(k, p, dim)
                    for k, p in zip(pdf["kind"], pdf["payload"])
                ]
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


def synth_media(spark, n: int = 64, seed: int = 42, real_payloads: bool = True) -> DataFrame:
    """Deterministic media corpus for tests. ``real_payloads=True`` (default)
    encodes actual PNG images and WAV clips (stdlib codecs) so the REAL
    decode path runs end-to-end in this container; video payloads stay
    opaque bytes (no stdlib codec — that kind exercises the error/fake
    path). ``real_payloads=False`` restores the old opaque-bytes corpus."""
    from mel_spark.functions import codecs

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image" and real_payloads:
            px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
            payload = codecs.encode_png(px)
        elif kind == "audio" and real_payloads:
            payload = codecs.encode_wav(
                rng.standard_normal(1600).astype(np.float32) * 0.3, 16000
            )
        else:
            payload = rng.bytes(128)
        meta = {
            "width": 8 if kind == "image" else None,
            "height": 8 if kind == "image" else None,
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
