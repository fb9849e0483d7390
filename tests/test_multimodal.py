"""Multimodal plumbing: schema, batching, determinism, stub gating."""

import pytest
from pyspark.sql import functions as F

from mel_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30)


def test_schema_and_counts(media):
    assert media.count() == 30
    assert dict(media.dtypes)["payload"] == "binary"


def test_fake_feature_extraction_deterministic(media):
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media, fake=True).collect()}
    f2 = {r["media_id"]: r["feature"] for r in
          extract_features(media.repartition(7), fake=True).collect()}
    assert f1.keys() == f2.keys()
    for k in f1:
        assert f1[k] == f2[k], k
        assert len(f1[k]) == 32


def test_real_decode_runs_for_png_and_wav(media):
    """r5: the real path decodes PNG/WAV with the stdlib codecs — executable
    in this container, deterministic across partitionings, unit-norm."""
    real = media.filter(F.col("kind") != "video")
    f1 = {r["media_id"]: r["feature"] for r in extract_features(real).collect()}
    f2 = {r["media_id"]: r["feature"] for r in
          extract_features(real.repartition(5)).collect()}
    assert f1 == f2 and len(f1) == 20
    import numpy as np

    for v in f1.values():
        assert len(v) == 32
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_real_decode_still_gated_for_video(media):
    """NotImplementedError is reserved for genuinely absent codecs."""
    with pytest.raises(Exception) as ei:
        extract_features(media.filter(F.col("kind") == "video")).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_plan(media):
    plan = frame_sample_plan(media, every_n=30)
    rows = plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 3 for r in rows)  # frames 0,30,60 of 90
    assert len(rows) == 10  # a third of the corpus is video
