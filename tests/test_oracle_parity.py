"""Spark Column builders vs DuckDB oracle twins — byte equality on real data.

This is the contract that makes the driver's DuckDB correctness gate
meaningful: every primitive used in __spark_entry__.oracle_sql() is proven
bit-identical here first.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mel_spark.functions import oracle as O
from mel_spark.functions import text as T
from mel_spark.functions import vectors as V


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return c


def _pairs_equal(sdf, ddf, cols):
    for col in cols:
        a, b = sdf[col], ddf[col]
        for i, (x, y) in enumerate(zip(a, b)):
            xa = list(x) if isinstance(x, (list, np.ndarray)) else x
            ya = list(y) if isinstance(y, (list, np.ndarray)) else y
            assert xa == ya, (col, i, xa, ya)


def test_text_primitives_parity(spark, con, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdf = (
        docs.select(
            "doc_id",
            F.array_sort(T.shingles("text", 3)).alias("sh"),
            T.minhash_signature(T.shingles("text", 3), 8).alias("sig"),
            T.simhash64(T.shingles("text", 3), 16).alias("simh"),
            T.doc_fingerprint("text").alias("fp"),
            T.num_tokens("text").alias("nt"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    ddf = con.sql(
        f"""
        select doc_id,
          list_sort({O.shingles("text", 3)}) as sh,
          {O.minhash_signature(O.shingles("text", 3), 8)} as sig,
          {O.simhash64(O.shingles("text", 3), 16)} as simh,
          {O.doc_fingerprint("text")} as fp,
          {O.num_tokens("text")} as nt
        from documents order by doc_id
        """
    ).df()
    _pairs_equal(sdf, ddf, ["sh", "sig", "simh", "fp", "nt"])


def test_cosine_parity(spark, con, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e2 = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.col("a.vec_id") < 10)
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            V.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .orderBy("ia", "ib")
        .toPandas()
    )
    dd = con.sql(
        f"""
        select a.vec_id ia, b.vec_id ib, {O.cosine("a.embedding", "b.embedding")} as cos
        from embeddings a join embeddings b on a.vec_id < b.vec_id
        where a.vec_id < 10 order by ia, ib
        """
    ).df()
    assert (e2["cos"].values == dd["cos"].values).all()


def test_quality_score_parity(spark, con, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdf = docs.select("doc_id", T.quality_score("text").alias("q")).orderBy("doc_id").toPandas()
    ddf = con.sql(
        f"select doc_id, {O.quality_score('text')} as q from documents order by doc_id"
    ).df()
    assert np.allclose(sdf["q"].astype(float), ddf["q"].astype(float), atol=1e-9)


def test_segment_and_gopher_primitives_parity(spark, con, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdf = (
        docs.select(
            "doc_id",
            T.doc_segments("text", 8).alias("segs"),
            T.mean_word_len("text").alias("mwl"),
            T.distinct_token_ratio("text").alias("dtr"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    ddf = con.sql(
        f"""
        select doc_id,
          {O.doc_segments('text', 8)} as segs,
          {O.mean_word_len('text')} as mwl,
          {O.distinct_token_ratio('text')} as dtr
        from documents order by doc_id
        """
    ).df()
    _pairs_equal(sdf, ddf, ["segs", "mwl", "dtr"])


def test_int8_codes_and_seed_hash_parity(spark, con, sf_dir):
    """Round-3 primitives: symmetric int8 quantization codes and the
    md5-seeded init hash (the IVF oracle's centroid sampler) must be
    byte-identical across engines."""
    from mel_spark.operators.similarity import _md5_seed_hash, int8_codes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sdf = (
        emb.select(
            "vec_id",
            int8_codes(F.col("embedding")).alias("code"),
            _md5_seed_hash(F.col("vec_id"), 42).alias("h"),
        )
        .orderBy("vec_id")
        .toPandas()
    )
    ddf = con.sql(
        f"""
        select vec_id,
          {O.int8_codes('embedding')} as code,
          ('0x' || substr(md5(vec_id::VARCHAR || ':42'), 1, 15))::BIGINT as h
        from embeddings order by vec_id
        """
    ).df()
    _pairs_equal(sdf, ddf, ["code", "h"])
