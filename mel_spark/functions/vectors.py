"""Vector (array<float>) math as Catalyst expressions + Arrow-vectorized UDFs.

The expression forms (cosine/dot/l2_normalize) stay JVM-side for small dims and
oracle parity; the pandas-UDF embedder mirrors the reference's batched encoder
(src/utils/embeddings.py:55-123: DataLoader batches → model → fp16 normalize)
as a deterministic hashed random-projection bi-encoder — model-pluggable, same
contract: L2-normalized float vectors (src/utils/embeddings.py:108-111).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMB_DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double (order matches DuckDB list_sum fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Exact cosine, rounded for cross-engine value-hash stability
    (oracle twin: mel_spark.functions.oracle.cosine)."""
    return F.round(dot(a, b) / (l2_norm(a) * l2_norm(b)), decimals)


def l2_normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(a, lambda x: (x.cast("double") / n).cast("float"))


# ---------------------------------------------------------------------------
# Deterministic hashed random-projection embedder (the pluggable "bi-encoder")
# ---------------------------------------------------------------------------

def _projection_matrix(dim: int, vocab_buckets: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((vocab_buckets, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _token_buckets(texts: pd.Series, vocab_buckets: int) -> list[np.ndarray]:
    import zlib

    out = []
    for t in texts:
        toks = t.split(" ") if t else []
        out.append(
            np.fromiter(
                (zlib.crc32(w.encode("utf-8")) % vocab_buckets for w in toks),
                dtype=np.int64,
                count=len(toks),
            )
        )
    return out


def embed_buckets_udf(dim: int = EMB_DIM, vocab_buckets: int = 4096, seed: int = 42):
    """Arrow-batched embedder over PRE-HASHED token buckets (array<int>, from
    text.token_bucket_ids — JVM-side xxhash64): per batch one flattened
    gather + segmented sum (np.add.reduceat), zero Python-per-token work.
    Same contract as embed_text_udf: deterministic, L2-normalized float[dim].
    """
    proj = _projection_matrix(dim, vocab_buckets, seed)

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for bucket_lists in it:
            lens = np.fromiter((len(b) for b in bucket_lists), dtype=np.int64, count=len(bucket_lists))
            vecs = np.zeros((len(bucket_lists), dim), dtype=np.float32)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate([np.asarray(b, dtype=np.int64) for b in bucket_lists if len(b)])
                starts = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=starts[1:])
                vecs[nz] = np.add.reduceat(proj[flat], starts, axis=0)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs /= norms
            yield pd.Series(list(vecs))

    return _embed


def embed_text_udf(dim: int = EMB_DIM, vocab_buckets: int = 4096, seed: int = 42):
    """Arrow-batched embedder: text → L2-normalized float[dim].

    Bag-of-hashed-tokens × fixed random projection — deterministic across runs,
    partitions, and parallelism levels (FIXTURES.md §5 determinism test). The
    projection matrix is built once per executor (lazy module-level cache), the
    per-batch math is a single scatter-add + matmul-free gather-sum: O(tokens).
    """
    proj = _projection_matrix(dim, vocab_buckets, seed)

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            buckets = _token_buckets(texts.fillna(""), vocab_buckets)
            vecs = np.zeros((len(buckets), dim), dtype=np.float32)
            for i, b in enumerate(buckets):
                if len(b):
                    np.add.at(vecs, i, 0)  # no-op keeps branch simple
                    vecs[i] = proj[b].sum(axis=0)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs /= norms
            yield pd.Series(list(vecs))

    return _embed
