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


def featurize_map(
    dim: int = EMB_DIM,
    vocab_buckets: int = 4096,
    seed: int = 42,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    th_col: str = "_th",
    id_col: str = "csid",
    emb_format: str = "f32",
    engine: str = "pandas",
):
    """One Arrow pass computing EVERY per-document feature the ER pipeline
    needs — embedding, sorted-distinct shingle hashes (xs), and minhash band
    keys — vectorized ACROSS the batch (no per-document Python loop on the
    hot path). Input rows: (id_col, th_col = pre-hashed token ints from
    text.token_int_hashes, the one JVM xxhash64 pass). Returns a
    (function, schema) pair: ``engine="pandas"`` for mapInPandas (reference
    form, kept for tests/ad-hoc use), ``engine="arrow"`` for mapInArrow —
    the pipeline hot path. Both share ONE math kernel over (lens, flat)
    arrays; only the batch decode/encode differs. The arrow form reads the
    token-hash list column as a FLAT buffer and emits list columns as
    (offsets, values) pairs — no per-row ndarray/bytes objects, no pandas
    conversion, which halved the scorer's bandwidth footprint when applied
    there (BENCH/PAIR_STAGE.md) and is what lets Python workers scale with
    cores on a bandwidth-shared host.

    Why not Catalyst: the expression form of this computation (32 `transform`
    permutations × `array_min` over ~80-element arrays per row) allocates a
    fresh array per permutation per row — JVM allocation/GC saturates and the
    stage scaled only ~1.5× from 2→8 threads (BENCH r1). Here the same
    integer math runs as ~40 flat NumPy passes per 10k-row batch in C.

    The formulas are BIT-IDENTICAL to the Catalyst builders
    (text.shingle_hashes_from_token_ints / minhash_signature_from_ints /
    minhash_band_ints), verified by tests — same blocks, same pairs, same F1.
    Reference analogue: the embed + index build fused pass
    (src/utils/embeddings.py:55-123, src/baselines/olpeat/find_recall.py:76-118).
    """
    from pyspark.sql.types import (
        ArrayType as _Arr,
        FloatType as _Flt,
        IntegerType as _Int,
        LongType as _Lng,
        StructField as _SF,
        StructType as _ST,
    )

    from mel_spark.functions.text import MINHASH_P, _minhash_params

    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh_coefs = np.array([1000003, 9176, 523717, 31, 65599][:shingle_n], dtype=np.int64)
    band_coefs = np.array([1000003, 9176, 523717, 31][:rows_per_band], dtype=np.int64)
    params = np.array(_minhash_params(num_hashes, 42), dtype=np.int64)  # (H, 2)
    proj = _projection_matrix(dim, vocab_buckets, seed)
    P = np.int64(MINHASH_P)
    band_mod = np.int64(MINHASH_P * 4)

    # xs values are md5/xxhash-derived ints < 2^30 → int32 halves the bytes of
    # the pipeline's widest payload column (shuffles, checkpoints, Arrow).
    # emb_format="f16" stores the embedding as a packed little-endian fp16
    # blob (dim·2 bytes) — HALF the f32 array payload and none of parquet's
    # per-element list overhead, the reference's deliberate fp16 storage
    # (/root/reference/src/utils/embeddings.py:108,219-221). Scorers upcast
    # on read (np.frombuffer('<f2')); quantization is deterministic, so
    # fold-equals-full-run byte identity is preserved.
    if emb_format not in ("f32", "f16"):
        raise ValueError(f"emb_format must be 'f32' or 'f16', got {emb_format!r}")
    from pyspark.sql.types import BinaryType as _Bin

    schema = _ST(
        [
            _SF(id_col, _Lng()),
            _SF("emb", _Bin() if emb_format == "f16" else _Arr(_Flt())),
            _SF("xs", _Arr(_Int())),
            _SF("bands", _Arr(_Lng())),
        ]
    )

    def _clamped_grams(t: np.ndarray) -> np.ndarray:
        # docs shorter than shingle_n: one gram with tail indices clamped —
        # same semantics as text.shingle_hashes_from_token_ints
        idx = np.minimum(np.arange(shingle_n), len(t) - 1)
        return np.array([(t[idx] * sh_coefs).sum() % P], dtype=np.int64)

    def _core(
        lens: np.ndarray, flat: np.ndarray, D: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """The shared math kernel over segmented flat arrays. Returns
        (vecs (D,dim) f32 L2-normed, u_val int32 flat sorted-distinct-per-doc,
        starts_u (D,) int64 segment starts into u_val, band_keys (D,bands))."""
        doc_starts = np.zeros(D, np.int64)
        np.cumsum(lens[:-1], out=doc_starts[1:])

        # ---- embedding: bucket gather + segmented sum (buckets = th mod
        # vocab_buckets, exact because vocab_buckets divides 2^30) ----
        # Chunked by docs: the gather proj[tokens] materializes
        # tokens×dim×4 B (≈100 MB per 10k-doc batch) before the segmented
        # sum. On a bandwidth-shared host that full-batch intermediate is
        # pure DRAM traffic; per ~512-doc chunk it stays ~5 MB (cache-warm)
        # and the arithmetic is unchanged (reduceat segments never span
        # chunk boundaries because chunks split ON doc starts).
        vecs = np.zeros((D, dim), dtype=np.float32)
        nz = lens > 0
        if nz.any():
            mask = np.int64(vocab_buckets - 1)
            EMB_CH = 512
            for c0 in range(0, D, EMB_CH):
                c1 = min(c0 + EMB_CH, D)
                cnz = np.flatnonzero(nz[c0:c1]) + c0
                if not len(cnz):
                    continue
                s = doc_starts[c0]
                e = doc_starts[c1] if c1 < D else len(flat)
                vecs[cnz] = np.add.reduceat(
                    proj[flat[s:e] & mask], doc_starts[cnz] - s, axis=0
                )
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs /= norms

        # ---- shingle hashes: shifted-add convolution over the flat
        # token-hash array, masked to within-document positions ----
        total = len(flat)
        g = sh_coefs[0] * flat
        for j in range(1, shingle_n):
            g[: total - j] += sh_coefs[j] * flat[j:]
        g %= P
        docidx = np.repeat(np.arange(D, dtype=np.int64), lens)
        pos_in_doc = np.arange(total, dtype=np.int64) - doc_starts[docidx]
        valid = pos_in_doc <= lens[docidx] - shingle_n
        sh = g[valid]
        sh_doc = docidx[valid]
        shorts = np.flatnonzero(lens < shingle_n)
        if len(shorts):
            extra = [
                _clamped_grams(flat[doc_starts[s] : doc_starts[s] + lens[s]])
                for s in shorts
            ]
            sh = np.concatenate([sh, np.concatenate(extra)])
            sh_doc = np.concatenate(
                [sh_doc, np.repeat(shorts.astype(np.int64), [len(e) for e in extra])]
            )

        # ---- per-doc sorted-distinct via one global unique over
        # (doc << 31 | hash); hashes < P < 2^31 so the pack is lossless ----
        u = np.unique((sh_doc << np.int64(31)) | sh)
        u_doc = u >> np.int64(31)
        u_val = (u & np.int64((1 << 31) - 1)).astype(np.int32)
        starts_u = np.searchsorted(u_doc, np.arange(D, dtype=np.int64))

        # ---- minhash signature minima + integer band keys ----
        # Chunked by docs for the same bandwidth reason as the embedding
        # gather: the naive loop streams the full shingle array from DRAM
        # 32× (once per hash); per ~2048-doc chunk the segment (~1.3 MB)
        # stays cache-warm across all 32 passes — ~32× less DRAM traffic
        # for identical arithmetic. ph buffers are preallocated and reused.
        u_val64 = u_val.astype(np.int64)
        sig = np.empty((D, num_hashes), dtype=np.int64)
        MH_CH = 2048
        ph = np.empty(0, np.int64)
        for c0 in range(0, D, MH_CH):
            c1 = min(c0 + MH_CH, D)
            s = starts_u[c0]
            e = starts_u[c1] if c1 < D else len(u_val64)
            seg = u_val64[s:e]
            st = starts_u[c0:c1] - s
            if len(seg) > len(ph):
                ph = np.empty(len(seg), np.int64)
            pv = ph[: len(seg)]
            for h in range(num_hashes):
                np.multiply(seg, params[h, 0], out=pv)
                np.add(pv, params[h, 1], out=pv)
                np.mod(pv, P, out=pv)
                sig[c0:c1, h] = np.minimum.reduceat(pv, st)
        band_keys = np.zeros((D, bands), dtype=np.int64)
        for b in range(bands):
            acc = np.zeros(D, dtype=np.int64)
            for j in range(rows_per_band):
                acc += band_coefs[j] * sig[:, b * rows_per_band + j]
            band_keys[:, b] = (acc + np.int64(b) * np.int64(1_000_000_007)) % band_mod
        return vecs, u_val, starts_u, band_keys

    _null_msg = (
        "featurize_map: document with NULL/zero-length token array "
        "(ids {ids}...). Upstream must "
        "canonicalize NULL content to '' (pipeline.ingest does)."
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            th = pdf[th_col]
            D = len(th)
            if D == 0:
                yield pd.DataFrame({id_col: [], "emb": [], "xs": [], "bands": []})
                continue
            # contract: >=1 token hash per document. ingest() canonicalizes
            # NULL content to '' (which tokenizes to one empty token), so a
            # None/empty array here means a caller bypassed that boundary —
            # fail with the contract named instead of an IndexError three
            # layers into the shingle kernel.
            bad = [t is None or len(t) == 0 for t in th]
            if any(bad):
                raise ValueError(_null_msg.format(ids=pdf[id_col][bad].tolist()[:5]))
            lens = np.fromiter((len(t) for t in th), np.int64, D)
            flat = (
                np.concatenate([np.asarray(t, np.int64) for t in th])
                if lens.sum()
                else np.empty(0, np.int64)
            )
            vecs, u_val, starts_u, band_keys = _core(lens, flat, D)
            xs_lists = np.split(u_val, starts_u[1:])
            if emb_format == "f16":
                emb_out = [v.astype("<f2").tobytes() for v in vecs]
            else:
                emb_out = list(vecs)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "emb": emb_out,
                    "xs": xs_lists,
                    "bands": list(band_keys),
                }
            )

    def _featurize_arrow(batches):
        import pyarrow as pa
        import pyarrow.compute as pc  # noqa: F401 — pa.compute is lazy

        def _empty():
            emb_t = pa.binary() if emb_format == "f16" else pa.list_(pa.float32())
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], emb_t),
                    pa.array([], pa.list_(pa.int32())),
                    pa.array([], pa.list_(pa.int64())),
                ],
                names=[id_col, "emb", "xs", "bands"],
            )

        for rb in batches:
            D = rb.num_rows
            if D == 0:
                yield _empty()
                continue
            th = rb.column(th_col)
            ids = rb.column(id_col)
            lens = pc.list_value_length(th)
            if th.null_count or pc.min(lens).as_py() == 0:
                bad = pc.fill_null(pc.equal(lens, 0), True)
                raise ValueError(
                    _null_msg.format(ids=ids.filter(bad).to_pylist()[:5])
                )
            lens = lens.to_numpy().astype(np.int64)
            flat = th.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            vecs, u_val, starts_u, band_keys = _core(lens, flat, D)

            xs_off = np.empty(D + 1, np.int32)
            xs_off[:D] = starts_u
            xs_off[D] = len(u_val)
            xs_arr = pa.ListArray.from_arrays(
                pa.array(xs_off), pa.array(u_val, pa.int32())
            )
            bd_off = np.arange(D + 1, dtype=np.int32) * bands
            bd_arr = pa.ListArray.from_arrays(
                pa.array(bd_off), pa.array(band_keys.ravel(), pa.int64())
            )
            if emb_format == "f16":
                blob = np.ascontiguousarray(vecs.astype("<f2")).tobytes()
                eb_off = np.arange(D + 1, dtype=np.int32) * (dim * 2)
                emb_arr = pa.Array.from_buffers(
                    pa.binary(), D,
                    [None, pa.py_buffer(eb_off.tobytes()), pa.py_buffer(blob)],
                )
            else:
                eb_off = np.arange(D + 1, dtype=np.int32) * dim
                emb_arr = pa.ListArray.from_arrays(
                    pa.array(eb_off), pa.array(vecs.ravel(), pa.float32())
                )
            yield pa.RecordBatch.from_arrays(
                [ids, emb_arr, xs_arr, bd_arr],
                names=[id_col, "emb", "xs", "bands"],
            )

    if engine not in ("pandas", "arrow"):
        raise ValueError(f"engine must be 'pandas' or 'arrow', got {engine!r}")
    return (_featurize_arrow if engine == "arrow" else _featurize), schema


def emb_matrix(series: pd.Series) -> np.ndarray:
    """(batch, dim) float64 matrix from an Arrow emb column in EITHER storage
    format — fp16-packed binary (bytes) or array<float> — the single decode
    point every NumPy scorer shares."""
    vals = series.to_numpy()
    if len(vals) and isinstance(vals[0], (bytes, bytearray)):
        return np.stack([np.frombuffer(v, dtype="<f2") for v in vals]).astype(np.float64)
    return np.stack(vals).astype(np.float64)


def emb_matrix_arrow(arr) -> np.ndarray:
    """(batch, dim) float64 matrix straight off an Arrow emb column's flat
    buffers — the mapInArrow twin of :func:`emb_matrix`. Handles both storage
    formats: fp16-packed binary (offsets buffer + one values buffer viewed as
    ``<f2``, zero per-row objects) and array<float> (``flatten()`` + reshape).
    Rows must be non-null and equal-width (the featurizer invariant)."""
    import pyarrow as pa

    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        n = len(arr)
        if n == 0:
            return np.empty((0, 0), np.float64)
        off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offsets = np.frombuffer(arr.buffers()[1], off_dt)[
            arr.offset : arr.offset + n + 1
        ]
        width = int(offsets[1] - offsets[0])
        if int(offsets[-1] - offsets[0]) != n * width:
            # ragged rows (shouldn't happen for embeddings) — per-row fallback
            return np.stack(
                [np.frombuffer(v.as_py(), dtype="<f2") for v in arr]
            ).astype(np.float64)
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        flat = data[int(offsets[0]) : int(offsets[-1])].view("<f2")
        return flat.reshape(n, width // 2).astype(np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1) if len(arr) else np.empty((0, 0), np.float64)


def unpack_f16_udf():
    """Arrow-batched decode fp16 blob → array<float>, for the (off-hot-path)
    consumers that need a real array column: Catalyst cosine scoring and
    hyperplane blocking over a f16-stored embed checkpoint."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _unpack(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield pd.Series(
                [np.frombuffer(v, dtype="<f2").astype(np.float32) for v in s]
            )

    return _unpack


def ensure_emb_array(df, emb_col: str = "emb"):
    """Return ``df`` with ``emb_col`` as array<float>, decoding in one Arrow
    pass when the column is fp16-packed binary; identity otherwise. Column
    pruning drops the decode entirely for consumers that never read emb."""
    from pyspark.sql.types import BinaryType

    if isinstance(df.schema[emb_col].dataType, BinaryType):
        return df.withColumn(emb_col, unpack_f16_udf()(F.col(emb_col)))
    return df


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
