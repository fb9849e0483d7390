"""Property test: the fused Arrow pair-scorer kernel == the Catalyst
expression scorer's math, per row, at 6dp — no SparkSession in the loop.

The oracle below replicates the EXPRESSION path's semantics scalar-by-scalar
(V.cosine = F.round(dot / (||a||·||b||), 6) HALF_UP with TRUE norms of the
values as stored; jaccard = round(|a∩b| / |a∪b|, 6); score = weighted fuse)
using plain Python sets and per-row dots.  The kernel
(mel_spark.operators.pairs._fused_score_batch) computes the same quantities
via flat-buffer packing, searchsorted intersection and einsum.  Any packing /
intersection / norm / rounding-mode bug diverges somewhere in the random
space — the round-4 fp16 true-norm bug (pairs.py raw-dot drift) is exactly
the class this catches mechanically (VERDICT r4 next #8).

Embedding values are drawn from the dyadic grid k/64, |k| <= 64: exact in
float32 AND float16, and their products/sums are exact in float64 — so
einsum vs per-row dot cannot differ by an ulp and 6dp equality is exact, for
both storages.  A separate case uses continuous random floats for the
fp16-binary storage (where re-quantization makes true-norm handling matter)
with a one-ulp-of-rounding tolerance.
"""

import math

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mel_spark.operators.pairs import _fused_score_batch

W_COS, W_JAC = 0.6, 0.4


def _round6(x: float) -> float:
    return (math.floor(x * 1e6 + 0.5) if x >= 0 else math.ceil(x * 1e6 - 0.5)) / 1e6


def _oracle_row(ea, eb, xa, xb):
    """Expression-path semantics for one pair, scalar arithmetic."""
    na = math.sqrt(sum(v * v for v in ea))
    nb = math.sqrt(sum(v * v for v in eb))
    dn = (na * nb) or 1.0
    cos = _round6(sum(a * b for a, b in zip(ea, eb)) / dn)
    inter = len(set(xa) & set(xb))
    union = len(set(xa) | set(xb))
    jac = _round6(inter / max(union, 1))
    score = _round6((W_COS * cos + W_JAC * jac) / (W_COS + W_JAC))
    return cos, jac, score


_grid_val = st.integers(-64, 64).map(lambda k: k / 64.0)
_xs_set = st.sets(
    st.one_of(st.integers(0, 99), st.integers(2**31 - 50, 2**31 - 1)),
    min_size=0,
    max_size=12,
)


def _batch(rows, emb_format: str) -> pa.RecordBatch:
    """rows: list of (ea, eb, xa, xb) → the joined-schema RecordBatch the
    kernel sees (ids/block_key are passthrough)."""
    n = len(rows)
    if emb_format == "f16":
        emb_a = pa.array(
            [np.asarray(r[0], dtype="<f2").tobytes() for r in rows], pa.binary()
        )
        emb_b = pa.array(
            [np.asarray(r[1], dtype="<f2").tobytes() for r in rows], pa.binary()
        )
    else:
        emb_a = pa.array(
            [np.asarray(r[0], dtype=np.float32) for r in rows],
            pa.list_(pa.float32()),
        )
        emb_b = pa.array(
            [np.asarray(r[1], dtype=np.float32) for r in rows],
            pa.list_(pa.float32()),
        )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(list(range(n)), pa.int64()),
            pa.array(list(range(n, 2 * n)), pa.int64()),
            pa.array([0] * n, pa.int64()),
            emb_a,
            emb_b,
            pa.array([sorted(r[2]) for r in rows], pa.list_(pa.int64())),
            pa.array([sorted(r[3]) for r in rows], pa.list_(pa.int64())),
        ],
        names=[
            "mention_id_a", "mention_id_b", "block_key",
            "_emb_a", "_emb_b", "_xs_a", "_xs_b",
        ],
    )


@settings(max_examples=700, deadline=None)
@given(
    data=st.data(),
    dim=st.integers(2, 12),
    nrows=st.integers(1, 24),
    emb_format=st.sampled_from(["f32", "f16"]),
)
def test_fused_kernel_matches_expression_oracle_exactly(
    data, dim, nrows, emb_format
):
    rows = [
        (
            data.draw(st.lists(_grid_val, min_size=dim, max_size=dim)),
            data.draw(st.lists(_grid_val, min_size=dim, max_size=dim)),
            data.draw(_xs_set),
            data.draw(_xs_set),
        )
        for _ in range(nrows)
    ]
    out = _fused_score_batch(_batch(rows, emb_format), W_COS, W_JAC)
    cos = out.column("cos").to_pylist()
    jac = out.column("jaccard").to_pylist()
    score = out.column("score").to_pylist()
    for i, (ea, eb, xa, xb) in enumerate(rows):
        # grid values are exact in BOTH storages, so the oracle on the raw
        # values is the oracle on the stored values
        c, j, s = _oracle_row(ea, eb, xa, xb)
        assert cos[i] == c, (i, rows[i])
        assert jac[i] == j, (i, rows[i])
        assert score[i] == s, (i, rows[i])


@settings(max_examples=300, deadline=None)
@given(data=st.data(), dim=st.integers(2, 12), nrows=st.integers(1, 16))
def test_fused_kernel_f16_uses_true_norms_of_stored_values(data, dim, nrows):
    """Continuous random floats, fp16 storage: the oracle is computed on the
    RE-QUANTIZED values with their TRUE norms — the round-4 bug (raw dot
    assuming stored normalization survives quantization) fails this for any
    row whose norm drifted.  einsum-vs-dot ulp noise permits one rounding
    step of slack."""
    # magnitude bounded away from 0 WITHOUT a filter (hypothesis shrinks
    # floats toward 0, which starves a filtered strategy)
    fval = st.builds(
        lambda mag, neg: -mag if neg else mag,
        st.floats(2**-10, 1.0, allow_nan=False, width=32),
        st.booleans(),
    )
    rows = [
        (
            data.draw(st.lists(fval, min_size=dim, max_size=dim)),
            data.draw(st.lists(fval, min_size=dim, max_size=dim)),
            data.draw(_xs_set),
            data.draw(_xs_set),
        )
        for _ in range(nrows)
    ]
    out = _fused_score_batch(_batch(rows, "f16"), W_COS, W_JAC)
    cos = out.column("cos").to_pylist()
    score = out.column("score").to_pylist()
    for i, (ea, eb, xa, xb) in enumerate(rows):
        ea16 = np.asarray(ea, dtype=np.float16).astype(np.float64).tolist()
        eb16 = np.asarray(eb, dtype=np.float16).astype(np.float64).tolist()
        c, j, s = _oracle_row(ea16, eb16, xa, xb)
        assert cos[i] == pytest.approx(c, abs=1.01e-6)
        assert score[i] == pytest.approx(s, abs=1.01e-6)
        assert -1.0 <= cos[i] <= 1.0  # the true-norm guarantee itself


def test_fused_kernel_empty_batch_returns_none():
    assert _fused_score_batch(_batch([], "f32"), W_COS, W_JAC) is None
