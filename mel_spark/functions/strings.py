"""Vectorized string-distance UDFs: Jaro-Winkler + normalized Levenshtein.

The reference matches strings exactly (alias table,
src/baselines/string_alias_tables/all_languages.py:125-130) but carries
rapidfuzz==3.9.4 in requirements.txt; the north_star fuses these distances into
the pair score. We gate on rapidfuzz and fall back to a pure-Python kernel —
still Arrow-batched (one Python call per ~10k-row batch, applied only to short
repo/path identifiers, never full file content; Levenshtein is O(len²)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

try:  # pragma: no cover - environment-dependent fast path
    from rapidfuzz.distance import JaroWinkler as _RFJW
    from rapidfuzz.distance import Levenshtein as _RFLev
    from rapidfuzz.process import cpdist as _rf_cpdist

    def _jw(a: str, b: str) -> float:
        return _RFJW.similarity(a, b)

    def _lev_norm(a: str, b: str) -> float:
        return _RFLev.normalized_similarity(a, b)

    # element-wise batch kernels: one C call per Arrow batch (no per-row
    # Python), rapidfuzz's cpdist is the pairwise (not cross-product) API
    def _jw_batch(fa: pd.Series, fb: pd.Series) -> pd.Series:
        return pd.Series(
            _rf_cpdist(fa.tolist(), fb.tolist(), scorer=_RFJW.similarity),
            dtype="float64",
        )

    def _lev_batch(fa: pd.Series, fb: pd.Series) -> pd.Series:
        return pd.Series(
            _rf_cpdist(fa.tolist(), fb.tolist(), scorer=_RFLev.normalized_similarity),
            dtype="float64",
        )

except ImportError:

    def _jw(a: str, b: str) -> float:
        if a == b:
            return 1.0
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        match_dist = max(la, lb) // 2 - 1
        a_match = [False] * la
        b_match = [False] * lb
        matches = 0
        for i, ca in enumerate(a):
            lo, hi = max(0, i - match_dist), min(lb, i + match_dist + 1)
            for j in range(lo, hi):
                if not b_match[j] and b[j] == ca:
                    a_match[i] = b_match[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(la):
            if a_match[i]:
                while not b_match[k]:
                    k += 1
                if a[i] != b[k]:
                    t += 1
                k += 1
        t //= 2
        jaro = (matches / la + matches / lb + (matches - t) / matches) / 3.0
        # Winkler boost: common prefix up to 4 chars, p = 0.1
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1.0 - jaro)

    def _lev_norm(a: str, b: str) -> float:
        if a == b:
            return 1.0
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        if la > lb:
            a, b, la, lb = b, a, lb, la
        prev = list(range(la + 1))
        for j in range(1, lb + 1):
            cur = [j] + [0] * la
            cb = b[j - 1]
            for i in range(1, la + 1):
                cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (a[i - 1] != cb))
            prev = cur
        return 1.0 - prev[la] / lb

    # pure-Python fallback batches (still one Python frame per ~10k-row Arrow
    # batch; only ever applied to short identifiers, never file content)
    def _jw_batch(fa: pd.Series, fb: pd.Series) -> pd.Series:
        return pd.Series([_jw(x, y) for x, y in zip(fa, fb)], dtype="float64")

    def _lev_batch(fa: pd.Series, fb: pd.Series) -> pd.Series:
        return pd.Series([_lev_norm(x, y) for x, y in zip(fa, fb)], dtype="float64")


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for sa, sb in a:
        yield _jw_batch(sa.fillna(""), sb.fillna(""))


@F.pandas_udf(DoubleType())
def levenshtein_norm_udf(a: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for sa, sb in a:
        yield _lev_batch(sa.fillna(""), sb.fillna(""))
