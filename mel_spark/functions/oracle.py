"""DuckDB-SQL twins of mel_spark.functions.text — oracle snippet builders.

Each function returns a SQL *expression string* over a given input expression,
computing byte-identically to the Spark Column builder of the same name
(equality-tested in tests/test_oracle_parity.py). Used by __spark_entry__.
oracle_sql() to assemble the driver's DuckDB correctness queries.

DuckDB notes: list slicing is 1-indexed inclusive (toks[i:i+n-1] = n items),
``range(1, m+1)`` is a list, md5() yields the same lowercase hex as Spark.
"""

from __future__ import annotations


def tokens(text: str) -> str:
    return f"string_split({text}, ' ')"


def num_tokens(text: str) -> str:
    return f"len({tokens(text)})"


def bpe_ish_tokens(text: str) -> str:
    from mel_spark.functions.text import BPE_ISH_PATTERN

    return f"regexp_extract_all({text}, '{BPE_ISH_PATTERN}')"


def shingles(text: str, n: int = 3) -> str:
    toks = tokens(text)
    m = f"greatest(len({toks}) - {n - 1}, 1)"
    return (
        f"list_distinct(list_transform(range(1, {m} + 1), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')))"
    )


def shingle_int_hashes(shingle_expr: str) -> str:
    from mel_spark.functions.text import MINHASH_M

    return (
        f"list_transform({shingle_expr}, "
        f"s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MINHASH_M})"
    )


def minhash_signature(shingle_expr: str, num_hashes: int = 16, seed: int = 42) -> str:
    """Inline form — re-evaluates the md5 pass per permutation. Only for tiny
    parity tests; real oracles stage the int hashes once via
    minhash_signature_from_ints (see __spark_entry__ CTEs)."""
    return minhash_signature_from_ints(shingle_int_hashes(shingle_expr), num_hashes, seed)


def minhash_signature_from_ints(xs_expr: str, num_hashes: int = 16, seed: int = 42) -> str:
    """Permutation minima over a (preferably CTE-staged) int-hash list expr."""
    from mel_spark.functions.text import MINHASH_P, _minhash_params

    parts = ", ".join(
        f"list_min(list_transform({xs_expr}, x -> ({a} * x + {b}) % {MINHASH_P}))"
        for a, b in _minhash_params(num_hashes, seed)
    )
    return f"[{parts}]"


def minhash_band_keys(sig_expr: str, bands: int, rows: int) -> str:
    strs = f"list_transform({sig_expr}, v -> v::VARCHAR)"
    keys = ", ".join(
        f"'b{i}:' || md5(array_to_string(({strs})[{i * rows + 1}:{i * rows + rows}], '|'))"
        for i in range(bands)
    )
    return f"[{keys}]"


def simhash64(shingle_expr: str, bits: int = 32) -> str:
    h = f"list_transform({shingle_expr}, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)"
    n = f"len({shingle_expr})"
    terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform({h}, v -> (v >> {b}) & 1)) >= {n} "
        f"THEN {2 ** b}::BIGINT ELSE 0 END)"
        for b in range(bits)
    )
    return f"({terms})"


def doc_fingerprint(text: str, n: int = 8) -> str:
    return f"list_min(list_transform({shingles(text, n)}, s -> md5(s)))"


def content_sha(text: str) -> str:
    return f"sha256({text})"


def stopword_ratio(text: str, stopwords: list[str]) -> str:
    toks = tokens(text)
    in_list = ", ".join(f"'{w}'" for w in stopwords)
    return (
        f"(len(list_filter({toks}, t -> t IN ({in_list}))) * 1.0 "
        f"/ greatest(len({toks}), 1))"
    )


def quality_score(text: str) -> str:
    from mel_spark.functions.text import LANG_MARKERS

    n_chars = f"length({text})"
    len_score = f"least({n_chars} / 400.0, 1.0)"
    punct = f"length(regexp_replace({text}, '[^.,;:!?]', '', 'g'))"
    punct_score = f"(1.0 - least({punct} * 1.0 / greatest({n_chars}, 1) * 10.0, 1.0))"
    stop = stopword_ratio(text, LANG_MARKERS["en"])
    return f"round(({len_score} + {punct_score} + {stop}) / 3.0, 6)"


def langid_score(text: str, stopwords: list[str]) -> str:
    toks = tokens(text)
    in_list = ", ".join(f"'{w}'" for w in stopwords)
    return f"len(list_filter({toks}, t -> t IN ({in_list})))"


def token_ids(text: str, vocab: int = 1 << 20) -> str:
    return (
        f"list_transform({tokens(text)}, "
        f"t -> (('0x' || substr(md5(t), 1, 15))::BIGINT % {vocab} + 1)::INT)"
    )


def _zeros(width: int) -> str:
    return "[" + ", ".join(["0"] * width) + "]"


def pad_tokens(ids: str, width: int = 64) -> str:
    """Truncate-and-right-pad-with-0 via zero-list concat + constant slice.
    (DuckDB 1.0's list_resize throws std::bad_array_new_length on larger
    batches, so the twin avoids it.)"""
    return f"(({ids}) || {_zeros(width)})[1:{width}]"


def mention_window(ids: str, ms: str, me: str, width: int = 64, reserve: int = 2) -> str:
    """Twin of text.mention_window: same branch choice, slice, and padding.
    ``ids``/``ms``/``me`` should be column references (CTE-staged), not
    inline expressions — each is referenced several times."""
    usable = width - reserve
    n = f"len({ids})"
    mlen = f"({me} - {ms})"
    remains = f"({usable} - {mlen})"
    left_start = f"({ms} - ({remains} // 2))"
    right_end = f"({me} + ({remains} - {remains} // 2))"
    too_large = f"({mlen} > {usable - 2})"
    mid_ok = f"({left_start} >= 0 AND {right_end} <= {n})"
    start = (
        f"(CASE WHEN {too_large} THEN {ms} "
        f"WHEN {mid_ok} THEN {left_start} "
        f"WHEN {left_start} < 0 THEN 0 "
        f"ELSE greatest({n} - {usable}, 0) END)"
    )
    length = f"(CASE WHEN {too_large} THEN {usable - 2} ELSE {usable} END)"
    return (
        f"((({ids})[({start} + 1):({start} + {length})]) || {_zeros(width)})[1:{width}]"
    )


def hyperplane_band_keys(
    emb: str, dim: int, n_planes: int = 16, bands: int = 4, seed: int = 42
) -> str:
    """DuckDB twin of blocking.hyperplane_blocks' band keys. The seeded plane
    weights are Python-generated floats inlined as literals into BOTH engines'
    plans; the dot product is written as the same left-associated double chain
    Spark's F.aggregate fold produces, so the sign bits are bit-identical."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype("float64")
    assert n_planes % bands == 0
    rows = n_planes // bands

    def _bit(p: int) -> str:
        terms = " + ".join(
            f"{emb}[{d + 1}]::DOUBLE * {float(planes[p][d])!r}" for d in range(dim)
        )
        return f"(CASE WHEN (0.0 + {terms}) >= 0 THEN '1' ELSE '0' END)"

    keys = ", ".join(
        f"'hp{i}:' || " + " || ".join(_bit(i * rows + j) for j in range(rows))
        for i in range(bands)
    )
    return f"[{keys}]"


def cosine(a: str, b: str) -> str:
    """Exact cosine over two list<float> expressions, computed in double with a
    left-fold matching Spark's F.aggregate ordering; round(…, 6) on both sides
    keeps the driver's value-hash stable across engines."""
    dot = f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"round({dot} / ({na} * {nb}), 6)"


def int8_codes(emb: str) -> str:
    """Twin of similarity.int8_codes: symmetric per-vector int8 quantization
    (s = max|v|/127, code = HALF_UP round(v/s)) — both engines round half away
    from zero, and the division inputs are identical doubles."""
    mx = f"list_max(list_transform({emb}, x -> abs(x::DOUBLE)))"
    s = f"greatest({mx} / 127.0, 1e-300)"
    return f"list_transform({emb}, x -> round(x::DOUBLE / {s}, 0)::INT)"


def doc_segments(text: str, seg_tokens: int = 8) -> str:
    toks = tokens(text)
    n_segs = f"greatest(cast(ceil(len({toks}) / {float(seg_tokens)}) AS INT), 1)"
    return (
        f"list_transform(range(0, {n_segs}), "
        f"i -> array_to_string(({toks})[(i*{seg_tokens}+1):(i*{seg_tokens}+{seg_tokens})], ' '))"
    )


def mean_word_len(text: str) -> str:
    toks = tokens(text)
    return (
        f"round(list_sum(list_transform({toks}, w -> length(w))) * 1.0 "
        f"/ greatest(len({toks}), 1), 6)"
    )


def distinct_token_ratio(text: str) -> str:
    toks = tokens(text)
    return f"round(len(list_distinct({toks})) * 1.0 / greatest(len({toks}), 1), 6)"
