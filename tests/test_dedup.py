"""Dedup operator family over a hand-built corpus with known duplicates."""

import pytest
from pyspark.sql import functions as F

from mel_spark.operators import dedup

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),          # exact dup of 1
    (3, "alpha beta gamma delta epsilon zeta eta iota"),           # near dup of 1
    (4, "one two three four five six seven eight nine ten"),
    (5, "one two three four five six seven eight nine eleven"),    # near dup of 4
    (6, "completely different words nothing shared here at all"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs, "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]


def test_dedup_keep_first(docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_keep_first(docs, "doc_id").collect())
    assert kept == [1, 3, 4, 5, 6]


def test_ngram_jaccard_exact_pairs(docs):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5, exact=True).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (4, 5) in pairs
    assert not any(6 in p for p in pairs)


def test_lsh_pairs_find_all_high_jaccard(docs):
    """With 16 bands × 2 rows the planted near-dups must all surface."""
    lsh = dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5, num_hashes=32, bands=16)
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in lsh.collect()}
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= got


def test_simhash_groups_exact_dups_collide(docs):
    groups = dedup.simhash_groups(docs, "doc_id", bits=30).collect()
    assert any(set(g["doc_ids"]) >= {1, 2} for g in groups)


def test_embedding_near_dup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 60)
    exact = dedup.embedding_near_dup_pairs(emb, "vec_id", threshold=0.9, exact=True)
    rows = exact.collect()
    for r in rows:
        assert r["cos"] >= 0.9 and r["doc_id_a"] < r["doc_id_b"]


def test_segment_dedup_line_mode_drops_shared_boilerplate(spark):
    """Docs sharing a license-header line lose exactly that line; unique
    lines survive and clean_sha reflects the newline-joined remainder."""
    import hashlib

    header = "licensed under apache two point zero"
    rows = [
        (1, header + "\nalpha body one\nbeta body one"),
        (2, header + "\ngamma body two"),
        (3, "delta solo doc\nepsilon second line"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(
            docs, "doc_id", "text", dup_k=2, line_mode=True
        ).collect()
    }
    assert out[1]["n_segments"] == 3 and out[1]["n_dup_segments"] == 1
    assert out[2]["n_segments"] == 2 and out[2]["n_dup_segments"] == 1
    assert out[3]["n_dup_segments"] == 0
    want1 = hashlib.md5("alpha body one\nbeta body one".encode()).hexdigest()
    want3 = hashlib.md5("delta solo doc\nepsilon second line".encode()).hexdigest()
    assert out[1]["clean_sha"] == want1
    assert out[3]["clean_sha"] == want3


def test_segment_dedup_token_mode_counts_within_doc_repeats(spark):
    """A segment repeated inside ONE doc counts toward dup_k (corpus-wide
    occurrence count, not distinct-doc count)."""
    seg = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, seg + " " + seg), (2, "i j k l m n o p")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, "doc_id", "text", 8, dup_k=2).collect()
    }
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 2
    assert out[2]["n_dup_segments"] == 0


def test_survivor_selection(spark, docs):
    # cluster {1,2,3} (1's text ties with 2 at same length; 3 has same token
    # count but different last word) + singleton cluster {6}
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (6, 60)], ["doc_id", "cluster_id"]
    )
    surv = {
        r["cluster_id"]: (r["survivor_doc_id"], r["group_size"], r["n_dropped"])
        for r in dedup.survivor_selection(clusters, docs, "doc_id").collect()
    }
    # docs 1/2/3 all have equal char length -> tie broken by min doc_id
    assert surv[10] == (1, 3, 2)
    assert surv[60] == (6, 1, 0)


def test_survivor_selection_prefers_longest(spark):
    docs2 = spark.createDataFrame(
        [(1, "short"), (2, "a much longer text body"), (3, "mid length")],
        ["doc_id", "text"],
    )
    clusters = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], ["doc_id", "cluster_id"])
    row = dedup.survivor_selection(clusters, docs2, "doc_id").collect()[0]
    assert row["survivor_doc_id"] == 2 and row["n_dropped"] == 2


def test_select_survivors(spark, docs):
    # docs 4,5 unclustered -> always kept; cluster {1,2,3} keeps min-id 1
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (6, 60)], ["doc_id", "cluster_id"]
    )
    kept = sorted(
        r["doc_id"] for r in dedup.select_survivors(clusters, docs, "doc_id").collect()
    )
    assert kept == [1, 4, 5, 6]


def test_survivor_selection_null_text_ranks_last(spark):
    """ADVICE r4: a NULL-text doc must LOSE the survivor pick to any
    non-null member (even empty text) — matching the windowed
    desc(length) nulls-last semantics the min_by aggregation replaced."""
    from mel_spark.operators.dedup import survivor_selection

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "xx")],
        schema="doc_id long, text string",
    )
    cl = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], ["doc_id", "cluster_id"]
    )
    rows = {r["cluster_id"]: r for r in survivor_selection(cl, docs).collect()}
    assert rows[100]["survivor_doc_id"] == 2  # empty beats NULL
    assert rows[200]["survivor_doc_id"] == 3


def test_segment_dedup_matches_python_reference(spark):
    """r6 internals change (duplicate-positions join instead of regrouping
    every segment string): output must equal a brute-force Python reference
    on a corpus with cross-doc dups, within-doc dups, and a short doc."""
    import hashlib

    texts = {
        1: "a b c d e f g h i j k l m n o p",          # segs: [a..h], [i..p]
        2: "a b c d e f g h q r s t u v w x",          # shares seg1 with doc 1
        3: "a b c d e f g h a b c d e f g h",          # within-doc repeat
        4: "z y x w",                                   # single short segment
        5: "q r s t u v w x",                           # dup of doc 2's seg2
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, "doc_id", "text", seg_tokens=8, dup_k=2).collect()
    }

    def segs_of(t):
        toks = t.split(" ")
        return [" ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)]

    from collections import Counter

    cnt = Counter(s for t in texts.values() for s in segs_of(t))
    for did, t in texts.items():
        ss = segs_of(t)
        kept = [s for s in ss if cnt[s] < 2]
        assert out[did]["n_segments"] == len(ss)
        assert out[did]["n_dup_segments"] == sum(1 for s in ss if cnt[s] >= 2)
        assert out[did]["clean_sha"] == hashlib.md5(" ".join(kept).encode()).hexdigest()
