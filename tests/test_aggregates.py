"""Aggregate operators A3/A4/A5 + the J7 hard-negative join."""

import math

from pyspark.sql import functions as F

from mel_spark.operators.aggregates import (
    composite_argmax,
    embedding_centroid,
    normalized_distribution,
)
from mel_spark.operators.pairs import hard_negative_pairs


def test_centroid_is_l2_normalized_sum(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [3.0, 4.0])],
        ["label", "embedding"],
    )
    got = {r["label"]: (r["n"], r["centroid"]) for r in embedding_centroid(df, "label").collect()}
    # label 1: sum = (1,1) → normalized (0.707107, 0.707107)
    assert got[1][0] == 2
    assert got[1][1] == [0.707107, 0.707107]
    # label 2: single vector normalized to (0.6, 0.8)
    assert got[2] == (1, [0.6, 0.8])


def test_centroid_zero_vector_guard(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], ["label", "embedding"])
    row = embedding_centroid(df, "label").collect()[0]
    assert row["centroid"] == [0.0, 0.0]  # no NaN / div-by-zero


def test_normalized_distribution_sums_to_one(spark):
    df = spark.createDataFrame([(x,) for x in "aabbbc"], ["k"])
    rows = normalized_distribution(df, "k").collect()
    freqs = {r["k"]: r["freq"] for r in rows}
    assert freqs == {"a": round(2 / 6, 6), "b": 0.5, "c": round(1 / 6, 6)}
    assert math.isclose(sum(freqs.values()), 1.0, abs_tol=1e-5)


def test_composite_argmax_tiebreaks_on_global_size(spark):
    # key k: lang x and y tie on pair count (2 each); y is globally larger
    # (appears under other keys too) → y must win rank 1, then x, then lex
    rows = [("k", "x")] * 2 + [("k", "y")] * 2 + [("other", "y")] * 5 + [("k", "z")]
    df = spark.createDataFrame(rows, ["key", "val"])
    got = composite_argmax(df, "key", "val", k=3).filter(F.col("key") == "k").collect()
    order = [(r["val"], r["rank"]) for r in sorted(got, key=lambda r: r["rank"])]
    assert order == [("y", 1), ("x", 2), ("z", 3)]


def test_hard_negatives_picks_best_gold_and_nongold(spark):
    topk = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 10, 1), (2, 11, 2)],
        ["query_id", "neighbor_id", "rank"],
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "B"), (10, "B"), (11, "A"), (12, "B")], ["vec_id", "label"]
    )
    got = {r["query_id"]: r for r in hard_negative_pairs(topk, labels).collect()}
    # query 1 (label A): gold = 11 (rank 2), neg = 10 (rank 1)
    assert (got[1]["gold_id"], got[1]["gold_rank"], got[1]["neg_id"], got[1]["neg_rank"]) == (11, 2, 10, 1)
    # query 2 (label B): gold = 10 (rank 1), neg = 11 (rank 2)
    assert (got[2]["gold_id"], got[2]["neg_id"]) == (10, 11)


def test_hard_negatives_drops_queries_without_both(spark):
    topk = spark.createDataFrame([(1, 10, 1)], ["query_id", "neighbor_id", "rank"])
    labels = spark.createDataFrame([(1, "A"), (10, "A")], ["vec_id", "label"])
    assert hard_negative_pairs(topk, labels).count() == 0
