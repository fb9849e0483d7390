"""Vector / distribution aggregates (SURVEY §2.4 rows A3, A4, A5).

embedding_centroid      — groupBy(key) → element-wise sum → L2-normalize: the
                          multi-language entity prototype vector
                          (src/multilingual_dataset/combine_embs.py:9-43).
normalized_distribution — count(key) ÷ window total: the sampling distribution
                          (src/utils/calculate_qids_distribution.py:7-21).
composite_argmax        — per-key top-k values by (count desc, global value
                          size desc, value asc): the qid↔lang language
                          selection (src/multilingual_dataset/creator.py:147-206).

Scale notes: embedding_centroid shuffles (key, pos) scalar rows — rows×dim
8-byte tuples, partial-aggregated map-side, never whole-vector arrays per
group; the per-element sums run in fixed-scale DECIMAL so the result is
addition-order-independent (cross-engine and cross-partitioning
deterministic). The other two are plain count aggregates + window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def embedding_centroid(
    df: DataFrame,
    key_col: str,
    emb_col: str = "embedding",
    out_col: str = "centroid",
    decimals: int = 6,
) -> DataFrame:
    """(key, n, centroid): centroid = L2-normalized element-wise sum of the
    group's vectors, rounded to ``decimals``.

    Element sums go through round(val, 7)::DECIMAL so they are exact and
    independent of addition order (Spark partial-agg order is not
    deterministic for doubles); the final normalize folds the (pos-ordered)
    sum vector left-to-right, matching the DuckDB oracle twin.
    """
    ex = df.select(
        F.col(key_col).alias("key"), F.posexplode(F.col(emb_col)).alias("pos", "val")
    )
    sums = ex.groupBy("key", "pos").agg(
        F.sum(F.round(F.col("val").cast("double"), 7).cast("decimal(24,7)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    vecs = (
        sums.groupBy("key")
        .agg(
            F.max("n").alias("n"),
            F.array_sort(F.collect_list(F.struct("pos", F.col("s").cast("double").alias("sd")))).alias("ps"),
        )
        .select(
            "key",
            "n",
            F.transform("ps", lambda p: p.getField("sd")).alias("vsum"),
        )
    )
    norm = F.sqrt(
        F.aggregate(F.col("vsum"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return vecs.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.transform(
            "vsum", lambda x: F.round(x / F.greatest(norm, F.lit(1e-300)), decimals)
        ).alias(out_col),
    )


def normalized_distribution(
    df: DataFrame, key_col: str, decimals: int = 6
) -> DataFrame:
    """(key, cnt, freq): per-key count and count ÷ grand total, aligned to key
    order downstream via orderBy(key) at the consumer (the reference aligns
    the distribution to index order the same way)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return counts.select(
        F.col("key").alias(key_col),
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.sum("cnt").over(total), decimals).alias("freq"),
    )


def composite_argmax(
    df: DataFrame,
    key_col: str,
    val_col: str,
    k: int = 1,
) -> DataFrame:
    """Per key, the top-``k`` values ranked by (pair count desc, GLOBAL value
    count desc, value asc) — the composite sort key of the reference's
    per-entity language selection: prefer the most-frequent pairing, break
    ties toward the globally larger language, then lexicographic."""
    pair_counts = df.groupBy(F.col(key_col).alias("key"), F.col(val_col).alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    val_sizes = df.groupBy(F.col(val_col).alias("val")).agg(
        F.count(F.lit(1)).alias("val_size")
    )
    w = Window.partitionBy("key").orderBy(
        F.desc("cnt"), F.desc("val_size"), F.asc("val")
    )
    return (
        pair_counts.join(F.broadcast(val_sizes), "val")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("key").alias(key_col),
            F.col("val").alias(val_col),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("val_size").cast("long").alias("val_size"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
