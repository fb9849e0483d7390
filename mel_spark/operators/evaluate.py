"""Evaluation: pairwise precision/recall/F1 and recall@k.

Generalizes the reference's recall machinery (RecallCalculator,
src/models/recall_calculator.py:43-110 — per-query gold ∈ top-k, then mean)
to labeled-pair F1 at a shared blocking key (BASELINE.json acceptance:
pairwise F1 ≥ 0.99 vs reference clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairs_from_clusters(assignment: DataFrame, id_col: str, cluster_col: str) -> DataFrame:
    """All within-cluster unordered pairs (id_a < id_b) from an assignment
    table — the gold/predicted pair sets for pairwise F1. Clusters are small
    (entity groups), so the per-cluster self-join is cheap and shuffles once."""
    a = assignment.select(F.col(cluster_col).alias("_c"), F.col(id_col).alias("mention_id_a"))
    b = assignment.select(F.col(cluster_col).alias("_c"), F.col(id_col).alias("mention_id_b"))
    return (
        a.join(b, "_c")
        .filter(F.col("mention_id_a") < F.col("mention_id_b"))
        .select("mention_id_a", "mention_id_b")
        .distinct()
    )


def pairwise_prf(predicted_pairs: DataFrame, gold_pairs: DataFrame) -> dict[str, float]:
    """Precision / recall / F1 over unordered id pairs, computed with one
    full-outer join (no collects)."""
    p = predicted_pairs.select("mention_id_a", "mention_id_b").distinct().withColumn("_p", F.lit(1))
    g = gold_pairs.select("mention_id_a", "mention_id_b").distinct().withColumn("_g", F.lit(1))
    j = p.join(g, ["mention_id_a", "mention_id_b"], "full_outer")
    row = j.select(
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = int(row["tp"]), int(row["fp"]), int(row["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}


def recall_at_k(candidates: DataFrame, gold_col: str = "gold_id", cand_col: str = "candidates", k: int = 10) -> DataFrame:
    """Mean of gold ∈ first-k distinct candidates (RecallCalculator semantics:
    unique qids, mode='multiple' dedups before truncation,
    src/models/recall_calculator.py:71-98). Expects one row per query with a
    ranked array column."""
    hit = F.array_contains(
        F.slice(F.array_distinct(F.col(cand_col)), 1, k), F.col(gold_col)
    )
    return candidates.select(F.round(F.avg(hit.cast("double")), 6).alias(f"recall_at_{k}"))
