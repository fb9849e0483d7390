"""Alias tables and per-group top-R — the reference's blocking/retrieval core.

A1 (string alias table, src/baselines/string_alias_tables/all_languages.py:93-115):
   groupBy(alias) → count per entity → keep top-R entities by count.
A2 (OLPEAT token-array table, src/baselines/olpeat/find_recall.py:76-91): same,
   keyed by the token array (we key by its md5 — J3's hash-join key analogue).
J2 (alias probe): equi-join query alias → candidate array; gold ∈ candidates.

Top-R-per-group = window row_number (W1) — Catalyst turns the partial/final
aggregation and the ranked window into two shuffles on the alias key; counts
are map-side combined, so hot aliases ("Paris") cost bandwidth ∝ distinct
entities, not ∝ links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_alias_table(
    links: DataFrame,
    alias_col: str,
    entity_col: str,
    top_r: int = 10,
    lowercase: bool = False,
) -> DataFrame:
    """(alias, entity, cnt, rank) with rank ≤ top_r by count desc (ties broken
    by entity id for determinism — the reference's Counter.most_common ties are
    insertion-ordered, i.e. unstable; we pin them)."""
    alias = F.lower(F.col(alias_col)) if lowercase else F.col(alias_col)
    counted = (
        links.select(alias.alias("alias"), F.col(entity_col).alias("entity"))
        .groupBy("alias", "entity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("alias").orderBy(F.desc("cnt"), F.asc("entity"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_r)
    )


def alias_candidates(alias_table: DataFrame) -> DataFrame:
    """Collapse the ranked table to (alias, candidates array ordered by rank)."""
    return alias_table.groupBy("alias").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col("entity")))
        ).alias("_rc")
    ).select(
        "alias",
        F.transform("_rc", lambda s: s.getField("entity")).alias("candidates"),
    )


def probe_alias_table(
    queries: DataFrame,
    candidates: DataFrame,
    query_alias_col: str,
    gold_col: str,
) -> DataFrame:
    """J2/J6: join queries to candidate arrays, flag gold membership. Missing
    aliases → empty candidate set (miss), matching the reference's
    defaultdict-miss behavior."""
    out = queries.join(
        candidates, queries[query_alias_col] == candidates["alias"], "left"
    )
    return out.withColumn(
        "hit",
        F.coalesce(F.array_contains("candidates", F.col(gold_col)), F.lit(False)),
    )
