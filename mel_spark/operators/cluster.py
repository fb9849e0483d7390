"""Transitive clustering: large-star / small-star connected components.

The reference resolves each mention to exactly one entity (argmax over
candidates, src/models/recall_calculator.py:100-110); our target generalizes
that to transitive entity clusters over the match graph (north_star). This is
the Kiveris et al. "Connected Components in MapReduce and Beyond" alternating
large-star/small-star algorithm expressed as DataFrame self-joins with
min-aggregation; every iteration localCheckpoints to break lineage
(SURVEY.md §7.3 hard-part #1).

Scale notes (100 TB / 10^12 edges):
 - each round is one groupBy shuffle on node id; AQE handles skewed hubs,
 - convergence is O(log n) rounds for large-star/small-star (vs O(diameter)
   for naive label propagation) — that is why we use it,
 - per-round edge-set fingerprint (count + sum of xxhash64) detects
   convergence without collecting edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(neighbors ∪ {u}); connect strictly-greater
    neighbors to m. Input/output: canonical undirected edge list (u, v)."""
    both = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbrs = both.groupBy("u").agg(
        F.collect_set("v").alias("nv"),
    )
    m = F.least(F.array_min("nv"), F.col("u"))
    out = (
        nbrs.select(F.col("u"), m.alias("m"), F.explode("nv").alias("v"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct edges high→low; for each u connect all smaller neighbors (and u)
    to the minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    nbrs = directed.groupBy("u").agg(F.collect_set("v").alias("nv"))
    m = F.array_min("nv")
    out = nbrs.select(
        F.col("u"),
        m.alias("m"),
        F.explode(F.array_union("nv", F.array("u"))).alias("v"),
    ).filter(F.col("v") != F.col("m")).select(F.col("v").alias("u"), F.col("m").alias("v"))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "mention_id_a",
    id_b: str = "mention_id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster the undirected match graph; returns (mention_id, cluster_id)
    where cluster_id = min member id (stable, deterministic).

    Nodes appearing only as singletons must be unioned by the caller
    (cluster_id = own id) — this operator only sees edges.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    prev_fp = None
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        fp = _fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp

    # after convergence every edge is (member → root); add roots themselves
    members = edges.select(F.col("u").alias("mention_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("mention_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).groupBy("mention_id").agg(F.min("cluster_id").alias("cluster_id"))


def attach_singletons(clusters: DataFrame, all_ids: DataFrame, id_col: str = "mention_id") -> DataFrame:
    """Left-join cluster assignment onto the full id set; unmatched ids become
    their own singleton clusters."""
    return (
        all_ids.select(F.col(id_col).alias("mention_id"))
        .distinct()
        .join(clusters, "mention_id", "left")
        .select(
            "mention_id",
            F.coalesce("cluster_id", F.col("mention_id")).alias("cluster_id"),
        )
    )
