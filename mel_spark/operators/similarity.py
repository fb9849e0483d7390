"""Similarity search (kNN retrieval) — the reference's J4 theta-join.

Three regimes, mirroring the reference's searcher hierarchy
(src/models/searchers/searcher.py:11-27):

 brute_force_topk       — DataFrame cross-join + ranked window; exact, fully
                          SQL-expressible (the correctness oracle path);
                          the numpy analogue is
                          src/models/searchers/simplified_brute_force_searcher.py:14-17
 broadcast_knn          — broadcast the index matrix into mapInPandas; per
                          Arrow batch one NumPy matmul + argpartition — the
                          Spark form of BruteForceSearcher's torch matmul+topk
                          (src/models/searchers/brute_force_searcher.py:29-36);
                          exact, for indexes that fit in executor memory
 lsh_topk               — hyperplane-LSH bucketed candidate join + exact
                          re-score + ranked window; the ScaNN analogue
                          (leaves=buckets, re-order=exact re-score;
                          src/models/searchers/scann_searcher.py:21-49)
 ivf_topk               — inverted-file ANN: seeded Lloyd k-means coarse
                          quantizer (the direct analogue of ScaNN's
                          tree partitioning, leaves ≈ 5√N per
                          src/data_processors/index/index.py:122-146), index
                          vectors assigned to their nearest centroid cell,
                          queries probe the nprobe nearest cells, exact
                          re-score inside. Iterative (k-means) ⇒ not
                          SQL-expressible; verified by recall tests instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from mel_spark.functions import vectors as V


def brute_force_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_emb: str = "embedding",
    i_id: str = "vec_id",
    i_emb: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cos, rank). Ties broken
    by neighbor id (deterministic). ``exclude_self`` drops id-equal matches
    (turn it OFF when query and index id spaces differ, e.g. retrieving
    against an entity-centroid index)."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_emb).alias("q_emb"))
    i = index.select(F.col(i_id).alias("neighbor_id"), F.col(i_emb).alias("i_emb"))
    scored = q.crossJoin(i)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.withColumn("cos", V.cosine(F.col("q_emb"), F.col("i_emb")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def broadcast_knn(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_emb: str = "embedding",
    i_id: str = "vec_id",
    i_emb: str = "embedding",
    exclude_self: bool = True,
    max_index_rows: int = 2_000_000,
) -> DataFrame:
    """Broadcast-index kNN: one NumPy matmul + argpartition per Arrow batch.

    ``index`` is a DataFrame (i_id, i_emb). Its size is guarded by an explicit
    count (≤ ``max_index_rows``) BEFORE anything is pulled to the driver; the
    guarded index is then gathered via Spark collect, L2-normalized, and
    broadcast — never an unguarded full-table toPandas. Indexes beyond the
    guard belong to lsh_topk (the ScaNN-analogue regime). Emits (query_id,
    neighbor_ids array<long> ranked). This mirrors the reference's
    fits-in-memory judgement for BruteForceSearcher vs ScaNN
    (src/data_processors/index/index.py:16-62).
    """
    spark = queries.sparkSession
    sc = spark.sparkContext
    n = index.count()
    if n > max_index_rows:
        raise ValueError(
            f"broadcast_knn: index has {n} rows > max_index_rows={max_index_rows}; "
            "use lsh_topk for indexes that do not fit in executor memory"
        )
    rows = index.select(F.col(i_id).alias("_id"), F.col(i_emb).alias("_emb")).collect()
    ids_arr = np.fromiter((r["_id"] for r in rows), dtype=np.int64, count=len(rows))
    embs_arr = np.array([r["_emb"] for r in rows], dtype=np.float32)
    norms = np.linalg.norm(embs_arr, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    b_ids = sc.broadcast(ids_arr)
    b_embs = sc.broadcast(np.ascontiguousarray(embs_arr / norms, dtype=np.float32))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_ids", ArrayType(LongType())),
        ]
    )

    def _search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids = b_ids.value
        # rank in float64 rounded to 6dp so the ordering matches the exact
        # column-expression scorer (ties then break by neighbor id)
        embs = b_embs.value.astype(np.float64)
        for pdf in batches:
            q = np.stack(pdf[q_emb].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            raw = (q / qn) @ embs.T
            # HALF_UP rounding (away from zero) — identical to Spark F.round /
            # DuckDB round, unlike np.round's banker's half-to-even: a cosine
            # landing exactly on a 5e-7 boundary must rank the same everywhere
            sims = np.where(
                raw >= 0, np.floor(raw * 1e6 + 0.5), np.ceil(raw * 1e6 - 0.5)
            ) / 1e6
            qids = pdf[q_id].to_numpy()
            if exclude_self:
                # mask identical ids (index id == query id)
                for r, qi in enumerate(qids):
                    sims[r, ids == qi] = -np.inf
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for r in range(sims.shape[0]):
                cand = part[r]
                # exact order within the top-k slice; ties by neighbor id
                order = np.lexsort((ids[cand], -sims[r, cand]))
                rows.append(ids[cand[order]].tolist())
            yield pd.DataFrame({"query_id": qids, "neighbor_ids": rows})

    return queries.select(q_id, q_emb).mapInPandas(_search, schema)


def train_ivf_centroids(
    index: DataFrame,
    n_cells: int,
    i_id: str = "vec_id",
    i_emb: str = "embedding",
    iterations: int = 3,
    seed: int = 42,
) -> np.ndarray:
    """Seeded Lloyd k-means over the index vectors → (n_cells, d) float32,
    rows L2-normalized (cells partition by cosine, matching the scorer).

    Deterministic: initial centroids are the vectors with the ``n_cells``
    smallest xxhash64(id, seed) values (a seeded sample independent of
    partitioning); each Lloyd round is one broadcast-assign + groupBy-mean —
    executor-parallel, O(N·cells·d) per round, no driver-side data beyond the
    (cells × d) matrix itself. ``n_cells ≈ 5√N`` is the reference's ScaNN
    leaf heuristic."""
    sdf = index.select(F.col(i_id).alias("_id"), F.col(i_emb).alias("_emb"))
    init = (
        sdf.orderBy(F.xxhash64(F.col("_id"), F.lit(seed)), F.col("_id"))
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r["_emb"] for r in init], dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cents /= norms
    spark = index.sparkSession
    for _ in range(iterations):
        assigned = _assign_cells(sdf, cents, spark).groupBy("_cell").agg(
            *[F.sum(F.element_at(F.col("_emb"), d + 1).cast("double")).alias(f"s{d}")
              for d in range(cents.shape[1])],
        )
        rows = assigned.collect()
        new = cents.copy()
        for r in rows:
            v = np.array([r[f"s{d}"] for d in range(cents.shape[1])], dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 0:
                new[r["_cell"]] = v / n
        cents = new
    return cents.astype(np.float32)


def _assign_cells(sdf: DataFrame, cents: np.ndarray, spark) -> DataFrame:
    """(_id, _emb, _cell): nearest centroid by dot product, via one NumPy
    matmul per Arrow batch against the broadcast centroid matrix."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    b = spark.sparkContext.broadcast(cents)
    schema = StructType(
        sdf.schema.fields + [StructField("_cell", IntegerType())]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["_emb"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            sims = (q / qn) @ C.T.astype(np.float64)
            # deterministic tie-break: lowest cell id wins (argmax is first-max)
            yield pdf.assign(_cell=np.argmax(sims, axis=1).astype(np.int32))

    return sdf.mapInPandas(_assign, schema)


def ivf_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    q_id: str = "vec_id",
    q_emb: str = "embedding",
    i_id: str = "vec_id",
    i_emb: str = "embedding",
    iterations: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means cells → queries probe their
    ``nprobe`` nearest cells → candidate equi-join on cell id → exact cosine
    re-score → ranked window. Output matches brute force on every candidate
    it surfaces (same cos/rank semantics); recall < 1 by construction.

    Scale shape: the only broadcast is the (n_cells × d) centroid matrix;
    candidates come from a cell-id equi-join, never all-pairs."""
    cents = train_ivf_centroids(index, n_cells, i_id, i_emb, iterations, seed)
    spark = index.sparkSession
    i_cells = _assign_cells(
        index.select(F.col(i_id).alias("_id"), F.col(i_emb).alias("_emb")), cents, spark
    ).select(F.col("_id").alias("neighbor_id"), F.col("_cell").alias("cell"))

    # queries probe nprobe cells: emit (query_id, cell) per probed cell
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    b = spark.sparkContext.broadcast(cents)
    probe_schema = StructType(
        [
            queries.select(F.col(q_id).alias("query_id")).schema.fields[0],
            StructField("cells", ArrayType(IntegerType())),
        ]
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b.value.astype(np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["_emb"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            sims = (q / qn) @ C.T
            npb = min(nprobe, C.shape[0])
            part = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "cells": [np.sort(row).astype(np.int32) for row in part],
                }
            )

    q_cells = (
        queries.select(F.col(q_id).alias("query_id"), F.col(q_emb).alias("_emb"))
        .mapInPandas(_probe, probe_schema)
        .select("query_id", F.explode("cells").alias("cell"))
    )
    cand = (
        q_cells.join(i_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(F.col(q_id).alias("query_id"), F.col(q_emb).alias("q_emb")),
            "query_id",
        )
        .join(
            index.select(F.col(i_id).alias("neighbor_id"), F.col(i_emb).alias("i_emb")),
            "neighbor_id",
        )
        .withColumn("cos", V.cosine(F.col("q_emb"), F.col("i_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_emb: str = "embedding",
    i_id: str = "vec_id",
    i_emb: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-band equi-join → exact re-score → window.
    Recall < 1 by construction; rank/cos columns match brute force on the
    candidates it does find."""
    from mel_spark.operators.blocking import hyperplane_blocks

    qb = hyperplane_blocks(
        queries.select(F.col(q_id).alias("_qid"), F.col(q_emb).alias("q_emb")),
        "_qid", "q_emb", dim=dim, n_planes=n_planes, bands=bands, seed=seed,
    ).withColumnRenamed("mention_id", "query_id")
    ib = hyperplane_blocks(
        index.select(F.col(i_id).alias("_iid"), F.col(i_emb).alias("i_emb")),
        "_iid", "i_emb", dim=dim, n_planes=n_planes, bands=bands, seed=seed,
    ).withColumnRenamed("mention_id", "neighbor_id")
    cand = (
        qb.join(ib, "block_key")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(F.col(q_id).alias("query_id"), F.col(q_emb).alias("q_emb")),
            "query_id",
        )
        .join(
            index.select(F.col(i_id).alias("neighbor_id"), F.col(i_emb).alias("i_emb")),
            "neighbor_id",
        )
        .withColumn("cos", V.cosine(F.col("q_emb"), F.col("i_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
