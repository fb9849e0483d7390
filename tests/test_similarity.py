"""Similarity-search operators: searcher equivalence (the reference's test,
tests/finetunings/evaluation/test_find_recall.py:25-66 — brute force vs ANN on
random matrices) re-expressed for our three regimes."""

import pytest
from pyspark.sql import functions as F

from mel_spark.operators.similarity import broadcast_knn, brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def emb_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_broadcast_knn_matches_brute_force(spark, emb_df):
    """The mapInPandas broadcast searcher must return exactly the DataFrame
    brute-force ranking (same ids, same order)."""
    queries = emb_df.filter(F.col("vec_id") < 20)
    bf = brute_force_topk(queries, emb_df, k=5)
    bf_map = {
        r["query_id"]: r["neighbor_ids"]
        for r in bf.groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "neighbor_id"))).alias("rc"))
        .select("query_id", F.transform("rc", lambda s: s.getField("neighbor_id")).alias("neighbor_ids"))
        .collect()
    }
    bc = {r["query_id"]: r["neighbor_ids"] for r in broadcast_knn(queries, emb_df, k=5).collect()}
    assert bf_map.keys() == bc.keys()
    mismatches = {q: (bf_map[q], bc[q]) for q in bf_map if list(bf_map[q]) != list(bc[q])}
    assert not mismatches, mismatches


def test_broadcast_knn_guards_index_size(spark, emb_df):
    """The fits-in-memory judgement is an explicit count guard, not an OOM."""
    with pytest.raises(ValueError, match="max_index_rows"):
        broadcast_knn(emb_df.limit(5), emb_df, k=3, max_index_rows=10)


def test_lsh_topk_subset_of_brute_force(spark, emb_df):
    """LSH results are approximate but every (query, neighbor, cos) it emits
    must agree with the exact scorer, and rank-1 recall should be decent."""
    queries = emb_df.filter(F.col("vec_id") < 50)
    bf = brute_force_topk(queries, emb_df, k=1).select("query_id", F.col("neighbor_id").alias("bf_top1"))
    lsh = lsh_topk(queries, emb_df, k=1, n_planes=8, bands=8)  # 8 bands × 1 row
    joined = bf.join(lsh.select("query_id", F.col("neighbor_id").alias("lsh_top1")), "query_id")
    n = joined.count()
    hits = joined.filter(F.col("bf_top1") == F.col("lsh_top1")).count()
    assert n > 0
    assert hits / n >= 0.5, f"rank-1 LSH recall {hits}/{n}"


def test_brute_force_excludes_self_and_is_ranked(emb_df):
    out = brute_force_topk(emb_df.filter(F.col("vec_id") < 5), emb_df, k=3).collect()
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3


def test_ivf_topk_recall_and_consistency(spark, emb_df):
    """IVF results must agree with the exact scorer on every emitted
    (query, neighbor) and reach decent rank-1 recall with generous nprobe."""
    from mel_spark.operators.similarity import ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 30)
    bf = brute_force_topk(queries, emb_df, k=1).select(
        "query_id", F.col("neighbor_id").alias("bf_top1"), F.col("cos").alias("bf_cos")
    )
    ivf = ivf_topk(queries, emb_df, k=1, n_cells=8, nprobe=6)
    joined = bf.join(ivf.select("query_id", F.col("neighbor_id").alias("ivf_top1"), "cos"), "query_id")
    n = joined.count()
    assert n > 0
    hits = joined.filter(F.col("bf_top1") == F.col("ivf_top1"))
    # where IVF found the true top-1, the cosine must be identical
    assert hits.filter(F.col("cos") != F.col("bf_cos")).count() == 0
    assert hits.count() / n >= 0.5, f"rank-1 IVF recall {hits.count()}/{n}"


def test_ivf_centroids_deterministic(spark, emb_df):
    from mel_spark.operators.similarity import train_ivf_centroids
    import numpy as np

    c1 = train_ivf_centroids(emb_df, 8, iterations=2)
    c2 = train_ivf_centroids(emb_df.repartition(7), 8, iterations=2)
    assert np.array_equal(c1, c2)


def test_broadcast_knn_index_path_matches_default(spark, sf_dir, emb_df):
    """index_path mode (executors load the parquet themselves; driver never
    touches vectors) must be byte-identical to the default packed-gather
    mode — canonical id-sorted index + exact boundary-tie ranking make the
    output independent of how the index was delivered."""
    queries = emb_df.filter(F.col("vec_id") < 20)
    default = {
        r["query_id"]: list(r["neighbor_ids"])
        for r in broadcast_knn(queries, emb_df, k=5).collect()
    }
    via_path = {
        r["query_id"]: list(r["neighbor_ids"])
        for r in broadcast_knn(
            queries, emb_df, k=5, index_path=f"{sf_dir}/embeddings.parquet"
        ).collect()
    }
    assert default == via_path


def test_ivf_quantized_reorder_matches_unquantized(spark, emb_df):
    """With a reorder budget comfortably above k, the int8 first pass must
    not change the final top-k: the exact re-score runs on the survivors and
    the true top-k survive a generous reorder cut. (Code payload is dim int8
    bytes — exactly 1/4 of the dim×fp32 vector the join would otherwise
    ship.)"""
    from mel_spark.operators.similarity import ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 15)
    plain = ivf_topk(queries, emb_df, k=3, n_cells=8, nprobe=6)
    quant = ivf_topk(
        queries, emb_df, k=3, n_cells=8, nprobe=6, quantized=True, reorder=200
    )
    p = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in plain.collect()}
    q = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in quant.collect()}
    assert p == q


def test_ivf_quantized_tight_reorder_recall(spark, emb_df):
    """Even with a TIGHT reorder budget (the regime where the approx pass
    actually prunes), int8-cosine ranking keeps recall@1 high vs brute
    force — the acceptance shape of the asymmetric-hashing pass."""
    from mel_spark.operators.similarity import ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 30)
    bf = brute_force_topk(queries, emb_df, k=1).select(
        "query_id", F.col("neighbor_id").alias("bf_top1")
    )
    quant = ivf_topk(
        queries, emb_df, k=1, n_cells=8, nprobe=6, quantized=True, reorder=10
    ).select("query_id", F.col("neighbor_id").alias("q_top1"))
    joined = bf.join(quant, "query_id")
    n = joined.count()
    hits = joined.filter(F.col("bf_top1") == F.col("q_top1")).count()
    assert n > 0 and hits / n >= 0.85, (hits, n)


def test_ivf_relational_subset_of_brute_force(spark, emb_df):
    """The oracle-matchable relational IVF: every (query, neighbor, cos) it
    returns carries the exact brute-force cosine (approximation affects WHICH
    neighbors surface, never their scores)."""
    from mel_spark.operators.similarity import ivf_topk_relational

    queries = emb_df.filter(F.col("vec_id") < 15)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute_force_topk(queries, emb_df, k=50).collect()
    }
    rel = ivf_topk_relational(
        queries, emb_df, k=3, n_cells=8, nprobe=6, iterations=2
    ).collect()
    assert len(rel) > 0
    for r in rel:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert bf[key] == r["cos"], (key, bf[key], r["cos"])
