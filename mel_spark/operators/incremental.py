"""Incremental entity resolution: fold a NEW batch of files into a completed
run without recomputing the old corpus.

The reference's pipelines are rerun-from-scratch batch jobs guarded by stage
markers (src/scripts/train/all_langs_no_slurm.sh:49-116); at the 10^12-file
tier a daily ingest cannot re-embed / re-block / re-cluster the whole corpus
to absorb 0.1% new rows. This operator makes the expensive stages proportional
to the NEW batch:

  1. ingest the new rows (same sha256 invariants as ``pipeline.ingest``);
     mention_ids already present in the base are dropped (idempotent re-sends).
  2. featurize ONLY contents whose csid is unseen — contents byte-identical
     to existing ones adopt the base features via anti-join, extending the
     dedup-before-embedding lesson (src/baselines/olpeat/at_embeddings.py:4-8)
     across batch boundaries.
  3. the DELTA block-key set = raw (band, lang) keys for every (csid, lang)
     combination the batch introduces — this catches both brand-new contents
     AND old contents surfacing under a new language (which opens blocks the
     base run never formed). Candidate pairs =
       (a) delta x delta: the standard salt+cap skew controls over the delta
           key set, then within-block pairing, and
       (b) delta x base: an equi-join probe of the delta keys against the
           base key set, capped per (new member, key) like cap_blocks.
     The base key set is derived from the base features here (one pass); at
     scale it is the precomputed "block index" — written once, bucketed by
     block_key, so the probe shuffles ONLY the delta side.
  4. score new pairs with the same fused Arrow kernel over (base ∪ new)
     features; threshold → new match edges.
  5. cluster incrementally: old csids COLLAPSE to their existing cluster
     roots (built from the base output), so connected components runs over a
     graph whose size is O(new edges + touched roots), never O(all historical
     edges). Components merging two old roots re-merge those clusters —
     transitivity across batches is preserved.
  6. relabel cluster_id = min mention ``mid`` per final root over ALL member
     mentions — byte-identical to what a full run over (base ∪ new) emits
     (whenever skew caps do not bind), which is the equivalence contract
     tests/test_incremental.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mel_spark.operators import blocking, cluster, pairs
from mel_spark.pipeline import ERConfig, embed_stage, ingest
from mel_spark.sources.checkpoint import LINEAGE_COLS, CheckpointManager


def content_roots(mentions: DataFrame, clusters: DataFrame) -> DataFrame:
    """(csid, root) content-level cluster roots recovered from the
    mention-level cluster output (all mentions of a csid share a cluster by
    construction; min() is a no-op made explicit for determinism)."""
    return (
        mentions.select("csid", "mention_id")
        .join(clusters, "mention_id")
        .groupBy("csid")
        .agg(F.min("cluster_id").alias("root"))
    )


def raw_band_keys(feats: DataFrame, content_langs: DataFrame) -> DataFrame:
    """(block_key, mention_id=csid) raw minhash-band keys — the same
    xxhash64("mh", band, lang) construction as pipeline.block_stage, WITHOUT
    salt/cap/singleton-drop (those are pairing-time policies, not key
    identities)."""
    return (
        feats.select("csid", "bands")
        .join(content_langs, "csid")
        .select("csid", F.explode("bands").alias("_band"), "lang")
        .select(
            F.xxhash64(F.lit("mh"), F.col("_band"), F.col("lang")).alias("block_key"),
            F.col("csid").alias("mention_id"),
        )
    )


def probe_keys(
    delta_keys: DataFrame,
    base_keys: DataFrame,
    max_candidates_per_key: int = 64,
) -> DataFrame:
    """delta x base candidate pairs: equi-join on raw block_key, capped at
    ``max_candidates_per_key`` old candidates per (new member, key) in
    deterministic min-order — cap_blocks' fan-out bound applied to the probe.
    Output: (mention_id_a < mention_id_b, block_key), distinct."""
    hits = delta_keys.select(
        "block_key", F.col("mention_id").alias("_new")
    ).join(
        base_keys.select("block_key", F.col("mention_id").alias("_old")),
        "block_key",
    ).filter(F.col("_new") != F.col("_old"))
    w = Window.partitionBy("_new", "block_key").orderBy("_old")
    hits = hits.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_candidates_per_key
    )
    return (
        hits.select(
            F.least("_new", "_old").alias("mention_id_a"),
            F.greatest("_new", "_old").alias("mention_id_b"),
            "block_key",
        )
        .groupBy("mention_id_a", "mention_id_b")
        .agg(F.min("block_key").alias("block_key"))
    )


def merge_components(
    new_matches: DataFrame,
    roots_old: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Incremental transitive closure: collapse old endpoints to their cluster
    roots, run connected components over the (small) mapped edge set, and emit
    (node, new_root) for every touched node — ``node`` is an old root or a new
    csid. Untouched nodes are absent (identity map).

    new_matches: (mention_id_a, mention_id_b) csid-level edges.
    roots_old:   (csid, root) from content_roots().
    """
    e = new_matches.select(
        F.col("mention_id_a").alias("u"), F.col("mention_id_b").alias("v")
    )
    ra = roots_old.select(F.col("csid").alias("u"), F.col("root").alias("_ru"))
    rb = roots_old.select(F.col("csid").alias("v"), F.col("root").alias("_rv"))
    mapped = (
        e.join(ra, "u", "left")
        .join(rb, "v", "left")
        .select(
            F.coalesce("_ru", F.col("u")).alias("mention_id_a"),
            F.coalesce("_rv", F.col("v")).alias("mention_id_b"),
        )
        .filter(F.col("mention_id_a") != F.col("mention_id_b"))
    )
    return cluster.connected_components(mapped, checkpoint_dir=checkpoint_dir)


def incremental_update(
    spark: SparkSession,
    base_checkpoint: str,
    new_repos: DataFrame,
    cfg: ERConfig = ERConfig(),
    checkpoint_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Fold ``new_repos`` into the completed run at ``base_checkpoint``.

    Returns {"mentions", "embedded", "matches_new", "clusters"} where
    ``clusters`` is the FULL updated (mention_id, cluster_id) assignment over
    base ∪ new mentions, labeled identically to a from-scratch run.
    """
    base = CheckpointManager(base_checkpoint)
    drop = list(LINEAGE_COLS)
    mentions_b = base.read("ingest", spark).drop(*drop)
    feats_b = base.read("embed", spark).drop(*drop)
    clusters_b = base.read("clusters", spark).drop(*drop)

    # 1. ingest; drop idempotent re-sends of known mentions
    new_m = ingest(new_repos).join(
        mentions_b.select("mention_id"), "mention_id", "left_anti"
    )

    # 2. featurize only unseen contents
    new_content_m = new_m.join(feats_b.select("csid"), "csid", "left_anti")
    feats_new = embed_stage(new_content_m, cfg)
    feats_all = feats_b.unionByName(feats_new)

    # 3. delta key set: every (csid, lang) combination this batch introduces —
    # new contents in any lang, and KNOWN contents surfacing in a new lang
    base_cl = mentions_b.select("csid", "lang").dropDuplicates(["csid", "lang"])
    delta_cl = (
        new_m.select("csid", "lang")
        .dropDuplicates(["csid", "lang"])
        .join(base_cl, ["csid", "lang"], "left_anti")
    )
    delta_keys = raw_band_keys(
        feats_all.join(delta_cl.select("csid").distinct(), "csid", "left_semi"),
        delta_cl,
    )
    base_keys = raw_band_keys(feats_b, base_cl)

    # 3a. delta x delta with the standard skew controls
    dd_blocks = blocking.cap_blocks(
        blocking.salt_hot_blocks(delta_keys, cfg.salt_threshold),
        cfg.max_block_size,
    )
    dd_pairs = pairs.candidate_pairs(dd_blocks)
    # 3b. delta x base probe (at scale: base_keys = pre-bucketed block index)
    db_pairs = probe_keys(
        delta_keys, base_keys, max_candidates_per_key=cfg.max_block_size
    )
    cand = (
        dd_pairs.unionByName(db_pairs)
        .groupBy("mention_id_a", "mention_id_b")
        .agg(F.min("block_key").alias("block_key"))
    )

    # 4. score + threshold with the shared fused kernel
    records = feats_all.select(F.col("csid").alias("mention_id"), "emb", "xs")
    scored = pairs.score_pairs_fused_arrow(
        cand, records, w_cos=cfg.w_cos, w_jaccard=cfg.w_jaccard
    )
    matches_new = pairs.match_pairs(scored, cfg.threshold)

    # 5. incremental components over root-collapsed edges
    import os as _os

    roots_old = content_roots(mentions_b, clusters_b)
    cc_dir = _os.path.join(checkpoint_dir, "cc_rounds") if checkpoint_dir else None
    remap = merge_components(matches_new, roots_old, checkpoint_dir=cc_dir).select(
        F.col("mention_id").alias("_node"), F.col("cluster_id").alias("_new_root")
    )

    # 6. final content-level assignment: old csid → remap(root) else root;
    #    new csid → remap(csid) else csid (singleton)
    old_assign = (
        roots_old.join(remap, roots_old["root"] == remap["_node"], "left")
        .select("csid", F.coalesce("_new_root", "root").alias("_root"))
    )
    new_assign = (
        feats_new.select("csid")
        .join(remap, feats_new["csid"] == remap["_node"], "left")
        .select("csid", F.coalesce("_new_root", F.col("csid")).alias("_root"))
    )
    assign = old_assign.unionByName(new_assign)

    # expand to mentions and relabel deterministically (min mid per root),
    # matching pipeline.run_pipeline's output contract exactly
    mentions_all = mentions_b.unionByName(new_m)
    expanded = mentions_all.select("mid", "mention_id", "csid").join(assign, "csid")
    mins = expanded.groupBy("_root").agg(F.min("mid").alias("cluster_id"))
    clusters = expanded.join(mins, "_root").select("mention_id", "cluster_id")

    out = {
        "mentions": mentions_all,
        "mentions_new": new_m,
        "embedded": feats_all,
        "matches_new": matches_new,
        "clusters": clusters,
    }
    if checkpoint_dir:
        ckpt = CheckpointManager(checkpoint_dir)
        out["clusters"] = ckpt.write("clusters", clusters)
        out["embedded"] = ckpt.write("embed", feats_all)
    return out
