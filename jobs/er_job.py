"""spark-submit entry point for the entity-resolution pipeline.

Usage (north_rule packaging: spark-submit --py-files mel_spark.zip):

    spark-submit --py-files mel_spark.zip jobs/er_job.py \
        --input /data/repos_parquet_dir \
        --checkpoint /tmp/er_ckpt --output /tmp/er_out

    # or synthesize a deterministic corpus (no external data):
    spark-submit --py-files mel_spark.zip jobs/er_job.py \
        --synthesize 2000 --checkpoint /tmp/er_ckpt --output /tmp/er_out

    # incremental: fold a new batch into a finished run (cost proportional
    # to the batch; output labels identical to a from-scratch recompute):
    spark-submit --py-files mel_spark.zip jobs/er_job.py \
        --update-base /tmp/er_ckpt --input /data/new_batch_dir \
        --checkpoint /tmp/er_ckpt_v2 --output /tmp/er_out_v2

Prints one JSON line of run metrics (rows, blocks, candidate pairs, matches,
clusters, elapsed sec, pairs/sec; plus pairwise F1 when gold clusters exist).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _maintain_ann_index(spark, ckpt_dir: str, index_path: str) -> dict:
    """Keep the persisted IVF index in step with a fold: append the fold's
    NEW embeddings (embed_delta) under the frozen centroids, idempotent per
    fold (the checkpoint dir is the epoch token, so a replayed green fold is
    a no-op); if no index exists yet, build one from the full embed chain."""
    import os as _os

    from mel_spark.operators.ann_index import (
        append_to_ivf_index,
        ensure_ivf_index,
        read_index_meta,
    )
    from mel_spark.operators.incremental import read_stage_chain
    from mel_spark.sources.checkpoint import CheckpointManager

    try:
        read_index_meta(index_path)
    except FileNotFoundError:
        # first build: the embed chain already CONTAINS this fold's delta, so
        # record this fold's token as epoch 0's — a replayed fold's append of
        # the same delta is then a committed no-op instead of a duplicate
        feats_all = read_stage_chain(spark, ckpt_dir, "embed")
        return ensure_ivf_index(
            feats_all.select("csid", "emb"), index_path, i_id="csid",
            i_emb="emb", token=_os.path.abspath(ckpt_dir),
        )
    delta = CheckpointManager(ckpt_dir).read("embed_delta", spark)
    meta = append_to_ivf_index(
        delta.select("csid", "emb"),
        index_path,
        i_id="csid",
        i_emb="emb",
        token=_os.path.abspath(ckpt_dir),
    )
    if meta.get("needs_refit"):
        import logging

        logging.getLogger(__name__).warning(
            "ann index %s: appended rows exceed the refit threshold — the "
            "quantizer was fitted on a minority of the data; rebuild with "
            "build_ivf_index at the next maintenance window", index_path,
        )
    return meta


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="dir containing repos.parquet (+ optional reference_clusters.parquet)")
    p.add_argument("--synthesize", type=int, default=0, help="generate N synthetic files instead of reading --input")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument(
        "--emit-survivors",
        action="store_true",
        help="also write <output>/survivors.parquet: the deduplicated corpus "
        "(per cluster the longest-content mention, tie min id) via "
        "dedup.select_survivors — the pipeline's training-data output",
    )
    p.add_argument(
        "--update-base",
        help="checkpoint dir of a COMPLETED run: incrementally fold the "
        "--input/--synthesize batch into it instead of running from scratch",
    )
    p.add_argument(
        "--bucketed-index",
        help="catalog table name for the bucketed block-index probe table "
        "(sources/bucketed.py). Full run: (re)built from the run's block "
        "index. Fold: validated/created from the base chain, used as the "
        "probe's corpus side, and the fold's delta keys appended exactly "
        "once (fenced by a per-fold marker)",
    )
    p.add_argument(
        "--bucketed-index-path",
        help="external location for --bucketed-index so it survives "
        "spark-submit invocations under the default in-memory catalog "
        "(a metastore deployment omits this)",
    )
    p.add_argument(
        "--bucketed-index-buckets",
        type=int,
        default=None,
        help="bucket count when (re)building --bucketed-index "
        "(default: sources/bucketed.py DEFAULT_BUCKETS)",
    )
    p.add_argument(
        "--ann-index-path",
        help="persisted IVF index dir (operators/ann_index.py) kept in step "
        "with the pipeline: full run — built from the run's embed "
        "checkpoint iff absent; fold — the batch's NEW embeddings are "
        "appended under the frozen centroids as one fenced epoch "
        "(idempotent per fold via the checkpoint-dir token), so the "
        "served index follows the incremental story between refits "
        "(meta.needs_refit flags when appends exceed half the index)",
    )
    p.add_argument(
        "--probe-sort-merge",
        action="store_true",
        help="fold probe: do NOT broadcast the delta key set — with "
        "--bucketed-index the probe runs as a sort-merge join where only "
        "the delta side exchanges (for batches past the broadcast ceiling)",
    )
    p.add_argument(
        "--relabel-sort-merge",
        action="store_true",
        help="fold relabel: do NOT broadcast the touched-cluster membership "
        "(use when the batch touches a mega-cluster whose membership exceeds "
        "the broadcast ceiling; output is identical, the relabel joins run "
        "sort-merge)",
    )
    args = p.parse_args(argv)
    if args.update_base:
        import os as _os

        if _os.path.abspath(args.update_base) == _os.path.abspath(args.checkpoint):
            p.error(
                "--checkpoint must differ from --update-base: a fold writes delta "
                "stages + a parent pointer into --checkpoint, and writing them into "
                "the completed base corrupts it (the base's full 'clusters' marker "
                "would shadow the fold's clusters_delta on the next chain read)"
            )

    from mel_spark.session import get_spark
    from mel_spark.pipeline import ERConfig, run_pipeline

    # static auto-broadcast OFF: Catalyst's size estimates for UDF-produced
    # relations (the embedding stage) are unreliable and a mis-broadcast OOMs;
    # AQE still converts SMJ→BHJ from real shuffle sizes, and known-small
    # sides (redirect maps, salt tables) use explicit broadcast()
    spark = get_spark("er_job", extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"})
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    gold = None
    if args.synthesize:
        from mel_spark.datagen import GenConfig, generate_repos

        tables = generate_repos(GenConfig(n_files=args.synthesize, seed=args.seed))
        repos = spark.createDataFrame(tables["repos"])
        gold = spark.createDataFrame(tables["reference_clusters"])
    elif args.input:
        # a single small parquet file arrives as one split; spread it so every
        # core scans/embeds/blocks in parallel. Conditional: a big input
        # already has more splits than cores and must NOT be funneled through
        # a corpus-wide shuffle into parallelism*2 fat partitions (the old
        # unconditional repartition did exactly that)
        from mel_spark.session import ensure_scan_parallelism

        repos = ensure_scan_parallelism(
            spark.read.parquet(f"{args.input}/repos.parquet"),
            spark.sparkContext.defaultParallelism * 2,
        )
        try:
            gold = spark.read.parquet(f"{args.input}/reference_clusters.parquet")
        except Exception:
            gold = None
    else:
        p.error("one of --input / --synthesize is required")

    cfg = ERConfig() if args.threshold is None else ERConfig(threshold=args.threshold)
    if args.update_base:
        from mel_spark.operators.incremental import incremental_update

        base_keys_table = None
        if args.bucketed_index:
            from mel_spark.sources import bucketed

            kw = {"path": args.bucketed_index_path}
            if args.bucketed_index_buckets is not None:
                kw["n_buckets"] = args.bucketed_index_buckets
            bucketed.ensure_bucketed_index(
                spark, args.bucketed_index, args.update_base, **kw
            )
            base_keys_table = args.bucketed_index
        inc = incremental_update(
            spark,
            args.update_base,
            repos,
            cfg,
            checkpoint_dir=args.checkpoint,
            input_token=(
                f"synthesize:{args.synthesize}:{args.seed}"
                if args.synthesize
                else str(args.input)
            ),
            base_keys_table=base_keys_table,
            broadcast_probe_delta=not args.probe_sort_merge,
            broadcast_touched=not args.relabel_sort_merge,
        )
        inc["clusters"].select("mention_id", "cluster_id").write.mode(
            "overwrite"
        ).parquet(f"{args.output}/clusters.parquet")
        if args.bucketed_index and not bucketed.fold_appended(
            args.checkpoint, args.bucketed_index
        ):
            # fold is green (every delta stage checkpointed above): append the
            # delta keys exactly once so the table keeps matching the chain
            from mel_spark.sources.checkpoint import CheckpointManager as _Mgr

            bucketed.append_bucketed_index(
                _Mgr(args.checkpoint)
                .read("block_index_delta", spark)
                .select("block_key", "mention_id"),
                args.bucketed_index,
            )
            bucketed.record_fold_appended(args.checkpoint, args.bucketed_index)
        ann_meta = None
        if args.ann_index_path:
            ann_meta = _maintain_ann_index(spark, args.checkpoint, args.ann_index_path)
        n_survivors = None
        if args.emit_survivors:
            from mel_spark.operators.dedup import select_survivors

            surv = select_survivors(
                inc["clusters"], inc["mentions"],
                id_col="mention_id", text_col="content",
            )
            surv.write.mode("overwrite").parquet(f"{args.output}/survivors.parquet")
            n_survivors = spark.read.parquet(f"{args.output}/survivors.parquet").count()
        from mel_spark.sources.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.checkpoint)
        stage_times = {}
        for st in ("ingest_delta", "embed_delta", "block_index_delta",
                   "pairs_delta", "clusters_delta"):
            try:
                stage_times[st] = mgr.counters(st).get("elapsed_sec")
            except FileNotFoundError:
                pass
        metrics = {
            "mode": "incremental",
            "new_mentions": inc["mentions_new"].count(),
            "total_mentions": inc["mentions"].count(),
            "new_matches": inc["matches_new"].count(),
            "clusters": inc["clusters"].select("cluster_id").distinct().count(),
            "elapsed_sec": round(time.time() - t0, 2),
            "stage_sec": stage_times,
        }
        if n_survivors is not None:
            metrics["survivors"] = n_survivors
        if ann_meta is not None:
            metrics["ann_index"] = {
                "rows": ann_meta["rows"],
                "epochs": len(ann_meta["epochs"]),
                "needs_refit": ann_meta.get("needs_refit", False),
            }
        if gold is not None:
            from pyspark.sql import functions as F
            from mel_spark.operators.evaluate import pairs_from_clusters, pairwise_prf

            # fold-mode gold covers only the folded batch, while the predicted
            # assignment spans base ∪ batch — evaluate on the gold-covered
            # mention set, else every base-side pair counts as a false positive
            gold_m = F.broadcast(gold.select("mention_id").distinct())
            pred = pairs_from_clusters(inc["clusters"], "mention_id", "cluster_id")
            pred = pred.join(
                gold_m.withColumnRenamed("mention_id", "mention_id_a"),
                "mention_id_a",
                "left_semi",
            ).join(
                gold_m.withColumnRenamed("mention_id", "mention_id_b"),
                "mention_id_b",
                "left_semi",
            )
            m = pairwise_prf(
                pred, pairs_from_clusters(gold, "mention_id", "entity_id")
            )
            metrics.update(
                {k: round(v, 6) if isinstance(v, float) else v for k, v in m.items()}
            )
        print(json.dumps(metrics))
        spark.stop()
        return 0
    input_token = (
        f"synthesize:{args.synthesize}:{args.seed}" if args.synthesize else str(args.input)
    )
    out = run_pipeline(spark, repos, args.checkpoint, cfg, input_token=input_token)
    if args.bucketed_index:
        from mel_spark.sources import bucketed

        kw = {"path": args.bucketed_index_path}
        if args.bucketed_index_buckets is not None:
            kw["n_buckets"] = args.bucketed_index_buckets
        bucketed.ensure_bucketed_index(spark, args.bucketed_index, args.checkpoint, **kw)
    ann_meta = None
    if args.ann_index_path:
        from mel_spark.operators.ann_index import ensure_ivf_index
        from mel_spark.sources.checkpoint import CheckpointManager as _AnnMgr

        ann_meta = ensure_ivf_index(
            _AnnMgr(args.checkpoint).read("embed", spark).select("csid", "emb"),
            args.ann_index_path, i_id="csid", i_emb="emb",
        )
    from mel_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(args.checkpoint)
    stage_times = {}
    for st in ("ingest", "embed", "block_index", "block_sizes", "blocks",
               "pairs", "clusters"):
        try:
            stage_times[st] = mgr.counters(st).get("elapsed_sec")
        except FileNotFoundError:
            pass
    out["clusters"].write.mode("overwrite").parquet(f"{args.output}/clusters.parquet")
    n_survivors = None
    if args.emit_survivors:
        from mel_spark.operators.dedup import select_survivors

        surv = select_survivors(
            out["clusters"], out["mentions"], id_col="mention_id", text_col="content"
        )
        surv.write.mode("overwrite").parquet(f"{args.output}/survivors.parquet")
        n_survivors = spark.read.parquet(f"{args.output}/survivors.parquet").count()

    # rows/candidate_pairs come from the checkpoint markers, which record the
    # EXACT written row count of their stage (ingest rows / pairs rows —
    # verified equal to a recount). Recounting them here re-scanned ingest and
    # pairs inside the timed window: measurement bookkeeping, not pipeline
    # work. The remaining stats (blocks/matches/clusters) are NOT marker-
    # derivable — blocks is the distinct POST-salt/cap pairing keys, which
    # differs from the block_sizes marker's raw pre-salt key count — so they
    # stay exact recounts, evaluated after ``elapsed`` is captured.
    n_pairs = mgr.counters("pairs")["rows"]
    elapsed = time.time() - t0
    metrics = {
        "rows": mgr.counters("ingest")["rows"],
        "blocks": out["blocks"].select("block_key").distinct().count(),
        "candidate_pairs": n_pairs,
        "matches": out["matches"].count(),
        "clusters": out["clusters"].select("cluster_id").distinct().count(),
        "elapsed_sec": round(elapsed, 2),
        "candidate_pairs_per_sec": round(n_pairs / elapsed, 1),
        "stage_sec": stage_times,
        "pairs_stage_pairs_per_sec": (
            round(n_pairs / stage_times["pairs"], 1) if stage_times.get("pairs") else None
        ),
    }
    if n_survivors is not None:
        metrics["survivors"] = n_survivors
    if ann_meta is not None:
        metrics["ann_index"] = {
            "rows": ann_meta["rows"],
            "epochs": len(ann_meta["epochs"]),
            "needs_refit": ann_meta.get("needs_refit", False),
        }
    if gold is not None:
        from mel_spark.operators.evaluate import pairs_from_clusters, pairwise_prf

        m = pairwise_prf(
            pairs_from_clusters(out["clusters"], "mention_id", "cluster_id"),
            pairs_from_clusters(gold, "mention_id", "entity_id"),
        )
        metrics.update({k: round(v, 6) if isinstance(v, float) else v for k, v in m.items()})
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
