"""Isolate the pair stage against existing checkpoints — scaling forensics.

The two-parallelism bench showed the pairs stage scaling 157.7 s → 133.8 s
(local[2] → local[8]) at 10M files while every other stage scaled 2.4-3.3x.
This probe reruns ONLY pair_stage from the embed/blocks checkpoints so the
stage can be profiled per-parallelism (pair it with spark.eventLog.enabled
and read task-time distributions from the JSON event log).

Usage:
    SPARK_GRAFT_CPUS=8 spark-submit --driver-memory 24g \
      --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
      --conf spark.eventLog.enabled=true \
      --conf spark.eventLog.dir=file:///tmp/evlog \
      --py-files /tmp/mel_spark.zip tools/probe_pairs.py \
      --ckpt /dev/shm/diag/ckpt --out /dev/shm/diag/pairs_probe
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from mel_spark.pipeline import ERConfig, pair_stage
    from mel_spark.session import get_spark
    from mel_spark.sources.checkpoint import CheckpointManager

    spark = get_spark(
        "probe_pairs", extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"}
    )
    spark.sparkContext.setLogLevel("WARN")
    mgr = CheckpointManager(args.ckpt)
    feats = mgr.read("embed", spark)
    blocks = mgr.read("blocks", spark)
    t0 = time.time()
    scored = pair_stage(blocks, feats, ERConfig())
    scored.write.mode("overwrite").parquet(args.out)
    wall = time.time() - t0
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"pairs": n, "stage_wall_sec": round(wall, 2),
                      "cpus": spark.sparkContext.defaultParallelism}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
