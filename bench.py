"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...}

Headline set = the flagship ER pipeline stages plus the heaviest operator
families (kNN retrieval, pricing aggregation, join+topN, sessionization).
Each query is executed to completion (count() the result — no collect of
payloads) and timed wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "er_minhash_pairs",
    "er_clusters",
    "er_blocking_stats",
    "knn_top5",
    "pricing_summary",
    "join_topn_revenue",
    "per_key_cap",
    "ev_sessionize",
    "ta_token_stats",
]


def main() -> int:
    import __spark_entry__ as entrymod
    from mel_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("mel_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warmup: JIT/codegen + parquet footer caches, standard throughput-bench
    # practice (the first query otherwise pays ~8-10 s of one-time JVM cost
    # that says nothing about operator throughput)
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("documents", "lineitem", "embeddings", "events", "orders", "customer", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.time()
    for name in HEADLINE:
        t0 = time.time()
        rows[name] = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
