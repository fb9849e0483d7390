"""Round-6 profiling harness (guide §1): per-query stage breakdown + plans.

NOT the contract bench (bench.py is frozen). This tool:
 - runs each headline query twice (warm-up + measured) with a job
   description naming the query, under a Spark event log, so
   tools/evlog_stages.py can attribute stage time per query;
 - times both the bench's `.count()` form and the noop-sink form
   (`write.format("noop")`) — the latter computes every column (guide §1.4);
 - dumps `explain("formatted")` for each query to plans/r06/.

Usage:
  python bench_extra.py [sf_dir] [--queries a,b,c] [--plans-suffix before]
  python tools/evlog_stages.py /tmp/mel_evlog_r6/<app-id>
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "er_minhash_pairs",
    "er_clusters",
    "er_incremental",
    "er_blocking_stats",
    "ld_segment_dedup",
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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"
    )
    names = HEADLINE
    plans_suffix = None
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--queries":
            names = args.pop(0).split(",")
        elif a == "--plans-suffix":
            plans_suffix = args.pop(0)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = "/tmp/mel_evlog_r6"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "mel_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"app_id={spark.sparkContext.applicationId}", file=sys.stderr)
    qs = entrymod.queries()
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("documents", "lineitem", "embeddings", "events", "orders", "customer", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()

    out: dict[str, dict] = {}
    if plans_suffix:
        os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        sc = spark.sparkContext
        # warm pass (JIT/codegen), unlabeled
        spark.catalog.clearCache()
        sc.setJobDescription(f"warm:{name}")
        qs[name](spark, sf_dir).count()
        # measured pass: count() (the bench's action)
        spark.catalog.clearCache()
        sc.setJobDescription(f"count:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        t_count = round(time.time() - t0, 3)
        # measured pass: noop sink (computes every column)
        spark.catalog.clearCache()
        sc.setJobDescription(f"noop:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_noop = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        out[name] = {"count": t_count, "noop": t_noop}
        print(f"{name:22s} count={t_count:7.3f}  noop={t_noop:7.3f}", file=sys.stderr)
        if plans_suffix:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{name}_{plans_suffix}.txt", "w") as f:
                f.write(buf.getvalue())
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
