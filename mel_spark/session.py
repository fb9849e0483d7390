"""SparkSession factory with scale-oriented defaults.

Configs chosen for the 100 TB / 1000-executor target (AQE, skew-join handling,
Arrow batching) but harmless at local[*] test scale. The reference hand-tunes the
same knobs (multiprocessing pool width: src/tokenization/runner.py:28-32; embed
batch sizes: configs/lealla.gin:2); here Spark owns them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpu_count() -> int:
    """Concurrent-task count this session will run locally: $SPARK_GRAFT_CPUS
    when numeric, else the machine's cores (the local[*] default)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)


def get_spark(
    app_name: str = "mel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback local[*]) so the
    same entry point serves pytest, bench, and spark-submit (where --master wins).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # MEL_SPARK_MASTER overrides the thread-mode default — the scaling bench
    # uses it to run `local-cluster[N,cores,memMB]`: REAL separate executor
    # JVMs (own heap, own GC, own Python workers), the literal "N vs 4N
    # executors" shape of the north_rule rather than N threads in one JVM.
    master = master or os.environ.get("MEL_SPARK_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        # FIXED across parallelism levels (a real cluster job ships one
        # shuffle.partitions regardless of executor count): pinning it to the
        # cpu count made the N-vs-4N comparison partly a partitioning
        # artifact (VERDICT r1). AQE coalesces small shuffles per level.
        shuffle_partitions = 64

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle / adaptive execution (north_rule: explicit skew handling) ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # --- scan splits: keep small checkpoint tables parallel. Default 128m
        # bin-packs a whole small stage into 1-2 splits and serializes every
        # downstream stage; 8m keeps local[32] fed while staying far above
        # task-overhead territory at cluster scale (tune per deployment) ---
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # --- Arrow: all Python boundaries are vectorized (input_hint mandate) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- broadcast threshold: compressed-parquet size estimates understate
        # in-memory size ~10-20× for array columns, so keep the static
        # threshold small; AQE upgrades SMJ→BHJ at runtime from ACTUAL shuffle
        # sizes, and known-small sides use explicit broadcast() ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # --- InferFiltersFromGenerate duplicates the ENTIRE generator
        # expression into a `size(gen) > 0 AND isnotnull(gen)` filter below
        # every explode — for our md5-shingle/minhash band arrays that filter
        # re-runs the whole feature chain per row, and predicate pushdown then
        # parks it below the scan-repartition Exchange where only a handful of
        # file-split tasks execute it (measured: explode(band_keys) noop at
        # sf0.01 5.4 s → 0.4 s with the rule excluded). The filter is
        # redundant for correctness: explode already emits nothing for null or
        # empty arrays ---
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # --- deterministic session timezone for reproducible hashing ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", os.environ.get("MEL_SPARK_UI", "false"))
        # heap sized to the concurrent-task count: local mode runs all tasks
        # in the driver JVM, so the old flat 8g gave 32-thread runs only
        # 250 MB/task and GC ate ~30% of stage run time (r6 event logs:
        # 24 s GC in er_clusters alone). 640 MB/core matches a normal
        # per-core executor memory grant at cluster scale; still
        # env-overridable, and spark-submit users pass --driver-memory
        .config("spark.driver.memory", os.environ.get("MEL_SPARK_DRIVER_MEM")
                or f"{max(8, (_cpu_count() * 5 + 7) // 8)}g")
        # throughput GC: G1 showed pathological pauses under this allocation
        # profile on a big shared local-mode heap (only effective when this
        # builder launches the JVM; spark-submit users pass it on the CLI)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    # shuffle/spill scratch space: a cluster gives each executor local NVMe; the
    # single-disk sandbox serializes IO there, so benches point this at tmpfs
    local_dir = os.environ.get("MEL_SPARK_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # opt-in event logging for profiling runs (tools/evlog_stages.py); off by
    # default — the log write adds driver work
    evlog = os.environ.get("MEL_SPARK_EVLOG")
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evlog)
            .config("spark.eventLog.compress", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_SCAN_SPLITS_CACHE: dict[tuple, int] = {}


def ensure_scan_parallelism(df, min_partitions: int | None = None,
                            cache_key: str | None = None):
    """Repartition a scan that yields fewer splits than the session's core
    count — a small parquet file is one split, so every downstream per-row
    computation (md5 shingling, cosine scoring) otherwise runs on ONE core no
    matter how many are idle. Conditional by design: a scan at production
    scale already has far more splits than cores, so this never adds an
    Exchange where the input is big — it only ever moves a small input
    (measured at sf0.1: the 0.6 MB documents scan + round-robin shuffle costs
    ~0.1 s and the md5 feature pass drops 2.6 s → 1.1 s on local[32]).
    Partition-placement-agnostic consumers only (aggregations, joins).

    ``cache_key`` (e.g. the parquet path): memoize the split-count probe —
    ``df.rdd.getNumPartitions()`` pays a full physical-planning py4j
    round-trip (~0.17 s measured), and repeated query builds over the same
    static input re-derive the same number. Process-local; pass it only for
    inputs that do not change within the process lifetime."""
    spark = df.sparkSession
    want = min_partitions or spark.sparkContext.defaultParallelism
    if cache_key is not None:
        key = (cache_key, want)
        n = _SCAN_SPLITS_CACHE.get(key)
        if n is None:
            n = _SCAN_SPLITS_CACHE[key] = df.rdd.getNumPartitions()
    else:
        n = df.rdd.getNumPartitions()
    if n < want:
        return df.repartition(want)
    return df
