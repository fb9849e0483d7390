"""Bucketed block-index storage: the shuffle-free probe path for folds whose
delta is too large to broadcast.

The incremental fold's default probe broadcasts the (batch-proportional)
delta key set and SCANS the corpus key stream (operators/incremental.py) —
zero corpus shuffle, but only as long as the batch fits a broadcast. When a
fold absorbs a batch past that ceiling (a backfill day, a vendored-monorepo
import), the join must co-locate instead: persist the block index BUCKETED BY
``block_key`` (hash-bucketed files + catalog bucket spec), and the probe
becomes a sort-merge join where ONLY the delta side exchanges — the 10^12-row
corpus index is read pre-partitioned, no Exchange above its scan
(`tests/test_bucketed.py` pins that plan shape). This is the parquet-catalog
analogue of an Iceberg bucket-partitioned table; the reference's counterpart
is the sharded alias-table layout (128 mod-shards,
/root/reference/configs/general.gin:4-5), which co-locates probes by key
modulus for the same reason.

Append lifecycle: each fold APPENDS its delta keys (Spark verifies the bucket
spec matches), so the table stays the union of the root run's index plus
every fold's delta — identical content to ``read_stage_chain(...,
'block_index')``, pre-bucketed. Appends must be fenced by the fold's
checkpoint markers (append once, after the fold's ``block_index_delta`` stage
is green) — a replayed fold that re-appended would duplicate base rows, which
keeps pair output correct (pairs are distinct-aggregated) but double-counts
toward the per-(member, key) probe cap.

The catalog entry is session-scoped under Spark's default in-memory catalog;
production deployments back it with a real metastore (Hive/Glue/Unity) so the
bucket spec survives across jobs — the write/read/append API here is
identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


DEFAULT_BUCKETS = 256  # ~10^12 keys / 256 buckets ≈ 4G rows/bucket-file group;
# scale with corpus (buckets should each fit an executor's scan split budget)


def write_bucketed_index(
    df: DataFrame,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> None:
    """Materialize (block_key, mention_id) bucketed by block_key. ``path``
    makes it an external table (tests point this at a tmp dir); default is the
    session warehouse."""
    w = (
        df.select("block_key", "mention_id")
        .write.bucketBy(n_buckets, "block_key")
        .sortBy("block_key")
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def append_bucketed_index(df: DataFrame, table: str) -> None:
    """Append a fold's delta keys. Spark rejects a mismatched bucket spec, so
    the bucketing invariant can't be silently broken; callers fence this with
    the fold's checkpoint marker (append exactly once per green fold)."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"append_bucketed_index: table {table!r} does not exist — write it "
            "with write_bucketed_index from the base run's block_index first"
        )
    n_buckets = _bucket_spec(spark, table)
    (
        df.select("block_key", "mention_id")
        .write.bucketBy(n_buckets, "block_key")
        .sortBy("block_key")
        .mode("append")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_index(spark: SparkSession, table: str) -> DataFrame:
    """The probe source: pass this as ``incremental_update(...,
    base_keys_table=...)`` (or directly as probe_keys' base side with
    ``broadcast_delta=False``) and the corpus side of the probe join carries
    no Exchange."""
    return spark.table(table)


def _bucket_spec(spark: SparkSession, table: str) -> int:
    row = [
        r
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        if r["col_name"] == "Num Buckets"
    ]
    if not row:
        raise ValueError(f"{table!r} is not a bucketed table")
    return int(row[0]["data_type"])
