"""Deterministic seeded ordering / partitioning (SURVEY §2.6 row O4).

The reference shuffles epoch rows with a seeded RNG permutation
(src/finetunings/generate_epochs/datasets.py:54-55) and re-shuffles file
groups in the Mixer (src/multilingual_dataset/mixer.py:34-50). A distributed
engine cannot reproduce NumPy's permutation, but a hash-of-(key, seed) sort
IS a deterministic seeded permutation — identical across engines, partition
counts, and parallelism levels, which is what reproducible sampling needs.

Scale notes: seeded_shuffle is one total sort (range-partitioned exchange);
seeded_repartition is one hash exchange with no sort — use the latter to
de-cluster inputs (the Mixer use case), the former when a reproducible
sequence is consumed downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(key_cols: list[str | Column], seed: int = 42) -> Column:
    """md5(key || seed) — the permutation's sort key (cross-engine twin:
    DuckDB md5 of the same concat)."""
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in key_cols]
    return F.md5(F.concat_ws("\x1f", *cols, F.lit(str(seed))))


def seeded_shuffle(df: DataFrame, key_cols: list[str], seed: int = 42) -> DataFrame:
    """Rows in a deterministic pseudo-random order; ties (identical keys)
    broken by the key columns themselves for full determinism."""
    return df.orderBy(shuffle_key(key_cols, seed), *key_cols)


def seeded_repartition(df: DataFrame, n: int, key_cols: list[str], seed: int = 42) -> DataFrame:
    """Deterministic seeded spread over ``n`` partitions (Mixer analogue):
    partition = hash(key, seed) — stable across runs, unlike rand()."""
    return df.repartition(n, F.xxhash64(*key_cols, F.lit(seed)))
