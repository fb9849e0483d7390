"""Sharded .xz / .bz2 / plain JSONL source (SURVEY §2.1 row S1).

The reference scans directories of ``part-*.xz`` JSONL shards and keeps shard
``num`` iff ``num % mod == remainder`` (src/tokenization/pipeline/loaders/
damuel.py:15-71, remainder_mod=128 in configs/general.gin:4). Spark reads
.bz2/.gz JSONL natively but ships NO xz codec, so this source distributes the
FILE LIST as a DataFrame and decompresses/parses inside mapInPandas with
stdlib lzma — each task streams whole shards, so the work parallelizes by
file exactly like the reference's pool-of-128 sharding (and like Spark's own
non-splittable-codec handling of .bz2 archives).

Scale notes: one task per shard (shards are the unit of parallelism at
10^12-file scale too); the mod/remainder filter prunes BEFORE any IO; parsing
is per-batch orjson/json, never per-row Python inside Spark rows.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SHARD_NUM = re.compile(r"(\d+)(?:\.[a-z0-9]+)?$")

try:  # orjson is the reference's parser (damuel.py:15); fall back to stdlib
    import orjson as _json
except ImportError:  # pragma: no cover
    import json as _json  # type: ignore[no-redef]


def shard_number(path: str) -> int | None:
    """part-00042.xz → 42 (the reference's file_number, damuel.py:28-43)."""
    m = _SHARD_NUM.search(os.path.basename(path))
    return int(m.group(1)) if m else None


def list_shards(
    root: str, mod: int | None = None, remainder: int = 0, pattern: str = "part-"
) -> list[str]:
    """Sorted shard paths under ``root``, mod/remainder-filtered by shard
    number — pruning happens before any byte is read."""
    out = []
    for name in sorted(os.listdir(root)):
        if not name.startswith(pattern):
            continue
        num = shard_number(name)
        if mod is not None and (num is None or num % mod != remainder):
            continue
        out.append(os.path.join(root, name))
    return out


def read_jsonl_shards(
    spark: SparkSession,
    root: str,
    schema: StructType,
    mod: int | None = None,
    remainder: int = 0,
    pattern: str = "part-",
) -> DataFrame:
    """DataFrame over sharded JSONL (.xz/.bz2/plain), schema-projected.

    ``schema`` names the top-level JSON keys to extract (missing keys → null,
    like the reference's optional-key handling, damuel.py:166-178). Values are
    returned as parsed by JSON and cast by Arrow to the declared types.
    """
    files = list_shards(root, mod=mod, remainder=remainder, pattern=pattern)
    fields = [f.name for f in schema.fields]
    if not files:
        return spark.createDataFrame([], schema)
    fdf = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        len(files)
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2
        import lzma

        for pdf in batches:
            for path in pdf["path"]:
                if path.endswith(".xz"):
                    fh = lzma.open(path, "rb")
                elif path.endswith(".bz2"):
                    fh = bz2.open(path, "rb")
                else:
                    fh = open(path, "rb")
                with fh:
                    rows = [_json.loads(line) for line in fh if line.strip()]
                yield pd.DataFrame(
                    {name: [r.get(name) for r in rows] for name in fields}
                )

    return fdf.mapInPandas(_read, schema)
