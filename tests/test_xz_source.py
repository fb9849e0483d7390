"""S1 sharded .xz/.bz2 JSONL source: codec handling + mod/remainder pruning
(reference loader tests: tests/tokenization/pipeline/loaders/test_damuel.py:44-70)."""

import bz2
import json
import lzma
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from mel_spark.sources.xz_jsonl import list_shards, read_jsonl_shards, shard_number

SCHEMA = StructType(
    [
        StructField("qid", StringType()),
        StructField("label", StringType()),
        StructField("n", LongType()),
    ]
)


def _write_shards(root):
    os.makedirs(root, exist_ok=True)
    for i, opener in [(0, lzma.open), (1, bz2.open), (2, open)]:
        name = f"part-0000{i}" + {0: ".xz", 1: ".bz2", 2: ""}[i]
        mode = "wt"
        with opener(os.path.join(root, name), mode) as f:
            for j in range(3):
                f.write(json.dumps({"qid": f"Q{i}{j}", "label": f"l{i}", "n": i * 10 + j}) + "\n")


def test_shard_number():
    assert shard_number("part-00042.xz") == 42
    assert shard_number("part-7.bz2") == 7
    assert shard_number("part-3") == 3


def test_reads_all_codecs(spark, tmp_path):
    root = str(tmp_path / "shards")
    _write_shards(root)
    df = read_jsonl_shards(spark, root, SCHEMA)
    rows = {(r["qid"], r["label"], r["n"]) for r in df.collect()}
    assert len(rows) == 9
    assert ("Q00", "l0", 0) in rows and ("Q12", "l1", 12) in rows and ("Q21", "l2", 21) in rows


def test_mod_remainder_pruning(spark, tmp_path):
    root = str(tmp_path / "shards")
    _write_shards(root)
    assert len(list_shards(root, mod=2, remainder=0)) == 2  # shards 0, 2
    df = read_jsonl_shards(spark, root, SCHEMA, mod=2, remainder=1)  # shard 1 only
    assert {r["label"] for r in df.collect()} == {"l1"}


def test_missing_keys_are_null(spark, tmp_path):
    root = str(tmp_path / "s2")
    os.makedirs(root)
    with lzma.open(os.path.join(root, "part-00000.xz"), "wt") as f:
        f.write(json.dumps({"qid": "Q1"}) + "\n")
    row = read_jsonl_shards(spark, root, SCHEMA).collect()[0]
    assert row["qid"] == "Q1" and row["label"] is None and row["n"] is None


def test_empty_dir_yields_empty_df(spark, tmp_path):
    root = str(tmp_path / "empty")
    os.makedirs(root)
    assert read_jsonl_shards(spark, root, SCHEMA).count() == 0
