"""Resumable stage checkpoints with lineage columns and counters.

Mirrors the reference's idempotent bash stage guards
(src/scripts/train/all_langs_no_slurm.sh:49-116 — `if [ ! "$(ls -A $DIR)" ]`)
as a durable-table protocol: a stage is skipped iff its output table exists
AND its `_MARKER.json` (row count + schema + run metadata) is present and the
recorded count matches. Each written row carries lineage columns
(stage, run_id, src_partition) per the north_rule.

Backend: Iceberg when `spark.sql.catalog.*` is configured, plain parquet
otherwise (this sandbox ships no Iceberg runtime jar — the protocol is
identical: atomic-rename marker after a successful write).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ("_stage", "_run_id", "_src_partition")


@dataclass
class CheckpointManager:
    root: str
    run_id: str = field(default_factory=lambda: f"run{int(time.time())}")
    fmt: str = "parquet"

    def __post_init__(self) -> None:
        self._last_elapsed: dict[str, float] = {}

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _marker(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._MARKER.json")

    def exists(
        self,
        stage: str,
        spark: SparkSession | None = None,
        fingerprint: str | None = None,
    ) -> bool:
        """A checkpoint is valid iff the marker is complete, its recorded
        fingerprint (config + input identity hash) matches the caller's, and —
        when a session is supplied — the on-disk row count still equals the
        recorded one. A rerun with a different threshold/input therefore
        recomputes instead of silently serving the stale stage (ADVICE r1)."""
        m = self._marker(stage)
        if not os.path.exists(m):
            return False
        with open(m) as f:
            meta = json.load(f)
        if not (os.path.isdir(self._path(stage)) and meta.get("status") == "complete"):
            return False
        if fingerprint is not None and meta.get("fingerprint") != fingerprint:
            return False
        if spark is not None:
            try:
                if self.read(stage, spark).count() != meta.get("rows"):
                    return False
            except Exception:
                return False
        return True

    def write(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        src_partition: str = "all",
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Materialize a stage: add lineage columns, write, record the marker,
        return the re-read DataFrame (fresh lineage ⇒ no upstream recompute)."""
        out = (
            df.withColumn("_stage", F.lit(stage))
            .withColumn("_run_id", F.lit(self.run_id))
            .withColumn("_src_partition", F.lit(src_partition))
        )
        # row count via an Observation piggybacked on the write action itself:
        # the count previously came from a full re-read scan of the written
        # table — one extra pass over EVERY stage's output (at 10M rows that
        # is gigabytes per stage, inside the stage's timed window). observe()
        # aggregates on the data as it flows through the write, costing ~0.
        from pyspark.sql import Observation

        obs = Observation()
        observed = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = observed.write.mode("overwrite").format(self.fmt)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        path = self._path(stage)
        writer.save(path)
        spark = df.sparkSession
        # pin the schema: an empty stage writes no data files, and inference
        # would fail on re-read (degenerate-input contract, FIXTURES.md §7)
        reread = spark.read.format(self.fmt).schema(out.schema).load(path)
        try:
            n = obs.get["rows"]
        except Exception:
            n = reread.count()  # degenerate plans that report no metrics
        tmp = self._marker(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "run_id": self.run_id,
                    "rows": n,
                    "schema": reread.schema.simpleString(),
                    "schema_json": out.schema.json(),
                    "fingerprint": fingerprint,
                    "status": "complete",
                    "written_at": time.time(),
                },
                f,
            )
        os.replace(tmp, self._marker(stage))  # atomic marker commit
        return reread

    def read(self, stage: str, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.fmt)
        marker = self._marker(stage)
        if os.path.exists(marker):
            from pyspark.sql.types import StructType

            with open(marker) as f:
                meta = json.load(f)
            if meta.get("schema_json"):
                reader = reader.schema(StructType.fromJson(json.loads(meta["schema_json"])))
        return reader.load(self._path(stage))

    def get_or_compute(
        self,
        stage: str,
        spark: SparkSession,
        compute,
        partition_by: list[str] | None = None,
        fingerprint: str | None = None,
    ) -> tuple[DataFrame, bool]:
        """Resume protocol: (df, was_resumed). ``compute`` is a thunk returning
        the stage DataFrame; it is not invoked when the checkpoint is valid
        (marker complete + fingerprint match + recorded row count verified)."""
        if self.exists(stage, spark, fingerprint):
            return self.read(stage, spark), True
        t0 = time.time()
        out = self.write(stage, compute(), partition_by=partition_by, fingerprint=fingerprint)
        self._last_elapsed[stage] = time.time() - t0
        # record the stage wall-time in the marker (bench + lineage metrics)
        marker = self._marker(stage)
        with open(marker) as f:
            meta = json.load(f)
        meta["elapsed_sec"] = round(self._last_elapsed[stage], 3)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, marker)
        return out, False

    def counters(self, stage: str) -> dict:
        with open(self._marker(stage)) as f:
            return json.load(f)
