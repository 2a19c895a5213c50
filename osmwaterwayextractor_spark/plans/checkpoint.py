"""Parameter-hashed checkpoints with per-partition lineage and resume.

Spark-native analog of the reference's step caches
(osm_waterway_extractor.py:1441-1515, get_intermediate_cache_filename
:3048-3055, param-subset hashes :239-334):

- stage path = ``{root}/{stage}_{config.step_param_hash(stage)}`` — changing
  a late-stage knob never invalidates earlier stages;
- every materialization writes a ``lineage/part-*.json`` sidecar per task
  partition with (partition id, rows, seconds, rows/sec) — the north-rule's
  per-partition lineage + throughput metrics;
- ``materialize`` resumes whole stages (valid ``_SUCCESS`` → read back,
  recorded as skipped);
- ``materialize_partitioned`` resumes at the PARTITION level for
  cell-partitioned outputs (tile partitions): existing ``<col>=<value>``
  directories are skipped and only missing partitions are computed and
  appended — checkpoint-resume at tile-partition granularity.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig


def _with_lineage_sidecar(df: DataFrame, lineage_dir: str, run_id: str) -> DataFrame:
    """Pass-through mapInPandas that records per-partition lineage on exit."""
    os.makedirs(lineage_dir, exist_ok=True)

    def passthrough(batches):
        from pyspark import TaskContext

        t0 = time.time()
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            yield pdf
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        secs = max(time.time() - t0, 1e-9)
        rec = {
            "run_id": run_id,
            "partition": pid,
            "rows": rows,
            "seconds": secs,
            "rows_per_sec": rows / secs,
        }
        tmp = os.path.join(lineage_dir, f".part-{pid}-{attempt}.json.tmp")
        final = os.path.join(lineage_dir, f"part-{pid}-{attempt}.json")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, final)

    return df.mapInPandas(passthrough, schema=df.schema)


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, resume: bool = True):
        self.spark = spark
        self.root = root
        self.resume = resume
        self.events: list[dict] = []  # (stage, action) log for tests/manifest

    def _stage_dir(self, stage: str, config: EngineConfig) -> str:
        return os.path.join(self.root, f"{stage}_{config.step_param_hash(stage)}")

    def materialize(self, stage: str, config: EngineConfig, df: DataFrame) -> DataFrame:
        sdir = self._stage_dir(stage, config)
        data_dir = os.path.join(sdir, "data")
        if self.resume and os.path.exists(os.path.join(data_dir, "_SUCCESS")):
            self.events.append({"stage": stage, "action": "resumed"})
            return self.spark.read.parquet(data_dir)
        run_id = uuid.uuid4().hex[:12]
        t0 = time.time()
        wrapped = _with_lineage_sidecar(df, os.path.join(sdir, "lineage"), run_id)
        wrapped.write.mode("overwrite").parquet(data_dir)
        self.events.append(
            {"stage": stage, "action": "computed", "seconds": time.time() - t0, "run_id": run_id}
        )
        return self.spark.read.parquet(data_dir)

    def materialize_partitioned(
        self,
        stage: str,
        config: EngineConfig,
        df: DataFrame,
        partition_col: str,
    ) -> DataFrame:
        """Tile-partition-level resume: skip <col>=<val> dirs already written."""
        sdir = self._stage_dir(stage, config)
        data_dir = os.path.join(sdir, "data")
        done_flag = os.path.join(sdir, "_STAGE_DONE")
        if self.resume and os.path.exists(done_flag):
            self.events.append({"stage": stage, "action": "resumed"})
            return self.spark.read.parquet(data_dir)

        existing: set[str] = set()
        if self.resume and os.path.isdir(data_dir):
            for name in os.listdir(data_dir):
                if name.startswith(f"{partition_col}="):
                    existing.add(name.split("=", 1)[1])
        pending = df
        if existing:
            vals = [v for v in existing]
            pending = df.where(~F.col(partition_col).cast("string").isin(vals))
        run_id = uuid.uuid4().hex[:12]
        t0 = time.time()
        wrapped = _with_lineage_sidecar(pending, os.path.join(sdir, "lineage"), run_id)
        (
            wrapped.write.mode("append")
            .partitionBy(partition_col)
            .parquet(data_dir)
        )
        with open(done_flag, "w") as f:
            f.write(run_id)
        self.events.append(
            {
                "stage": stage,
                "action": "computed",
                "skipped_partitions": len(existing),
                "seconds": time.time() - t0,
                "run_id": run_id,
            }
        )
        return self.spark.read.parquet(data_dir)

    def lineage(self, stage: str, config: EngineConfig) -> list[dict]:
        ldir = os.path.join(self._stage_dir(stage, config), "lineage")
        out = []
        if os.path.isdir(ldir):
            for name in sorted(os.listdir(ldir)):
                if name.endswith(".json"):
                    with open(os.path.join(ldir, name)) as f:
                        out.append(json.load(f))
        return out
