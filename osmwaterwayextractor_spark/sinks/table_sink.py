"""Iceberg-shaped table sink seam (README "Iceberg deviation").

The final nodes/edges land through a ``writeTo``-shaped interface so a real
Iceberg catalog drops in as ONE constructor swap — no operator, plan, or
checkpoint logic touches the storage format directly:

- ``ParquetTableSink`` — what this sandbox runs: Iceberg-STYLE layout on
  plain parquet (``<col>=<val>/part-*.parquet`` Hive partitioning), with
  partition listing/pruning implemented on the filesystem. Fully tested.
- ``IcebergTableSink`` — the production implementation: the same four
  methods expressed as ``df.writeTo(table)`` / catalog reads. It cannot run
  here (no iceberg-spark jar or catalog service in the container), so it is
  code-complete but unexercised; its partition recovery comes from Iceberg
  snapshots/metadata tables rather than directory listings.

``plans.checkpoint.Checkpointer.materialize_partitioned`` accepts any object
with this surface via its ``sink`` parameter.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class ParquetTableSink:
    """Partitioned-parquet implementation of the table-sink surface."""

    def __init__(self, location: str):
        self.location = location

    def append(self, df: DataFrame, partition_col: Optional[str] = None) -> None:
        w = df.write.mode("append")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(self.location)

    def overwrite(self, df: DataFrame, partition_col: Optional[str] = None) -> None:
        w = df.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(self.location)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.location)

    def list_partitions(self, partition_col: str) -> list[str]:
        """Partition VALUES currently present (Hive dir names)."""
        prefix = f"{partition_col}="
        if not os.path.isdir(self.location):
            return []
        return sorted(
            n[len(prefix):] for n in os.listdir(self.location) if n.startswith(prefix)
        )

    def drop_partition(self, partition_col: str, value: str) -> None:
        shutil.rmtree(
            os.path.join(self.location, f"{partition_col}={value}"), ignore_errors=True
        )


class IcebergTableSink:
    """Iceberg catalog implementation — same surface, ``writeTo`` verbs.

    Requires a configured Iceberg catalog (spark.sql.catalog.* + the
    iceberg-spark runtime jar), neither of which ships in this sandbox; on a
    real cluster this class replaces ParquetTableSink with no other change.
    Partition bookkeeping uses the ``<table>.partitions`` metadata table and
    ``DELETE WHERE`` — Iceberg's snapshot log supersedes the sidecar-based
    crash recovery the parquet sink needs.
    """

    def __init__(self, table: str):
        self.table = table

    def append(self, df: DataFrame, partition_col: Optional[str] = None) -> None:
        # partitioning is a property of the Iceberg table (PARTITIONED BY at
        # create time), not of the write
        df.writeTo(self.table).append()

    def overwrite(self, df: DataFrame, partition_col: Optional[str] = None) -> None:
        df.writeTo(self.table).overwritePartitions()

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.table(self.table)

    def list_partitions(self, partition_col: str) -> list[str]:
        spark = SparkSession.getActiveSession()
        rows = spark.sql(
            f"SELECT partition.{partition_col} AS v FROM {self.table}.partitions"
        ).collect()
        return sorted(str(r["v"]) for r in rows)

    def drop_partition(self, partition_col: str, value: str) -> None:
        spark = SparkSession.getActiveSession()
        spark.sql(f"DELETE FROM {self.table} WHERE {partition_col} = '{value}'")
