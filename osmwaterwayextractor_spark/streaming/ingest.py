"""Structured-Streaming ingest of interleaved documents.

The reference is pure batch (SURVEY.md §2.8) and the north rule asks for
checkpoint-resumable BATCH, which plans/checkpoint.py provides. This module
adds the natural streaming front-door anyway: a file-source stream of docs
parquet → the same parse operators → per-microbatch appends of nodes/ways,
with Spark's own streaming checkpoint giving exactly-once file-source
semantics. The batch pipeline then runs over the accumulated tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig
from ..sources.docsgen import DOC_SCHEMA_DDL
from ..sources.parse import parse_nodes, parse_ways


def stream_parse_docs(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
) -> tuple[StreamingQuery, StreamingQuery]:
    """Watch ``docs_dir`` for doc parquet files; append parsed nodes/ways."""
    config = config or EngineConfig()
    docs = spark.readStream.schema(DOC_SCHEMA_DDL).parquet(docs_dir)
    nodes_q = (
        parse_nodes(docs, config)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/nodes")
        .option("checkpointLocation", f"{checkpoint_dir}/nodes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    ways_q = (
        parse_ways(docs, config)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/ways")
        .option("checkpointLocation", f"{checkpoint_dir}/ways")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return nodes_q, ways_q
