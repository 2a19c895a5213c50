"""Streaming incremental tile rollup — a maintained materialized aggregate.

Turns the streaming front door (ingest.py) into a LIVE per-cell density
table: doc micro-batches → span parse → tile-cell assignment → a custom
stateful operator (``applyInPandasWithState``) that keeps per-cell running
(node_count, batch_count) state across micro-batches and emits only the
cells UPDATED in each batch (outputMode=update). State lives in Spark's
streaming state store, so a restart with the same checkpoint resumes the
running totals exactly-once over the file source.

The reference is batch-only; this is the graft's §2.8 streaming analog of
the A10 rollup (docs/ROUND3_PLAN.md, VERDICT r2 next-round item 10). The
built-in ``groupBy(cell).count()`` streaming agg could maintain the count
alone; the custom operator exists to carry operator-defined state shapes
(here: count + batches-touched; the pattern extends to per-cell sketches)
that built-in aggs can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig
from ..functions.tiling import H3_RES_TO_LEVEL
from ..operators.tiles import cell_col
from ..sources.docsgen import DOC_SCHEMA_DDL
from ..sources.parse import parse_nodes


def _cell_update_fn(key, pdf_iter, state):
    """Per-cell state update: (node_count, batch_count) running totals."""
    import pandas as pd

    if state.exists:
        node_count, batch_count = state.get
    else:
        node_count, batch_count = 0, 0
    added = 0
    for pdf in pdf_iter:
        added += len(pdf)
    node_count += added
    batch_count += 1
    state.update((node_count, batch_count))
    yield pd.DataFrame(
        {
            "cell": [key[0]],
            "node_count": [node_count],
            "batch_count": [batch_count],
        }
    )


def streaming_cell_updates(
    docs_stream: DataFrame, config: EngineConfig | None = None, res: int = 7
) -> DataFrame:
    """docs stream → per-batch updated (cell, node_count, batch_count) rows."""
    config = config or EngineConfig()
    level = H3_RES_TO_LEVEL[res]
    cells = parse_nodes(docs_stream, config).select(
        cell_col(F.col("lat"), F.col("lon"), level).alias("cell")
    )
    return cells.groupBy("cell").applyInPandasWithState(
        _cell_update_fn,
        outputStructType="cell long, node_count long, batch_count long",
        stateStructType="node_count long, batch_count long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stream_tile_rollup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    res: int = 7,
) -> StreamingQuery:
    """Watch ``docs_dir``; maintain the live rollup as a parquet upsert log.

    Update-mode emits each batch's changed cells with their CUMULATIVE
    totals; ``foreachBatch`` appends them with the batch id, so the current
    rollup is latest-batch-per-cell (``read_live_rollup``) — the same shape
    an Iceberg MERGE-per-cell sink would take in production. foreachBatch
    is checkpoint-recoverable (the memory sink is not), so a restarted
    query resumes the per-cell state store exactly-once over the file
    source. ``trigger(availableNow)`` drains pending files then stops."""
    docs = spark.readStream.schema(DOC_SCHEMA_DDL).parquet(docs_dir)
    updates = streaming_cell_updates(docs, config, res)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        updates.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def read_live_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Current rollup: the latest emitted row per cell from the upsert log."""
    from pyspark.sql.window import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("cell").orderBy(F.desc("_batch"))
    return (
        log.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("cell", "node_count", "batch_count")
    )
