"""Scale-safe dense sequential ids (SURVEY.md W3/W4).

A global ``Window.orderBy(...)`` funnels every row through ONE task — at
10⁹-node scale that task is the straggler that caps the whole pipeline.
``dense_index`` produces the identical dense ordering with the zipWithIndex
pattern expressed in DataFrame ops: range-repartition on the order key, sort
within partitions, then add each partition's cumulative row-count offset
(broadcast) to the within-partition row_number. The only single-partition
window runs over #shuffle-partitions offset rows, never the data.

Reference parity: the reference emits ids in pandas arrival order
(osm_waterway_extractor.py:2784-2839, :2912-2958); this engine documents a
deterministic sort order instead (sinks/writers.py module docstring) — the
ids are dense and stable either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_index(
    df: DataFrame,
    order_col: str,
    out_col: str,
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = dense sequential long ids (start, start+1, ...)
    assigned in ascending ``order_col`` order, with no global window.

    ``order_col`` must be unique (node/edge ids are). The sorted+tagged frame
    is lazily localCheckpoint'ed so the offset aggregation and the final join
    see the SAME physical partitioning (repartitionByRange boundaries come
    from sampling and must not be recomputed independently).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    tagged = (
        df.repartitionByRange(n_part, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = tagged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long")
    )
    w_in = Window.partitionBy("_pid").orderBy(order_col)
    return (
        tagged.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(
            out_col,
            (F.row_number().over(w_in).cast("long") + F.col("_off") - 1 + start),
        )
        .drop("_pid", "_off")
    )
