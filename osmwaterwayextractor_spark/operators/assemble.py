"""J1 — geometry assembly: way node-refs ⋈ node coordinates.

The reference resolves refs through osmium's in-memory location index during
the scan (osm_waterway_extractor.py:2715, hidden C++); at cluster scale this
is a distributed equi-join with two explicit skew defenses (SURVEY.md J1,
north_star "salted hash joins ... explicit ref-list explode +
repartitioning"):

1. **ref-list explode**: every (way, pos, node_id) becomes its own row, so a
   mega-way with 10^5 refs is 10^5 independent join rows spread across
   partitions — no single task owns a whole mega-way during the probe.
2. **two-level reassembly**: rebuilding ordered coordinate arrays is a
   groupBy(way_id) + collect_list; a mega-way would funnel into one reducer
   row. We first collect fixed-size CHUNKS on (way_id, pos / chunk_size),
   then concatenate the few chunk rows per way — bounding every reducer's
   row size by chunk_size regardless of way length.

Ways with ANY unresolved ref are dropped whole (the osmium location index
throws for missing locations and the way never materializes).

AQE (skewJoin + coalescePartitions) remains on for residual hot node ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig


def assemble_geometries(
    ways: DataFrame, nodes: DataFrame, config: EngineConfig
) -> DataFrame:
    """(way_id, refs, tags) ⋈ (node_id, lat, lon) → (way_id, lats, lons, tags).

    Output arrays are ordered by ref position; ways with missing refs or
    fewer than 2 resolved coordinates are dropped.
    """
    chunk = config.assemble_chunk_size
    refs = ways.select(
        "way_id",
        F.size("refs").alias("n_refs"),
        F.posexplode("refs").alias("pos", "node_id"),
    )
    resolved = refs.join(nodes, "node_id", "inner").select(
        "way_id", "n_refs", "pos", "lat", "lon"
    )

    def _finish(pts_df):
        return (
            pts_df.where(F.col("n_resolved") == F.col("n_refs"))  # drop partial ways
            .select(
                "way_id",
                F.col("pts.lat").alias("lats"),
                F.col("pts.lon").alias("lons"),
            )
            .where(F.size("lats") >= 2)
        )

    # ordinary ways: single groupBy + ordered collect
    small = (
        resolved.where(F.col("n_refs") <= chunk)
        .groupBy("way_id")
        .agg(
            F.first("n_refs").alias("n_refs"),
            F.count("*").alias("n_resolved"),
            F.sort_array(F.collect_list(F.struct("pos", "lat", "lon"))).alias("pts"),
        )
    )
    # mega-ways: two-level chunked reassembly bounds reducer row size
    big_chunks = (
        resolved.where(F.col("n_refs") > chunk)
        .groupBy("way_id", (F.col("pos") / chunk).cast("long").alias("chunk_id"))
        .agg(
            F.first("n_refs").alias("n_refs"),
            F.count("*").alias("n_in_chunk"),
            F.sort_array(F.collect_list(F.struct("pos", "lat", "lon"))).alias("pts"),
        )
    )
    big = (
        big_chunks.groupBy("way_id")
        .agg(
            F.first("n_refs").alias("n_refs"),
            F.sum("n_in_chunk").alias("n_resolved"),
            F.sort_array(F.collect_list(F.struct("chunk_id", "pts"))).alias("chunks"),
        )
        .select("way_id", "n_refs", "n_resolved", F.flatten("chunks.pts").alias("pts"))
    )
    geoms = _finish(small).unionByName(_finish(big))
    return geoms.join(ways.select("way_id", "tags"), "way_id", "inner")
