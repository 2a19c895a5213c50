"""A8/A9 — QA metrics (reference _generate_qa_metrics :2662-2701).

One aggregation pass over edges; percentiles use Spark's exact ``percentile``
(interpolating — the reference uses sorted-index selection, a documented
report-only deviation). Width-parse rates and counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig


def qa_metrics(nodes: DataFrame, edges: DataFrame, config: EngineConfig) -> dict:
    agg = edges.agg(
        F.count("*").alias("final_edges"),
        F.mean("length_m").alias("mean_edge_length_m"),
        F.expr("percentile(length_m, 0.05)").alias("edge_length_p5_m"),
        F.expr("percentile(length_m, 0.5)").alias("edge_length_p50_m"),
        F.expr("percentile(length_m, 0.95)").alias("edge_length_p95_m"),
        F.expr("percentile(length_m, 0.99)").alias("edge_length_p99_m"),
        F.sum(F.when(F.col("width_raw") != "", 1).otherwise(0)).alias("edges_with_width_raw"),
        F.sum(F.when(F.col("width_m").isNotNull(), 1).otherwise(0)).alias("edges_with_width_m"),
    ).collect()[0]
    n_nodes = nodes.count()
    d = agg.asDict()
    n_edges = d["final_edges"] or 0
    with_raw = d["edges_with_width_raw"] or 0
    with_m = d["edges_with_width_m"] or 0
    d.update(
        {
            "final_nodes": n_nodes,
            "pct_edges_with_width_raw": (with_raw / n_edges * 100) if n_edges else 0,
            "pct_edges_with_width_m": (with_m / n_edges * 100) if n_edges else 0,
            "width_parse_success_rate": (with_m / with_raw * 100) if with_raw else 0,
            "snap_tolerance_m": config.snap_tolerance_m,
            "min_fragment_length_m": config.min_fragment_length_m,
            "coordinate_precision": config.coordinate_precision,
        }
    )
    return d


def displacement_metrics(snap: DataFrame, config: EngineConfig) -> dict:
    """Cluster displacement stats (reference _update_cluster_metrics
    :1345-1365): p50/p95/p99 of snap displacements, counts of moved points
    and of points beyond the warning threshold."""
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    from ..functions.geodesy import geodesic_m

    @pandas_udf("double")
    def _disp(lat: pd.Series, lon: pd.Series, slat: pd.Series, slon: pd.Series) -> pd.Series:
        return pd.Series(
            geodesic_m(
                lat.to_numpy(dtype=float), lon.to_numpy(dtype=float),
                slat.to_numpy(dtype=float), slon.to_numpy(dtype=float),
            )
        )

    moved = snap.where(
        (F.col("lat") != F.col("snap_lat")) | (F.col("lon") != F.col("snap_lon"))
    ).withColumn("disp_m", _disp("lat", "lon", "snap_lat", "snap_lon"))
    warn = config.snap_tolerance_m * config.warning_displacement_multiplier
    agg = moved.agg(
        F.count("*").alias("moved_points"),
        F.expr("percentile(disp_m, 0.5)").alias("displacement_p50_m"),
        F.expr("percentile(disp_m, 0.95)").alias("displacement_p95_m"),
        F.expr("percentile(disp_m, 0.99)").alias("displacement_p99_m"),
        F.max("disp_m").alias("displacement_max_m"),
        F.sum(F.when(F.col("disp_m") > warn, 1).otherwise(0)).alias("points_above_warning"),
    ).collect()[0]
    d = agg.asDict()
    d["total_snap_points"] = snap.count()
    return d


def waterway_type_histogram(edges: DataFrame) -> DataFrame:
    """A9 (:1375-1387): waterway-type counts, descending."""
    return (
        edges.groupBy(F.col("type").alias("waterway_type"))
        .agg(F.count("*").alias("n_edges"))
        .orderBy(F.desc("n_edges"))
    )
