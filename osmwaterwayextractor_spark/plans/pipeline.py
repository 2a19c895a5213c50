"""End-to-end waterway-graph pipeline (reference build_graph :1433-1523).

``WaterwayEngine.build_graph(docs_df)`` runs:

  parse (S1) → assemble (J1) → clean+simplify (P2-P4, F4) →
  intersections (J5/F5/W1) → junctions (A1-A4) → snap map (J3/A7/A5) →
  edges (J2/W2/F1/F3/F7-F9/P5) → nodes (A6) → tiles (F14/A10)

Each stage can checkpoint to parquet keyed by the stage's parameter-subset
hash (reference cache semantics :1441-1515, :3048-3055) with per-partition
lineage manifests; reruns skip completed stages (plans.checkpoint).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..operators.assemble import assemble_geometries
from ..operators.cluster import snap_map
from ..operators.edges import (
    build_edges,
    build_nodes,
    clustering_domain_fast,
    endpoint_junction_points,
)
from ..operators.geometry_ops import (
    clean_and_simplify,
    detect_intersections,
    insert_intersections,
)
from ..operators.tiles import channel_density_rollup, with_edge_cells, with_node_cells
from ..sources.parse import parse_nodes, parse_ways


@dataclass
class GraphResult:
    nodes: DataFrame
    edges: DataFrame
    tile_rollup: DataFrame


class WaterwayEngine:
    def __init__(self, config: Optional[EngineConfig] = None, checkpointer=None):
        self.config = config or EngineConfig()
        self.checkpointer = checkpointer

    def _stage(self, name: str, df: DataFrame) -> DataFrame:
        import os
        import time

        t0 = time.time()
        if self.checkpointer is not None:
            out = self.checkpointer.materialize(name, self.config, df)
        else:
            # Eager localCheckpoint, not cache(): the pipeline's logical plan
            # is deep, and every downstream action would re-analyze/optimize
            # the whole accumulated tree on the driver (seconds per action —
            # the dominant serial cost at high core counts). Checkpointing
            # truncates lineage to a block scan while keeping data in
            # executor storage.
            out = df.localCheckpoint(eager=True)
        if os.environ.get("OSMWWE_STAGE_TIMING"):
            print(f"[stage] {name}: {time.time() - t0:.2f}s", flush=True)
        return out

    def build_graph(self, docs: DataFrame, spark: Optional[SparkSession] = None) -> GraphResult:
        spark = spark or docs.sparkSession
        cfg = self.config

        # parse outputs materialize once (assembly consumes ways twice and
        # nodes once; recomputing the span explode+JSON parse per consumer
        # was the dominant cost of the assembled stage)
        nodes_raw = self._stage("parsed", parse_nodes(docs, cfg))
        if cfg.local_first_assembly:
            from ..operators.assemble_local import assemble_local_first

            assembled = self._stage("assembled", assemble_local_first(docs, nodes_raw, cfg))
        else:
            ways_raw = self._stage("parsed_ways", parse_ways(docs, cfg))
            assembled = self._stage("assembled", assemble_geometries(ways_raw, nodes_raw, cfg))
        simplified = self._stage("simplified", clean_and_simplify(assembled, cfg))

        if cfg.enable_intersection_detection:
            points = detect_intersections(simplified, cfg).cache()
            # (<2 ways trivially yields no intersection points — reference's
            # early-out :1820 is subsumed; skip the insert stage when empty)
            if points.isEmpty():
                intersected = simplified
            else:
                intersected = self._stage(
                    "intersections", insert_intersections(simplified, points, cfg)
                )
        else:
            intersected = simplified

        domain = clustering_domain_fast(intersected)
        snap = self._stage("clustering", snap_map(domain, cfg, spark))

        edges = self._stage("edges", build_edges(intersected, snap, cfg))
        nodes = self._stage("nodes", build_nodes(snap, cfg))

        nodes_t = with_node_cells(nodes, cfg)
        edges_t = with_edge_cells(edges, cfg)
        rollup = self._stage("tiles", channel_density_rollup(edges_t, cfg))
        return GraphResult(nodes=nodes_t, edges=edges_t, tile_rollup=rollup)


def spark_session(
    app: str = "osmwwe",
    master: str = "local[*]",
    shuffle_partitions: int = 32,
    extra: Optional[dict] = None,
) -> SparkSession:
    """Tuned session: AQE (coalesce + skew join), Arrow enabled."""
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
