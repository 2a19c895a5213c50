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
from ..operators.tiles import (
    channel_density_rollup,
    with_edge_cells,
    with_edge_covering,
    with_node_cells,
)
from ..sources.parse import parse_nodes


@dataclass
class GraphResult:
    nodes: DataFrame
    edges: DataFrame
    tile_rollup: DataFrame


class WaterwayEngine:
    def __init__(self, config: Optional[EngineConfig] = None, checkpointer=None):
        self.config = config or EngineConfig()
        self.checkpointer = checkpointer
        self._scratch: Optional[str] = None

    def _stage(self, name: str, df: DataFrame) -> DataFrame:
        import os
        import time

        t0 = time.time()
        if self.checkpointer is not None:
            out = self.checkpointer.materialize(name, self.config, df)
        else:
            out = self._ephemeral_stage(name, df)
        if os.environ.get("OSMWWE_STAGE_TIMING"):
            print(f"[stage] {name}: {time.time() - t0:.2f}s", flush=True)
        return out

    def _ephemeral_stage(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize a stage boundary without the durable Checkpointer.

        Plan-truncation is mandatory either way: the pipeline's logical plan
        is deep, and every downstream action would re-analyze/optimize the
        whole accumulated tree on the driver (seconds per action).

        Default is a snappy-parquet round-trip in a scratch dir (tmpfs when
        spark.local.dir points there): columnar, serialized, OFF the GC's
        live set. ``localCheckpoint`` (OSMWWE_STAGE_MODE=localckpt) keeps
        every stage's partitions as DESERIALIZED row objects in executor
        storage — measured on the 100k-doc pipeline, the accumulated live
        set inflates JVM GC to ~470 task-seconds per run and destroys
        core-count scaling."""
        import os
        import uuid

        mode = os.environ.get("OSMWWE_STAGE_MODE", "parquet")
        if mode == "localckpt":
            return df.localCheckpoint(eager=True)
        spark = df.sparkSession
        if self._scratch is None:
            import atexit
            import shutil

            base = spark.conf.get("spark.local.dir", "/tmp")
            self._scratch = os.path.join(
                base.split(",")[0], f"osmwwe-stages-{uuid.uuid4().hex[:8]}"
            )
            # scratch may live on tmpfs (RAM): reclaim it at process exit
            atexit.register(shutil.rmtree, self._scratch, ignore_errors=True)
        path = os.path.join(self._scratch, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _stages_concurrent(self, named: list[tuple[str, DataFrame]]) -> list[DataFrame]:
        """Materialize independent stages from concurrent driver threads so
        their Spark jobs overlap (the round-1 pipeline ran ~40 jobs strictly
        serially — the dominant anti-scaling cost). The durable-checkpoint
        path stays serial: resume semantics over one manifest dir are not
        worth racing."""
        if self.checkpointer is not None or len(named) == 1:
            return [self._stage(n, df) for n, df in named]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(len(named)) as pool:
            futs = [pool.submit(self._stage, n, df) for n, df in named]
            return [f.result() for f in futs]

    def build_graph(self, docs: DataFrame, spark: Optional[SparkSession] = None) -> GraphResult:
        spark = spark or docs.sparkSession
        cfg = self.config

        # ONE span scan parses nodes AND ways (union schema); it materializes
        # once and the assembly's three consumers (refs, tags, node coords)
        # read it back as cheap checkpoint-scan filters.
        if cfg.local_first_assembly:
            from ..operators.assemble_local import assemble_local_first

            nodes_raw = self._stage("parsed", parse_nodes(docs, cfg))
            assembled = assemble_local_first(docs, nodes_raw, cfg)
        else:
            from ..sources.parse import nodes_from_parsed, parse_osm, ways_from_parsed

            parsed = self._stage("parsed", parse_osm(docs, cfg))
            assembled = assemble_geometries(
                ways_from_parsed(parsed, cfg), nodes_from_parsed(parsed), cfg
            )
        # clean+simplify is a narrow Arrow pass — fused into the assembly job
        simplified = self._stage("simplified", clean_and_simplify(assembled, cfg))

        if cfg.enable_intersection_detection:
            # detect feeds insert lazily: insert's left join passes ways with
            # no candidate points through untouched, so the empty-point case
            # needs no isEmpty() driver probe — one materialization total
            points = detect_intersections(simplified, cfg)
            intersected = self._stage(
                "intersections", insert_intersections(simplified, points, cfg)
            )
        else:
            intersected = simplified

        # the snap domain is consumed 4× inside snap_map (max-lat agg, both
        # sides of the ε-pair join, the final mapping join) — materialize it
        # once instead of recomputing the vertex groupBy per consumer
        domain = self._stage("clustering_domain", clustering_domain_fast(intersected))
        snap = self._stage("clustering", snap_map(domain, cfg, spark))

        # edges and nodes are independent given (intersected, snap) — overlap
        edges, nodes = self._stages_concurrent(
            [("edges", build_edges(intersected, snap, cfg)), ("nodes", build_nodes(snap, cfg))]
        )

        nodes_t = with_node_cells(nodes, cfg)
        edges_t = with_edge_covering(with_edge_cells(edges, cfg), cfg)
        if self.checkpointer is not None:
            # Iceberg-style final layout: nodes/edges land partitioned by
            # their coarsest tile cell, resumable at the tile-partition level
            # (north_rule; plans.checkpoint.materialize_partitioned skips
            # already-written <cell>= directories on re-run)
            pcol = f"cell_r{min(cfg.tile_resolutions)}"
            nodes_t = self.checkpointer.materialize_partitioned(
                "nodes_tiled", cfg, nodes_t, pcol
            )
            edges_t = self.checkpointer.materialize_partitioned(
                "edges_tiled", cfg, edges_t, pcol
            )
        # rollup stays lazy: one map-combinable groupBy over checkpointed
        # edges — a barrier here would serialize the tail for no reuse gain
        rollup = channel_density_rollup(edges_t, cfg)
        if self.checkpointer is not None:
            rollup = self._stage("tiles", rollup)
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
