"""Per-stage wall-time profile of the waterway pipeline at a given core count.

Usage: python scripts/profile_pipeline.py <cores> <n_docs>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

    from bench import build_session

    spark = build_session(cores)
    from pyspark.sql import functions as F

    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.operators.assemble import assemble_geometries
    from osmwaterwayextractor_spark.operators.cluster import snap_map
    from osmwaterwayextractor_spark.operators.edges import (
        build_edges,
        build_nodes,
        clustering_domain,
        endpoint_junction_points,
    )
    from osmwaterwayextractor_spark.operators.geometry_ops import (
        clean_and_simplify,
        detect_intersections,
        insert_intersections,
    )
    from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe
    from osmwaterwayextractor_spark.sources.parse import parse_nodes, parse_ways

    cfg = EngineConfig(filter_waterway_types=False)
    t: dict[str, float] = {}

    def stage(name, df):
        t0 = time.time()
        out = df.cache()
        n = out.count()
        t[name] = round(time.time() - t0, 2)
        print(name, t[name], "rows:", n, flush=True)
        return out

    docs = stage("gen", docs_dataframe(spark, n_docs, DocsGenParams(seed=42, mega_every=200, mega_refs=20000)))
    nodes_raw = stage("parse_nodes", parse_nodes(docs, cfg))
    ways_raw = stage("parse_ways", parse_ways(docs, cfg))
    assembled = stage("assemble", assemble_geometries(ways_raw, nodes_raw, cfg))
    simplified = stage("simplify", clean_and_simplify(assembled, cfg))
    points = stage("detect_intersections", detect_intersections(simplified, cfg))
    intersected = stage("insert_intersections", insert_intersections(simplified, points, cfg))
    endpoints, junctions = endpoint_junction_points(intersected)
    domain = stage("domain", clustering_domain(endpoints, junctions))
    t0 = time.time()
    snap = snap_map(domain, cfg, spark).cache()
    snap.count()
    t["snap_map_cc"] = round(time.time() - t0, 2)
    print("snap_map_cc", t["snap_map_cc"], flush=True)
    edges = stage("edges", build_edges(intersected, snap, cfg))
    nodes = stage("nodes", build_nodes(snap, cfg))
    print(json.dumps({"cores": cores, "n_docs": n_docs, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    main()
