"""Output sinks S3-S8 (reference OutputManager, osm_waterway_extractor.py:2747-2963).

All sinks take the engine's internal frames (edges with ``lats``/``lons``
double arrays) and are ordinary DataFrame writers — distributed, codegen'd.
The legacy single-file variants (GeoJSON, JSON-GZ) stream through
``toLocalIterator()`` — one partition on the driver at a time, never a
collected list — so even those paths are file-size bound, not driver-memory
bound. Only the (small) JSON manifests are built driver-side.

Deviations from the reference, documented:
- CSV serializes ``coordinates`` as compact JSON ``[[lat,lon],...]`` rather
  than a Python-repr string (:2858-2876 uses pandas' default str()).
- JSON-GZ (S6) and mobile (S7) positional/sequential ids use a deterministic
  sort (node id / edge id) + row_number instead of arrival order — stable and
  dense, SURVEY.md §7 hard-part 3.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_with_coord_structs(edges: DataFrame) -> DataFrame:
    """Public edge schema (FIXTURES.md F-C): array<struct<lat,lon>>."""
    return edges.withColumn(
        "coordinates",
        F.arrays_zip(F.col("lats").alias("lat"), F.col("lons").alias("lon")),
    ).drop("lats", "lons")


def save_parquet(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """S3 (:2841-2856): snappy parquet."""
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes.parquet"))
    edges_with_coord_structs(edges).write.mode("overwrite").parquet(
        os.path.join(out_dir, "edges.parquet")
    )


def save_csv(nodes: DataFrame, edges: DataFrame, out_dir: str, compress: bool = True) -> None:
    """S4 (:2858-2876): csv(.gz); nested columns JSON-encoded."""
    opts = {"header": "true"}
    if compress:
        opts["compression"] = "gzip"
    nodes.write.mode("overwrite").options(**opts).csv(os.path.join(out_dir, "nodes.csv"))
    flat = edges.withColumn(
        "coordinates",
        F.to_json(F.arrays_zip(F.col("lats").alias("lat"), F.col("lons").alias("lon"))),
    ).drop("lats", "lons")
    # CSV can't carry nested types — JSON-encode any remaining array column
    # (e.g. the per-edge cell covering)
    for fld in flat.schema.fields:
        if not fld.dataType.typeName() in ("string", "long", "integer", "double", "float", "boolean"):
            flat = flat.withColumn(fld.name, F.to_json(F.col(fld.name)))
    flat.write.mode("overwrite").options(**opts).csv(os.path.join(out_dir, "edges.csv"))


def geojson_features(edges: DataFrame) -> DataFrame:
    """S5 (:2878-2910): one GeoJSON Feature per edge, (lat,lon)→(lon,lat)
    flip in the sink only. Distributed: one JSON text column."""
    geom = F.struct(
        F.lit("LineString").alias("type"),
        F.zip_with("lons", "lats", lambda lon, lat: F.array(lon, lat)).alias("coordinates"),
    )
    props = F.struct(
        F.col("id"), F.col("from_node_id"), F.col("to_node_id"),
        F.col("length_m"), F.col("name"), F.col("type").alias("waterway_type"),
        F.col("width_m"), F.col("original_way_id"),
    )
    feature = F.struct(F.lit("Feature").alias("type"), geom.alias("geometry"), props.alias("properties"))
    return edges.select(F.to_json(feature).alias("feature_json"))


def save_geojson(edges: DataFrame, out_path: str, single_file_limit: int = 1_000_000) -> None:
    """Single-file FeatureCollection (reference format). The driver STREAMS
    features via ``toLocalIterator()`` — one partition resident at a time,
    never the materialized feature list — so the sink is output-file-size
    bound, not driver-memory bound. The guard caps the single local file;
    for larger outputs write ``geojson_features`` as distributed JSONL."""
    feats = geojson_features(edges)
    n = feats.count()
    if n > single_file_limit:
        raise ValueError(
            f"{n} features exceed single-file GeoJSON guard; write geojson_features as JSONL"
        )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [')
        first = True
        for r in feats.toLocalIterator():
            if not first:
                f.write(",")
            f.write(r["feature_json"])
            first = False
        f.write("]}")


def jsongz_frames(nodes: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S6 (:2784-2839): nodes as positional [lat, lon]; edges reference nodes
    by integer index. Index = dense position in node-id order — assigned via
    the partition-offset pattern (operators.ids), never a global window."""
    from ..operators.ids import dense_index

    node_idx = dense_index(nodes, "id", "node_index").select("id", "lat", "lon", "node_index")
    nodes_out = node_idx.orderBy("node_index").select("node_index", "lat", "lon")
    e = edges.select("id", "from_node_id", "to_node_id", "length_m", "lats", "lons")
    e = (
        e.join(
            node_idx.select(F.col("id").alias("from_node_id"), F.col("node_index").alias("start")),
            "from_node_id",
        )
        .join(
            node_idx.select(F.col("id").alias("to_node_id"), F.col("node_index").alias("end")),
            "to_node_id",
        )
        .select(
            "id",
            "start",
            "end",
            F.col("length_m").alias("length"),
            F.arrays_zip(F.col("lats").alias("lat"), F.col("lons").alias("lon")).alias("coordinates"),
        )
    )
    return nodes_out, e


def save_jsongz(nodes: DataFrame, edges: DataFrame, out_path: str) -> None:
    """Single-file legacy graph json.gz. The driver streams both frames via
    ``toLocalIterator()`` and emits JSON incrementally (byte-identical to a
    whole-document ``json.dump`` with default separators), so peak driver
    residency is one partition, never the full node/edge lists."""
    import gzip

    nodes_out, edges_out = jsongz_frames(nodes, edges)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with gzip.open(out_path, "wt") as f:
        f.write('{"nodes": [')
        first = True
        for r in nodes_out.toLocalIterator():
            if not first:
                f.write(", ")
            f.write(json.dumps([r["lat"], r["lon"]]))
            first = False
        f.write('], "edges": [')
        first = True
        for r in edges_out.toLocalIterator():
            if not first:
                f.write(", ")
            f.write(
                json.dumps(
                    {
                        "start": r["start"],
                        "end": r["end"],
                        "length": r["length"],
                        "coordinates": [[c["lat"], c["lon"]] for c in r["coordinates"]],
                    }
                )
            )
            first = False
        f.write("]}")


def mobile_frames(nodes: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S7 (:2912-2958): dense sequential int ids (1-based), deterministic
    order — partition-offset assignment (operators.ids), no global window."""
    from ..operators.ids import dense_index

    nmap = dense_index(nodes, "id", "mobile_id", start=1).select(
        "id", "lat", "lon", "mobile_id"
    )
    emap = dense_index(edges, "id", "mobile_edge_id", start=1)
    e = (
        emap.join(nmap.select(F.col("id").alias("from_node_id"), F.col("mobile_id").alias("from_mobile_id")), "from_node_id")
        .join(nmap.select(F.col("id").alias("to_node_id"), F.col("mobile_id").alias("to_mobile_id")), "to_node_id")
        .select(
            "mobile_edge_id", "from_mobile_id", "to_mobile_id", "length_m",
            "name", "type", "width_m",
        )
    )
    return nmap.select("mobile_id", "lat", "lon"), e


def save_mobile_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    n, e = mobile_frames(nodes, edges)
    n.write.mode("overwrite").option("header", "true").csv(os.path.join(out_dir, "mobile_nodes.csv"))
    e.write.mode("overwrite").option("header", "true").csv(os.path.join(out_dir, "mobile_edges.csv"))


def input_fingerprint(docs: DataFrame) -> dict:
    """Distributed content fingerprint of the input docs table — the Spark
    replacement for the reference's whole-file SHA-256 (:3026-3035, feasible
    only for a local file): row count + order-independent sum of per-row
    xxhash64 over (doc_id, span sequence JSON). Any change to any span of
    any doc changes the fingerprint."""
    row = docs.select(
        F.count("*").alias("rows"),
        # decimal(38,0) accumulator: a long sum overflows under ANSI mode
        F.sum(F.xxhash64("doc_id", F.to_json("spans")).cast("decimal(38,0)")).alias("hsum"),
    ).collect()[0]
    return {
        "rows": int(row["rows"] or 0),
        "xxh64_sum": format(int(row["hsum"] or 0) & ((1 << 64) - 1), "016x"),
    }


def _dir_sizes(paths: dict[str, str]) -> dict:
    """name → total byte size (file, or recursive dir total for parquet/csv
    output directories) — reference manifest output_files (:2996)."""
    out = {}
    for name, p in paths.items():
        if os.path.isdir(p):
            total = 0
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, fn)) for fn in files)
            out[name] = total
        elif os.path.exists(p):
            out[name] = os.path.getsize(p)
        else:
            out[name] = 0
    return out


def save_manifest(
    out_path: str,
    config,
    qa: dict,
    extra: Optional[dict] = None,
    input_docs: Optional[DataFrame] = None,
    output_paths: Optional[dict] = None,
    results: Optional[dict] = None,
) -> None:
    """S8 (:2966-3035): reproducibility manifest — version + timestamp,
    input fingerprint (distributed content hash instead of a file SHA-256),
    full parameter dump + param hash, result counts and per-sink output
    sizes, plus the QA metric dump."""
    import dataclasses
    import hashlib
    import time

    cfg = dataclasses.asdict(config)
    blob = json.dumps(cfg, sort_keys=True, default=list)
    manifest = {
        "engine": "osmwaterwayextractor_spark",
        "version": "2.1",  # tracks the reference's manifest version (:2978)
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "input": input_fingerprint(input_docs) if input_docs is not None else None,
        "config": cfg,
        "param_hash": hashlib.sha256(blob.encode()).hexdigest()[:16],
        "results": {
            **(results or {}),
            "output_files": _dir_sizes(output_paths or {}),
        },
        "qa": qa,
    }
    if extra:
        manifest.update(extra)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(manifest, f, indent=2, default=str)


def format_extraction_report(
    qa: dict,
    config,
    input_name: str = "",
    processing_seconds: float = 0.0,
    histogram: Optional[list] = None,
    output_sizes: Optional[dict] = None,
) -> str:
    """End-of-run console summary, reference-shaped
    (osm_waterway_extractor.py:3262-3300: banner, counts, config echo,
    quality metrics, per-file sizes, ODbL notice). Consumes the already
    computed qa dict — no extra Spark jobs."""
    bar = "=" * 60
    lines = ["", bar, "WATERWAY EXTRACTION SUMMARY v2.1", bar]
    if input_name:
        lines.append(f"Input: {input_name}")
    lines += [
        f"Final nodes: {qa.get('final_nodes', 0):,}",
        f"Final edges: {qa.get('final_edges', 0):,}",
        f"Processing time: {processing_seconds:.2f}s",
        "",
        "Configuration:",
        f"  Snap tolerance: {config.snap_tolerance_m}m",
        f"  Min edge length: {config.min_fragment_length_m}m",
        f"  Coordinate precision: {config.coordinate_precision} decimal places",
        "",
        "Quality Metrics:",
        f"  Width parse success: {qa.get('width_parse_success_rate', 0):.1f}%",
        f"  Mean edge length: {(qa.get('mean_edge_length_m') or 0):.1f}m",
        f"  Edge length p50/p95: "
        f"{(qa.get('edge_length_p50_m') or 0):.1f}m / {(qa.get('edge_length_p95_m') or 0):.1f}m",
    ]
    dv = qa.get("distance_validation_samples")
    if dv:
        lines.append(
            f"  Distance validation: {dv} samples, max err "
            f"{qa.get('distance_validation_max_error_m', 0.0):.6f}m"
        )
    if histogram:
        lines += ["", "Waterway types:"]
        for row in histogram:
            lines.append(f"  {row[0] or '(none)'}: {row[1]:,}")
    if output_sizes:
        lines += ["", "Output files:"]
        total = 0
        for name, size in output_sizes.items():
            sz = size.get("bytes", 0) if isinstance(size, dict) else int(size or 0)
            total += sz
            lines.append(f"  {name} ({sz:,} bytes)")
        lines.append(f"  Total size: {total:,} bytes")
    lines += [bar, "(c) OpenStreetMap contributors. Data licensed under ODbL."]
    return "\n".join(lines)
