"""Single-process golden oracle.

A straight-line NumPy/python implementation of the full reference pipeline
(osm_waterway_extractor.py build_graph :1433-1523 and its steps), sharing the
exact numeric kernels the Spark operators use (``functions/``). The Spark
pipeline must reproduce this oracle's nodes/edges/tiles bit-for-bit — this is
the parity contract from BASELINE.json ("same edge set, same node dedup/merge
behavior, same tile assignments").

Replicated reference quirks (deliberate, documented):
- simplification runs BEFORE intersection detection and junction counting, so
  a simplified-away shared vertex is only recovered if intersection detection
  re-inserts it geometrically (steps 1.5/1.75 ordering, :1450-1470);
- the split-at-junction cut set is the KEY set of coord_mapping — moved
  cluster centroids are cut points only when they coincide with an original
  endpoint/junction coordinate (:2546-2559 membership check);
- ways with any unresolvable node ref are dropped whole (the osmium location
  index raises on missing locations and the way never materializes);
- intersection candidate points are tested against EVERY way within
  tolerance, not only the two ways that produced them (:2085-2099).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .config import EngineConfig
from .functions.clustering import UnionFind, centroid_of_members, epsilon_pairs
from .functions.geodesy import geodesic_m, polyline_length_m, round_coords
from .functions.geometry import (
    M_TO_DEG,
    insert_points_on_line,
    segment_intersections,
    simplify_dp,
)
from .functions.hashing import edge_ids, node_ids
from .functions.tiling import cell_id_h3res
from .functions.width import parse_width


@dataclass
class OracleResult:
    nodes: list[dict] = field(default_factory=list)
    edges: list[dict] = field(default_factory=list)
    qa: dict = field(default_factory=dict)
    # stage intermediates for per-operator tests
    ways_assembled: list[dict] = field(default_factory=list)
    ways_processed: list[dict] = field(default_factory=list)
    ways_simplified: list[dict] = field(default_factory=list)
    ways_intersected: list[dict] = field(default_factory=list)
    endpoints: list[tuple] = field(default_factory=list)
    junctions: list[tuple] = field(default_factory=list)
    coord_mapping: dict = field(default_factory=dict)


def parse_docs(docs: list[dict], config: EngineConfig) -> tuple[dict, list[dict]]:
    """Spans → (node_id→(lat,lon) rounded, ways list), mirroring sources/parse."""
    nodes: dict[int, tuple[float, float]] = {}
    ways: list[dict] = []
    p = config.coordinate_precision
    for doc in docs:
        for span in doc["spans"]:
            if span["kind"] == "osm_node":
                rec = json.loads(span["text"])
                nodes[rec["id"]] = (
                    float(round_coords(np.float64(rec["lat"]), p)),
                    float(round_coords(np.float64(rec["lon"]), p)),
                )
            elif span["kind"] == "osm_way":
                rec = json.loads(span["text"])
                tags = rec.get("tags") or {}
                if config.filter_waterway_types and tags.get("waterway") not in config.waterway_types:
                    continue
                if len(rec.get("refs") or []) < 2:
                    continue
                ways.append({"id": rec["id"], "refs": rec["refs"], "tags": tags})
    return nodes, ways


def assemble(nodes: dict, ways: list[dict]) -> list[dict]:
    """J1: resolve refs to coordinates; drop ways with unresolved refs."""
    out = []
    for w in sorted(ways, key=lambda w: w["id"]):
        coords = []
        ok = True
        for r in w["refs"]:
            c = nodes.get(r)
            if c is None:
                ok = False
                break
            coords.append(c)
        if ok and len(coords) >= 2:
            out.append({"id": w["id"], "coordinates": coords, "tags": w["tags"]})
    return out


def process(ways: list[dict]) -> list[dict]:
    """Step 1 (:1569-1599): coords already rounded at parse; dedup consecutive."""
    out = []
    for w in ways:
        coords = w["coordinates"]
        if len(coords) < 2:
            continue
        dedup = [coords[0]]
        for c in coords[1:]:
            if c != dedup[-1]:
                dedup.append(c)
        if len(dedup) >= 2:
            out.append({"id": w["id"], "coordinates": dedup, "tags": w["tags"]})
    return out


def simplify(ways: list[dict], config: EngineConfig) -> list[dict]:
    """Step 1.5 (:1710-1749): Douglas-Peucker in degree space."""
    if not config.enable_geometry_simplification:
        return ways
    tol = config.simplification_tolerance_m * M_TO_DEG
    out = []
    for w in ways:
        coords = np.asarray(w["coordinates"], dtype=np.float64)
        if coords.shape[0] < 2:
            continue
        keep = simplify_dp(coords[:, 0], coords[:, 1], tol)
        kept = [tuple(c) for c in coords[keep]]
        if len(kept) >= 2:
            out.append({"id": w["id"], "coordinates": kept, "tags": w["tags"]})
    return out


def detect_intersection_points(ways: list[dict]) -> list[tuple[float, float]]:
    """Step 1.75a (:1818-1902): pairwise polyline intersection points."""
    pts: list[tuple[float, float]] = []
    n = len(ways)
    arrays = [np.asarray(w["coordinates"], dtype=np.float64) for w in ways]
    bboxes = [
        (a[:, 0].min(), a[:, 0].max(), a[:, 1].min(), a[:, 1].max()) for a in arrays
    ]
    for i in range(n):
        for j in range(i + 1, n):
            bi, bj = bboxes[i], bboxes[j]
            if bi[1] < bj[0] or bj[1] < bi[0] or bi[3] < bj[2] or bj[3] < bi[2]:
                continue
            A, B = arrays[i], arrays[j]
            na, nb = A.shape[0] - 1, B.shape[0] - 1
            ii, jj = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
            ii, jj = ii.ravel(), jj.ravel()
            hit, p = segment_intersections(A[ii], A[ii + 1], B[jj], B[jj + 1])
            if hit.any():
                uniq = np.unique(p[hit], axis=0)
                pts.extend((float(a), float(b)) for a, b in uniq)
    return pts


def insert_intersections(
    ways: list[dict], points: list[tuple[float, float]], config: EngineConfig
) -> list[dict]:
    """Step 1.75b (:2039-2152): insert points into every way within tolerance."""
    if not points:
        return ways
    pts = np.asarray(points, dtype=np.float64)
    tol = config.snap_tolerance_m * M_TO_DEG
    out = []
    for w in ways:
        coords = np.asarray(w["coordinates"], dtype=np.float64)
        new = insert_points_on_line(coords, pts, tol, config.coordinate_precision)
        out.append(
            {"id": w["id"], "coordinates": [tuple(c) for c in new], "tags": w["tags"]}
        )
    return out


def endpoints_and_junctions(ways: list[dict]) -> tuple[list[tuple], list[tuple]]:
    """Step 2 (:2286-2316)."""
    from collections import Counter

    endpoint_count: Counter = Counter()
    all_count: Counter = Counter()
    all_endpoints: list[tuple] = []
    for w in ways:
        coords = w["coordinates"]
        endpoint_count[coords[0]] += 1
        endpoint_count[coords[-1]] += 1
        all_endpoints.extend([coords[0], coords[-1]])
        for c in coords:
            all_count[c] += 1
    endpoint_junctions = [c for c, k in endpoint_count.items() if k > 1]
    ep_set = set(endpoint_junctions)
    interior_junctions = [c for c, k in all_count.items() if k > 1 and c not in ep_set]
    endpoints = list(set(all_endpoints))
    return endpoints, endpoint_junctions + interior_junctions


def cluster(
    endpoints: list[tuple], junctions: list[tuple], config: EngineConfig
) -> dict:
    """Step 3 (:1253-1331): ε-union-find + sorted-member mean centroids."""
    domain = sorted(set(endpoints) | set(junctions))
    if not domain:
        return {}
    arr = np.asarray(domain, dtype=np.float64)
    lo, hi = epsilon_pairs(arr[:, 0], arr[:, 1], config.snap_tolerance_m)
    uf = UnionFind(len(domain))
    for a, b in zip(lo, hi):
        uf.union(int(a), int(b))
    labels = uf.labels()
    mapping: dict[tuple, tuple] = {}
    max_allowed = config.snap_tolerance_m * config.max_displacement_multiplier
    for root in np.unique(labels):
        members = np.nonzero(labels == root)[0]
        if members.shape[0] == 1:
            c = domain[int(members[0])]
            mapping[c] = c
        else:
            mlat = arr[members, 0]
            mlon = arr[members, 1]
            cen = centroid_of_members(mlat, mlon)
            disp = geodesic_m(mlat, mlon, np.full(len(members), cen[0]), np.full(len(members), cen[1]))
            if float(disp.max()) > max_allowed:
                raise ValueError("Cluster displacement exceeds safety threshold")
            for m in members:
                mapping[domain[int(m)]] = cen
    return mapping


def create_edges(
    ways: list[dict], coord_mapping: dict, config: EngineConfig
) -> list[dict]:
    """Step 4 (:2465-2599): snap, split at cut set, lengths, ids, filter."""
    cut_set = set(coord_mapping.keys())
    edges: list[dict] = []
    for w in ways:
        coords = [coord_mapping.get(c, c) for c in w["coordinates"]]
        if len(coords) < 2:
            continue
        junction_indices = [
            i
            for i, c in enumerate(coords)
            if c in cut_set or i == 0 or i == len(coords) - 1
        ]
        tags = w["tags"]
        width_raw, width_m, width_source = parse_width(tags.get("width", ""))
        for k in range(len(junction_indices) - 1):
            s, e = junction_indices[k], junction_indices[k + 1]
            if e <= s:
                continue
            seg = coords[s : e + 1]
            if len(seg) < 2:
                continue
            seg_arr = np.asarray(seg, dtype=np.float64)
            length = polyline_length_m(seg_arr[:, 0], seg_arr[:, 1])
            from_id = str(
                node_ids(np.array([seg[0][0]]), np.array([seg[0][1]]), config.coordinate_precision, config.hash_length)[0]
            )
            to_id = str(
                node_ids(np.array([seg[-1][0]]), np.array([seg[-1][1]]), config.coordinate_precision, config.hash_length)[0]
            )
            eid = str(
                edge_ids(np.array([from_id]), np.array([to_id]), np.array([w["id"]]), np.array([k]), config.hash_length)[0]
            )
            edges.append(
                {
                    "id": eid,
                    "from_node_id": from_id,
                    "to_node_id": to_id,
                    "length_m": float(length),
                    "coordinates": seg,
                    "name": tags.get("name", ""),
                    "type": tags.get("waterway", ""),
                    "width_raw": width_raw,
                    "width_m": width_m,
                    "width_source": width_source,
                    "original_way_id": w["id"],
                }
            )
    return [e for e in edges if e["length_m"] >= config.min_fragment_length_m]


def build_nodes(coord_mapping: dict, config: EngineConfig) -> list[dict]:
    """Step 5 (:2643-2660)."""
    uniq = sorted(set(coord_mapping.values()))
    if not uniq:
        return []
    arr = np.asarray(uniq, dtype=np.float64)
    ids = node_ids(arr[:, 0], arr[:, 1], config.coordinate_precision, config.hash_length)
    return [
        {"id": str(i), "lat": float(la), "lon": float(lo), "type": "junction"}
        for i, (la, lo) in zip(ids, uniq)
    ]


def tile_assignments(nodes: list[dict], edges: list[dict], config: EngineConfig):
    """Graft F14: node cells per endpoint; edge cells at the midpoint vertex."""
    node_cells = []
    for nd in nodes:
        row = {"id": nd["id"]}
        for res in config.tile_resolutions:
            row[f"cell_r{res}"] = int(
                cell_id_h3res(np.array([nd["lat"]]), np.array([nd["lon"]]), res)[0]
            )
        node_cells.append(row)
    edge_cells = []
    for e in edges:
        mid = e["coordinates"][(len(e["coordinates"]) - 1) // 2]
        row = {"id": e["id"]}
        for res in config.tile_resolutions:
            row[f"cell_r{res}"] = int(
                cell_id_h3res(np.array([mid[0]]), np.array([mid[1]]), res)[0]
            )
        edge_cells.append(row)
    return node_cells, edge_cells


def run_oracle(docs: list[dict], config: Optional[EngineConfig] = None) -> OracleResult:
    config = config or EngineConfig()
    res = OracleResult()
    nodes_map, ways = parse_docs(docs, config)
    res.ways_assembled = assemble(nodes_map, ways)
    res.ways_processed = process(res.ways_assembled)
    res.ways_simplified = simplify(res.ways_processed, config)
    if config.enable_intersection_detection and len(res.ways_simplified) >= 2:
        pts = detect_intersection_points(res.ways_simplified)
        res.ways_intersected = insert_intersections(res.ways_simplified, pts, config)
    else:
        res.ways_intersected = res.ways_simplified
    res.endpoints, res.junctions = endpoints_and_junctions(res.ways_intersected)
    res.coord_mapping = cluster(res.endpoints, res.junctions, config)
    res.edges = create_edges(res.ways_intersected, res.coord_mapping, config)
    res.nodes = build_nodes(res.coord_mapping, config)
    lengths = sorted(e["length_m"] for e in res.edges)
    res.qa = {
        "final_nodes": len(res.nodes),
        "final_edges": len(res.edges),
        "mean_edge_length_m": (sum(lengths) / len(lengths)) if lengths else 0.0,
    }
    return res


def fixture_4way_docs() -> list[dict]:
    """FIXTURES.md F-B: the reference's create_test_waterways (:3141-3165)
    wrapped into one interleaved document (node ids 9001.., way ids 1-4)."""
    ways = [
        (1, [(52.5, 13.4), (52.51, 13.41), (52.52, 13.42)],
         {"waterway": "river", "name": "Test River", "width": "10 m"}),
        (2, [(52.51, 13.41), (52.515, 13.405), (52.52, 13.40)],
         {"waterway": "stream", "name": "Test Stream", "width": "3 m"}),
        (3, [(52.52, 13.42), (52.53, 13.43), (52.54, 13.44)],
         {"waterway": "river", "name": "Test River"}),
        (4, [(52.505, 13.405), (52.515, 13.415), (52.525, 13.425)],
         {"waterway": "stream", "name": "Test Crossing Stream", "width": "2 m"}),
    ]
    spans = []
    nid = 9000
    off = 0
    for way_id, coords, tags in ways:
        refs = []
        for lat, lon in coords:
            nid += 1
            refs.append(nid)
            spans.append(
                {
                    "kind": "osm_node",
                    "text": json.dumps({"id": nid, "lat": lat, "lon": lon}),
                    "media_ref": "",
                    "offset": off,
                }
            )
            off += 1
        spans.append(
            {
                "kind": "osm_way",
                "text": json.dumps({"id": way_id, "refs": refs, "tags": tags}, separators=(",", ":")),
                "media_ref": "",
                "offset": off,
            }
        )
        off += 1
    spans.append({"kind": "text", "text": "fixture filler", "media_ref": "", "offset": off})
    return [{"doc_id": "doc-fixture", "spans": spans}]
