"""qa_thresholds enforcement (reference config.yaml:152-162 declares the
thresholds; the engine evaluates them post-build — VERDICT r1 item 6).
One fixture per threshold: each violates exactly one gate."""

import pytest

from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.operators.qa import (
    QAThresholdError,
    enforce_qa_thresholds,
    qa_threshold_checks,
)

NODE_SCHEMA = "id string, lat double, lon double"
EDGE_SCHEMA = (
    "id string, from_node_id string, to_node_id string, original_way_id long, "
    "lats array<double>, lons array<double>, length_m double, "
    "width_raw string, width_m double"
)

CFG = EngineConfig()


def _edge(eid, fr, to, lats, lons, way, width_raw="5 m", width_m=5.0):
    import numpy as np

    return (eid, fr, to, way, lats, lons, 1000.0, width_raw, width_m)


def _clean_graph(spark):
    """Two far-apart edges, widths parsed, no crossings → all gates pass."""
    nodes = spark.createDataFrame(
        [("a", 50.0, 13.0), ("b", 50.1, 13.0), ("c", 52.0, 14.0), ("d", 52.1, 14.0)],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            _edge("e1", "a", "b", [50.0, 50.1], [13.0, 13.0], 1),
            _edge("e2", "c", "d", [52.0, 52.1], [14.0, 14.0], 2),
        ],
        EDGE_SCHEMA,
    )
    return nodes, edges


def test_clean_graph_passes(spark):
    nodes, edges = _clean_graph(spark)
    checks = enforce_qa_thresholds(nodes, edges, CFG)
    assert checks["unsnapped_near_miss_count"] == 0
    assert checks["width_parse_success_rate"] == 1.0
    assert checks["crossing_edges_count"] == 0


def test_near_miss_violation(spark):
    # endpoints of different ways ~8 m apart: beyond the 6 m snap tolerance,
    # inside the 12 m near-miss radius → 2 of 4 nodes = 50% > 0.1%
    nodes = spark.createDataFrame(
        [
            ("a", 50.0, 13.0),
            ("b", 50.1, 13.0),
            ("c", 50.00007, 13.0),  # ~7.8 m north of a
            ("d", 50.2, 13.1),
        ],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            _edge("e1", "a", "b", [50.0, 50.1], [13.0, 13.0], 1, "", None),
            _edge("e2", "c", "d", [50.00007, 50.2], [13.0, 13.1], 2, "", None),
        ],
        EDGE_SCHEMA,
    )
    with pytest.raises(QAThresholdError, match="near_miss"):
        enforce_qa_thresholds(nodes, edges, CFG)


def test_interior_vertex_within_tolerance_is_not_a_near_miss(spark):
    # dangling endpoint "a" lies ~4.4 m (< 6 m snap tolerance) from a foreign
    # way's INTERIOR vertex — interior vertices are not in the snap domain,
    # so this is not a "should have merged" miss; the (tol, 2·tol] band must
    # exclude it (ADVICE r2) and the gate must pass
    nodes = spark.createDataFrame(
        [("a", 50.0, 13.0), ("b", 50.1, 13.0), ("c", 50.2, 13.1), ("d", 50.4, 13.1)],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            _edge("e1", "a", "b", [50.0, 50.1], [13.0, 13.0], 1),
            _edge(
                "e2", "c", "d", [50.2, 50.00004, 50.4], [13.1, 13.00001, 13.1], 2
            ),
        ],
        EDGE_SCHEMA,
    )
    checks = enforce_qa_thresholds(nodes, edges, CFG)
    assert checks["unsnapped_near_miss_count"] == 0


def test_width_parse_violation(spark):
    nodes, edges = _clean_graph(spark)
    bad = spark.createDataFrame(
        [
            _edge("e1", "a", "b", [50.0, 50.1], [13.0, 13.0], 1, "abc", None),
            _edge("e2", "c", "d", [52.0, 52.1], [14.0, 14.0], 2, "junk", None),
        ],
        EDGE_SCHEMA,
    )
    with pytest.raises(QAThresholdError, match="width_parse_success_rate"):
        enforce_qa_thresholds(nodes, bad, CFG)


def test_crossing_edges_violation(spark):
    # two edges crossing mid-segment with NO node at the crossing point
    nodes = spark.createDataFrame(
        [("a", 50.0, 13.0), ("b", 50.2, 13.2), ("c", 50.2, 13.0), ("d", 50.0, 13.2)],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            _edge("e1", "a", "b", [50.0, 50.2], [13.0, 13.2], 1, "", None),
            _edge("e2", "c", "d", [50.2, 50.0], [13.0, 13.2], 2, "", None),
        ],
        EDGE_SCHEMA,
    )
    with pytest.raises(QAThresholdError, match="crossing_edges_pct"):
        enforce_qa_thresholds(nodes, edges, CFG)


def test_checks_dict_shape(spark):
    nodes, edges = _clean_graph(spark)
    checks = qa_threshold_checks(nodes, edges, CFG)
    for k in (
        "unsnapped_near_miss_pct",
        "width_parse_success_rate",
        "crossing_edges_pct",
        "near_miss_radius_m",
    ):
        assert k in checks


def test_distance_validation_sampling(spark):
    """QA re-measures a deterministic edge sample with the full-precision
    geodesic kernel (reference config.yaml:145 declares the knob; the
    engine implements it)."""
    import numpy as np

    from osmwaterwayextractor_spark.functions.geodesy import polyline_length_m
    from osmwaterwayextractor_spark.operators.qa import distance_validation

    lats = [50.0, 50.1]
    lons = [13.0, 13.0]
    true_len = polyline_length_m(np.array(lats), np.array(lons))
    edges = spark.createDataFrame(
        [
            _edge("ok", "a", "b", lats, lons, 1)[:6] + (true_len, "", None),
            _edge("bad", "c", "d", lats, lons, 2)[:6] + (true_len + 7.5, "", None),
        ],
        EDGE_SCHEMA,
    )
    d = distance_validation(edges, CFG)
    assert d["distance_validation_samples"] == 2
    assert abs(d["distance_validation_max_error_m"] - 7.5) < 1e-6
    assert abs(d["distance_validation_mean_error_m"] - 3.75) < 1e-6
    # 0 disables sampling entirely
    off = distance_validation(edges, EngineConfig(distance_validation_samples=0))
    assert off == {"distance_validation_samples": 0}
