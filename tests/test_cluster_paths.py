"""snap_map has two execution paths — driver union-find below
DRIVER_CC_MAX_PAIRS pairs, distributed min-label propagation above. Cluster
partitions are algorithm-independent (connected components of the geodesic≤ε
graph) and centroids share the sorted-member kernel, so the two paths must
produce IDENTICAL snap maps on the same input (VERDICT r1 item 4)."""

import pytest

from osmwaterwayextractor_spark.config import EngineConfig
import osmwaterwayextractor_spark.operators.cluster as cl


def _fixture_points(spark):
    # 40 anchors ~1.1 km apart; every 3rd/5th anchor gets satellites within
    # ~2-3 m (≪ snap_tolerance_m = 6), forming 2- and 3-member clusters —
    # including chained ones where only consecutive satellites are within ε.
    pts = []
    for i in range(40):
        lat = 50.0 + i * 0.01
        lon = 13.0 + (i % 7) * 0.01
        pts.append((lat, lon))
        if i % 3 == 0:
            pts.append((lat + 2.0e-5, lon + 1.0e-5))
        if i % 5 == 0:
            pts.append((lat - 1.5e-5, lon + 2.0e-5))
    return spark.createDataFrame(pts, "lat double, lon double").distinct()


def test_snap_map_driver_and_distributed_paths_agree(spark, monkeypatch):
    df = _fixture_points(spark)
    cfg = EngineConfig()

    driver_rows = sorted(map(tuple, cl.snap_map(df, cfg, spark).collect()))

    # force the distributed label-propagation path on the same input
    monkeypatch.setattr(cl, "DRIVER_CC_MAX_PAIRS", 0)
    dist_rows = sorted(map(tuple, cl.snap_map(df, cfg, spark).collect()))

    assert len(driver_rows) == df.count()
    assert driver_rows == dist_rows  # bit-identical, incl. centroids

    # sanity: some rows actually snapped (non-identity mapping exists)
    assert any(r[0] != r[2] or r[1] != r[3] for r in driver_rows)


def test_snap_map_displacement_guardrail_both_paths(spark, monkeypatch):
    # tolerance huge, allowed displacement tiny → the 3-member clusters'
    # member-to-centroid distance must trip the reference's hard abort on
    # BOTH paths (osm_waterway_extractor.py:1314-1317)
    df = _fixture_points(spark)
    cfg = EngineConfig(snap_tolerance_m=2000.0, max_displacement_multiplier=1e-7)
    with pytest.raises(Exception, match="displacement"):
        cl.snap_map(df, cfg, spark).collect()
    monkeypatch.setattr(cl, "DRIVER_CC_MAX_PAIRS", 0)
    with pytest.raises(Exception, match="displacement"):
        cl.snap_map(df, cfg, spark).collect()
