import numpy as np

from osmwaterwayextractor_spark.functions.geodesy import (
    approx_distance_m,
    geodesic_m,
    polyline_length_m,
    polyline_lengths_batch,
    round_coords,
)
from osmwaterwayextractor_spark.functions.geometry import (
    insert_points_on_line,
    points_in_polygon,
    project_onto_polyline,
    segment_intersections,
    simplify_dp,
)


def test_geodesic_known_wgs84():
    # 1 degree of longitude on the equator: a * pi/180 = 111319.4908 m
    d = geodesic_m(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([1.0]))
    assert abs(d[0] - 111319.4908) < 0.01
    # 1 degree of latitude from the equator ≈ 110574.39 m (WGS84 meridian arc)
    d = geodesic_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert abs(d[0] - 110574.39) < 0.5
    # coincident → exactly 0
    d = geodesic_m(np.array([52.5]), np.array([13.4]), np.array([52.5]), np.array([13.4]))
    assert d[0] == 0.0
    # symmetry
    d1 = geodesic_m(np.array([52.5]), np.array([13.4]), np.array([52.51]), np.array([13.41]))
    d2 = geodesic_m(np.array([52.51]), np.array([13.41]), np.array([52.5]), np.array([13.4]))
    assert abs(d1[0] - d2[0]) < 1e-6
    assert 1200 < d1[0] < 1400  # ~1.3 km


def test_approx_vs_geodesic():
    rng = np.random.default_rng(5)
    lat1 = rng.uniform(-60, 60, 100)
    lon1 = rng.uniform(-170, 170, 100)
    lat2 = lat1 + rng.uniform(-0.01, 0.01, 100)
    lon2 = lon1 + rng.uniform(-0.01, 0.01, 100)
    g = geodesic_m(lat1, lon1, lat2, lon2)
    a = approx_distance_m(lat1, lon1, lat2, lon2)
    mask = g > 1.0
    assert np.all(np.abs(a[mask] - g[mask]) / g[mask] < 0.02)


def test_polyline_batch_bit_identical_to_scalar():
    rng = np.random.default_rng(11)
    lines = []
    for n in [2, 3, 7, 25, 2]:
        base = rng.uniform(-50, 50, 2)
        lines.append(
            (base[0] + np.cumsum(rng.uniform(-1e-3, 1e-3, n)),
             base[1] + np.cumsum(rng.uniform(-1e-3, 1e-3, n)))
        )
    flat_lat = np.concatenate([l[0] for l in lines])
    flat_lon = np.concatenate([l[1] for l in lines])
    offsets = np.concatenate([[0], np.cumsum([len(l[0]) for l in lines])])
    batch = polyline_lengths_batch(flat_lat, flat_lon, offsets)
    scalar = np.array([polyline_length_m(l[0], l[1]) for l in lines])
    assert np.array_equal(batch, scalar)  # bit-identical, not just close


def test_round_coords_matches_python_round():
    assert round_coords(np.array([52.5123449999]), 5)[0] == 52.51234
    assert round_coords(np.array([-13.412345]), 5)[0] == round(-13.412345, 5)
    # exact binary tie → half-even, like Python
    assert round_coords(np.array([0.015625]), 5)[0] == round(0.015625, 5)
    rng = np.random.default_rng(23)
    vals = np.concatenate(
        [
            rng.uniform(-180, 180, 5000),
            np.round(rng.uniform(-90, 90, 2000), 5),  # already-5-decimal values
            rng.uniform(-0.001, 0.001, 1000),
        ]
    )
    got = round_coords(vals, 5)
    for v, g in zip(vals, got):
        assert g == round(float(v), 5), v


def test_simplify_dp_collinear_and_corner():
    # collinear interior points all dropped
    lats = np.array([0.0, 0.1, 0.2, 0.3])
    lons = np.array([0.0, 0.1, 0.2, 0.3])
    keep = simplify_dp(lats, lons, 1e-6)
    assert keep.tolist() == [True, False, False, True]
    # a sharp corner above tolerance survives
    lats = np.array([0.0, 0.1, 0.0])
    lons = np.array([0.0, 0.1, 0.2])
    keep = simplify_dp(lats, lons, 0.05)
    assert keep.tolist() == [True, True, True]
    # ...and is dropped when within tolerance
    keep = simplify_dp(lats, lons, 0.2)
    assert keep.tolist() == [True, False, True]


def test_segment_intersections_cross_touch_parallel():
    # X crossing at (0.5, 0.5)
    hit, pts = segment_intersections(
        np.array([[0.0, 0.0]]), np.array([[1.0, 1.0]]),
        np.array([[1.0, 0.0]]), np.array([[0.0, 1.0]]),
    )
    assert hit[0] and np.allclose(pts[0], [0.5, 0.5])
    # touching at an endpoint returns the exact vertex
    hit, pts = segment_intersections(
        np.array([[52.5, 13.4]]), np.array([[52.52, 13.42]]),
        np.array([[52.52, 13.42]]), np.array([[52.54, 13.40]]),
    )
    assert hit[0] and pts[0, 0] == 52.52 and pts[0, 1] == 13.42
    # parallel → no hit
    hit, _ = segment_intersections(
        np.array([[0.0, 0.0]]), np.array([[0.0, 1.0]]),
        np.array([[1.0, 0.0]]), np.array([[1.0, 1.0]]),
    )
    assert not hit[0]
    # disjoint non-parallel → no hit
    hit, _ = segment_intersections(
        np.array([[0.0, 0.0]]), np.array([[0.0, 1.0]]),
        np.array([[2.0, 3.0]]), np.array([[3.0, 3.0]]),
    )
    assert not hit[0]


def test_project_onto_polyline():
    lats = np.array([0.0, 0.0, 1.0])
    lons = np.array([0.0, 1.0, 1.0])
    d, pos = project_onto_polyline(lats, lons, 0.5, 0.5)  # above first segment
    assert abs(d - 0.5) < 1e-12 and abs(pos - 0.5) < 1e-12
    d, pos = project_onto_polyline(lats, lons, 0.5, 1.2)  # right of second segment
    assert abs(d - 0.2) < 1e-12 and abs(pos - 1.5) < 1e-12
    # exact vertex → distance 0, position = cumulative arc length
    d, pos = project_onto_polyline(lats, lons, 0.0, 1.0)
    assert d == 0.0 and pos == 1.0


def test_insert_points_membership_and_order():
    coords = np.array([[0.0, 0.0], [0.0, 1.0]])
    pts = np.array([[0.000001, 0.25], [0.0, 0.75], [0.0, 0.25], [5.0, 5.0]])
    out = insert_points_on_line(coords, pts, tolerance_deg=0.001, precision=5)
    # 0.000001 rounds to 0.0 → (0.0, 0.25); duplicate (0.0,0.25) skipped by
    # the membership check; far point ignored; sorted by arc position.
    assert out.tolist() == [[0.0, 0.0], [0.0, 0.25], [0.0, 0.75], [0.0, 1.0]]
    # a point exactly at an existing vertex is never inserted (strict straddle)
    out = insert_points_on_line(coords, np.array([[0.0, 0.0], [0.0, 1.0]]), 0.001, 5)
    assert out.tolist() == coords.tolist()


def test_points_in_polygon():
    ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
    ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
    lats = np.array([0.5, 1.5, -0.1, 0.99])
    lons = np.array([0.5, 0.5, 0.5, 0.01])
    got = points_in_polygon(lats, lons, ring_lat, ring_lon)
    assert got.tolist() == [True, False, False, True]
    # concave polygon (notch cut into the top)
    ring_lat = np.array([0.0, 0.0, 1.0, 0.2, 1.0])
    ring_lon = np.array([0.0, 1.0, 1.0, 0.5, 0.0])
    got = points_in_polygon(np.array([0.5, 0.1]), np.array([0.5, 0.5]), ring_lat, ring_lon)
    assert got.tolist() == [False, True]
