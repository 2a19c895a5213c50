"""Planar geometry kernels in degree space (NumPy).

The reference does all planar geometry with shapely/GEOS on ``(x=lon, y=lat)``
coordinates and meter→degree factor ``1e-5`` (osm_waterway_extractor.py:1726,
:2048). shapely is unavailable; these kernels re-implement the exact
operations used:

- Douglas-Peucker simplification (``line.simplify`` :1722-1729). The
  reference passes ``preserve_topology=True``; for simple (non-self-crossing)
  waterway polylines GEOS' topology-preserving simplifier and plain DP agree,
  and plain DP is the documented spec here.
- segment-segment intersection points (``line_i.intersection(line_j)``
  :1871-1896, Point/MultiPoint only, overlaps ignored).
- point-to-polyline distance + arc-length projection (``line.distance`` /
  ``line.project`` :2094-2099) used to insert intersection points.
- ray-casting point-in-polygon (graft F15; no reference analog).

All kernels are shared between the Spark Arrow UDFs and the test oracle.
"""

from __future__ import annotations

import numpy as np

M_TO_DEG = 0.00001  # reference's rough meter→degree factor (:1726, :2048)


def simplify_dp(lats: np.ndarray, lons: np.ndarray, tolerance_deg: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for one polyline in degree space.

    Returns a boolean mask over the input vertices. Distance is perpendicular
    planar distance on (x=lon, y=lat); a vertex splits iff its distance is
    strictly greater than the tolerance; ties pick the lowest index
    (np.argmax). Endpoints always kept.
    """
    n = lats.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        xi, yi, xj, yj = x[i], y[i], x[j], y[j]
        dx, dy = xj - xi, yj - yi
        seg_len_sq = dx * dx + dy * dy
        px = x[i + 1 : j]
        py = y[i + 1 : j]
        if seg_len_sq == 0.0:
            d_sq = (px - xi) ** 2 + (py - yi) ** 2
        else:
            # perpendicular distance to the infinite line through i,j
            # (GEOS DP uses line distance, not segment distance)
            cross = (px - xi) * dy - (py - yi) * dx
            d_sq = cross * cross / seg_len_sq
        k = int(np.argmax(d_sq))
        if d_sq[k] > tolerance_deg * tolerance_deg:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


def simplify_dp_batch(
    lats: np.ndarray, lons: np.ndarray, offsets: np.ndarray, tolerance_deg: float
) -> np.ndarray:
    """Douglas-Peucker keep-mask for MANY polylines at once.

    ``lats``/``lons`` are the concatenated vertices of W polylines;
    ``offsets`` (len W+1, int64) bounds polyline w as [offsets[w], offsets[w+1]).
    Returns one boolean keep-mask over all vertices.

    Level-synchronous formulation of ``simplify_dp``: one round processes
    EVERY active (i, j) span across every polyline with whole-batch ufuncs
    and segmented reductions, instead of a Python iteration per span. The
    per-vertex arithmetic — cross/seg_len_sq perpendicular distance, the
    degenerate seg_len_sq == 0 fallback, the strictly-greater tolerance
    test, first-index tie-break — is the same IEEE-754 operation dag as the
    scalar kernel, so the mask is bit-identical (pinned by
    tests/test_round6_optimizations.py). Motivation: the per-way loop cost
    ~8 µs of NumPy small-slice overhead per VERTEX (round-6 profile: 92% of
    the fused assembly kernel; guide §4.2 — hand whole batches to
    vectorized kernels)."""
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = x.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    starts, ends = offsets[:-1], offsets[1:]
    nonempty = ends > starts
    keep[starts[nonempty]] = True
    keep[ends[nonempty] - 1] = True
    ai = starts[nonempty].astype(np.int64)
    aj = (ends[nonempty] - 1).astype(np.int64)
    live = aj > ai + 1
    ai, aj = ai[live], aj[live]
    tol_sq = tolerance_deg * tolerance_deg
    while ai.size:
        counts = aj - ai - 1
        offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
        total = int(offs[-1])
        segid = np.repeat(np.arange(ai.size, dtype=np.int64), counts)
        within = np.arange(total, dtype=np.int64) - offs[segid]
        k = ai[segid] + 1 + within
        xi, yi = x[ai], y[ai]
        dxs, dys = x[aj] - xi, y[aj] - yi
        seg_len_sq = dxs * dxs + dys * dys
        px, py = x[k], y[k]
        xi_r, yi_r = xi[segid], yi[segid]
        dx_r, dy_r = dxs[segid], dys[segid]
        sls_r = seg_len_sq[segid]
        cross = (px - xi_r) * dy_r - (py - yi_r) * dx_r
        with np.errstate(divide="ignore", invalid="ignore"):
            d_line = cross * cross / sls_r
        d_pt = (px - xi_r) ** 2 + (py - yi_r) ** 2
        d_sq = np.where(sls_r == 0.0, d_pt, d_line)
        mx = np.maximum.reduceat(d_sq, offs[:-1])
        # first index achieving the max (np.argmax tie semantics)
        first_within = np.minimum.reduceat(
            np.where(d_sq == mx[segid], within, total), offs[:-1]
        )
        split = mx > tol_sq
        mids = (ai + 1 + first_within)[split]
        keep[mids] = True
        new_ai = np.concatenate([ai[split], mids])
        new_aj = np.concatenate([mids, aj[split]])
        live = new_aj > new_ai + 1
        ai, aj = new_ai[live], new_aj[live]
    return keep


def segment_intersections(
    a1: np.ndarray, a2: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Intersection points of segment pairs, vectorized.

    Inputs are (k, 2) arrays of (lat, lon) endpoints: segment A = a1→a2,
    segment B = b1→b2. Returns (hit_mask, points) where points is (k, 2)
    (lat, lon), valid where hit_mask. Touching at endpoints counts (shapely
    returns a Point for touching lines, reference :1876). Parallel/collinear
    pairs are skipped (reference ignores overlap intersections :1895-1896).
    Endpoint-coincident hits return the exact input vertex (no float drift).
    """
    a1 = np.asarray(a1, dtype=np.float64)
    a2 = np.asarray(a2, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    b2 = np.asarray(b2, dtype=np.float64)
    # planar x=lon, y=lat
    rx = a2[:, 1] - a1[:, 1]
    ry = a2[:, 0] - a1[:, 0]
    sx = b2[:, 1] - b1[:, 1]
    sy = b2[:, 0] - b1[:, 0]
    qpx = b1[:, 1] - a1[:, 1]
    qpy = b1[:, 0] - a1[:, 0]
    denom = rx * sy - ry * sx
    # GEOS decides parallelism with exact predicates; in plain float64 two
    # nominally-collinear segments leave a ~1e-16 residual denominator that
    # would fabricate a bogus crossing inside the overlap. Segments whose
    # normalized cross product is below 1e-9 (angle < 1 nrad) are treated as
    # parallel — the documented spec for this engine. Parallel pairs still
    # produce a Point when they are collinear and touch at a single point
    # (shapely returns Point there, LineString for overlaps → ignored,
    # reference :1895-1896).
    scale = np.sqrt((rx * rx + ry * ry) * (sx * sx + sy * sy))
    nonpar = np.abs(denom) > 1e-9 * scale
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(nonpar, (qpx * sy - qpy * sx) / np.where(nonpar, denom, 1.0), np.nan)
        u = np.where(nonpar, (qpx * ry - qpy * rx) / np.where(nonpar, denom, 1.0), np.nan)
    hit = nonpar & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)

    # collinear single-point touch: project B's endpoints onto A's parameter
    r_len_sq = rx * rx + ry * ry
    with np.errstate(divide="ignore", invalid="ignore"):
        lateral = np.abs(qpx * ry - qpy * rx) / np.where(r_len_sq > 0, np.sqrt(r_len_sq), 1.0)
        tb1 = np.where(r_len_sq > 0, (qpx * rx + qpy * ry) / r_len_sq, np.inf)
        tb2 = np.where(
            r_len_sq > 0,
            ((b2[:, 1] - a1[:, 1]) * rx + (b2[:, 0] - a1[:, 0]) * ry) / r_len_sq,
            np.inf,
        )
    eps_t = 1e-9
    seg_len = np.sqrt(r_len_sq)
    lo = np.maximum(0.0, np.minimum(tb1, tb2))
    hi = np.minimum(1.0, np.maximum(tb1, tb2))
    touch = (
        ~nonpar
        & (r_len_sq > 0)
        & (lateral <= 1e-9 * np.maximum(seg_len, 1e-300))
        & (hi - lo >= -eps_t)
        & (hi - lo <= eps_t)
    )
    t = np.where(touch, np.clip((lo + hi) / 2.0, 0.0, 1.0), t)
    # the touching B endpoint: whichever of tb1/tb2 falls inside [0,1]
    u = np.where(touch, np.where(np.abs(tb1 - np.clip(tb1, 0.0, 1.0)) <= np.abs(tb2 - np.clip(tb2, 0.0, 1.0)), 0.0, 1.0), u)
    hit = hit | touch
    lat = a1[:, 0] + t * ry
    lon = a1[:, 1] + t * rx
    # snap exact endpoint touches to the original vertices
    lat = np.where(t == 0.0, a1[:, 0], np.where(t == 1.0, a2[:, 0], lat))
    lon = np.where(t == 0.0, a1[:, 1], np.where(t == 1.0, a2[:, 1], lon))
    lat = np.where(u == 0.0, b1[:, 0], np.where(u == 1.0, b2[:, 0], lat))
    lon = np.where(u == 0.0, b1[:, 1], np.where(u == 1.0, b2[:, 1], lon))
    pts = np.stack([lat, lon], axis=1)
    return hit, pts


def project_onto_polyline(
    lats: np.ndarray, lons: np.ndarray, pt_lat: float, pt_lon: float
) -> tuple[float, float]:
    """(distance, arc_position) of a point vs a polyline in degree space.

    Mirrors shapely ``line.distance(pt)`` + ``line.project(pt)``: the
    position is the arc length (degrees) to the globally nearest projection;
    ties resolve to the lowest segment index.
    """
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    dx = x[1:] - x[:-1]
    dy = y[1:] - y[:-1]
    seg_len_sq = dx * dx + dy * dy
    wx = pt_lon - x[:-1]
    wy = pt_lat - y[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(seg_len_sq > 0.0, (wx * dx + wy * dy) / seg_len_sq, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = x[:-1] + t * dx
    cy = y[:-1] + t * dy
    d_sq = (pt_lon - cx) ** 2 + (pt_lat - cy) ** 2
    k = int(np.argmin(d_sq))
    seg_len = np.sqrt(seg_len_sq)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    return float(np.sqrt(d_sq[k])), float(cum[k] + t[k] * seg_len[k])


def vertex_arc_positions(lats: np.ndarray, lons: np.ndarray) -> np.ndarray:
    """Cumulative planar arc length (degrees) at each vertex."""
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    seg = np.sqrt((x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2)
    return np.concatenate([[0.0], np.cumsum(seg)])


def insert_points_on_line(
    coords: np.ndarray,
    points: np.ndarray,
    tolerance_deg: float,
    precision: int,
) -> np.ndarray:
    """Insert intersection points into a coordinate sequence.

    Replicates ``_split_waterways_sequential`` (reference :2039-2152) exactly,
    quirks included:
    - a candidate point is "on" the line iff its planar distance to the line
      is < tolerance_deg;
    - candidates sort by arc-length position; a point is inserted into the
      (unique) segment whose vertex positions straddle it STRICTLY;
    - inserted points are rounded to ``precision`` and skipped when the
      rounded pair already appears ANYWHERE in the accumulated sequence
      (membership check at :2132);
    - consecutive duplicates are removed afterwards (:2137-2141).

    ``coords``: (n,2) (lat,lon); ``points``: (k,2). Returns new (m,2) array.
    """
    from .geodesy import round_coords

    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    if n < 2 or points.shape[0] == 0:
        return coords
    on_line = []
    for plat, plon in points:
        dist, pos = project_onto_polyline(coords[:, 0], coords[:, 1], float(plat), float(plon))
        if dist < tolerance_deg:
            on_line.append((pos, float(plat), float(plon)))
    if not on_line:
        return coords
    on_line.sort(key=lambda r: r[0])
    vpos = vertex_arc_positions(coords[:, 0], coords[:, 1])
    new_coords: list[tuple[float, float]] = []
    seen: set[tuple[float, float]] = set()

    def _push(lat: float, lon: float) -> None:
        new_coords.append((lat, lon))
        seen.add((lat, lon))

    for i in range(n):
        _push(float(coords[i, 0]), float(coords[i, 1]))
        if i < n - 1:
            lo, hi = vpos[i], vpos[i + 1]
            for pos, plat, plon in on_line:
                if lo < pos < hi:
                    rlat = float(round_coords(plat, precision))
                    rlon = float(round_coords(plon, precision))
                    if (rlat, rlon) not in seen:
                        _push(rlat, rlon)
    # consecutive-duplicate removal
    out = [new_coords[0]]
    for c in new_coords[1:]:
        if c != out[-1]:
            out.append(c)
    return np.asarray(out, dtype=np.float64)


def points_in_polygon(
    pt_lats: np.ndarray, pt_lons: np.ndarray, ring_lats: np.ndarray, ring_lons: np.ndarray
) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon (graft F15).

    ``ring`` is a closed or open simple ring (lat, lon); points exactly on an
    edge follow the half-open crossing rule (deterministic, documented).
    Returns a boolean mask over the points.
    """
    px = np.asarray(pt_lons, dtype=np.float64)
    py = np.asarray(pt_lats, dtype=np.float64)
    rx = np.asarray(ring_lons, dtype=np.float64)
    ry = np.asarray(ring_lats, dtype=np.float64)
    if rx.shape[0] >= 2 and (rx[0] == rx[-1] and ry[0] == ry[-1]):
        rx, ry = rx[:-1], ry[:-1]
    n = rx.shape[0]
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    for k in range(n):
        xa, ya, xb, yb = x1[k], y1[k], x2[k], y2[k]
        cond = (ya > py) != (yb > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        inside ^= cond & (px < xint)
    return inside
