"""WGS84 geodesic kernels (vectorized NumPy).

The reference uses ``pyproj.Geod(ellps='WGS84').inv`` (Karney) for all
distances (osm_waterway_extractor.py:1002-1072, vectorized form :419-460).
pyproj is not available here, so the engine's single shared kernel is a
vectorized Vincenty inverse on the WGS84 ellipsoid (agrees with Karney to
<0.5 mm for non-antipodal points — far below coordinate_precision). Both the
Spark UDFs and the test oracle call THIS function, so lengths/displacements
are bit-identical across the two paths (SURVEY.md F1/F3).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def round_coords(arr: np.ndarray, precision: int) -> np.ndarray:
    """Canonical coordinate rounding — bit-identical to Python ``round(x, p)``.

    ``np.round`` scales in float64 and can misround near decimal boundaries
    (e.g. np.round(-13.412345, 5) → -13.41234 but round() → -13.41235). The
    reference uses Python ``round`` everywhere (:1579-1583, :1093-1094), so
    this kernel scales in 80-bit longdouble, rints to an exact integer
    (|coord|·10^p < 2^53), and performs one exact float64 division — which
    reproduces Python's correctly-rounded half-even semantics.
    """
    scale = 10.0 ** precision
    x = np.asarray(arr, dtype=np.float64)
    scaled = np.rint(x.astype(np.longdouble) * scale).astype(np.float64)
    out = scaled / scale
    # normalize -0.0 → 0.0: Python dicts/Spark joins conflate them but their
    # reprs differ, which would fork the node-id hash
    return np.where(out == 0.0, 0.0, out)


def geodesic_m(lat1, lon1, lat2, lon2, iterations: int = 200, tol: float = 1e-12) -> np.ndarray:
    """Vectorized Vincenty inverse distance in meters (WGS84).

    Coincident points → 0. Near-antipodal non-convergence falls back to a
    great-circle (spherical) distance; never occurs for waterway vertices.
    """
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)

    U1 = np.arctan((1.0 - WGS84_F) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - WGS84_F) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)

    for _ in range(iterations):
        if not active.any():
            break
        sl, cl = np.sin(lam), np.cos(lam)
        t1 = cosU2 * sl
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cl
        ss = np.sqrt(t1 * t1 + t2 * t2)
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cl
        sig = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(ss != 0.0, cosU1 * cosU2 * sl / ss, 0.0)
        csa = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(csa != 0.0, cs - 2.0 * sinU1 * sinU2 / np.where(csa == 0.0, 1.0, csa), 0.0)
        C = WGS84_F / 16.0 * csa * (4.0 + WGS84_F * (4.0 - 3.0 * csa))
        lam_new = L + (1.0 - C) * WGS84_F * sin_alpha * (
            sig + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm * c2sm))
        )
        upd = active
        sin_sigma = np.where(upd, ss, sin_sigma)
        cos_sigma = np.where(upd, cs, cos_sigma)
        sigma = np.where(upd, sig, sigma)
        cos_sq_alpha = np.where(upd, csa, cos_sq_alpha)
        cos2sm = np.where(upd, c2sm, cos2sm)
        delta = np.abs(lam_new - lam)
        lam = np.where(upd, lam_new, lam)
        active = active & (delta > tol)

    u_sq = cos_sq_alpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = B * sin_sigma * (
        cos2sm
        + B / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos2sm * cos2sm)
            - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sigma * sin_sigma) * (-3.0 + 4.0 * cos2sm * cos2sm)
        )
    )
    dist = WGS84_B * A * (sigma - delta_sigma)

    same = (lat1 == lat2) & (lon1 == lon2)
    dist = np.where(same, 0.0, dist)
    if active.any():  # non-converged (near-antipodal): spherical fallback
        R = 6371008.8
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dphi = p2 - p1
        dlmb = np.radians(lon2 - lon1)
        a_h = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2) ** 2
        hav = 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(a_h)))
        dist = np.where(active & ~same, hav, dist)
    return dist


def approx_distance_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Equirectangular approximation: dx = Δlat°·111000,
    dy = Δlon°·111000·cos(mean lat). Cheap-prefilter companion to the
    geodesic kernel (reference ``_approximate_distance`` :1022-1035 — note
    the reference multiplies RADIAN deltas by 111000/degree, a latent 57×
    underestimate on its non-default fallback path; this engine uses the
    correct degree form and never uses it where exactness matters)."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    mean_lat = np.radians((lat1 + lat2) / 2.0)
    dx = (lat2 - lat1) * 111000.0
    dy = (lon2 - lon1) * 111000.0 * np.cos(mean_lat)
    return np.sqrt(dx * dx + dy * dy)


def polyline_length_m(lats: np.ndarray, lons: np.ndarray) -> float:
    """Geodesic length of one polyline (reference calculate_segment_length
    :1037-1050): sum of pairwise distances; <2 points → 0."""
    lats = np.asarray(lats, dtype=np.float64)
    if lats.shape[0] < 2:
        return 0.0
    lons = np.asarray(lons, dtype=np.float64)
    d = geodesic_m(lats[:-1], lons[:-1], lats[1:], lons[1:])
    return float(np.add.reduce(d))


def polyline_lengths_batch(
    flat_lats: np.ndarray, flat_lons: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Lengths of many polylines stored flat with ``offsets`` boundaries
    (len = n_lines+1). One vectorized geodesic call for the whole batch,
    then a per-line ``np.add.reduce`` over contiguous slices — bit-identical
    to calling ``polyline_length_m`` on each line (same elementwise distances,
    same pairwise summation order). The Arrow-batch analog of the reference's
    vectorized Step-4 kernel (:419-460).
    """
    flat_lats = np.asarray(flat_lats, dtype=np.float64)
    flat_lons = np.asarray(flat_lons, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.shape[0] - 1
    out = np.zeros(n, dtype=np.float64)
    if flat_lats.shape[0] == 0:
        return out
    seg_d = geodesic_m(flat_lats[:-1], flat_lons[:-1], flat_lats[1:], flat_lons[1:])
    for i in range(n):
        s, e = offsets[i], offsets[i + 1] - 1
        if e > s:
            out[i] = np.add.reduce(seg_d[s:e])
    return out
