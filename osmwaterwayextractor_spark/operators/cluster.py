"""Step 3 — ε-snap clustering (J3 + A7 + A5) as distributed dataflow.

The reference unions all endpoint/junction pairs within ``snap_tolerance_m``
with an R-tree + union-find and maps every member to the cluster's arithmetic
mean (osm_waterway_extractor.py:1253-1331). Here:

1. **ε-pairs (J3)**: points get a join-grid cell (deepest level whose cell
   edge covers the tolerance at the data's max |lat|); one side explodes to
   its ring-1 neighborhood; the cell equi-join + exact vectorized geodesic
   filter yields exactly {(p,q) : geodesic ≤ ε} — the R-tree prefilter
   replaced by a shuffle-friendly equi-join (SURVEY.md J3).
2. **connected components (A7)**: iterative min-label propagation over the
   pair edges with per-iteration localCheckpoint (lineage break). Labels are
   the points' own (lat,lon) structs — min() is lexicographic, no global id
   assignment (no single-partition window). Cluster diameters are tiny in
   practice (the displacement guardrail aborts oversized clusters exactly
   like the reference :1314-1317), so iterations ≈ a few.
3. **centroids (A5)**: members collect per label, sorted; the shared
   ``centroid_of_members`` summation order makes Spark and oracle centroids
   bit-identical.

Returns the snap map (lat, lon, snap_lat, snap_lon) — identity rows included
(they double as the split-stage cut set, reference :2554-2559).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import EngineConfig
from ..functions.clustering import centroid_of_members
from ..functions.geodesy import geodesic_m
from ..functions.tiling import LEVEL_SHIFT, X_SHIFT, cell_width_deg, join_grid_level


def _cell_expr(lat_col: str, lon_col: str, level: int):
    w = cell_width_deg(level)
    return (
        F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
        + F.shiftleft(F.floor((F.col(lon_col) + 180.0) / w).cast("long"), int(X_SHIFT))
        + F.floor((F.col(lat_col) + 90.0) / w).cast("long")
    )


def _ring_cells_expr(lat_col: str, lon_col: str, level: int):
    """3×3 neighborhood cell ids as an array column (lon wrap, lat clip)."""
    w = cell_width_deg(level)
    nx = 2 << level
    ny = 1 << level
    x = F.floor((F.col(lon_col) + 180.0) / w).cast("long")
    y = F.floor((F.col(lat_col) + 90.0) / w).cast("long")
    cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            xx = (x + dx + nx) % nx
            yy = F.greatest(F.lit(0).cast("long"), F.least(F.lit(ny - 1).cast("long"), y + dy))
            cells.append(
                F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
                + F.shiftleft(xx, int(X_SHIFT))
                + yy
            )
    return F.array_distinct(F.array(*cells))


def _geodesic_udf():
    @pandas_udf("double")
    def _g(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return pd.Series(
            geodesic_m(
                lat1.to_numpy(dtype=float),
                lon1.to_numpy(dtype=float),
                lat2.to_numpy(dtype=float),
                lon2.to_numpy(dtype=float),
            )
        )

    return _g


def epsilon_pair_edges(points: DataFrame, eps_m: float, max_abs_lat: float) -> DataFrame:
    """points(lat, lon) → symmetric pair edges (lat, lon, nlat, nlon)."""
    level = join_grid_level(eps_m, max_abs_lat)
    left = points.select(
        "lat", "lon", F.explode(_ring_cells_expr("lat", "lon", level)).alias("cell")
    )
    right = points.select(
        F.col("lat").alias("nlat"),
        F.col("lon").alias("nlon"),
        _cell_expr("lat", "lon", level).alias("cell"),
    )
    cand = left.join(right, "cell").drop("cell")
    cand = cand.where((F.col("lat") != F.col("nlat")) | (F.col("lon") != F.col("nlon")))
    cand = cand.distinct()  # ring overlap can duplicate candidates
    return cand.where(_geodesic_udf()("lat", "lon", "nlat", "nlon") <= F.lit(eps_m))


def connected_components(points: DataFrame, edges: DataFrame, checkpoint_every: int = 1) -> DataFrame:
    """→ (lat, lon, label struct<lat,lon>) via min-label propagation."""
    labels = points.select(
        "lat", "lon", F.struct(F.col("lat").alias("llat"), F.col("lon").alias("llon")).alias("label")
    ).localCheckpoint()
    it = 0
    while True:
        it += 1
        msgs = (
            edges.join(labels, ["lat", "lon"])
            .select(F.col("nlat").alias("lat"), F.col("nlon").alias("lon"), "label")
            .unionByName(labels)
        )
        new_labels = msgs.groupBy("lat", "lon").agg(F.min("label").alias("label")).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), ["lat", "lon"])
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0 or it > 64:
            return labels


DRIVER_CC_MAX_PAIRS = 5_000_000  # collect-and-union-find below this; iterate above


def snap_map(points: DataFrame, config: EngineConfig, spark: SparkSession) -> DataFrame:
    """points(lat, lon) distinct → (lat, lon, snap_lat, snap_lon).

    ε-pairs are vastly fewer than points (only near-coincident endpoints
    qualify), so the common path collects JUST the pair edges and runs exact
    union-find + centroids in NumPy on the driver, then broadcast-joins the
    (tiny) non-identity mapping back onto the full point set — zero CC
    iterations, zero extra shuffles. Above ``DRIVER_CC_MAX_PAIRS`` the
    distributed min-label propagation path takes over (same partitions by
    construction: connected components are algorithm-independent).
    """
    stats = points.agg(
        F.max(F.abs(F.col("lat"))).alias("maxlat"), F.count("*").alias("n")
    ).collect()[0]
    identity = points.select(
        "lat", "lon", F.col("lat").alias("snap_lat"), F.col("lon").alias("snap_lon")
    )
    if stats["n"] == 0:
        return identity
    pair_edges = epsilon_pair_edges(
        points, config.snap_tolerance_m, float(stats["maxlat"])
    ).cache()
    n_pairs = pair_edges.count()
    if n_pairs == 0:
        return identity
    if n_pairs <= DRIVER_CC_MAX_PAIRS:
        return _snap_map_driver(points, pair_edges, config, spark)
    labels = connected_components(points, pair_edges)

    @pandas_udf("struct<snap_lat:double, snap_lon:double, max_disp:double>")
    def _centroid(members: pd.Series) -> pd.DataFrame:
        out_lat = np.empty(len(members))
        out_lon = np.empty(len(members))
        out_disp = np.empty(len(members))
        for i, m in enumerate(members):
            mlat = np.array([p["lat"] for p in m], dtype=np.float64)
            mlon = np.array([p["lon"] for p in m], dtype=np.float64)
            if mlat.shape[0] == 1:
                out_lat[i], out_lon[i] = mlat[0], mlon[0]
                out_disp[i] = 0.0
            else:
                cla, clo = centroid_of_members(mlat, mlon)
                out_lat[i], out_lon[i] = cla, clo
                disp = geodesic_m(mlat, mlon, np.full_like(mlat, cla), np.full_like(mlon, clo))
                out_disp[i] = float(disp.max())
        return pd.DataFrame({"snap_lat": out_lat, "snap_lon": out_lon, "max_disp": out_disp})

    clusters = labels.groupBy("label").agg(
        F.sort_array(F.collect_list(F.struct("lat", "lon"))).alias("members")
    )
    clusters = clusters.select(
        "members", _centroid("members").alias("c")
    ).select("members", "c.snap_lat", "c.snap_lon", "c.max_disp")

    max_allowed = config.snap_tolerance_m * config.max_displacement_multiplier
    bad = clusters.where(F.col("max_disp") > F.lit(max_allowed)).limit(1).count()
    if bad:
        # reference :1314-1317 — hard abort on displacement violations
        raise ValueError("Cluster displacement exceeds safety threshold")

    return clusters.select(
        F.explode("members").alias("m"), "snap_lat", "snap_lon"
    ).select(
        F.col("m.lat").alias("lat"),
        F.col("m.lon").alias("lon"),
        "snap_lat",
        "snap_lon",
    )


def _snap_map_driver(
    points: DataFrame, pair_edges: DataFrame, config: EngineConfig, spark: SparkSession
) -> DataFrame:
    """Exact union-find + centroids over the (small) involved-point set on
    the driver; mapping broadcast-joined back onto all points. Bit-identical
    to the distributed path: same partitions, same sorted-member centroid
    kernel, same displacement abort (reference :1314-1317)."""
    import numpy as np

    from ..functions.clustering import UnionFind

    rows = pair_edges.select("lat", "lon", "nlat", "nlon").collect()
    coords: dict[tuple, int] = {}
    for r in rows:
        for c in ((r["lat"], r["lon"]), (r["nlat"], r["nlon"])):
            if c not in coords:
                coords[c] = len(coords)
    uf = UnionFind(len(coords))
    for r in rows:
        uf.union(coords[(r["lat"], r["lon"])], coords[(r["nlat"], r["nlon"])])
    inv = [None] * len(coords)
    for c, i in coords.items():
        inv[i] = c
    labels = uf.labels()
    max_allowed = config.snap_tolerance_m * config.max_displacement_multiplier
    mapping_rows: list[tuple] = []
    for root in np.unique(labels):
        members = np.nonzero(labels == root)[0]
        mlat = np.array([inv[int(m)][0] for m in members])
        mlon = np.array([inv[int(m)][1] for m in members])
        if members.shape[0] == 1:
            cen = (float(mlat[0]), float(mlon[0]))
        else:
            cen = centroid_of_members(mlat, mlon)
            disp = geodesic_m(
                mlat, mlon, np.full(len(members), cen[0]), np.full(len(members), cen[1])
            )
            if float(disp.max()) > max_allowed:
                raise ValueError("Cluster displacement exceeds safety threshold")
        for m in members:
            c = inv[int(m)]
            mapping_rows.append((float(c[0]), float(c[1]), cen[0], cen[1]))
    mapping = spark.createDataFrame(
        mapping_rows, "lat double, lon double, snap_lat double, snap_lon double"
    )
    from pyspark.sql.functions import broadcast

    return points.join(broadcast(mapping), ["lat", "lon"], "left").select(
        "lat",
        "lon",
        F.coalesce("snap_lat", "lat").alias("snap_lat"),
        F.coalesce("snap_lon", "lon").alias("snap_lon"),
    )
