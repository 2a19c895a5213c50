"""Steps 1 / 1.5 / 1.75 — coordinate cleaning, simplification, intersections.

- ``clean_and_simplify``: one narrow Arrow stage per way (consecutive-dup
  removal, reference :1586-1589, + Douglas-Peucker, :1710-1749). No shuffle.
- ``detect_intersections`` (J5+F5): ways → segments (pure Catalyst) →
  bbox-cover cell assignment (pure Catalyst ``sequence``/bit-ops explodes) →
  cell self-join with ``way_a < way_b`` → exact vectorized segment math in an
  Arrow UDF → distinct intersection points. The cell cover replaces the
  reference's R-tree bbox prefilter (:1833-1863); because each segment is
  assigned EVERY cell its (tolerance-padded) bbox overlaps, two intersecting
  segments always share the cell containing their intersection point, so the
  equi-join candidate set is a superset of the true pairs.
- ``insert_intersections`` (W1): candidate points are cell-joined back to
  ways, grouped per way, and inserted by arc-length position in an Arrow
  kernel that replicates the reference's insertion quirks
  (functions.geometry.insert_points_on_line, reference :2039-2152).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.geometry import M_TO_DEG, insert_points_on_line, segment_intersections, simplify_dp
from ..functions.tiling import LEVEL_SHIFT, X_SHIFT, cell_width_deg

WAYS_SCHEMA = "way_id long, lats array<double>, lons array<double>, tags map<string,string>"

# quad level for segment-pair candidate cells: 0.011° ≈ 1.2 km cells — a few
# cells per typical river segment, fine enough to bound per-cell fan-out
INTERSECT_CELL_LEVEL = 14


def clean_and_simplify(ways: DataFrame, config: EngineConfig) -> DataFrame:
    """Consecutive-dup removal + optional DP simplify, one Arrow pass."""
    simplify_on = config.enable_geometry_simplification
    tol = config.simplification_tolerance_m * M_TO_DEG

    def kernel(batches):
        for pdf in batches:
            out_rows = {"way_id": [], "lats": [], "lons": [], "tags": []}
            for way_id, lats, lons, tags in zip(
                pdf["way_id"], pdf["lats"], pdf["lons"], pdf["tags"]
            ):
                la = np.asarray(lats, dtype=np.float64)
                lo = np.asarray(lons, dtype=np.float64)
                if la.shape[0] < 2:
                    continue
                # remove consecutive duplicates (vectorized)
                same = (la[1:] == la[:-1]) & (lo[1:] == lo[:-1])
                keep = np.concatenate([[True], ~same])
                la, lo = la[keep], lo[keep]
                if la.shape[0] < 2:
                    continue
                if simplify_on:
                    mask = simplify_dp(la, lo, tol)
                    la, lo = la[mask], lo[mask]
                    if la.shape[0] < 2:
                        continue
                out_rows["way_id"].append(way_id)
                out_rows["lats"].append(la)
                out_rows["lons"].append(lo)
                out_rows["tags"].append(tags)
            yield pd.DataFrame(out_rows)

    return ways.mapInPandas(kernel, schema=WAYS_SCHEMA)


def _segments(ways: DataFrame) -> DataFrame:
    """Explode ways into segments — pure Catalyst (no Python)."""
    return ways.select(
        "way_id",
        F.expr(
            "posexplode(transform(slice(lats, 1, size(lats)-1), (x, i) -> "
            "struct(x as lat1, lons[i] as lon1, "
            "element_at(lats, i+2) as lat2, element_at(lons, i+2) as lon2)))"
        ).alias("seg_idx", "seg"),
    ).select("way_id", "seg_idx", "seg.*")


def _with_cover_cells(segs: DataFrame, level: int, pad_deg: float) -> DataFrame:
    """Attach every level-``level`` cell the segment's padded bbox overlaps —
    sequence() explodes + bit-packed cell ids, all JVM-side."""
    w = cell_width_deg(level)
    return (
        segs.withColumn("_xlo", F.floor((F.least("lon1", "lon2") - pad_deg + 180.0) / w).cast("long"))
        .withColumn("_xhi", F.floor((F.greatest("lon1", "lon2") + pad_deg + 180.0) / w).cast("long"))
        .withColumn("_ylo", F.floor((F.least("lat1", "lat2") - pad_deg + 90.0) / w).cast("long"))
        .withColumn("_yhi", F.floor((F.greatest("lat1", "lat2") + pad_deg + 90.0) / w).cast("long"))
        .withColumn("cx", F.explode(F.sequence("_xlo", "_xhi")))
        .withColumn("cy", F.explode(F.sequence("_ylo", "_yhi")))
        .withColumn(
            "cell",
            F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
            + F.shiftleft(F.col("cx"), int(X_SHIFT))
            + F.col("cy"),
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi", "cx", "cy")
    )


DENSE_CELL_SPLIT_LEVELS = 3  # dense cells re-split 8× finer per axis


def _resplit_dense_cells(
    covered: DataFrame, level: int, cap: int, pad_deg: float
) -> DataFrame:
    """Skew defense for the segment-pair self-join: the per-cell candidate
    count is quadratic in per-cell segment count, so any cell whose segment
    count exceeds ``cap`` has its segments re-covered at ``level + 3`` (8×
    finer per axis), restricted to child cells of the dense parent.

    Completeness is preserved per region: an intersecting pair inside a dense
    cell has the intersection point inside both padded bboxes, so both
    segments cover the CHILD cell containing the point and still meet in the
    equi-join. Mixed-level cell ids never collide (level lives in the id's
    high bits)."""
    counts = covered.groupBy("cell").agg(F.count("*").alias("_n"))
    dense = counts.where(F.col("_n") > cap).select("cell").withColumn(
        "_dense", F.lit(True)
    )
    flagged = covered.join(F.broadcast(dense), "cell", "left")
    keep = flagged.where(F.col("_dense").isNull()).drop("_dense")
    split = (
        flagged.where(F.col("_dense").isNotNull())
        .drop("_dense")
        .withColumnRenamed("cell", "_parent")
    )
    from .tiles import parent_cell_col

    deep_level = level + DENSE_CELL_SPLIT_LEVELS
    deep = _with_cover_cells(split, deep_level, pad_deg)
    deep = deep.where(
        parent_cell_col(F.col("cell"), deep_level, level) == F.col("_parent")
    ).drop("_parent")
    return keep.unionByName(deep)


def detect_intersections(
    ways: DataFrame, config: EngineConfig, keep_way_ids: bool = False
) -> DataFrame:
    """→ DataFrame(plat double, plon double): distinct intersection points.
    With ``keep_way_ids`` also returns (way_a, way_b) per point — used by the
    QA crossing-edges check to attribute unsplit crossings to edges."""
    segs = _segments(ways)
    covered = _with_cover_cells(segs, INTERSECT_CELL_LEVEL, 0.0)
    covered = _resplit_dense_cells(
        covered, INTERSECT_CELL_LEVEL, config.intersect_cell_cap, 0.0
    )
    a = covered.select(
        F.col("cell"),
        F.col("way_id").alias("way_a"),
        F.col("lat1").alias("a_lat1"), F.col("lon1").alias("a_lon1"),
        F.col("lat2").alias("a_lat2"), F.col("lon2").alias("a_lon2"),
    )
    b = covered.select(
        F.col("cell"),
        F.col("way_id").alias("way_b"),
        F.col("lat1").alias("b_lat1"), F.col("lon1").alias("b_lon1"),
        F.col("lat2").alias("b_lat2"), F.col("lon2").alias("b_lon2"),
    )
    # NOTE: pairs sharing several cover cells are tested more than once — the
    # exact kernel is cheap and vectorized, and the output points are
    # distinct()ed below, so skipping a wide 8-double dedup shuffle here wins.
    pairs = a.join(b, "cell").where(F.col("way_a") < F.col("way_b")).drop("cell")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<hit:boolean, plat:double, plon:double>")
    def _intersect(
        a_lat1: pd.Series, a_lon1: pd.Series, a_lat2: pd.Series, a_lon2: pd.Series,
        b_lat1: pd.Series, b_lon1: pd.Series, b_lat2: pd.Series, b_lon2: pd.Series,
    ) -> pd.DataFrame:
        a1 = np.stack([a_lat1.to_numpy(), a_lon1.to_numpy()], axis=1)
        a2 = np.stack([a_lat2.to_numpy(), a_lon2.to_numpy()], axis=1)
        b1 = np.stack([b_lat1.to_numpy(), b_lon1.to_numpy()], axis=1)
        b2 = np.stack([b_lat2.to_numpy(), b_lon2.to_numpy()], axis=1)
        hit, pts = segment_intersections(a1, a2, b1, b2)
        return pd.DataFrame({"hit": hit, "plat": pts[:, 0], "plon": pts[:, 1]})

    hits = pairs.select(
        "way_a",
        "way_b",
        _intersect(
            "a_lat1", "a_lon1", "a_lat2", "a_lon2",
            "b_lat1", "b_lon1", "b_lat2", "b_lon2",
        ).alias("r"),
    ).where(F.col("r.hit"))
    if keep_way_ids:
        return hits.select(
            "way_a", "way_b", F.col("r.plat").alias("plat"), F.col("r.plon").alias("plon")
        ).distinct()
    return hits.select(F.col("r.plat").alias("plat"), F.col("r.plon").alias("plon")).distinct()


def insert_intersections(
    ways: DataFrame, points: DataFrame, config: EngineConfig
) -> DataFrame:
    """Insert candidate points (within snap-tolerance degrees) into each way."""
    tol_deg = config.snap_tolerance_m * M_TO_DEG
    precision = config.coordinate_precision

    segs = _segments(ways)
    covered = _with_cover_cells(segs, INTERSECT_CELL_LEVEL, tol_deg).select("cell", "way_id")
    w = cell_width_deg(INTERSECT_CELL_LEVEL)
    pts_cells = points.select(
        "plat",
        "plon",
        (
            F.lit(INTERSECT_CELL_LEVEL).cast("long") * F.lit(1 << 52).cast("long")
            + F.shiftleft(F.floor((F.col("plon") + 180.0) / w).cast("long"), int(X_SHIFT))
            + F.floor((F.col("plat") + 90.0) / w).cast("long")
        ).alias("cell"),
    )
    cand = (
        covered.join(pts_cells, "cell")
        .select("way_id", "plat", "plon")
        .distinct()
        .groupBy("way_id")
        .agg(F.collect_list(F.struct("plat", "plon")).alias("cand_pts"))
    )
    enriched = ways.join(cand, "way_id", "left")

    def kernel(batches):
        for pdf in batches:
            out = {"way_id": [], "lats": [], "lons": [], "tags": []}
            for way_id, lats, lons, tags, cand_pts in zip(
                pdf["way_id"], pdf["lats"], pdf["lons"], pdf["tags"], pdf["cand_pts"]
            ):
                la = np.asarray(lats, dtype=np.float64)
                lo = np.asarray(lons, dtype=np.float64)
                if cand_pts is not None and len(cand_pts) > 0:
                    coords = np.stack([la, lo], axis=1)
                    pts = np.array(
                        [[p["plat"], p["plon"]] for p in cand_pts], dtype=np.float64
                    )
                    new = insert_points_on_line(coords, pts, tol_deg, precision)
                    la, lo = new[:, 0], new[:, 1]
                out["way_id"].append(way_id)
                out["lats"].append(la)
                out["lons"].append(lo)
                out["tags"].append(tags)
            yield pd.DataFrame(out)

    return enriched.mapInPandas(kernel, schema=WAYS_SCHEMA)
