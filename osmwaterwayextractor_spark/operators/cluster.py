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
    """Join-grid cell id with the SAME lon-wrap / lat-clip normalization as
    ``_ring_cells_expr`` — a point exactly at lon=±180 or lat=±90 must land
    in a cell that is a member of its own ring-1 block set, otherwise its
    cluster is owned by no block and silently never emitted."""
    w = cell_width_deg(level)
    nx = 2 << level
    ny = 1 << level
    x = F.floor((F.col(lon_col) + 180.0) / w).cast("long")
    y = F.floor((F.col(lat_col) + 90.0) / w).cast("long")
    xx = ((x % nx) + nx) % nx
    yy = F.greatest(F.lit(0).cast("long"), F.least(F.lit(ny - 1).cast("long"), y))
    return (
        F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
        + F.shiftleft(xx, int(X_SHIFT))
        + yy
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


def _ring_cells_of_cell_expr(cell_col: str, level: int):
    """3×3 neighborhood of a NORMALIZED cell id (decode → offset with lon
    wrap / lat clamp → re-encode). Equivalent to ``_ring_cells_expr`` on any
    point inside the cell: both reduce to cell adjacency in normalized
    (wrapped/clamped) grid space."""
    nx = 2 << level
    ny = 1 << level
    pay = F.col(cell_col) - F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
    x = F.shiftright(pay, int(X_SHIFT))
    y = pay - F.shiftleft(F.shiftright(pay, int(X_SHIFT)), int(X_SHIFT))
    cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            xx = (x + dx + nx) % nx
            yy = F.greatest(
                F.lit(0).cast("long"), F.least(F.lit(ny - 1).cast("long"), y + dy)
            )
            cells.append(
                F.lit(level).cast("long") * F.lit(1 << 52).cast("long")
                + F.shiftleft(xx, int(X_SHIFT))
                + yy
            )
    return F.array_distinct(F.array(*cells))


# hot-block broadcast guard: the set of blocks with >=2 points in their 3x3
# neighborhood is bounded by the epsilon-pair population (the same quantity
# the mapping localCheckpoint already assumes is executor-memory small), but
# at 10^12-doc scale a pathological corpus could blow it up — past this many
# blocks the prune falls back to a shuffle semi-join instead of a broadcast.
# 2M single-long rows ≈ 16 MB raw / low-hundreds-MB hashed relation: safe on
# a DEFAULT driver/executor heap, not just the bench's 48g (ADVICE r4 — the
# old 20M cap could build a multi-GB driver-side hashed relation).
HOT_BLOCK_BROADCAST_MAX = 2_000_000


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
        if changed == 0:
            return labels
        if it > 64:
            # a silent wrong answer from a parity oracle is worse than a
            # crash (reference hard-abort analog :1314-1317)
            raise RuntimeError(
                "connected_components did not converge within 64 iterations"
            )


DRIVER_CC_MAX_PAIRS = 50_000  # _snap_map_driver cross-check bound (tests)


def snap_map(
    points: DataFrame,
    config: EngineConfig,
    spark: SparkSession,
    max_abs_lat: float | None = None,
) -> DataFrame:
    """points(lat, lon) distinct → (lat, lon, snap_lat, snap_lon).

    Production path: ``_snap_map_blocks`` — a SINGLE-SHUFFLE exact
    ε-clustering. The displacement guardrail (reference :1314-1317) bounds
    every acceptable cluster's diameter at D = 2·tol·multiplier, so points
    replicated to their ring-1 blocks at a grid level whose cell edge is
    ≥ D + 2·tol make each cluster FULLY visible from its minimum member's
    home block:

    - if a block-local cluster's displacement ≤ tol·multiplier, its bbox is
      ≤ D, so any unseen ε-neighbor would lie within D + tol of the home
      block — inside the replicated halo — contradiction: the view is
      provably complete and the emitted centroid exact;
    - if the seen displacement exceeds the bound, the FULL cluster's
      displacement must too (a compliant full cluster would have been fully
      seen), which is exactly the reference's hard-abort case.

    No iterative label propagation, no pair collect to the driver — three
    driver actions total (max|lat| agg, the small mapping checkpoint, the
    violation probe). ``_snap_map_driver`` (union-find on collected pairs)
    and ``connected_components`` (min-label propagation) remain as
    independent cross-check implementations for the parity tests.
    """
    import os
    import time

    if max_abs_lat is None:
        max_abs_lat = points.agg(F.max(F.abs(F.col("lat")))).collect()[0][0]
    identity = points.select(
        "lat", "lon", F.col("lat").alias("snap_lat"), F.col("lon").alias("snap_lon")
    )
    if max_abs_lat is None:  # empty input
        return identity
    t0 = time.time()
    mapping = _snap_map_blocks(points, config, float(max_abs_lat)).localCheckpoint(
        eager=True
    )
    if os.environ.get("OSMWWE_STAGE_TIMING"):
        print(f"[snap] block kernel+checkpoint: {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    if mapping.where(F.col("viol") == 1).limit(1).count() > 0:
        # reference :1314-1317 — hard abort on displacement violations
        raise ValueError("Cluster displacement exceeds safety threshold")
    if os.environ.get("OSMWWE_STAGE_TIMING"):
        print(f"[snap] violation probe: {time.time() - t0:.2f}s", flush=True)
    return points.join(mapping.drop("viol"), ["lat", "lon"], "left").select(
        "lat",
        "lon",
        F.coalesce("snap_lat", "lat").alias("snap_lat"),
        F.coalesce("snap_lon", "lon").alias("snap_lon"),
    )


def _snap_map_blocks(
    points: DataFrame, config: EngineConfig, max_abs_lat: float
) -> DataFrame:
    """→ (lat, lon, snap_lat, snap_lon, viol) for every point in an ε-pair.

    Block grid: deepest level whose cell edge covers D + 2·tol in both axes
    at the data's max |lat| (functions.tiling.join_grid_level); each point
    lands in its home block and replicates to ring-1 neighbors. Per block,
    the oracle's vectorized grid-bucket ε-pair kernel + union-find +
    sorted-member centroid run in one Arrow pass; a cluster is emitted only
    by its minimum member's home block (no duplicates — see snap_map
    docstring for the completeness proof)."""
    tol = config.snap_tolerance_m
    r_disp = tol * config.max_displacement_multiplier
    halo_m = 2.0 * r_disp + 2.0 * tol
    level = join_grid_level(halo_m, max_abs_lat)

    # Hot-point prune AT TOLERANCE RESOLUTION: a point can belong to an
    # ε-pair only if some OTHER point lies within tol, and any such point's
    # cell AT A GRID WHOSE EDGE ≥ tol is adjacent (±1, wrapped/clamped) to
    # its own. Pruning at the coarse BLOCK grid (edge ≥ 2·r_disp + 2·tol,
    # several× tol) barely prunes — on the 100k-doc corpus it kept 730k hot
    # blocks and the kernel's per-block Python loop still dominated
    # (77 s of a 380 s 4-CPU leg). At the tol-level grid, "some other point
    # in my 3×3" approximates the actual ε-pair population, so the 9× ring
    # replication + block sort + per-block kernel only ever see genuine
    # cluster candidates; every pruned point provably joins no cluster and
    # the downstream left join defaults it to identity (identical output).
    # Cost: two map-combinable aggs over tiny (long, long) rows.
    prune_level = join_grid_level(tol, max_abs_lat)
    home_pts = points.select(
        "lat",
        "lon",
        _cell_expr("lat", "lon", prune_level).alias("home"),
    )
    occ = home_pts.groupBy("home").agg(F.count("*").alias("cnt"))
    nbh = (
        occ.select(
            F.explode(_ring_cells_of_cell_expr("home", prune_level)).alias("block"), "cnt"
        )
        .groupBy("block")
        .agg(F.sum("cnt").alias("nbh_cnt"))
    )
    import os
    import time

    t0 = time.time()
    hot_blocks = (
        nbh.where(F.col("nbh_cnt") >= 2)
        .select(F.col("block").alias("home"))
        .localCheckpoint(eager=True)  # tiny; reused by the count + the join
    )
    n_hot = hot_blocks.count()
    if os.environ.get("OSMWWE_STAGE_TIMING"):
        print(
            f"[snap] hot-block prune: {time.time() - t0:.2f}s ({n_hot} hot blocks)",
            flush=True,
        )
    if n_hot <= HOT_BLOCK_BROADCAST_MAX:
        hot_blocks = F.broadcast(hot_blocks)
    hot = home_pts.join(hot_blocks, "home", "leftsemi").drop("home")

    # replication + cluster ownership stay at the BLOCK grid (edge ≥
    # D + 2·tol — the completeness proof's level); the prune level above is
    # only a point filter. The point's own home block is NOT shuffled — the
    # kernel recomputes it vectorized from (lat, lon) with the same
    # wrap/clamp normalization as _cell_expr, saving 8 of 32 bytes per
    # replicated row across the exchange (guide §2.3 shuffle fewer bytes).
    replicated = hot.select(
        "lat",
        "lon",
        F.explode(_ring_cells_expr("lat", "lon", level)).alias("block"),
    )

    from ..functions.clustering import UnionFind, epsilon_pairs

    # blocks up to this size take the vectorized all-pairs path; bigger
    # blocks (dense areas) keep the per-block grid-bucket kernel whose
    # candidate count stays near-linear
    BRUTE_CAP = 48

    def _home_cells_np(plats: np.ndarray, plons: np.ndarray) -> np.ndarray:
        """NumPy twin of _cell_expr(level): floor → java-style %-wrap → clamp.
        NumPy's % is already a positive floor-mod for positive divisors, so
        ((x % nx) + nx) % nx collapses to the same canonical value."""
        w = cell_width_deg(level)
        nx = np.int64(2 << level)
        ny = np.int64(1 << level)
        x = np.floor((plons + 180.0) / w).astype(np.int64)
        y = np.floor((plats + 90.0) / w).astype(np.int64)
        xx = ((x % nx) + nx) % nx
        yy = np.clip(y, 0, ny - 1)
        return (
            np.int64(level) * np.int64(1 << 52) + (xx << np.int64(X_SHIFT)) + yy
        )

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        """Rows SORTED by block (one or many whole blocks) → emitted snap
        rows. Same output as the original per-block loop — the ε-pair set
        per block is exactly {(i,j): geodesic ≤ tol} and union-find roots
        are order-canonical (min member index) — but candidate pairs for
        small blocks are generated for the WHOLE batch at once (size-grouped
        triu indices), the exact geodesic filter runs as ONE vectorized call,
        and union-find runs once over the points that appear in any pair.
        The old loop paid ~500 µs of grid-bucket machinery per block at an
        average block size of ~2 (round-6 cProfile: 8,411 blocks, 85% of
        kernel wall in epsilon_pairs/k_ring/cell_id setup; guide §4.2)."""
        lats = pdf["lat"].to_numpy(dtype=np.float64)
        lons = pdf["lon"].to_numpy(dtype=np.float64)
        blocks = pdf["block"].to_numpy(dtype=np.int64)
        out = {"lat": [], "lon": [], "snap_lat": [], "snap_lon": [], "viol": []}
        n = blocks.shape[0]
        if n == 0:
            return pd.DataFrame(out)
        bstarts = np.concatenate([[0], np.nonzero(np.diff(blocks))[0] + 1, [n]])
        starts = bstarts[:-1]
        sizes = np.diff(bstarts)
        gi_parts: list[np.ndarray] = []
        gj_parts: list[np.ndarray] = []
        small = (sizes >= 2) & (sizes <= BRUTE_CAP)
        for k in np.unique(sizes[small]):
            s_k = starts[small & (sizes == k)]
            iu, ju = np.triu_indices(int(k), 1)
            gi_parts.append((s_k[:, None] + iu[None, :]).ravel())
            gj_parts.append((s_k[:, None] + ju[None, :]).ravel())
        if gi_parts:
            ci = np.concatenate(gi_parts)
            cj = np.concatenate(gj_parts)
            d = geodesic_m(lats[ci], lons[ci], lats[cj], lons[cj])
            keep = d <= tol
            gi_parts, gj_parts = [ci[keep]], [cj[keep]]
        for bs, k in zip(starts[sizes > BRUTE_CAP], sizes[sizes > BRUTE_CAP]):
            li, lj = epsilon_pairs(lats[bs : bs + k], lons[bs : bs + k], tol)
            if li.shape[0]:
                gi_parts.append(bs + li)
                gj_parts.append(bs + lj)
        if not gi_parts:
            return pd.DataFrame(out)
        pi = np.concatenate(gi_parts)
        pj = np.concatenate(gj_parts)
        if not pi.shape[0]:
            return pd.DataFrame(out)
        # union-find over the involved points only (compact ids); the root
        # of a component is its minimum index either way, so clusters match
        # the per-block formulation exactly
        iv = np.unique(np.concatenate([pi, pj]))
        uf = UnionFind(iv.shape[0])
        for x, y in zip(
            np.searchsorted(iv, pi).tolist(), np.searchsorted(iv, pj).tolist()
        ):
            uf.union(x, y)
        labels = uf.labels()
        order = np.argsort(labels, kind="stable")
        slab = labels[order]
        cb = np.concatenate([[0], np.nonzero(np.diff(slab))[0] + 1, [slab.shape[0]]])
        homes = _home_cells_np(lats[iv], lons[iv])  # home of each involved point
        for s, e in zip(cb[:-1], cb[1:]):
            idx = order[s:e]  # compact ids, ascending ⇒ global order preserved
            if idx.shape[0] < 2:
                continue
            g = iv[idx]
            mlat, mlon = lats[g], lons[g]
            block = int(blocks[g[0]])  # members share one block by construction
            mloc = np.lexsort((mlon, mlat))[0]
            if int(homes[idx[mloc]]) != block:
                continue  # owned (and emitted) by another block
            cla, clo = centroid_of_members(mlat, mlon)
            disp = geodesic_m(
                mlat, mlon, np.full(g.shape[0], cla), np.full(g.shape[0], clo)
            )
            viol = 1 if float(disp.max()) > r_disp else 0
            out["lat"].extend(mlat.tolist())
            out["lon"].extend(mlon.tolist())
            out["snap_lat"].extend([cla] * g.shape[0])
            out["snap_lon"].extend([clo] * g.shape[0])
            out["viol"].extend([viol] * g.shape[0])
        return pd.DataFrame(out)

    def kernel(batches):
        # boundary-aware batch walk (same pattern as the J1 reassembly
        # kernel): hold back the trailing — possibly incomplete — block of
        # each Arrow batch and prepend it to the next
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            blocks = pdf["block"].to_numpy()
            cut = int(np.searchsorted(blocks, blocks[-1], side="left"))
            carry = pdf.iloc[cut:]
            if cut:
                res = _process(pdf.iloc[:cut])
                if len(res):
                    yield res
        if carry is not None and len(carry):
            res = _process(carry)
            if len(res):
                yield res

    n_part = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    rep = replicated.repartition(n_part, "block").sortWithinPartitions("block")
    return rep.mapInPandas(
        kernel,
        schema="lat double, lon double, snap_lat double, snap_lon double, viol int",
    )


def _snap_map_labelprop(
    points: DataFrame, config: EngineConfig, spark: SparkSession, max_abs_lat: float
) -> DataFrame:
    """Cross-check implementation: iterative min-label propagation over the
    distributed ε-pair edges (the round-1 production path, kept for the
    algorithm-independence parity test)."""
    identity = points.select(
        "lat", "lon", F.col("lat").alias("snap_lat"), F.col("lon").alias("snap_lon")
    )
    pair_edges = epsilon_pair_edges(
        points, config.snap_tolerance_m, max_abs_lat
    ).localCheckpoint(eager=True)
    if pair_edges.limit(1).count() == 0:
        return identity
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
    points: DataFrame, pairs_pdf: pd.DataFrame, config: EngineConfig, spark: SparkSession
) -> DataFrame:
    """Exact union-find + centroids over the (small) involved-point set on
    the driver — array-vectorized, no per-row Python except the ≤50k-step
    union loop and the per-CLUSTER centroid calls (whose summation order is
    the bit-parity contract, functions.clustering.centroid_of_members).
    Mapping broadcast-joined back onto all points. Bit-identical to the
    distributed path: same partitions, same sorted-member centroid kernel,
    same displacement abort (reference :1314-1317)."""
    from ..functions.clustering import UnionFind

    a = pairs_pdf[["lat", "lon"]].to_numpy(dtype=np.float64)
    b = pairs_pdf[["nlat", "nlon"]].to_numpy(dtype=np.float64)
    uniq, inv = np.unique(np.concatenate([a, b], axis=0), axis=0, return_inverse=True)
    n_pairs = a.shape[0]
    uf = UnionFind(uniq.shape[0])
    for x, y in zip(inv[:n_pairs].tolist(), inv[n_pairs:].tolist()):
        uf.union(x, y)
    labels = uf.labels()
    order = np.argsort(labels, kind="stable")
    slab = labels[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(slab))[0] + 1, [slab.shape[0]]])
    snap_lat = np.empty(uniq.shape[0])
    snap_lon = np.empty(uniq.shape[0])
    max_allowed = config.snap_tolerance_m * config.max_displacement_multiplier
    for s, e in zip(starts[:-1], starts[1:]):
        idx = order[s:e]
        mlat, mlon = uniq[idx, 0], uniq[idx, 1]
        if idx.shape[0] == 1:
            cla, clo = float(mlat[0]), float(mlon[0])
        else:
            cla, clo = centroid_of_members(mlat, mlon)
            disp = geodesic_m(
                mlat, mlon, np.full(idx.shape[0], cla), np.full(idx.shape[0], clo)
            )
            if float(disp.max()) > max_allowed:
                raise ValueError("Cluster displacement exceeds safety threshold")
        snap_lat[idx] = cla
        snap_lon[idx] = clo
    mapping = spark.createDataFrame(
        pd.DataFrame(
            {"lat": uniq[:, 0], "lon": uniq[:, 1], "snap_lat": snap_lat, "snap_lon": snap_lon}
        )
    )
    from pyspark.sql.functions import broadcast

    return points.join(broadcast(mapping), ["lat", "lon"], "left").select(
        "lat",
        "lon",
        F.coalesce("snap_lat", "lat").alias("snap_lat"),
        F.coalesce("snap_lon", "lon").alias("snap_lon"),
    )
