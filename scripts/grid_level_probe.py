"""One-off: candidate-pair volume of the intersect cell join at several grid
levels, with and without canonical-cell pair dedup, on staged 100k-doc
simplified ways (/dev/shm/hist-simp)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.operators.geometry_ops import (
    _resplit_dense_cells, _segments, _with_cover_cells)
from osmwaterwayextractor_spark.functions.tiling import X_SHIFT, cell_width_deg
from osmwaterwayextractor_spark.plans.pipeline import spark_session

spark = spark_session(app="grid-probe", master="local[4]",
    shuffle_partitions=16,
    extra={"spark.driver.memory": "24g",
           "spark.local.dir": "/dev/shm/spark-local",
           "spark.ui.enabled": "false"})
cfg = EngineConfig(filter_waterway_types=False)
simp = spark.read.parquet("/dev/shm/hist-simp")
segs = _segments(simp)
n_seg = segs.count()
print(f"segments: {n_seg}", flush=True)

for level in (14, 15, 16, 17):
    w = cell_width_deg(level)
    t0 = time.time()
    cov = _with_cover_cells(segs, level, 0.0)
    n_cov = cov.count()
    t_cov = time.time() - t0
    rs = _resplit_dense_cells(cov, level, cfg.intersect_cell_cap, 0.0)
    a = rs.select("cell","way_id",
                  F.least("lon1","lon2").alias("axlo"), F.least("lat1","lat2").alias("aylo"))
    b = rs.select("cell", F.col("way_id").alias("wb"),
                  F.least("lon1","lon2").alias("bxlo"), F.least("lat1","lat2").alias("bylo"))
    j = a.join(b, "cell").where(F.col("way_id") < F.col("wb"))
    t0 = time.time()
    n_pairs = j.count()
    t_pairs = time.time() - t0
    # canonical cell: cell containing the lower-left corner of the bbox overlap
    # (level of the row's own cell — resplit rows live at level+3)
    lvl = (F.col("cell") / F.lit(1 << 52)).cast("long")
    t0 = time.time()
    # compute canonical with exact per-level width via when() on the two levels present
    from osmwaterwayextractor_spark.operators.geometry_ops import DENSE_CELL_SPLIT_LEVELS
    deep = level + DENSE_CELL_SPLIT_LEVELS
    wl, wdp = cell_width_deg(level), cell_width_deg(deep)
    width = F.when(lvl == level, F.lit(wl)).otherwise(F.lit(wdp))
    cx = F.floor((F.greatest("axlo", "bxlo") + 180.0) / width).cast("long")
    cy = F.floor((F.greatest("aylo", "bylo") + 90.0) / width).cast("long")
    canon = lvl * F.lit(1 << 52).cast("long") + F.shiftleft(cx, int(X_SHIFT)) + cy
    n_canon = j.where(F.col("cell") == canon).count()
    t_canon = time.time() - t0
    print(f"level {level}: cover_rows={n_cov} ({t_cov:.1f}s) pairs={n_pairs} "
          f"({t_pairs:.1f}s) canonical={n_canon} ({t_canon:.1f}s)", flush=True)
spark.stop()
