"""One-off: decompose the intersections stage (detect vs insert, and their
internal jobs) to find why it runs ~140 s independent of core count."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.operators.assemble import assemble_geometries
from osmwaterwayextractor_spark.operators.geometry_ops import (
    INTERSECT_CELL_LEVEL,
    _resplit_dense_cells,
    _segments,
    _with_cover_cells,
    clean_and_simplify,
    detect_intersections,
    insert_intersections,
)
from osmwaterwayextractor_spark.plans.pipeline import spark_session
from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe
from osmwaterwayextractor_spark.sources.parse import (
    nodes_from_parsed,
    parse_osm,
    ways_from_parsed,
)

N_DOCS = int(os.environ.get("PROF_DOCS", "50000"))
CPUS = int(os.environ.get("PROF_CPUS", "8"))
SIMPLIFIED = f"/dev/shm/profile-simplified-{N_DOCS}"


def tmark(label, t0):
    print(f"[prof] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()


def main():
    spark = spark_session(
        app="profile-intersect",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra={
            "spark.driver.memory": "48g",
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    cfg = EngineConfig(filter_waterway_types=False)

    if not os.path.exists(SIMPLIFIED):
        t0 = time.time()
        params = DocsGenParams(seed=42, mega_every=200, mega_refs=20000)
        docs_dataframe(spark, N_DOCS, params).write.mode("overwrite").parquet(
            "/dev/shm/profile-docs"
        )
        docs = spark.read.parquet("/dev/shm/profile-docs")
        t0 = tmark("docs", t0)
        parsed = parse_osm(docs, cfg)
        parsed.write.mode("overwrite").parquet("/dev/shm/profile-parsed")
        parsed = spark.read.parquet("/dev/shm/profile-parsed")
        t0 = tmark("parsed", t0)
        assembled = assemble_geometries(
            ways_from_parsed(parsed, cfg), nodes_from_parsed(parsed), cfg
        )
        clean_and_simplify(assembled, cfg).write.mode("overwrite").parquet(SIMPLIFIED)
        t0 = tmark("simplified", t0)

    simplified = spark.read.parquet(SIMPLIFIED)
    n_ways = simplified.count()
    print(f"[prof] simplified ways: {n_ways}, files: "
          f"{len([f for f in os.listdir(SIMPLIFIED) if f.endswith('.parquet')])}")

    # --- detect, decomposed ---
    t0 = time.time()
    segs = _segments(simplified)
    segs.write.format("noop").mode("overwrite").save()
    t0 = tmark("segments (explode)", t0)

    covered = _with_cover_cells(segs, INTERSECT_CELL_LEVEL, 0.0)
    covered.write.format("noop").mode("overwrite").save()
    t0 = tmark("cover cells", t0)

    n_seg = covered.count()
    t0 = tmark(f"cover count ({n_seg} rows)", t0)

    re_split = _resplit_dense_cells(covered, INTERSECT_CELL_LEVEL, cfg.intersect_cell_cap, 0.0)
    re_split.write.format("noop").mode("overwrite").save()
    t0 = tmark("resplit dense", t0)

    # pair count without the python kernel
    a = re_split.select("cell", F.col("way_id").alias("way_a"))
    b = re_split.select("cell", F.col("way_id").alias("way_b"))
    n_pairs = a.join(b, "cell").where(F.col("way_a") < F.col("way_b")).count()
    t0 = tmark(f"pair join count ({n_pairs} pairs)", t0)

    pts = detect_intersections(simplified, cfg)
    pts.write.mode("overwrite").parquet("/dev/shm/profile-points")
    t0 = tmark("detect_intersections full", t0)
    pts = spark.read.parquet("/dev/shm/profile-points")
    print(f"[prof] intersection points: {pts.count()}")

    t0 = time.time()
    ins = insert_intersections(simplified, pts, cfg)
    ins.write.format("noop").mode("overwrite").save()
    t0 = tmark("insert_intersections full", t0)

    # exactly as the pipeline composes the stage: detect is LAZY inside
    # insert's plan, and the stage result lands as parquet
    t0 = time.time()
    lazy_pts = detect_intersections(simplified, cfg)
    staged = insert_intersections(simplified, lazy_pts, cfg)
    staged.write.mode("overwrite").parquet("/dev/shm/profile-intersected")
    t0 = tmark("pipeline-composed stage (lazy detect + parquet write)", t0)

    spark.stop()


if __name__ == "__main__":
    main()
