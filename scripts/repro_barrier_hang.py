"""Minimal repro: detect_intersections wall time with/without the codegen
barrier, at tiny doc counts, in both join shapes (broadcast and SMJ)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.operators.assemble import assemble_geometries
from osmwaterwayextractor_spark.operators.geometry_ops import (
    clean_and_simplify,
    detect_intersections,
)
from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe
from osmwaterwayextractor_spark.sources.parse import (
    nodes_from_parsed,
    parse_osm,
    ways_from_parsed,
)

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
shape = sys.argv[2] if len(sys.argv) > 2 else "broadcast"  # or "smj"

thresh = "64MB" if shape == "broadcast" else "-1"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.autoBroadcastJoinThreshold", thresh)
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

cfg = EngineConfig(filter_waterway_types=False)
docs = docs_dataframe(spark, n_docs, DocsGenParams(seed=42))
parsed = parse_osm(docs, cfg)
simplified = clean_and_simplify(
    assemble_geometries(ways_from_parsed(parsed, cfg), nodes_from_parsed(parsed), cfg),
    cfg,
).cache()
print("ways:", simplified.count(), flush=True)

for barrier in ("1", "0"):
    os.environ["OSMWWE_CODEGEN_BARRIER"] = barrier
    t0 = time.time()
    n = detect_intersections(simplified, cfg).count()
    print(
        f"[repro] shape={shape} barrier={barrier}: {n} points "
        f"in {time.time() - t0:.2f}s",
        flush=True,
    )

spark.stop()
