"""Print the detect_intersections physical plan with/without the barrier."""

import os
import sys

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

shape = sys.argv[1] if len(sys.argv) > 1 else "broadcast"
thresh = "64MB" if shape == "broadcast" else "-1"
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.autoBroadcastJoinThreshold", thresh)
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

cfg = EngineConfig(filter_waterway_types=False)
docs = docs_dataframe(spark, 50, DocsGenParams(seed=42))
parsed = parse_osm(docs, cfg)
simplified = clean_and_simplify(
    assemble_geometries(ways_from_parsed(parsed, cfg), nodes_from_parsed(parsed), cfg),
    cfg,
)
simplified.write.mode("overwrite").parquet("/dev/shm/explain-simpl")
simplified = spark.read.parquet("/dev/shm/explain-simpl")

for barrier in ("1", "0"):
    os.environ["OSMWWE_CODEGEN_BARRIER"] = barrier
    print(f"\n================ barrier={barrier} shape={shape}")
    detect_intersections(simplified, cfg).explain("formatted")

spark.stop()
