"""A/B the parse stage: Arrow-Python ndjson kernel vs JVM from_json.

Variant 'py'  = current parse_osm (mapInPandas Arrow C++ ndjson kernel).
Variant 'jvm' = explode → from_json (Jackson, whole-stage codegen) with the
                exact round_coords applied to (lat, lon) via ONE vectorized
                pandas_udf (only 2 double columns cross Arrow).

Usage: taskset -c <cpuset> python scripts/ab_parse.py <cores> <n_docs> <variant>
Writes the parsed stage to scratch parquet exactly like the pipeline does.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_parse(docs, config):
    from pyspark.sql import functions as F

    from osmwaterwayextractor_spark.functions.geodesy import round_coords
    from osmwaterwayextractor_spark.sources.parse import (
        NODE_JSON_SCHEMA,
        WAY_JSON_SCHEMA,
        explode_spans,
    )

    precision = config.coordinate_precision

    @F.pandas_udf("double")
    def _round(s: pd.Series) -> pd.Series:
        return pd.Series(round_coords(s.to_numpy(dtype="float64"), precision))

    spans = explode_spans(docs).where(
        F.col("kind").isin("osm_node", "osm_way")
    ).select("kind", "text")
    n = F.when(F.col("kind") == "osm_node", F.from_json("text", NODE_JSON_SCHEMA))
    w = F.when(F.col("kind") == "osm_way", F.from_json("text", WAY_JSON_SCHEMA))
    return spans.select("kind", n.alias("n"), w.alias("w")).select(
        "kind",
        F.col("n.id").alias("node_id"),
        _round(F.col("n.lat")).alias("lat"),
        _round(F.col("n.lon")).alias("lon"),
        F.col("w.id").alias("way_id"),
        F.col("w.refs").alias("refs"),
        F.col("w.tags").alias("tags"),
    )


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    variant = sys.argv[3] if len(sys.argv) > 3 else "jvm"

    os.environ.setdefault("SPARK_GRAFT_BENCH_MODE", "pipeline")
    from bench import build_session

    spark = build_session(cores)
    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.sources.parse import parse_osm

    cfg = EngineConfig(filter_waterway_types=False)
    docs = spark.read.parquet(f"/dev/shm/osmwwe-scaling-docs-{n_docs}")
    out = f"/dev/shm/ab-parse-{variant}"

    t0 = time.time()
    df = parse_osm(docs, cfg) if variant == "py" else jvm_parse(docs, cfg)
    df.write.mode("overwrite").option(
        "parquet.block.size", str(8 * 1024 * 1024)
    ).parquet(out)
    sec = time.time() - t0
    n = spark.read.parquet(out).count()
    print(f'{{"variant": "{variant}", "cores": {cores}, "n_docs": {n_docs}, '
          f'"parse_sec": {sec:.2f}, "rows": {n}}}', flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
