"""Interleaved-span parser: docs → (nodes_df, ways_df).

Spark-first replacement for the reference's osmium PBF scan
(osm_waterway_extractor.py:1368-1418, :2704-2738): instead of a per-object
Python callback (the reference's dominant cost, see BASELINE.md), this is a
declarative plan — ``posexplode(spans)`` → ``kind`` filter (pushed by
Catalyst) → ``from_json`` (JVM-side, whole-stage codegen) — plus exactly one
Arrow-vectorized UDF to round node coordinates with Python-round semantics
(coordinate rounding, reference :1579-1583, hoisted to parse time: rounding
is per-coordinate, so rounding node records before geometry assembly is
equivalent and saves a later array rewrite).

The docs table itself is never mutated: the per-row span-sequence invariant
(kind, text, media_ref, order) holds trivially and is pinned by
``span_sequence`` + tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import EngineConfig
from ..functions.geodesy import round_coords

NODE_JSON_SCHEMA = "id bigint, lat double, lon double"
WAY_JSON_SCHEMA = "id bigint, refs array<bigint>, tags map<string,string>"


def _round_udf(precision: int):
    @pandas_udf("double")
    def _round(col: pd.Series) -> pd.Series:
        return pd.Series(round_coords(col.to_numpy(dtype=float), precision))

    return _round


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, text, media_ref, offset) — one row per span."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def span_sequence(docs: DataFrame) -> DataFrame:
    """Canonical per-row invariant view: (doc_id, pos, kind, text, media_ref),
    ordered by in-array position. Compared before/after any engine round-trip
    to prove spans survive bit-for-bit (BASELINE.json per-row invariant)."""
    return explode_spans(docs).select("doc_id", "pos", "kind", "text", "media_ref")


def parse_nodes(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """osm_node spans → (node_id long, lat double, lon double), rounded."""
    spans = explode_spans(docs)
    parsed = (
        spans.where(F.col("kind") == "osm_node")
        .select(F.from_json("text", NODE_JSON_SCHEMA).alias("n"))
        .select(
            F.col("n.id").alias("node_id"),
            F.col("n.lat").alias("lat_raw"),
            F.col("n.lon").alias("lon_raw"),
        )
    )
    r = _round_udf(config.coordinate_precision)
    return parsed.select(
        "node_id", r("lat_raw").alias("lat"), r("lon_raw").alias("lon")
    )


def parse_ways(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """osm_way spans → (way_id long, refs array<long>, tags map) with the
    waterway-type scan filter (reference P1, :1390) pushed to parse time."""
    spans = explode_spans(docs)
    ways = (
        spans.where(F.col("kind") == "osm_way")
        .select(F.from_json("text", WAY_JSON_SCHEMA).alias("w"))
        .select(
            F.col("w.id").alias("way_id"),
            F.col("w.refs").alias("refs"),
            F.col("w.tags").alias("tags"),
        )
    )
    if config.filter_waterway_types:
        ways = ways.where(
            F.col("tags").getItem("waterway").isin(list(config.waterway_types))
        )
    # reference P2 precursor: a way needs ≥2 refs to ever form a segment
    return ways.where(F.size("refs") >= 2)
