"""Interleaved-span parser: docs → parsed OSM records.

Spark-first replacement for the reference's osmium PBF scan
(osm_waterway_extractor.py:1368-1418, :2704-2738): instead of a per-object
Python callback (the reference's dominant cost, see BASELINE.md), this is a
declarative plan — ``posexplode(spans)`` → ``kind`` filter (pushed by
Catalyst) → ONE Arrow C++ ndjson batch kernel that parses node AND way
payloads in a single scan (``parse_osm``), with Python-round-exact
coordinate rounding fused in (reference :1579-1583, hoisted to parse time:
rounding is per-coordinate, so rounding node records before geometry
assembly is equivalent and saves a later array rewrite). Relations parse
via ``from_json`` (tiny volume, parsed on demand).

The docs table itself is never mutated: the per-row span-sequence invariant
(kind, text, media_ref, order) holds trivially and is pinned by
``span_sequence`` + tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.geodesy import round_coords

NODE_JSON_SCHEMA = "id bigint, lat double, lon double"
WAY_JSON_SCHEMA = "id bigint, refs array<bigint>, tags map<string,string>"
RELATION_JSON_SCHEMA = (
    "id bigint, members array<struct<type:string,ref:bigint,role:string>>, "
    "tags map<string,string>"
)


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


OSM_PARSED_SCHEMA = (
    "kind string, node_id long, lat double, lon double, "
    "way_id long, refs array<long>, tags map<string,string>"
)


def _osm_parse_kernel(precision: int):
    """ONE Arrow C++ ndjson pass for BOTH node and way payloads (union
    schema) — replaces the round-1 design of two full span scans (one
    Arrow-kernel scan for nodes + one Jackson from_json scan for ways).
    Node coordinates get Python-round-exact rounding in the same pass."""
    import io

    import numpy as np
    import pyarrow as pa
    import pyarrow.json as pajson

    node_schema = pa.schema(
        [("id", pa.int64()), ("lat", pa.float64()), ("lon", pa.float64())]
    )
    node_popts = pajson.ParseOptions(explicit_schema=node_schema)
    way_schema = pa.schema([("id", pa.int64()), ("refs", pa.list_(pa.int64()))])
    # tags keys are open-ended (real OSM) → let Arrow infer the per-batch
    # struct of observed keys, converted to dicts (null fields dropped)
    way_popts = pajson.ParseOptions(
        explicit_schema=way_schema, unexpected_field_behavior="infer"
    )
    # use_threads=False: Arrow's JSON reader otherwise fans each task out over
    # its own host-wide thread pool — N tasks × N-thread pools oversubscribes
    # the machine quadratically and destroys core-count scaling (measured:
    # parse anti-scaled 7× from 8→32 tasks with the default).
    ropts = pajson.ReadOptions(use_threads=False)

    def _null_i64(n):
        return pd.Series(np.full(n, np.nan)).astype("Int64")

    def kernel(batches):
        # node and way frames are yielded SEPARATELY (mapInPandas accepts
        # any number of frames per input batch; row order is unchanged —
        # nodes then ways, as the old concatenated frame emitted them):
        # pd.concat on frames with mostly-None object columns scanned every
        # element through is_valid_na_for_dtype — ~60% of this kernel's
        # profiled Python wall at 100k docs (guide §4.2).
        for pdf in batches:
            kinds = pdf["kind"].to_numpy()
            texts = pdf["text"]
            nmask = kinds == "osm_node"
            if nmask.any():
                blob = ("\n".join(texts[nmask])).encode("utf-8")
                tbl = pajson.read_json(
                    io.BytesIO(blob), read_options=ropts, parse_options=node_popts
                )
                n = len(tbl)
                yield pd.DataFrame(
                    {
                        "kind": np.repeat("osm_node", n),
                        "node_id": tbl.column("id").to_numpy(),
                        "lat": round_coords(tbl.column("lat").to_numpy(), precision),
                        "lon": round_coords(tbl.column("lon").to_numpy(), precision),
                        "way_id": _null_i64(n),
                        "refs": pd.Series([None] * n, dtype=object),
                        "tags": pd.Series([None] * n, dtype=object),
                    }
                )
            wmask = kinds == "osm_way"
            if wmask.any():
                blob = ("\n".join(texts[wmask])).encode("utf-8")
                tbl = pajson.read_json(
                    io.BytesIO(blob), read_options=ropts, parse_options=way_popts
                )
                n = len(tbl)
                if "tags" in tbl.schema.names:
                    sc = tbl.column("tags").combine_chunks()
                    fields = [f.name for f in sc.type]
                    cols = {f: sc.field(f).to_pylist() for f in fields}
                    tag_dicts = [
                        {k: cols[k][i] for k in fields if cols[k][i] is not None}
                        for i in range(n)
                    ]
                else:
                    tag_dicts = [{} for _ in range(n)]
                # refs as int64 views over the Arrow values buffer instead
                # of to_pylist(): no per-ref Python int boxing. Null ref
                # lists (a way span without a refs field) keep the slow
                # path so None survives as None.
                rcol = tbl.column("refs").combine_chunks()
                if rcol.null_count:
                    refs_arrays = rcol.to_pylist()
                else:
                    rvals = rcol.flatten().to_numpy(zero_copy_only=False)
                    roffs = rcol.offsets.to_numpy()
                    refs_arrays = np.split(rvals, (roffs[1:-1] - roffs[0]))
                yield pd.DataFrame(
                    {
                        "kind": np.repeat("osm_way", n),
                        "node_id": _null_i64(n),
                        "lat": np.full(n, np.nan),
                        "lon": np.full(n, np.nan),
                        "way_id": tbl.column("id").to_numpy(),
                        "refs": pd.Series(refs_arrays, dtype=object),
                        "tags": pd.Series(tag_dicts, dtype=object),
                    }
                )

    return kernel


def parse_osm(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """docs → union-schema parsed OSM records in ONE span scan: rows with
    ``kind='osm_node'`` carry (node_id, lat, lon); ``kind='osm_way'`` carry
    (way_id, refs, tags). The pipeline materializes this once and derives
    nodes/ways as cheap filters (nodes_from_parsed / ways_from_parsed)."""
    spans = explode_spans(docs).where(
        F.col("kind").isin("osm_node", "osm_way")
    ).select("kind", "text")
    return spans.mapInPandas(
        _osm_parse_kernel(config.coordinate_precision), schema=OSM_PARSED_SCHEMA
    )


def nodes_from_parsed(parsed: DataFrame) -> DataFrame:
    return parsed.where(F.col("kind") == "osm_node").select("node_id", "lat", "lon")


def ways_from_parsed(parsed: DataFrame, config: EngineConfig) -> DataFrame:
    """Way rows + the waterway-type scan filter (reference P1, :1390) and the
    ≥2-refs precursor (P2)."""
    ways = parsed.where(F.col("kind") == "osm_way").select("way_id", "refs", "tags")
    if config.filter_waterway_types:
        ways = ways.where(
            F.col("tags").getItem("waterway").isin(list(config.waterway_types))
        )
    return ways.where(F.size("refs") >= 2)


def parse_nodes(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """osm_node spans → (node_id long, lat double, lon double), rounded."""
    return nodes_from_parsed(parse_osm(docs, config))


def parse_ways(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """osm_way spans → (way_id long, refs array<long>, tags map) filtered."""
    return ways_from_parsed(parse_osm(docs, config), config)


def parse_relations(docs: DataFrame, config: EngineConfig) -> DataFrame:
    """osm_relation spans → (relation_id long, members array<struct>, tags).

    The reference's graph builder consumes only nodes and ways (its osmium
    handler :1368-1418 defines node/way callbacks; relations never feed the
    edge set) — this engine matches that: relations are parsed, preserved and
    countable, but intentionally NOT used in graph assembly (documented
    non-use, BASELINE.json north_star sentence 1)."""
    spans = explode_spans(docs)
    return (
        spans.where(F.col("kind") == "osm_relation")
        .select(F.from_json("text", RELATION_JSON_SCHEMA).alias("r"))
        .select(
            F.col("r.id").alias("relation_id"),
            F.col("r.members").alias("members"),
            F.col("r.tags").alias("tags"),
        )
    )
