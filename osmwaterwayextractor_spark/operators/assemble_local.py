"""Local-first geometry assembly (J1 shuffle-elimination).

Interleaved documents carry a way's node records alongside the way in the
SAME document for the overwhelming majority of ways (the interleave is
block-local, like OSM PBF blocks). Shuffling 10¹¹ exploded refs through a
global hash join to resolve coordinates that are already sitting in the same
input split wastes the dominant shuffle of the whole pipeline.

``assemble_local_first`` therefore:

1. runs ONE narrow ``mapInPandas`` over the docs table that parses each
   document's spans (batch ``json.loads`` over the span-text array — a
   C-accelerated batch kernel, not a row-at-a-time UDF) and assembles every
   way whose refs all resolve inside its own document — zero shuffle;
2. emits the rare ways with out-of-document refs unassembled; only THOSE go
   through the global exploded-ref join (operators.assemble), probing the
   full node table;
3. unions both results.

Semantics are identical to the global join (same rounding — shared
``round_coords`` — same drop rules), pinned by the oracle-parity tests with
``p_nonlocal_ref > 0`` generator data exercising both paths.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.geodesy import round_coords
from .assemble import assemble_geometries

LOCAL_SCHEMA = (
    "rec string, way_id long, lats array<double>, lons array<double>, "
    "tags map<string,string>, refs array<long>"
)


def _local_kernel(config: EngineConfig):
    precision = config.coordinate_precision
    do_filter = config.filter_waterway_types
    types = set(config.waterway_types)

    def kernel(batches):
        for pdf in batches:
            out = {"rec": [], "way_id": [], "lats": [], "lons": [], "tags": [], "refs": []}
            for spans in pdf["spans"]:
                nodes: dict[int, tuple[float, float]] = {}
                ways = []
                for s in spans:
                    kind = s["kind"]
                    if kind == "osm_node":
                        rec = json.loads(s["text"])
                        nodes[rec["id"]] = (rec["lat"], rec["lon"])
                    elif kind == "osm_way":
                        ways.append(json.loads(s["text"]))
                if not ways:
                    continue
                if nodes:
                    ids = np.fromiter(nodes.keys(), dtype=np.int64, count=len(nodes))
                    la = round_coords(np.fromiter((v[0] for v in nodes.values()), dtype=np.float64, count=len(nodes)), precision)
                    lo = round_coords(np.fromiter((v[1] for v in nodes.values()), dtype=np.float64, count=len(nodes)), precision)
                    local = dict(zip(ids.tolist(), zip(la.tolist(), lo.tolist())))
                else:
                    local = {}
                for w in ways:
                    tags = w.get("tags") or {}
                    refs = w.get("refs") or []
                    if do_filter and tags.get("waterway") not in types:
                        continue
                    if len(refs) < 2:
                        continue
                    coords = []
                    resolved = True
                    for r in refs:
                        c = local.get(r)
                        if c is None:
                            resolved = False
                            break
                        coords.append(c)
                    if resolved:
                        out["rec"].append("geom")
                        out["way_id"].append(w["id"])
                        out["lats"].append([c[0] for c in coords])
                        out["lons"].append([c[1] for c in coords])
                        out["tags"].append(tags)
                        out["refs"].append(None)
                    else:
                        out["rec"].append("pending")
                        out["way_id"].append(w["id"])
                        out["lats"].append(None)
                        out["lons"].append(None)
                        out["tags"].append(tags)
                        out["refs"].append(refs)
            yield pd.DataFrame(out)

    return kernel


def assemble_local_first(
    docs: DataFrame, nodes: DataFrame, config: EngineConfig
) -> DataFrame:
    """docs + global nodes table → (way_id, lats, lons, tags).

    ``nodes`` is only probed for the pending (cross-document) ways.
    """
    parsed = docs.select("spans").mapInPandas(
        _local_kernel(config), schema=LOCAL_SCHEMA
    ).localCheckpoint(eager=True)
    local_geoms = parsed.where(F.col("rec") == "geom").select(
        "way_id", "lats", "lons", "tags"
    )
    pending = parsed.where(F.col("rec") == "pending").select("way_id", "refs", "tags")
    if pending.isEmpty():  # cheap: `parsed` is checkpointed
        return local_geoms  # don't shuffle the whole node table for nothing
    joined = assemble_geometries(pending, nodes, config)
    return local_geoms.unionByName(joined)
