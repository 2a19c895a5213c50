"""Golden snapshots for the rows-only entry queries (VERDICT r3 item 3).

The driver's DuckDB correctness gate can only check queries with an
``oracle_sql`` entry; nine queries are not SQL-expressible. This script
computes their expected outputs INDEPENDENTLY of the Spark operators —
single-process ``oracle.py`` for the waterway graph, pure-Python/NumPy
reimplementations for the dedup/ANN/fingerprint/media families (sharing only
the bit-validated ``functions/`` kernels, per the parity contract) — and
writes them to ``goldens/<name>.parquet``. ``entry_queries.oracle_sql`` then
exposes each as ``SELECT * FROM read_parquet(...)`` so the driver records a
falsifiable rows+schema+hash match instead of ``no_oracle``.

Goldens are pinned to the driver's correctness scale factor:
``/root/testdata/sf0.01`` (override: GOLDEN_SF_DIR). The waterway_* and
media_features fixtures are sf-independent (deterministic docsgen).

Usage:
    python scripts/make_goldens.py          # (re)generate goldens + manifest
    python scripts/make_goldens.py --check  # ALSO run each Spark query on
                                            # local[4] and diff exactly
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLD = os.path.join(REPO, "goldens")
SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.01")

from osmwaterwayextractor_spark.config import EngineConfig  # noqa: E402
from osmwaterwayextractor_spark.functions.geodesy import geodesic_m  # noqa: E402
from osmwaterwayextractor_spark.functions.hashing import xxh64_ascii  # noqa: E402
from osmwaterwayextractor_spark.functions.tiling import cell_id_h3res  # noqa: E402
from osmwaterwayextractor_spark.oracle import run_oracle  # noqa: E402
from osmwaterwayextractor_spark.sources.docsgen import (  # noqa: E402
    DocsGenParams,
    generate_doc,
)

# same fixture as entry_queries._synth_docs
_PARAMS = DocsGenParams(seed=42, mega_every=50, mega_refs=800)
_CFG = EngineConfig(filter_waterway_types=False)
_MERSENNE = (1 << 31) - 1


def spark_round(x: float, d: int) -> float:
    """Spark round(double, d): BigDecimal.valueOf(shortest repr), HALF_UP."""
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def xxh64_i64(strings: list[str]) -> np.ndarray:
    """Spark xxhash64(string) = XXH64(utf8, seed 42) as signed long."""
    if not strings:
        return np.zeros(0, dtype=np.int64)
    return xxh64_ascii(np.array(strings, dtype=np.str_), seed=42).astype(np.int64)


def _read_table(name: str):
    return pq.read_table(os.path.join(SF_DIR, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# waterway graph family (independent implementation: oracle.py)

def _oracle_result():
    docs = [generate_doc(i, _PARAMS) for i in range(120)]
    return run_oracle(docs, _CFG)


def golden_waterway_edges(res) -> pa.Table:
    cols = ["id", "from_node_id", "to_node_id", "length_m", "name", "type",
            "width_raw", "width_m", "width_source", "original_way_id"]
    types = {
        "length_m": pa.float64(), "width_m": pa.float64(),
        "original_way_id": pa.int64(),
    }
    data = {c: [e[c] for e in res.edges] for c in cols}
    return pa.table(
        {c: pa.array(data[c], type=types.get(c, pa.string())) for c in cols}
    )


def golden_waterway_nodes(res) -> pa.Table:
    cells = {}
    for nd in res.nodes:
        lat, lon = np.array([nd["lat"]]), np.array([nd["lon"]])
        cells[nd["id"]] = {
            r: int(cell_id_h3res(lat, lon, r)[0]) for r in _CFG.tile_resolutions
        }
    return pa.table(
        {
            "id": pa.array([n["id"] for n in res.nodes], pa.string()),
            "lat": pa.array([n["lat"] for n in res.nodes], pa.float64()),
            "lon": pa.array([n["lon"] for n in res.nodes], pa.float64()),
            "type": pa.array([n["type"] for n in res.nodes], pa.string()),
            **{
                f"cell_r{r}": pa.array(
                    [cells[n["id"]][r] for n in res.nodes], pa.int64()
                )
                for r in _CFG.tile_resolutions
            },
        }
    )


def golden_waterway_tile_rollup(res) -> pa.Table:
    """Per-res midpoint-cell rollup; decimal(…,6) length sum exactly as the
    query computes it (cast rounds each length HALF_UP at 1e-6, exact sum)."""
    rows = []
    q6 = Decimal(1).scaleb(-6)
    for r in _CFG.tile_resolutions:
        agg: dict[int, list] = {}
        for e in res.edges:
            mid = e["coordinates"][(len(e["coordinates"]) - 1) // 2]
            cell = int(cell_id_h3res(np.array([mid[0]]), np.array([mid[1]]), r)[0])
            a = agg.setdefault(cell, [0, Decimal(0)])
            a[0] += 1
            a[1] += Decimal(repr(e["length_m"])).quantize(q6, rounding=ROUND_HALF_UP)
        for cell, (n, tot) in agg.items():
            rows.append((r, cell, n, float(tot)))
    return pa.table(
        {
            "res": pa.array([r[0] for r in rows], pa.int32()),
            "cell": pa.array([r[1] for r in rows], pa.int64()),
            "edge_count": pa.array([r[2] for r in rows], pa.int64()),
            "total_length_m": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def golden_waterway_knn_dangling(res, radius_m: float = 2000.0) -> pa.Table:
    """Brute-force nearest foreign vertex (the operator's ring join provably
    contains the nearest-in-radius candidate, so exhaustive search must agree)."""
    from collections import defaultdict

    degree: dict[str, int] = defaultdict(int)
    own_ways: dict[str, set] = defaultdict(set)
    for e in res.edges:
        for nid in (e["from_node_id"], e["to_node_id"]):
            degree[nid] += 1
            own_ways[nid].add(e["original_way_id"])

    verts = sorted(
        {
            (e["original_way_id"], c[0], c[1])
            for e in res.edges
            for c in e["coordinates"]
        }
    )
    vway = np.array([v[0] for v in verts], dtype=np.int64)
    vlat = np.array([v[1] for v in verts])
    vlon = np.array([v[2] for v in verts])

    rows = []
    for nd in res.nodes:
        if degree.get(nd["id"]) != 1:
            continue
        mask = np.array([w not in own_ways[nd["id"]] for w in vway])
        mask &= ~((vlat == nd["lat"]) & (vlon == nd["lon"]))
        if not mask.any():
            continue
        d = geodesic_m(
            np.full(mask.sum(), nd["lat"]), np.full(mask.sum(), nd["lon"]),
            vlat[mask], vlon[mask],
        )
        ok = d <= radius_m
        if not ok.any():
            continue
        cl, cn, cw, cd = vlat[mask][ok], vlon[mask][ok], vway[mask][ok], d[ok]
        order = np.lexsort((cw, cn, cl, cd))  # (dist, lat, lon, way) asc
        j = order[0]
        rows.append(
            (nd["id"], nd["lat"], nd["lon"], float(cl[j]), float(cn[j]),
             int(cw[j]), float(cd[j]))
        )
    names = ["id", "lat", "lon", "target_lat", "target_lon", "target_way_id", "dist_m"]
    types = [pa.string()] + [pa.float64()] * 4 + [pa.int64(), pa.float64()]
    return pa.table(
        {n: pa.array([r[i] for r in rows], t) for i, (n, t) in enumerate(zip(names, types))}
    )


# ---------------------------------------------------------------------------
# document family (independent pure-Python reimplementations)

def _documents() -> list[tuple[str, str | None]]:
    t = _read_table("documents")
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _tokens(text: str | None) -> list[str] | None:
    if text is None:
        return None
    return re.split(r"\s+", text.lower())


def _shingle_hashes(text: str | None, n: int = 3) -> set[int]:
    toks = _tokens(text)
    if toks is None or len(toks) < n:
        return set()
    sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    sh.discard("")
    return set(int(h) for h in xxh64_i64(sorted(sh)))


def _perm_params(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_perm)]


def golden_minhash_pairs(num_perm=32, bands=8, threshold=0.5) -> pa.Table:
    rows_per_band = num_perm // bands
    params = _perm_params(num_perm)
    shingles = {d: _shingle_hashes(t) for d, t in _documents()}
    shingles = {d: s for d, s in shingles.items() if s}

    sigs = {}
    for d, s in shingles.items():
        h = np.array(sorted(s), dtype=np.int64) % _MERSENNE  # pmod: python % = pmod
        sigs[d] = [int(np.min((a * h + b) % _MERSENNE)) for a, b in params]

    buckets: dict[tuple, list[str]] = {}
    for d, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    rows = []
    for a, b in sorted(cand):
        inter = len(shingles[a] & shingles[b])
        jac = inter / (len(shingles[a]) + len(shingles[b]) - inter)
        if jac >= threshold:
            rows.append((a, b, spark_round(jac, 6)))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def golden_simhash_pairs(max_hamming=3) -> pa.Table:
    sims = {}
    for d, t in _documents():
        toks = [tk for tk in (_tokens(t) or []) if len(tk) > 0]
        if not toks:
            continue  # no tokens → absent from the groupBy
        h = xxh64_i64(toks).astype(np.uint64)
        sim = np.uint64(0)
        for b in range(64):
            bits = (h >> np.uint64(b)) & np.uint64(1)
            if int(2 * bits.sum()) - len(toks) > 0:  # sum(+1/-1) > 0
                sim |= np.uint64(1) << np.uint64(b)
        sims[d] = int(sim.astype(np.int64))

    buckets: dict[tuple, list[str]] = {}
    for d, s in sims.items():
        u = s & ((1 << 64) - 1)
        for c in range(4):
            key = (c, (u >> (16 * c)) & 0xFFFF)
            buckets.setdefault(key, []).append(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    rows = []
    for a, b in sorted(cand):
        ham = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if ham <= max_hamming:
            rows.append((a, b, ham))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


def golden_fingerprints(window=16) -> pa.Table:
    """Independent plain-loop winnowing hash (operator uses a vectorized
    prefix-power kernel; same uint64 wraparound semantics)."""
    B = np.uint64(1000003)
    out = []
    with np.errstate(over="ignore"):
        for d, t in _documents():
            b = (t or "").encode("utf-8")
            if len(b) == 0:
                out.append((d, 0))
                continue
            if len(b) < window:
                h = np.uint64(0)
                for x in b:
                    h = h * B + np.uint64(x)
                out.append((d, int(h.astype(np.int64))))
                continue
            # sliding windows × power weights, summed in uint64 (modular
            # arithmetic is associative — any summation order is exact)
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
            pw = np.ones(window, dtype=np.uint64)
            for j in range(1, window):
                pw[j] = pw[j - 1] * B
            win = np.lib.stride_tricks.sliding_window_view(arr, window)
            h = (win * pw[::-1]).sum(axis=1, dtype=np.uint64)
            out.append((d, int(h.min().astype(np.int64))))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in out], pa.int64()),
            "fingerprint": pa.array([r[1] for r in out], pa.int64()),
        }
    )


def golden_lsh_ann(k=3, n_planes=4, n_tables=8, seed=11, dim=64) -> pa.Table:
    """NumPy reimplementation with Spark's exact fp semantics: float32
    products (float*float), sequential float64 fold (aggregate), f32→f64
    promotion against the double hyperplane literals."""
    t = _read_table("embeddings")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = [np.array(v, dtype=np.float32) for v in t["embedding"].to_pylist()]

    def seq_sum(products) -> float:
        acc = 0.0
        for p in products:
            acc += float(p)
        return acc

    def norm(v32: np.ndarray) -> float:
        return float(np.sqrt(seq_sum(v32 * v32)))  # f32 squares, f64 fold

    norms = {int(i): norm(v) for i, v in zip(ids, vecs)}
    tables = [
        np.random.default_rng(seed + 1000 * tt).standard_normal((n_planes, dim))
        for tt in range(n_tables)
    ]

    def buckets(v32: np.ndarray) -> list[int]:
        out = []
        for planes in tables:
            bkt = 0
            for i, p in enumerate(planes):
                if seq_sum(v32.astype(np.float64) * p) >= 0:  # f64 products
                    bkt += 1 << i
            out.append(bkt)
        return out

    bk = {int(i): buckets(v) for i, v in zip(ids, vecs)}
    corpus_by_bucket: dict[tuple, list[int]] = {}
    for i in ids:
        for tt, b in enumerate(bk[int(i)]):
            corpus_by_bucket.setdefault((tt, b), []).append(int(i))

    vmap = {int(i): v for i, v in zip(ids, vecs)}
    rows = []
    for qid in sorted(int(i) for i in ids if i < 20):
        cands = set()
        for tt, b in enumerate(bk[qid]):
            cands.update(corpus_by_bucket.get((tt, b), []))
        cands.discard(qid)
        scored = []
        for nid in cands:
            dot = seq_sum(vmap[qid] * vmap[nid])  # f32 products, f64 fold
            scored.append((nid, dot / (norms[qid] * norms[nid])))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (nid, cos) in enumerate(scored[:k], start=1):
            rows.append((qid, nid, spark_round(cos, 5), rank))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            "cosine": pa.array([r[2] for r in rows], pa.float64()),
            "rank": pa.array([r[3] for r in rows], pa.int32()),
        }
    )


def golden_media_features(n_docs=60, feat_dim=8) -> pa.Table:
    refs = []
    for i in range(n_docs):
        for s in generate_doc(i, _PARAMS)["spans"]:
            r = s.get("media_ref")
            if r is not None and r != "":
                refs.append(r)
    h = np.abs(xxh64_i64(refs))
    kind = np.where(h % 3 == 0, "image", np.where(h % 3 == 1, "audio", "video"))
    return pa.table(
        {
            "media_id": pa.array(refs, pa.string()),
            "kind": pa.array(kind.tolist(), pa.string()),
            "feat_dim": pa.array([feat_dim] * len(refs), pa.int32()),
        }
    )


# ---------------------------------------------------------------------------

def _content_hash(table: pa.Table) -> str:
    df = table.to_pandas().sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def main() -> None:
    os.makedirs(GOLD, exist_ok=True)
    res = _oracle_result()
    goldens = {
        "waterway_edges": golden_waterway_edges(res),
        "waterway_nodes": golden_waterway_nodes(res),
        "waterway_tile_rollup": golden_waterway_tile_rollup(res),
        "waterway_knn_dangling": golden_waterway_knn_dangling(res),
        "minhash_pairs": golden_minhash_pairs(),
        "simhash_pairs": golden_simhash_pairs(),
        "fingerprints": golden_fingerprints(),
        "lsh_ann": golden_lsh_ann(),
        "media_features": golden_media_features(),
    }
    manifest = {"sf_dir": SF_DIR, "queries": {}}
    for name, tbl in goldens.items():
        pq.write_table(tbl, os.path.join(GOLD, f"{name}.parquet"))
        manifest["queries"][name] = {
            "rows": tbl.num_rows,
            "content_hash": _content_hash(tbl),
        }
        print(f"golden {name}: {tbl.num_rows} rows, hash {manifest['queries'][name]['content_hash']}")
    with open(os.path.join(GOLD, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    if "--check" in sys.argv:
        _check(goldens)


def _check(goldens: dict) -> None:
    """Diff each Spark query against its golden EXACTLY (sorted rows,
    bitwise-equal values) on a small local session."""
    import pandas as pd
    from pyspark.sql import SparkSession

    from osmwaterwayextractor_spark import entry_queries as EQ

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("golden-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs = EQ.queries()
    failures = []
    for name, tbl in goldens.items():
        got = qs[name](spark, SF_DIR).toPandas().sort_index(axis=1)
        want = tbl.to_pandas().sort_index(axis=1)
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            print(f"CHECK {name}: OK ({len(want)} rows)")
        except AssertionError as ex:
            failures.append(name)
            print(f"CHECK {name}: MISMATCH\n{str(ex)[:2000]}")
    spark.stop()
    if failures:
        sys.exit(f"golden mismatches: {failures}")


if __name__ == "__main__":
    main()
