"""Similarity search over an embedding column (graft brief: ANN).

- ``cosine_topk_bruteforce``: exact top-k via a (queries × corpus) join with
  the dot product computed JVM-side (``aggregate``/``zip_with`` — no Python).
  The baseline and the verifier for the approximate paths.
- ``lsh_cosine_topk``: random-hyperplane LSH (sign bits → bucket key);
  queries probe only their bucket (+ optional multi-probe) — the scale path:
  corpus shuffles once on bucket, probes are an equi-join.
- ``embedding_neardup_pairs``: all corpus pairs with cosine ≥ τ via shared
  LSH buckets + exact verify.

Hyperplanes are deterministic (seeded NumPy) and inlined as literal arrays,
so plans are reproducible and the driver/DuckDB oracle can recompute them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_col(vec: str):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot_col(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): exact top-k per query."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot_col("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality — a ONE-TIME driver probe for callers that
    don't know it statically. Deliberately separate from the LSH operators:
    plan construction there must stay free of driver actions (a hidden
    ``.first()`` per operator call serializes pipelines that build many
    plans). Call once, cache the result, pass ``dim=`` explicitly."""
    return len(df.select(vec_col).limit(1).collect()[0][0])


def _require_dim(dim: int | None) -> int:
    if dim is None:
        raise TypeError(
            "dim is required (plan construction runs no driver actions); "
            "probe once with similarity.embedding_dim(df) and pass dim="
        )
    return int(dim)


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket key as a long — dot products via zip_with literals."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**i).cast("long")).otherwise(0)
    return bucket


def _table_buckets(vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int):
    """Array of (table, bucket) structs — one bucket per hash table (standard
    OR-construction: a candidate pair needs to collide in ≥1 table)."""
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        entries.append(
            F.struct(F.lit(t).alias("table"), _bucket_col(vec_col, planes).alias("bucket"))
        )
    return F.array(*entries)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates collide with the query in ≥1 of
    ``n_tables`` independent hyperplane tables (recall tunable via
    tables×planes; corpus shuffles once on (table, bucket))."""
    dim = _require_dim(dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
        F.explode(_table_buckets(vec_col, dim, n_planes, n_tables, seed)).alias("tb"),
    ).select("neighbor_id", "cv", "cn", "tb.table", "tb.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
        F.explode(_table_buckets(vec_col, dim, n_planes, n_tables, seed)).alias("tb"),
    ).select("query_id", "qv", "qn", "tb.table", "tb.bucket")
    scored = (
        q.join(c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", _dot_col("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_a, id_b, cosine ≥ threshold) via bucket-join candidates."""
    planes = _hyperplanes(_require_dim(dim), n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_col(vec_col).alias("n"),
        _bucket_col(vec_col, planes).alias("bucket"),
    )
    a = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"), "bucket")
    b = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot_col("va", "vb") / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
