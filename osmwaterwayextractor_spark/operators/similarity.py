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


def _plane_dot_sql(vec_col: str, plane: np.ndarray) -> str:
    """Left-to-right fold dot product as ONE SQL string. Same Catalyst tree
    as the old stacked-Column construction (zip_with multiply, aggregate
    (acc, x) -> acc + x from 0.0D), so the resulting double — and therefore
    every sign-bit bucket — is bit-identical. ``repr(float)`` round-trips
    IEEE doubles exactly and the D suffix keeps the parser off the decimal
    path."""
    lits = ", ".join(f"{float(x)!r}D" for x in plane)
    return (
        f"aggregate(zip_with({vec_col}, array({lits}), (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _bucket_sql(vec_col: str, planes: np.ndarray) -> str:
    """Sign-bit bucket key as a long — one SQL string per bucket."""
    terms = " + ".join(
        f"(CASE WHEN {_plane_dot_sql(vec_col, p)} >= 0 THEN "
        f"CAST({2 ** i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    return f"(CAST(0 AS BIGINT) + {terms})"


def _bucket_col(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket key as a long — dot products via zip_with literals.

    Authored as ONE SQL string (F.expr), not stacked Column ops: the DSL
    version cost ~75 py4j driver round-trips PER PLANE (64 F.lit calls for
    the literal array alone), ~3 s of driver-serial plan construction per
    lsh_cosine_topk call at 32 planes (guide §1.2 step 2 / the round-5
    _intersect_catalyst lesson). One JVM parse builds the identical tree."""
    return F.expr(_bucket_sql(vec_col, planes))


def _table_buckets(vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int):
    """Array of (table, bucket) structs — one bucket per hash table (standard
    OR-construction: a candidate pair needs to collide in ≥1 table). One SQL
    string → one py4j round-trip (see _bucket_col)."""
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        entries.append(
            f"struct(CAST({t} AS INT) AS table, {_bucket_sql(vec_col, planes)} AS bucket)"
        )
    return F.expr("array(" + ", ".join(entries) + ")")


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
