"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship waterway-graph pipeline; ``queries`` exposes one
entry per implemented operator class from SURVEY.md §2 (plus the graft's
training-data ops); ``oracle_sql`` gives DuckDB twins for every
SQL-expressible query (the rest are gated by the oracle-parity pytest suite
and recorded rows-only). Implementation: osmwaterwayextractor_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmwaterwayextractor_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize interleaved OSM docs (seeded by the sf0.001
    documents table's row count), extract the waterway graph, return edges
    with tile assignments."""
    sf_dir = "/root/testdata/sf0.001"
    n_docs = min(spark.read.parquet(f"{sf_dir}/documents.parquet").count(), 100)
    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.plans.pipeline import WaterwayEngine
    from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe

    docs = docs_dataframe(spark, int(n_docs), DocsGenParams(seed=42, mega_every=50, mega_refs=500), partitions=8)
    cfg = EngineConfig(filter_waterway_types=False)
    g = WaterwayEngine(cfg).build_graph(docs, spark)
    return g.edges.select(
        "id", "from_node_id", "to_node_id", "length_m", "name", "type",
        "width_raw", "width_m", "width_source", "original_way_id",
        "cell_r7", "cell_r8", "cell_r9",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
