import os

from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe


def test_stream_parse_availablenow(spark, tmp_path):
    from osmwaterwayextractor_spark.streaming.ingest import stream_parse_docs

    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = docs_dataframe(spark, 20, DocsGenParams(seed=9), partitions=2)
    docs.write.parquet(docs_dir)

    cfg = EngineConfig(filter_waterway_types=False)
    nq, wq = stream_parse_docs(spark, docs_dir, out_dir, ckpt, cfg)
    nq.awaitTermination(120)
    wq.awaitTermination(120)

    nodes = spark.read.parquet(os.path.join(out_dir, "nodes"))
    ways = spark.read.parquet(os.path.join(out_dir, "ways"))
    from osmwaterwayextractor_spark.sources.parse import parse_nodes, parse_ways

    batch_docs = spark.read.parquet(docs_dir)
    assert nodes.count() == parse_nodes(batch_docs, cfg).count()
    assert ways.count() == parse_ways(batch_docs, cfg).count()

    # restart with no new files: exactly-once — no duplicate appends
    nq2, wq2 = stream_parse_docs(spark, docs_dir, out_dir, ckpt, cfg)
    nq2.awaitTermination(120)
    wq2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "nodes")).count() == nodes.count()
