"""spark-submit entry point (north rule: submitted via spark-submit --py-files).

Package + submit:

    cd /root/repo && zip -qr /tmp/engine.zip osmwaterwayextractor_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        scripts/submit_job.py --docs <iceberg-or-parquet path or synth:N> \
        --out /data/waterways --checkpoint /data/ckpt [--config config.yaml]

Reads the interleaved-doc table, builds the waterway graph with
tile-partition-resumable checkpoints, writes parquet sinks + manifest.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="docs table path, or synth:<n_docs>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--config", default=None, help="reference-shaped YAML")
    ap.add_argument("--keep-all-waterway-types", action="store_true")
    ap.add_argument(
        "--skip-qa-gate",
        action="store_true",
        help="report qa_threshold checks in the manifest without failing the run",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("osmwwe-extract").getOrCreate()

    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.operators.qa import qa_metrics
    from osmwaterwayextractor_spark.plans.checkpoint import Checkpointer
    from osmwaterwayextractor_spark.plans.pipeline import WaterwayEngine
    from osmwaterwayextractor_spark.sinks import writers

    cfg = EngineConfig.from_yaml(args.config) if args.config else EngineConfig()
    if args.keep_all_waterway_types:
        import dataclasses

        cfg = dataclasses.replace(cfg, filter_waterway_types=False)

    import time as _time

    t_start = _time.time()
    if args.docs.startswith("synth:"):
        from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe

        docs = docs_dataframe(spark, int(args.docs.split(":", 1)[1]), DocsGenParams())
    else:
        docs = spark.read.parquet(args.docs)

    ck = Checkpointer(spark, args.checkpoint) if args.checkpoint else None
    g = WaterwayEngine(cfg, checkpointer=ck).build_graph(docs, spark)

    writers.save_parquet(g.nodes, g.edges, args.out)
    g.tile_rollup.write.mode("overwrite").parquet(os.path.join(args.out, "tile_rollup.parquet"))
    qa = qa_metrics(g.nodes, g.edges, cfg)

    # QA gate: fail the run on threshold violations (config.yaml:152-162)
    from osmwaterwayextractor_spark.operators.qa import (
        enforce_qa_thresholds,
        qa_threshold_checks,
    )

    if args.skip_qa_gate:
        qa["qa_threshold_checks"] = qa_threshold_checks(g.nodes, g.edges, cfg)
    else:
        qa["qa_threshold_checks"] = enforce_qa_thresholds(g.nodes, g.edges, cfg)

    writers.save_manifest(
        os.path.join(args.out, "manifest.json"),
        cfg,
        qa,
        input_docs=docs,
        output_paths={
            "nodes.parquet": os.path.join(args.out, "nodes.parquet"),
            "edges.parquet": os.path.join(args.out, "edges.parquet"),
            "tile_rollup.parquet": os.path.join(args.out, "tile_rollup.parquet"),
        },
        results={"final_nodes": qa["final_nodes"], "final_edges": qa["final_edges"]},
    )
    # reference-shaped console summary (osm_waterway_extractor.py:3262-3300)
    from osmwaterwayextractor_spark.operators.qa import waterway_type_histogram

    hist = [
        (r["waterway_type"], r["n_edges"])
        for r in waterway_type_histogram(g.edges).collect()
    ]
    sizes = writers._dir_sizes(
        {
            "nodes.parquet": os.path.join(args.out, "nodes.parquet"),
            "edges.parquet": os.path.join(args.out, "edges.parquet"),
            "tile_rollup.parquet": os.path.join(args.out, "tile_rollup.parquet"),
            "manifest.json": os.path.join(args.out, "manifest.json"),
        }
    )
    print(
        writers.format_extraction_report(
            qa,
            cfg,
            input_name=args.docs,
            processing_seconds=_time.time() - t_start,
            histogram=hist,
            output_sizes=sizes,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
