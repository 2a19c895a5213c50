"""A/B the intersections stage exactly as the pipeline composes it.

Session 3 of the round-5 scaling evidence regressed the 4-CPU intersections
stage to 354-416 s (vs ~59-86 s in sessions 1-2) while the 1-CPU leg
IMPROVED — the only engine change in between was the whole-stage-codegen
barrier (coalesce between the self-join and the exact test,
geometry_ops.py detect_intersections). This script isolates that stage:

  - builds (or reuses) the simplified-ways scratch parquet for N docs,
    written with the pipeline's 8 MiB row groups;
  - materializes covered_raw/covered the way WaterwayEngine._covered_stage
    does;
  - times the composed detect(lazy) + insert + parquet write.

Drive it pinned, with the barrier toggled:

  taskset -c 9,17,25,29 env OSMWWE_CODEGEN_BARRIER=1 OSMWWE_EVENTLOG=true \
      python scripts/ab_intersections.py 4 40000

Event logs land in /tmp/spark-events for scripts/analyze_eventlog.py, which
attributes the delta to task time / GC / driver gaps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

    os.environ.setdefault("SPARK_GRAFT_BENCH_MODE", "pipeline")  # AQE off
    from bench import build_session

    spark = build_session(cores)
    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.operators.assemble import assemble_geometries
    from osmwaterwayextractor_spark.operators.geometry_ops import (
        _covered_raw,
        _covered_resplit,
        clean_and_simplify,
        detect_intersections,
        insert_intersections,
    )
    from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe
    from osmwaterwayextractor_spark.sources.parse import (
        nodes_from_parsed,
        parse_osm,
        ways_from_parsed,
    )

    cfg = EngineConfig(filter_waterway_types=False)
    simplified_path = f"/dev/shm/ab-simplified-{n_docs}"
    scratch = f"/dev/shm/ab-scratch-{os.getpid()}"

    def stage_write(df, path):
        df.write.mode("overwrite").option(
            "parquet.block.size", str(8 * 1024 * 1024)
        ).parquet(path)
        return spark.read.parquet(path)

    if not os.path.exists(os.path.join(simplified_path, "_SUCCESS")):
        params = DocsGenParams(seed=42, mega_every=200, mega_refs=20000)
        docs = stage_write(
            docs_dataframe(spark, n_docs, params), f"/dev/shm/ab-docs-{n_docs}"
        )
        parsed = stage_write(parse_osm(docs, cfg), f"{scratch}/parsed")
        assembled = assemble_geometries(
            ways_from_parsed(parsed, cfg), nodes_from_parsed(parsed), cfg
        )
        stage_write(clean_and_simplify(assembled, cfg), simplified_path)
        print("[ab] simplified built", flush=True)

    simplified = spark.read.parquet(simplified_path)

    barrier = os.environ.get("OSMWWE_CODEGEN_BARRIER", "1")
    t0 = time.time()
    raw = stage_write(_covered_raw(simplified), f"{scratch}/covered_raw")
    covered = stage_write(_covered_resplit(raw, cfg), f"{scratch}/covered")
    t_cov = time.time() - t0
    print(f"[ab] covered: {t_cov:.2f}s", flush=True)

    t0 = time.time()
    points = detect_intersections(simplified, cfg, covered=covered)
    staged = insert_intersections(simplified, points, cfg, covered=covered)
    stage_write(staged, f"{scratch}/intersected")
    t_int = time.time() - t0
    print(f"[ab] intersections (barrier={barrier}): {t_int:.2f}s", flush=True)
    print(
        '{"barrier": %s, "cores": %d, "n_docs": %d, "covered_sec": %.2f, '
        '"intersections_sec": %.2f}' % (barrier, cores, n_docs, t_cov, t_int),
        flush=True,
    )

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
