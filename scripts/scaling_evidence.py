"""North-rule scaling evidence: the same job at N and 4N parallelism.

No multi-node cluster exists in this sandbox, so (per BASELINE.md) the
two-cluster-size criterion is evidenced with local[8] vs local[32] on the
IDENTICAL deterministic input: waterway-pipeline throughput (edges/sec) and
tile-assignment wall time at both levels + scaling efficiency
(throughput@4N / throughput@N) / 4. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_evidence.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_session, run_bench  # noqa: E402


def one_level(cpus: int, sf_dir: str, n_docs: int) -> dict:
    spark = build_session(cpus)
    try:
        t0 = time.time()
        res = run_bench(spark, sf_dir, n_docs)
        res["total_sec"] = time.time() - t0
        res["cpus"] = cpus
        return res
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    levels = [8, 32]
    results = [one_level(c, sf_dir, n_docs) for c in levels]

    thr = [r["edges_per_sec"] for r in results]
    eff = (thr[1] / thr[0]) / (levels[1] / levels[0]) if thr[0] > 0 else 0.0
    tile = [r["tile_assign_sec"] for r in results]

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("# BENCH/BASELINE — throughput & N→4N scaling evidence\n\n")
        f.write(
            f"Input: {n_docs} deterministic interleaved docs (seed 42, "
            f"mega-ways every 200 docs with 20k refs); sf tables from {sf_dir}.\n"
            "Same input at both parallelism levels (north-rule evidence: no real\n"
            "cluster in this sandbox, so N→4N executors is evidenced as\n"
            "local[8]→local[32] cores on one JVM).\n\n"
        )
        f.write("| cores | pipeline sec | edges | edges/sec | tile-assign+rollup sec |\n")
        f.write("|---|---|---|---|---|\n")
        for c, r in zip(levels, results):
            f.write(
                f"| {c} | {r['timings']['waterway_pipeline']:.2f} | {r['n_edges']} | "
                f"{r['edges_per_sec']:.1f} | {r['tile_assign_sec']:.2f} |\n"
            )
        f.write(
            f"\n**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.3f}** "
            f"(target ≥ 0.8 per BASELINE.json)\n\n"
        )
        f.write("Per-query wall times (seconds):\n\n| query | 8 cores | 32 cores |\n|---|---|---|\n")
        for k in results[0]["timings"]:
            f.write(f"| {k} | {results[0]['timings'][k]:.2f} | {results[1]['timings'][k]:.2f} |\n")
    print(
        json.dumps(
            {
                "levels": levels,
                "edges_per_sec": thr,
                "tile_assign_sec": tile,
                "scaling_efficiency": round(eff, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
