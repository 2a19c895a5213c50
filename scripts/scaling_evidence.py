"""North-rule scaling evidence: the same job at N and 4N parallelism.

No multi-node cluster exists in this sandbox, so (per BASELINE.md) the
two-cluster-size criterion is evidenced with local[8] vs local[32] on the
IDENTICAL deterministic input: waterway-pipeline throughput (edges/sec) and
tile-assignment wall time at both levels + scaling efficiency
(throughput@4N / throughput@N) / 4. Writes BENCH/BASELINE.md.

Each leg runs in a FRESH subprocess — a second SparkSession reusing the
first leg's JVM inherits its heap/thread state and measurably degrades,
contaminating the comparison.

Usage: python scripts/scaling_evidence.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_level(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_DOCS": str(n_docs),
            "SPARK_GRAFT_BENCH_MODE": "pipeline",
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    levels = [8, 32]
    # The sandbox host's CPU throughput swings >2x over minutes; single-run
    # comparisons are meaningless. Run the levels INTERLEAVED `reps` times
    # and take each level's best run — the standard jitter-robust estimator.
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(reps):
        for c in levels:
            runs[c].append(one_level(c, n_docs))
    results = [max(runs[c], key=lambda r: r["edges_per_sec"]) for c in levels]

    thr = [r["edges_per_sec"] for r in results]
    eff = (thr[1] / thr[0]) / (levels[1] / levels[0]) if thr[0] > 0 else 0.0

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write("# BENCH/BASELINE — throughput & N→4N scaling evidence\n\n")
        f.write(
            f"Input: {n_docs} deterministic interleaved docs (seed 42, mega-ways "
            f"every 200 docs with 20k refs); sf tables from {sf_dir}.\n"
            "Same input at both parallelism levels; each leg is a fresh JVM\n"
            "(north-rule evidence: no real cluster in this sandbox, so N→4N\n"
            "executors is evidenced as local[8]→local[32] cores).\n"
            f"Jitter control: the sandbox host's throughput varies >2× over\n"
            f"minutes, so each level ran {reps}× interleaved and the best run\n"
            "per level is reported (all runs below).\n\n"
        )
        f.write("All runs (edges/sec): ")
        for c in levels:
            f.write(f"{c} cores → {[round(r['edges_per_sec'],1) for r in runs[c]]}  ")
        f.write("\n\n")
        f.write("| cores | pipeline sec | edges | edges/sec | tile-assign+rollup sec |\n")
        f.write("|---|---|---|---|---|\n")
        for c, r in zip(levels, results):
            f.write(
                f"| {c} | {r['queries']['waterway_pipeline']:.2f} | {r['n_edges']} | "
                f"{r['edges_per_sec']:.1f} | {r['tile_assign_sec']:.2f} |\n"
            )
        f.write(
            f"\n**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.3f}** "
            f"(target ≥ 0.8 per BASELINE.json)\n\n"
        )
        f.write("Stage wall times (seconds):\n\n| stage | 8 cores | 32 cores |\n|---|---|---|\n")
        for k in results[0]["queries"]:
            f.write(
                f"| {k} | {results[0]['queries'][k]:.2f} | {results[1]['queries'].get(k, float('nan')):.2f} |\n"
            )
    print(
        json.dumps(
            {
                "levels": levels,
                "edges_per_sec": thr,
                "tile_assign_sec": [r["tile_assign_sec"] for r in results],
                "scaling_efficiency": round(eff, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
