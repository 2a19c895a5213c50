"""One event-logged pinned pipeline leg + per-Spark-stage analysis.

Runs the exact scaling-session leg (taskset around a fresh local[k] JVM,
pipeline bench mode, shared docs parquet) with OSMWWE_EVENTLOG=true, then
prints the analyze_eventlog per-stage table. Used to attribute the N->4N
efficiency gap to specific Spark stages (task counts, skew, per-task CPU
inflation) rather than guessing from stage walls.

Usage: python scripts/profile_leg.py <cores> <n_docs>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from scaling_evidence import pregenerate_docs, select_cpuset

    docs_path = pregenerate_docs(n_docs)
    cpuset, sel = select_cpuset(cores)
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cores),
            "SPARK_GRAFT_DOCS": str(n_docs),
            "SPARK_GRAFT_DOCS_PATH": docs_path,
            "SPARK_GRAFT_BENCH_MODE": "pipeline",
            "SPARK_GRAFT_BENCH_REPS": "1",
            "SPARK_GRAFT_BENCH_ANCHOR_DOCS": "0",
            "OSMWWE_STAGE_TIMING": "1",
            "OSMWWE_EVENTLOG": "true",
        }
    )
    t0 = time.time()
    out = subprocess.run(
        ["taskset", "-c", cpuset, sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    wall = time.time() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(1)
    for ln in out.stdout.splitlines():
        if ln.startswith(("[stage]", "[snap]", "[gap]", "{")):
            print(ln, flush=True)
    print(f"[leg] cores={cores} cpuset={cpuset} membw={sel.get('gbps')} wall={wall:.1f}s")
    # newest eventlog dir
    evdir = "/tmp/spark-events"
    logs = sorted(
        (os.path.join(evdir, d) for d in os.listdir(evdir)),
        key=os.path.getmtime,
    )
    newest = logs[-1]
    if os.path.isdir(newest):
        files = [f for f in os.listdir(newest) if f.startswith("events_")]
        newest = os.path.join(newest, files[0])
    print(f"--- per-stage analysis of {newest} ---", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "analyze_eventlog.py"),
         newest, str(cores), "30"],
    )


if __name__ == "__main__":
    main()
