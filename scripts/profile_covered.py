"""Targeted A/B of the covered-segment stage at pinned core counts.

Round-5 session data showed `covered` ANTI-scaling 1→4 pinned CPUs
(44.2 s → 50.4 s) while neighboring stages scaled at 0.8+ — this script
isolates that stage: prep (unpinned, full cores) generates the
deterministic docs and materializes the `simplified` stage parquet to
/dev/shm once, then each leg runs `taskset -c <adaptive-healthy-cpuset>`
around a fresh JVM that only scans the simplified parquet, builds
`_covered_for_join`, and writes it to scratch — with event logging, so
per-Spark-stage task counts/skew are visible via analyze_eventlog.

Usage: python scripts/profile_covered.py <n_docs> [legs, default "1,4"]
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

PREP_DIR = "/dev/shm/osmwwe-profile-covered"


def prep(n_docs: int) -> str:
    """Generate docs and materialize the simplified stage once (unpinned)."""
    out = os.path.join(PREP_DIR, f"simplified-{n_docs}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    code = f"""
import sys; sys.path.insert(0, {ROOT!r})
import os
os.environ.pop("OSMWWE_EVENTLOG", None)
from bench import build_session
from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.sources.docsgen import DocsGenParams, docs_dataframe
from osmwaterwayextractor_spark.sources.parse import parse_osm, nodes_from_parsed, ways_from_parsed
from osmwaterwayextractor_spark.operators.assemble import assemble_clean_simplify
spark = build_session(32)
cfg = EngineConfig(filter_waterway_types=False)
docs = docs_dataframe(spark, {n_docs}, DocsGenParams(seed=42, mega_every=200, mega_refs=20000))
docs.write.mode("overwrite").parquet("/dev/shm/osmwwe-profile-covered/docs")
parsed = spark.read.parquet("/dev/shm/osmwwe-profile-covered/docs")
p = parse_osm(parsed, cfg)
p.write.mode("overwrite").parquet("/dev/shm/osmwwe-profile-covered/parsed")
pp = spark.read.parquet("/dev/shm/osmwwe-profile-covered/parsed")
simplified = assemble_clean_simplify(ways_from_parsed(pp, cfg), nodes_from_parsed(pp), cfg)
simplified.write.mode("overwrite").parquet({out!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)
    return out


LEG_CODE = """
import sys, os, time, json
sys.path.insert(0, {root!r})
os.environ["OSMWWE_EVENTLOG"] = "true"
os.environ["SPARK_GRAFT_BENCH_MODE"] = "pipeline"
from bench import build_session
from osmwaterwayextractor_spark.config import EngineConfig
from osmwaterwayextractor_spark.operators.geometry_ops import _covered_for_join
spark = build_session({cores})
app_id = spark.sparkContext.applicationId
cfg = EngineConfig(filter_waterway_types=False)
simplified = spark.read.parquet({simp!r})
t0 = time.time()
cov = _covered_for_join(simplified, cfg)
cov.write.mode("overwrite").parquet("/dev/shm/osmwwe-profile-covered/out-{cores}")
wall = time.time() - t0
n = spark.read.parquet("/dev/shm/osmwwe-profile-covered/out-{cores}").count()
print(json.dumps({{"cores": {cores}, "wall": round(wall, 2), "rows": n, "app_id": app_id}}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    legs = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,4").split(",")]
    simp = prep(n_docs)
    from scaling_evidence import select_cpuset

    for cores in legs:
        cpuset, sel = select_cpuset(cores)
        code = LEG_CODE.format(root=ROOT, cores=cores, simp=simp)
        t0 = time.time()
        out = subprocess.run(
            ["taskset", "-c", cpuset, sys.executable, "-c", code],
            capture_output=True, text=True,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(1)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r["cpuset"] = cpuset
        r["membw_gbps"] = sel.get("gbps", -1.0)
        r["leg_wall"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)
        log = os.path.join("/tmp/spark-events", r["app_id"])
        if os.path.exists(log):
            print(f"--- per-stage breakdown (cores={cores}) ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "scripts", "analyze_eventlog.py"),
                 log, str(cores), "20"],
            )


if __name__ == "__main__":
    main()
