"""Host capability probe: does THIS machine scale 1 -> 4 pinned cores?

The north-rule gate is the ENGINE's N->4N scaling. A single-box sandbox can
only evidence it if the box itself gives 4 pinned cores ~4x the resources of
1 — which a hypervisor-capped VM may not. This probe measures, in a few
seconds per leg, the host's own 1-vs-4 scaling on two pure workloads with no
Spark/JVM anywhere:

- ``alu``: a tight integer/FP loop per process (fits in registers/L1). On
  honest hardware 4 pinned cores give ~4x aggregate. If even this fails to
  scale, the hypervisor is throttling CPU itself (QoS/steal), and NO job can
  evidence the gate here.
- ``membw``: a NumPy array copy+sum sweep over a working set far beyond LLC
  (256 MiB/process). Scaling here is bounded by the box's aggregate memory
  bandwidth — the resource a real 4N-executor cluster multiplies with its
  nodes but a single box shares.

Each workload runs at 1 and 4 pinned cores, compact (0-3) and spread
(0,8,16,24) pinning, interleaved. Output: one JSON line with aggregate
throughput per leg and the 1->4 scaling ratio per workload/pinning, plus
host steal over the probe. Probes run serially per leg (4-core legs run 4
processes simultaneously, one per pinned core).

Usage: python scripts/host_probe.py [--seconds 4]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

_N_CPUS = os.cpu_count() or 4


def _alu_worker(seconds: float, out):
    # integer mix that stays in registers — no memory traffic
    t_end = time.perf_counter() + seconds
    x = 0x9E3779B97F4A7C15
    iters = 0
    while time.perf_counter() < t_end:
        for _ in range(100_000):
            x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
            x ^= x >> 29
        iters += 100_000
    out.put(iters)


def _membw_worker(seconds: float, out):
    import numpy as np

    a = np.random.default_rng(0).integers(0, 255, size=256 * 1024 * 1024 // 8, dtype=np.uint64)
    b = np.empty_like(a)
    t_end = time.perf_counter() + seconds
    nbytes = 0
    while time.perf_counter() < t_end:
        np.copyto(b, a)          # read + write the full 256 MiB
        nbytes += 2 * a.nbytes
    out.put(nbytes)


def _read_steal() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7], sum(vals)


def _run_leg(workload: str, cpu_list: list[int], seconds: float) -> float:
    """Spawn one pinned worker per cpu in cpu_list; return aggregate rate."""
    script = os.path.abspath(__file__)
    procs = []
    for c in cpu_list:
        p = subprocess.Popen(
            ["taskset", "-c", str(c), sys.executable, script,
             "--_worker", workload, str(seconds)],
            stdout=subprocess.PIPE, text=True,
        )
        procs.append(p)
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += float(out.strip().splitlines()[-1])
    return total / seconds


def _worker_main(workload: str, seconds: float) -> None:
    q = mp.Queue()
    w = _alu_worker if workload == "alu" else _membw_worker
    w(seconds, q)
    print(q.get())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--_worker", nargs=2, default=None)
    args = ap.parse_args()
    if args._worker:
        _worker_main(args._worker[0], float(args._worker[1]))
        return

    spread = [0, _N_CPUS // 4, _N_CPUS // 2, 3 * _N_CPUS // 4] if _N_CPUS >= 8 else [0, 1, 2, 3]
    legs = {
        "alu_1": ("alu", [0]),
        "alu_4_compact": ("alu", [0, 1, 2, 3]),
        "alu_4_spread": ("alu", spread),
        "membw_1": ("membw", [0]),
        "membw_4_compact": ("membw", [0, 1, 2, 3]),
        "membw_4_spread": ("membw", spread),
    }
    s0, t0 = _read_steal()
    rates: dict[str, float] = {}
    # two interleaved reps, best-per-leg (same jitter defense as the bench)
    for _ in range(2):
        for name, (wl, cpus) in legs.items():
            r = _run_leg(wl, cpus, args.seconds)
            rates[name] = max(rates.get(name, 0.0), r)
    s1, t1 = _read_steal()
    out = {
        "n_host_cpus": _N_CPUS,
        "seconds_per_leg": args.seconds,
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
        "alu_rate_1": round(rates["alu_1"], 0),
        "alu_scale_compact": round(rates["alu_4_compact"] / rates["alu_1"], 2),
        "alu_scale_spread": round(rates["alu_4_spread"] / rates["alu_1"], 2),
        "membw_gbps_1": round(rates["membw_1"] / 1e9, 2),
        "membw_gbps_4_compact": round(rates["membw_4_compact"] / 1e9, 2),
        "membw_gbps_4_spread": round(rates["membw_4_spread"] / 1e9, 2),
        "membw_scale_compact": round(rates["membw_4_compact"] / rates["membw_1"], 2),
        "membw_scale_spread": round(rates["membw_4_spread"] / rates["membw_1"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
