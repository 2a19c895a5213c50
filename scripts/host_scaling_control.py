"""Spark-free 1→4 scaling controls: what can THIS host scale, at all?

The round-5 question is no longer "does the engine scale" (it passed 0.912
at 2→8 on the round-3 host, and this round's same-window concurrent rounds
reproduce ~0.65 with tight variance on THIS host) but "can this host
express ≥0.8 scaling for memory-touching work of any kind". Streaming
bandwidth probes say yes for pure sequential streams (open windows grant
4-cpu cpusets ~4x one core: 69-75 GB/s vs 17-20). Spark event logs say no
for real tasks (per-task CPU time inflates ~1.7x at 4 cores with <0.1%
steal and near-full utilization). The missing piece is a control WITHOUT
Spark, the JVM, or Python workers in the loop: the same 1-vs-4 pinned
protocol over three kernels whose resource shapes bracket the engine's —

- alu:    register-resident integer mix (no memory traffic). If cores are
          honest this scales ~1.0; measured 4.02x/4 on this host family.
- stream: 256 MiB sequential copy per proc (the launch-gate probe's
          workload) — pure DRAM bandwidth, no cache reuse.
- gather: random-permutation gather over a 256 MiB uint64 table per proc —
          latency/LLC-miss bound with no sequential prefetch, the shape of
          hash-shuffle/join probes (and of JVM object graphs).
- chase:  serial pointer chase over a 32 MiB ring per proc — pure load
          latency, the LLC-contention fingerprint: a solo core enjoys the
          whole shared L3; 4 active cores get a quarter each, so per-core
          latency rises on a single box in a way a real 4-node cluster
          (each executor with its own L3) does not.

Each kernel runs solo on the sweep's best core, then jointly on the best
spaced 4-cpu set (same selection as the scaling legs), interleaved
solo/joint to share windows. Efficiency = joint per-core rate / solo rate.
Appends one JSON line per invocation to BENCH/work/host_controls.jsonl.

Usage: python scripts/host_scaling_control.py [seconds_per_leg]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_evidence import _spaced_pick, _sweep_cpus  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH", "work", "host_controls.jsonl")


def _k_alu(seconds: float) -> float:
    """Integer ALU mix; returns ops/s."""
    x, n = 1469598103934665603, 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        for _ in range(10000):
            x = (x * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 33
        n += 10000
    return n / seconds


def _k_stream(seconds: float) -> float:
    """Sequential copy over 256 MiB; returns bytes/s (copied, one way)."""
    src = np.empty(32 * 1024 * 1024, dtype=np.uint64)
    src[:] = 7
    dst = np.empty_like(src)
    n = 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
        n += src.nbytes
    return n / seconds


def _k_gather(seconds: float) -> float:
    """Random-permutation gather over 256 MiB; returns elements/s."""
    rng = np.random.default_rng(42)
    table = rng.integers(0, 1 << 62, size=32 * 1024 * 1024, dtype=np.uint64)
    idx = rng.permutation(table.shape[0]).astype(np.int64)
    out = np.empty_like(table)
    n = 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        np.take(table, idx, out=out)
        n += table.shape[0]
    return n / seconds


def _k_chase(seconds: float) -> float:
    """Serial pointer chase over a 32 MiB ring; returns loads/s.

    Vectorized into dependent-gather rounds: each np.take step makes every
    lane jump once through the permutation cycle — 4096 parallel chains of
    dependent loads, enough MLP to stress the LLC/DRAM path rather than a
    single load's full latency, while staying miss-bound (working set 8x
    a typical per-core L3 slice share)."""
    rng = np.random.default_rng(7)
    size = 4 * 1024 * 1024  # 32 MiB of int64
    nxt = rng.permutation(size).astype(np.int64)
    cur = rng.integers(0, size, size=4096).astype(np.int64)
    n = 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        for _ in range(64):
            cur = nxt[cur]
        n += 64 * cur.shape[0]
    return n / seconds


KERNELS = {"alu": _k_alu, "stream": _k_stream, "gather": _k_gather, "chase": _k_chase}


def _worker(kernel: str, cpu: int, seconds: float, q) -> None:
    os.sched_setaffinity(0, {cpu})
    q.put(KERNELS[kernel](seconds))


def run_leg(kernel: str, cpus: list[int], seconds: float) -> float:
    """Per-core rate (mean) with one pinned process per cpu."""
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(kernel, c, seconds, q)) for c in cpus
    ]
    for p in procs:
        p.start()
    rates = [q.get(timeout=seconds * 4 + 60) for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    sweep = _sweep_cpus()
    ranked = sorted(sweep, key=lambda c: -sweep[c])
    solo = [ranked[0]]
    joint = _spaced_pick(ranked, 4, set(solo)) or ranked[1:5]
    rec = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "solo_cpu": solo[0],
        "joint_cpus": joint,
        "solo_gbps_probe": sweep[solo[0]],
        "seconds_per_leg": seconds,
        "kernels": {},
    }
    for name in KERNELS:
        r1 = run_leg(name, solo, seconds)
        r4 = run_leg(name, joint, seconds)
        eff = r4 / r1 if r1 > 0 else 0.0
        rec["kernels"][name] = {
            "solo_rate": round(r1, 1),
            "joint_per_core_rate": round(r4, 1),
            "per_core_efficiency": round(eff, 4),
        }
        print(f"[control] {name}: solo={r1:.3e}/s joint-per-core={r4:.3e}/s "
              f"eff={eff:.3f}", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
