"""In-leg host-capability tracer for scaling legs.

Why: the scaling legs run 4-11 minutes while this VM's bandwidth QoS swings
on MINUTE scale — a 3-second probe adjacent to the leg (round-4 protocol)
says what the host could grant when the leg STARTED, not whether the window
HELD. Round-5 sessions launched through an open gate (e.g. 71 GB/s granted
to the 4-cpu set) still scored 0.31-0.80 on individual paired rounds, which
is only explainable if the grant decayed mid-leg. This tracer makes that
falsifiable per leg.

What it samples, every INTERVAL seconds while a leg runs:
- spare-core streaming bandwidth (GB/s): a 0.4 s single-core membw probe
  pinned to a core OUTSIDE the leg's cpuset. A proxy for the host's current
  QoS window (the per-vCPU grant moves around, so the spare may diverge from
  the leg's own cpus — the spare's identity is logged with each sample).
  Duty cycle ~3%; the probe never touches the leg's pinned cpus.
- leg-cpuset busy%: non-idle time share of the leg's OWN cpus from
  /proc/stat deltas (free to read, zero perturbation). Busy ~100% with low
  throughput = the cpus are running but starved (bandwidth); busy well
  below 100% = scheduling gaps / serial fraction — the decomposition that
  separates "host stopped providing" from "engine stopped scaling".
- host-wide steal%: the hypervisor's own record of neighbors taking the
  physical CPU (distinct from the bandwidth QoS, which steals NOTHING
  /proc/stat can see).

Usage:
    tr = LegTracer(leg_cpus=[25, 30, 11, 17], spare_pool=[...ranked...])
    tr.start(); ... run the leg ...; summary = tr.stop()
summary carries min/mean/last spare-GB/s, mean busy%, max steal%, and the
full timeline for the session log.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_times(cpus: list[int]) -> tuple[float, float]:
    """(busy_ticks, total_ticks) summed over the given cpus."""
    busy = total = 0
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu") or line.startswith("cpu "):
                continue
            parts = line.split()
            c = int(parts[0][3:])
            if c not in cpus:
                continue
            vals = [int(x) for x in parts[1:]]
            idle = vals[3] + vals[4]  # idle + iowait
            total += sum(vals)
            busy += sum(vals) - idle
    return busy, total


def _host_steal() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7], sum(vals)


class LegTracer:
    def __init__(
        self,
        leg_cpus: list[int],
        spare_pool: list[int] | None = None,
        interval: float = 15.0,
        probe_sec: float = 0.4,
    ) -> None:
        self.leg_cpus = list(leg_cpus)
        n = os.cpu_count() or 32
        pool = spare_pool or [c for c in range(1, n)]
        self.spares = [c for c in pool if c not in self.leg_cpus][:4] or [0]
        self.interval = interval
        self.probe_sec = probe_sec
        self.samples: list[dict] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _probe_spare(self, idx: int) -> tuple[int, float]:
        try:
            from host_probe import _run_leg

            spare = self.spares[idx % len(self.spares)]
            return spare, round(_run_leg("membw", [spare], self.probe_sec) / 1e9, 2)
        except Exception:
            return -1, -1.0

    def _loop(self) -> None:
        i = 0
        b0, t0 = _cpu_times(self.leg_cpus)
        s0, st0 = _host_steal()
        t_last = time.time()
        while not self._stop.wait(self.interval):
            spare, gbps = self._probe_spare(i)
            b1, t1 = _cpu_times(self.leg_cpus)
            s1, st1 = _host_steal()
            dt_total = max(t1 - t0, 1)
            self.samples.append(
                {
                    "t": round(time.time() - self._t_start, 1),
                    "spare": spare,
                    "spare_gbps": gbps,
                    "leg_busy_pct": round(100.0 * (b1 - b0) / dt_total, 1),
                    "steal_pct": round(100.0 * (s1 - s0) / max(st1 - st0, 1), 2),
                }
            )
            b0, t0, s0, st0 = b1, t1, s1, st1
            t_last = time.time()
            i += 1

    def start(self) -> "LegTracer":
        self._t_start = time.time()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self.interval + self.probe_sec + 2)
        gb = [s["spare_gbps"] for s in self.samples if s["spare_gbps"] >= 0]
        busy = [s["leg_busy_pct"] for s in self.samples]
        steal = [s["steal_pct"] for s in self.samples]
        return {
            "n_samples": len(self.samples),
            "spare_gbps_min": min(gb) if gb else -1.0,
            "spare_gbps_mean": round(sum(gb) / len(gb), 2) if gb else -1.0,
            "leg_busy_pct_mean": round(sum(busy) / len(busy), 1) if busy else -1.0,
            "steal_pct_max": max(steal) if steal else -1.0,
            "timeline": self.samples,
        }
