"""Zero-task (driver-serial) hole analysis of a Spark event log.

The N->4N scaling gap on a pinned local[k] leg has two distinct engine-side
mechanisms with opposite fixes:

- per-stage task-time inflation / skew (analyze_eventlog.py covers this);
- DRIVER HOLES: wall intervals where ZERO tasks are running — plan
  analysis/optimization, Janino codegen compiles, parquet commit protocol,
  py4j round-trips. A hole costs the same absolute seconds at every core
  count, so it is pure Amdahl serial fraction: at 1 cpu a 20 s hole is 3%
  of a 630 s leg, at 4 cpus it is 10% of a 200 s leg — exactly the busy%
  gap the in-leg tracer measures (1-cpu legs trace 100% busy, 4-cpu legs
  89-92%). The round-5 session-2 audit found one such 59 s hole (a doomed
  64 KB Janino compile); this tool generalizes that hunt: it reconstructs
  the running-task count timeline from task Launch/Finish times and prints
  every hole >= min_hole seconds with the stages immediately before/after
  it, plus the total hole time inside the span of the first..last task.

Usage: python scripts/driver_holes.py <eventlog-file> [min_hole_sec=0.5]
"""

from __future__ import annotations

import json
import sys


def _eventlog_files(path: str) -> list[str]:
    """Flat-file OR Spark-4 rolling v2 directory (events_<n>_<appId>)."""
    import os

    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.startswith("events_")
        ]
    return []


def load_events(path: str):
    tasks = []  # (launch_ms, finish_ms, stage_id)
    stage_names: dict[int, str] = {}
    for fp in _eventlog_files(path):
        for line in open(fp):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerTaskEnd":
                ti = ev.get("Task Info") or {}
                lt, ft = ti.get("Launch Time"), ti.get("Finish Time")
                if lt and ft:
                    tasks.append((lt, ft, ev.get("Stage ID", -1)))
            elif kind == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si.get("Stage Name", "?")
    return tasks, stage_names


def holes(tasks, min_hole_ms: float):
    """Merged task intervals -> gaps between them (the zero-task holes)."""
    if not tasks:
        return [], 0.0, 0.0
    ivs = sorted((lt, ft) for lt, ft, _ in tasks)
    merged = [list(ivs[0])]
    for lt, ft in ivs[1:]:
        if lt <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], ft)
        else:
            merged.append([lt, ft])
    gaps = [
        (merged[i][1], merged[i + 1][0])
        for i in range(len(merged) - 1)
        if merged[i + 1][0] - merged[i][1] >= min_hole_ms
    ]
    span = merged[-1][1] - merged[0][0]
    total_gap = sum(b - a for a, b in (
        (merged[i][1], merged[i + 1][0]) for i in range(len(merged) - 1)
    ))
    return gaps, span / 1e3, total_gap / 1e3


def neighbors(tasks, stage_names, t_ms: float, after: bool):
    """Stage of the task nearest to t_ms (ending before / starting after)."""
    best, best_d = None, None
    for lt, ft, sid in tasks:
        d = (lt - t_ms) if after else (t_ms - ft)
        if d >= 0 and (best_d is None or d < best_d):
            best, best_d = sid, d
    if best is None:
        return "?"
    return f"s{best}:{stage_names.get(best, '?')[:60]}"


def main() -> None:
    # usage: driver_holes.py <eventlog> [min_hole_sec] [t0_epoch t1_epoch]
    # The optional epoch pair (from bench.py's [mark] pipeline_*_epoch lines)
    # clips the analysis to the MEASURED pipeline window, separating in-timer
    # Amdahl serial loss from untimed setup (probe, imports, docs scan).
    path = sys.argv[1]
    min_hole = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    tasks, stage_names = load_events(path)
    if len(sys.argv) > 4:
        w0, w1 = float(sys.argv[3]) * 1e3, float(sys.argv[4]) * 1e3
        tasks = [
            (max(lt, w0), min(ft, w1), sid)
            for lt, ft, sid in tasks
            if ft > w0 and lt < w1
        ]
        print(f"window-clipped to [{sys.argv[3]}, {sys.argv[4]}] epoch sec")
    gaps, span_s, total_gap_s = holes(tasks, min_hole * 1e3)
    print(
        f"tasks: {len(tasks)}  span(first-launch→last-finish): {span_s:.1f}s  "
        f"total zero-task time: {total_gap_s:.1f}s ({100 * total_gap_s / max(span_s, 1e-9):.1f}%)"
    )
    print(f"holes >= {min_hole}s:")
    for a, b in sorted(gaps, key=lambda g: -(g[1] - g[0])):
        print(
            f"  {(b - a) / 1e3:7.2f}s  after [{neighbors(tasks, stage_names, a, False)}]"
            f" before [{neighbors(tasks, stage_names, b, True)}]"
        )


if __name__ == "__main__":
    main()
