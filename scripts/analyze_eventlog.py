"""One-off diagnostic: per-Spark-stage core utilization from an event log.

For a pinned local[k] bench leg run with OSMWWE_EVENTLOG=true, reports per
stage: wall (submission→completion), task count, sum of task run time, GC
time, shuffle read/write bytes, and utilization = task-time / (wall × k).
Low utilization → idle cores (parallelism/skew problem); high utilization
with inflated per-task time → memory-bandwidth or GC pressure.

Usage: python scripts/analyze_eventlog.py <eventlog-file> <k-cores> [top-n]
"""

import json
import sys


def main() -> None:
    path, cores = sys.argv[1], int(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    stages: dict[tuple[int, int], dict] = {}
    from driver_holes import _eventlog_files

    for fp in _eventlog_files(path):
        _scan(fp, stages)

    rows = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])[:top_n]
    total_wall = sum(s["wall"] for _, s in stages.items())
    print(f"{'stage':>5} {'wall_s':>8} {'tasks':>6} {'task_s':>8} {'cpu_s':>8} "
          f"{'gc_s':>6} {'util':>5} {'shR_MB':>7} {'shW_MB':>7}  name")
    for (sid, _), s in rows:
        util = s["run"] / (s["wall"] * cores) if s["wall"] > 0 else 0.0
        print(f"{sid:>5} {s['wall']:>8.1f} {s['tasks']:>6} {s['run']:>8.1f} "
              f"{s['cpu']:>8.1f} {s['gc']:>6.1f} {util:>5.2f} "
              f"{s['sh_r']/1e6:>7.0f} {s['sh_w']/1e6:>7.0f}  {s['name']}")
    print(f"total stage wall: {total_wall:.1f}s  stages: {len(stages)}")


def _scan(path: str, stages: dict) -> None:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, _blank())
                st["name"] = si.get("Stage Name", "?")[:70]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    st["wall"] = (comp - sub) / 1e3
            elif kind == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.setdefault(key, _blank())
                st["tasks"] += 1
                tm = ev.get("Task Metrics") or {}
                st["run"] += tm.get("Executor Run Time", 0) / 1e3
                st["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
                st["gc"] += tm.get("JVM GC Time", 0) / 1e3
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_r"] += srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                st["sh_w"] += swm.get("Shuffle Bytes Written", 0)


def _blank() -> dict:
    return {"name": "?", "wall": 0.0, "tasks": 0, "run": 0.0, "cpu": 0.0,
            "gc": 0.0, "sh_r": 0, "sh_w": 0}


if __name__ == "__main__":
    main()
