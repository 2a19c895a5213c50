"""Reseed BENCH/work evidence logs from committed snapshots and republish.

BENCH/work/ is gitignored and gets wiped on sandbox restarts. Each scaling
session appends to the work logs and regenerates BENCH/BASELINE.md's history
table from them, so a session that runs after a wipe publishes a history
containing only itself (this happened to session 10: the published table lost
the banked 0.9157 PASS row and the supplementary sections). The committed
snapshots BENCH/*_r5.jsonl are the durable copies.

This script makes the two stores converge and republishes:
  1. work log <- union(committed snapshot, work log), order-preserving,
     dedup by exact line (records are append-only JSON lines).
  2. committed snapshot <- the merged log (so new sessions get banked).
  3. BENCH/BASELINE.md: regenerate the session-history table rows from the
     merged sessions log, then re-run every supplementary publish module
     (concurrent pairing, weak scaling, host controls, per-stage table).

Run it before launching scaling sessions after any restart, and after any
session completes, so neither store can silently lose history again.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(ROOT, "BENCH", "work")

# work-log basename -> committed snapshot basename
PAIRS = [
    ("scaling_sessions.jsonl", "sessions_r5.jsonl"),
    ("scaling_probes.jsonl", "probes_r5.jsonl"),
    ("concurrent_sessions.jsonl", "concurrent_r5.jsonl"),
    ("host_controls.jsonl", "host_controls_r5.jsonl"),
    ("weak_sessions.jsonl", "weak_r5.jsonl"),
]


def _read_lines(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [l.rstrip("\n") for l in f if l.strip()]


def merge_logs() -> dict[str, int]:
    os.makedirs(WORK, exist_ok=True)
    counts: dict[str, int] = {}
    for work_name, snap_name in PAIRS:
        work_path = os.path.join(WORK, work_name)
        snap_path = os.path.join(ROOT, "BENCH", snap_name)
        snap = _read_lines(snap_path)
        work = _read_lines(work_path)
        if not snap and not work:
            continue
        merged, seen = [], set()
        for line in snap + work:
            if line not in seen:
                seen.add(line)
                merged.append(line)
        body = "\n".join(merged) + "\n"
        with open(work_path, "w") as f:
            f.write(body)
        with open(snap_path, "w") as f:
            f.write(body)
        counts[work_name] = len(merged)
    return counts


def render_history_rows(history: list[dict]) -> list[str]:
    """Same row format as scaling_evidence.write_baseline_md's history loop."""
    rows = []
    for s in history:
        if s.get("no_window"):
            rows.append(
                f"| {s['ts']} | {s['n_docs']} | — | — | — | — | — | — | — | — | "
                f"NO-WINDOW (gate held closed {s['gate_attempts']} probes) |"
            )
            continue
        lo, hi = str(s["levels"][0]), str(s["levels"][1])
        steals = s.get("steal_pct_runs", {})
        verdict = (
            "INTERFERENCE"
            if s.get("interference_invalidated")
            else ("PASS" if s["passed"] else "fail")
        )
        rows.append(
            f"| {s['ts']} | {s['n_docs']} | {s['reps']} | "
            f"{s['edges_per_sec_runs'][lo]} | {s['edges_per_sec_runs'][hi]} | "
            f"{steals.get(lo, 'n/a')} | {steals.get(hi, 'n/a')} | "
            f"{s['edges_per_sec_best'][0]} | {s['edges_per_sec_best'][1]} | "
            f"{s['scaling_efficiency']} | {verdict} |"
        )
    return rows


def republish_history_table(history: list[dict]) -> None:
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    body = open(path).read()
    header = "## Session history (ALL invocations of this script)"
    start = body.index(header)
    # rows sit between the |---| separator line and the first non-table line
    sep = body.index("|---|", start)
    rows_start = body.index("\n", sep) + 1
    rows_end = rows_start
    for line in body[rows_start:].splitlines(keepends=True):
        if not line.startswith("|"):
            break
        rows_end += len(line)
    new_rows = "\n".join(render_history_rows(history)) + "\n"
    with open(path, "w") as f:
        f.write(body[:rows_start] + new_rows + body[rows_end:])


def republish_supplementary() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    for mod_name, jsonl in (
        ("scaling_concurrent", "concurrent_sessions.jsonl"),
        ("scaling_weak", "weak_sessions.jsonl"),
        ("publish_controls", "host_controls.jsonl"),
        ("stage_scaling_table", "scaling_sessions.jsonl"),
    ):
        p = os.path.join(WORK, jsonl)
        if os.path.exists(p):
            importlib.import_module(mod_name).publish(
                [json.loads(l) for l in open(p) if l.strip()]
            )


def main() -> None:
    counts = merge_logs()
    for name, n in counts.items():
        print(f"merged {name}: {n} records")
    sessions_path = os.path.join(WORK, "scaling_sessions.jsonl")
    if not os.path.exists(sessions_path):
        # fresh environment with no session history at all (ADVICE r5):
        # nothing to republish — merge_logs already reported what it did
        print("no session history yet; skipping republish")
        return
    history = [json.loads(l) for l in open(sessions_path) if l.strip()]
    republish_history_table(history)
    republish_supplementary()
    passes = [s for s in history if s.get("passed")]
    print(
        f"republished BASELINE.md: {len(history)} sessions in history, "
        f"{len(passes)} PASS"
    )


if __name__ == "__main__":
    main()
