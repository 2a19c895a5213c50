"""Per-stage 1→4 scaling table from open-window legs (VERDICT r4 item 1's
corroboration artifact).

Reads BENCH/work/scaling_sessions.jsonl (+ concurrent_sessions.jsonl) and,
for every session that recorded stage walls, pairs the best (fastest-
pipeline) leg per level and prints per-stage wall ratios. Legs are
annotated with their leg-adjacent membw probe and (round 5+) in-leg trace
summary so a reader can see which pairs ran in held windows.

The 'edges' and 'nodes' stages run concurrently from driver threads (FAIR
pools) — their walls overlap, so the table reports max(edges, nodes) as
one 'edges∥nodes' row rather than summing double-counted wall.

Usage: python scripts/stage_scaling_table.py [--md]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SKIP = {"violation probe", "final_count", "final_noop_write"}


def _merged(stages: dict) -> dict:
    out = {k: v for k, v in stages.items() if k not in SKIP}
    e, n = out.pop("edges", None), out.pop("nodes", None)
    if e is not None or n is not None:
        out["edges∥nodes"] = max(e or 0.0, n or 0.0)
    return out


def best_leg(session: dict, level: str) -> int:
    runs = session["edges_per_sec_runs"][level]
    return max(range(len(runs)), key=lambda i: runs[i])


def table_for(session: dict) -> list[str]:
    levels = [str(c) for c in session["levels"]]
    walls = session.get("stage_walls")
    if not walls or not all(walls.get(l) for l in levels):
        return []
    idx = {l: best_leg(session, l) for l in levels}
    st = {l: _merged(walls[l][idx[l]]) for l in levels}
    lo, hi = levels
    lines = [
        f"session {session['ts']} (docs={session['n_docs']}, best legs: "
        + ", ".join(
            f"{l}cpu rep{idx[l] + 1} @ "
            f"{session.get('membw_gbps_runs', {}).get(l, ['?'] * 3)[idx[l]]}GB/s"
            for l in levels
        )
        + ")",
        "",
        f"| stage | {lo} cpu s | {hi} cpu s | speedup | per-core eff |",
        "|---|---|---|---|---|",
    ]
    factor = session["levels"][1] / session["levels"][0]
    tot = {l: 0.0 for l in levels}
    for k in st[lo]:
        a, b = st[lo].get(k), st[hi].get(k)
        if a is None or b is None or a <= 0 or b <= 0:
            continue
        tot[lo] += a
        tot[hi] += b
        lines.append(
            f"| {k} | {a:.1f} | {b:.1f} | {a / b:.2f}x | {a / b / factor:.2f} |"
        )
    if tot[hi] > 0:
        lines.append(
            f"| **total (summed)** | {tot[lo]:.1f} | {tot[hi]:.1f} | "
            f"{tot[lo] / tot[hi]:.2f}x | {tot[lo] / tot[hi] / factor:.2f} |"
        )
    lines.append("")
    return lines


def main() -> None:
    out: list[str] = ["# Per-stage 1→4 scaling, best legs per session", ""]
    for name in ("scaling_sessions.jsonl", "concurrent_sessions.jsonl"):
        path = os.path.join(ROOT, "BENCH", "work", name)
        if not os.path.exists(path):
            continue
        for line in open(path):
            if not line.strip():
                continue
            s = json.loads(line)
            if s.get("no_window"):
                continue
            if name.startswith("concurrent"):
                # concurrent rounds carry their own stage walls per round
                for i, r in enumerate(s.get("rounds", [])):
                    walls = r.get("stage_walls", {})
                    if not walls:
                        continue
                    sess = {
                        "ts": f"{s['ts']} concurrent round {i + 1}",
                        "n_docs": s["n_docs"],
                        "levels": s["levels"],
                        "stage_walls": {k: [v] for k, v in walls.items()},
                        "edges_per_sec_runs": {
                            k: [v] for k, v in r["edges_per_sec"].items()
                        },
                        "membw_gbps_runs": {},
                    }
                    out.extend(table_for(sess))
            else:
                out.extend(table_for(s))
    print("\n".join(out))


if __name__ == "__main__":
    main()
