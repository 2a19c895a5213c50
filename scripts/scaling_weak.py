"""Weak-scaling evidence: 4x the documents on 4x the pinned cores.

Third protocol variant (round 5), published alongside the sequential
strong-scaling sessions (scaling_evidence.py) and the same-window
concurrent pairing (scaling_concurrent.py).

Why: the north rule's operating point is "N → 4N executors on 10^12-
document inputs" — on a real fleet the cluster grows WITH the data, which
is weak scaling. It also fixes the last measurement asymmetry on this
host: strong-scaling legs have a 2-3x wall mismatch (the 1-cpu leg runs
5-6 min longer than the 4-cpu leg and its tail enjoys the host solo, with
burst bandwidth a real per-core grant would never give it), while weak
legs run the SAME wall by construction (4x work / 4x cores), so both
levels integrate over comparable window exposure even sequentially.

Input is deterministic docsgen at both sizes; the synthetic generator is
density-uniform, so 4x docs is 4.0004x edges (503,259 @100k →
2,013,123 @400k) — per-core work per leg is equal to three digits.

Estimator (fixed before the first session): per interleaved round,
efficiency = (edges/s @4cpu/400k) / (edges/s @1cpu/100k) / 4; session =
MEDIAN round (weak legs share window exposure by construction; median is
the representative round); legs with host steal > 2% flag their round
interference-invalidated. Adaptive pin selection, launch-window logging,
and the in-leg tracer are inherited verbatim from scaling_evidence.
Every session is appended to BENCH/work/weak_sessions.jsonl and
republished in BENCH/BASELINE.md's supplementary section.

Usage: python scripts/scaling_weak.py [base_docs]
Env:   SPARK_GRAFT_SCALING_REPS=2  SPARK_GRAFT_SCALING_LEVELS="1,4"
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_evidence import (
    GATE_RATIO,
    PROBES_LOG,
    STEAL_FLAG_PCT,
    one_level,
    pregenerate_docs,
    select_cpuset,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SESSIONS = os.path.join(ROOT, "BENCH", "work", "weak_sessions.jsonl")
MARKER = "## Weak scaling (4x docs on 4x cores, supplementary protocol)"


def publish(history: list[dict]) -> None:
    from baseline_sections import replace_section

    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    body = open(path).read() if os.path.exists(path) else "# BENCH/BASELINE\n"
    lines = [MARKER, ""]
    lines.append(
        "The north rule's operating point — N→4N EXECUTORS on 10^12-document\n"
        "inputs — is a cluster grown with its data: weak scaling. Each round\n"
        "runs the 1-cpu leg on base_docs and the 4-cpu leg on 4x base_docs\n"
        "(4.0004x edges — density-uniform generator), so legs run the SAME\n"
        "wall by construction and integrate comparable window exposure, which\n"
        "strong-scaling legs on this host cannot (the 1-cpu leg's solo tail\n"
        "gets burst bandwidth no per-core grant sustains). Estimator (fixed\n"
        "in advance): per-round (thr@4,4x)/(thr@1,1x)/4; session = MEDIAN\n"
        "round; steal>2% rounds invalidated. Pins/tracer inherited from the\n"
        "sequential protocol.\n"
    )
    lines.append("| when | base docs | round efficiencies | median | steal% | result |")
    lines.append("|---|---|---|---|---|---|")
    for s in history:
        lines.append(
            f"| {s['ts']} | {s['base_docs']} | {s['round_efficiencies']} | "
            f"{s['median_efficiency']} | {s['steal_pct_rounds']} | "
            f"{'PASS' if s['passed'] else 'fail'} |"
        )
    with open(path, "w") as f:
        f.write(replace_section(body, MARKER, "\n".join(lines)))


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    levels = [
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "1,4").split(",")
    ]
    docs = {levels[0]: base, levels[1]: base * (levels[1] // levels[0])}
    paths = {c: pregenerate_docs(docs[c]) for c in levels}
    os.makedirs(os.path.dirname(SESSIONS), exist_ok=True)
    t_start = time.time()
    rounds = []
    for i in range(reps):
        legs = {}
        for c in levels:
            # Same per-leg window gate as the other two protocols (round-5
            # extension): a multi-cpu leg only launches when its selected
            # cpuset's joint bandwidth >= GATE_RATIO x the best single core
            # in the same sweep — otherwise the leg measures the
            # hypervisor's QoS grant, not the engine. Scheduler only; the
            # median-round estimator is untouched. Bounded attempts, every
            # probe logged.
            attempts = int(os.environ.get("SPARK_GRAFT_SCALING_LEG_GATE_ATTEMPTS", "8"))
            gate_sleep = float(os.environ.get("SPARK_GRAFT_SCALING_LEG_GATE_SLEEP", "120"))
            for attempt in range(1, attempts + 1):
                cpuset, sel = select_cpuset(c)
                sweep = sel.get("sweep") or {}
                best_core = max(sweep.values()) if sweep else -1.0
                ratio = (sel.get("gbps", -1.0) / best_core) if best_core > 0 else -1.0
                # scale the threshold with the level (ADVICE r5: the fixed
                # 4-cpu-calibrated GATE_RATIO could never open for c<4 and
                # burned attempts x sleep before running anyway)
                open_ = c == 1 or ratio >= GATE_RATIO * c / 4.0
                with open(PROBES_LOG, "a") as f:
                    f.write(json.dumps({
                        "ts": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
                        "type": "weak_leg_select", "level": c, "cpuset": cpuset,
                        "gbps": sel.get("gbps", -1.0), "attempt": attempt,
                        "gate_ratio_measured": round(ratio, 2), "window_open": open_,
                    }) + "\n")
                if open_ or attempt == attempts:
                    break
                print(
                    f"[weak leg-gate] cpus={c} window closed "
                    f"(ratio {ratio:.2f} < {GATE_RATIO}); waiting "
                    f"(attempt {attempt}/{attempts})",
                    flush=True,
                )
                time.sleep(gate_sleep)
            os.environ["SPARK_GRAFT_DOCS_PATH"] = paths[c]
            r = one_level(c, docs[c], cpuset, sel)
            # launched-attempt gate state rides on the leg (ADVICE r5: a leg
            # launched with the window still closed after exhausting attempts
            # was only visible in the probes log, not the session record)
            r["launch_window_open"] = open_
            legs[c] = r
            print(
                f"[weak round {i + 1}/{reps}] cpus={c} docs={docs[c]} "
                f"pin={r['cpuset']} membw={r['membw_gbps']}GB/s: "
                f"{r['edges_per_sec']:.1f} edges/s "
                f"({r['queries']['waterway_pipeline']:.1f}s, steal {r['steal_pct']}%)",
                flush=True,
            )
        lo, hi = levels
        eff = (legs[hi]["edges_per_sec"] / legs[lo]["edges_per_sec"]) / (hi / lo)
        interference = any(legs[c]["interference"] for c in levels)
        rounds.append(
            {
                "efficiency": round(eff, 4),
                "edges_per_sec": {str(c): legs[c]["edges_per_sec"] for c in levels},
                "n_edges": {str(c): legs[c]["n_edges"] for c in levels},
                "pipeline_sec": {
                    str(c): legs[c]["queries"]["waterway_pipeline"] for c in levels
                },
                "cpusets": {str(c): legs[c]["cpuset"] for c in levels},
                "membw_gbps": {str(c): legs[c]["membw_gbps"] for c in levels},
                "steal_pct": {str(c): legs[c]["steal_pct"] for c in levels},
                "traces": {str(c): legs[c].get("trace", {}) for c in levels},
                "stage_walls": {str(c): legs[c].get("stages", {}) for c in levels},
                "leg_window_open": {
                    str(c): legs[c].get("launch_window_open") for c in levels
                },
                "interference": interference,
            }
        )
        print(f"[weak round {i + 1}/{reps}] eff={eff:.4f}", flush=True)
    clean = [r for r in rounds if not r["interference"]]
    effs = sorted(r["efficiency"] for r in (clean or rounds))
    median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 4
    )
    session = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "base_docs": base,
        "levels": levels,
        "reps": reps,
        "protocol": "weak scaling: 4x docs on 4x pinned cores; median round",
        "rounds": rounds,
        "round_efficiencies": [r["efficiency"] for r in rounds],
        "steal_pct_rounds": [r["steal_pct"] for r in rounds],
        "median_efficiency": median,
        "interference_invalidated": not clean,
        "passed": median >= 0.8 and bool(clean),
        "wall_minutes": round((time.time() - t_start) / 60, 1),
    }
    with open(SESSIONS, "a") as f:
        f.write(json.dumps(session) + "\n")
    publish([json.loads(l) for l in open(SESSIONS) if l.strip()])
    print(json.dumps({k: v for k, v in session.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
