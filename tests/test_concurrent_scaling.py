"""Unit tests for the same-window concurrent pairing protocol
(scripts/scaling_concurrent.py) and the in-leg tracer (scripts/leg_tracer.py).

Pure-Python — no Spark, no subprocess legs. The session-level estimator
(median round efficiency, steal-flagged rounds excluded) and the disjoint
cpuset picker are the declared-in-advance pieces; they must be unit-pinned
just like the sequential estimator.
"""

import importlib.util
import os
import sys
import time

_SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
sys.path.insert(0, _SCRIPTS)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


scaling_concurrent = _load("scaling_concurrent")
leg_tracer = _load("leg_tracer")


def _median_of(effs, steals):
    """Drive the same median+interference logic main() applies, via the
    module's own pieces (kept in one place there; mirrored here)."""
    rounds = [
        {"efficiency": e, "interference": s > 2.0, "steal_pct": s}
        for e, s in zip(effs, steals)
    ]
    clean = [r for r in rounds if not r["interference"]]
    vals = sorted(r["efficiency"] for r in (clean or rounds))
    if len(vals) % 2:
        return vals[len(vals) // 2], bool(clean)
    return round((vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2, 4), bool(clean)


def test_median_round_is_the_session_number():
    med, clean = _median_of([0.9, 0.5, 0.84], [0.1, 0.1, 0.1])
    assert med == 0.84 and clean  # middle value, not the best round


def test_steal_flagged_round_excluded_from_median():
    # the best round ran under a storm: median over the clean rounds only
    # (two clean rounds -> mean of the middle pair)
    med, clean = _median_of([0.95, 0.7, 0.72], [5.0, 0.1, 0.1])
    assert med == 0.71 and clean


def test_all_rounds_flagged_invalidates():
    med, clean = _median_of([0.9, 0.85], [4.0, 3.0])
    assert not clean  # interference_invalidated, never a pass


def test_pick_disjoint_levels_never_share_cpus(monkeypatch):
    sweep = {c: float(32 - c) for c in range(32)}  # cpu0 best, descending
    monkeypatch.setattr(scaling_concurrent, "_sweep_cpus", lambda: sweep)
    monkeypatch.setattr(
        scaling_concurrent, "_membw_probe", lambda cs, seconds=1.5: 40.0
    )
    cpusets, sel = scaling_concurrent.pick_disjoint([1, 4])
    lo = {int(c) for c in cpusets[1].split(",")}
    hi = {int(c) for c in cpusets[4].split(",")}
    assert len(lo) == 1 and len(hi) == 4
    assert not (lo & hi)
    # the lower leg takes the single BEST core (baseline never understated)
    assert lo == {0}
    assert sel["lo_gbps"] == 32.0


def test_tracer_samples_busy_and_spare(monkeypatch):
    tr = leg_tracer.LegTracer([1, 2], interval=0.2, probe_sec=0.05)
    # spares must avoid the leg's own cpus
    assert not (set(tr.spares) & {1, 2})
    # stub the bandwidth probe: the unit test pins the sampling loop and
    # summary math, not the fork-heavy host_probe worker
    tr._probe_spare = lambda idx: (3, 5.0)
    tr.start()
    time.sleep(1.1)
    s = tr.stop()
    assert s["n_samples"] >= 2
    assert s["spare_gbps_mean"] == 5.0
    assert all(k in s for k in ("spare_gbps_mean", "leg_busy_pct_mean", "steal_pct_max"))
    assert len(s["timeline"]) == s["n_samples"]


baseline_sections = _load("baseline_sections")
scaling_weak = _load("scaling_weak")


def test_replace_section_composes_in_any_order():
    rs = baseline_sections.replace_section
    body = "# title\n\nbase content\n"
    body = rs(body, "## A", "## A\n\na1")
    body = rs(body, "## B", "## B\n\nb1")
    body = rs(body, "## A", "## A\n\na2")  # update A without touching B
    assert "a2" in body and "a1" not in body and "b1" in body
    assert body.index("## A") < body.index("## B")
    body = rs(body, "## B", "## B\n\nb2")
    assert "b2" in body and "b1" not in body and "a2" in body


def test_weak_publish_writes_own_section_only(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling_weak, "ROOT", str(tmp_path))
    (tmp_path / "BENCH").mkdir()
    (tmp_path / "BENCH" / "BASELINE.md").write_text(
        "# BENCH/BASELINE\n\nsequential body\n\n"
        "## Same-window concurrent pairing (supplementary protocol)\n\nconc\n"
    )
    scaling_weak.publish([
        {
            "ts": "2026-08-19 00:00:00 UTC",
            "base_docs": 100000,
            "round_efficiencies": [0.9, 0.85],
            "median_efficiency": 0.875,
            "steal_pct_rounds": [{"1": 0.1, "4": 0.1}],
            "passed": True,
        }
    ])
    text = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "sequential body" in text and "conc" in text
    assert "Weak scaling" in text and "0.875" in text and "PASS" in text
