"""Round-5 hardening: IcebergTableSink surface coverage (VERDICT r4 item 6)
and the opportunistic scaling-gate rule (VERDICT r4 item 1)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


# ---- IcebergTableSink: catalog-free coverage via a fake writeTo surface ----
# No iceberg-spark jar or catalog service exists in this sandbox, so the
# production sink is exercised against recording fakes: the test pins WHICH
# writeTo verbs and WHICH catalog SQL each method composes — the exact seam
# a real catalog would receive.


class _RecordingWriter:
    def __init__(self, calls, table):
        self._calls, self._table = calls, table

    def append(self):
        self._calls.append(("writeTo.append", self._table))

    def overwritePartitions(self):
        self._calls.append(("writeTo.overwritePartitions", self._table))


class _FakeDF:
    def __init__(self, calls):
        self._calls = calls

    def writeTo(self, table):
        return _RecordingWriter(self._calls, table)


def test_iceberg_sink_write_verbs():
    from osmwaterwayextractor_spark.sinks.table_sink import IcebergTableSink

    calls = []
    sink = IcebergTableSink("cat.db.edges")
    sink.append(_FakeDF(calls), partition_col="tile")
    sink.overwrite(_FakeDF(calls), partition_col="tile")
    assert calls == [
        ("writeTo.append", "cat.db.edges"),
        ("writeTo.overwritePartitions", "cat.db.edges"),
    ]


def test_iceberg_sink_catalog_sql(spark, monkeypatch):
    """list_partitions must read the Iceberg ``.partitions`` metadata table
    and drop_partition must issue DELETE WHERE — asserted on the literal SQL
    the active session receives."""
    from pyspark.sql import Row

    from osmwaterwayextractor_spark.sinks.table_sink import IcebergTableSink

    issued = []

    def fake_sql(q, *a, **kw):
        issued.append(q)

        class _R:
            def collect(self):
                return [Row(v="t2"), Row(v="t1")]

        return _R()

    monkeypatch.setattr(spark, "sql", fake_sql)
    sink = IcebergTableSink("cat.db.edges")
    assert sink.list_partitions("tile") == ["t1", "t2"]  # sorted
    sink.drop_partition("tile", "t1")
    assert issued == [
        "SELECT partition.tile AS v FROM cat.db.edges.partitions",
        "DELETE FROM cat.db.edges WHERE tile = 't1'",
    ]


def test_iceberg_sink_read_uses_catalog_table(spark, monkeypatch):
    from pyspark.sql.readwriter import DataFrameReader

    from osmwaterwayextractor_spark.sinks.table_sink import IcebergTableSink

    seen = []
    monkeypatch.setattr(
        DataFrameReader, "table", lambda self, name: seen.append(name) or "DF"
    )
    assert IcebergTableSink("cat.db.edges").read(spark) == "DF"
    assert seen == ["cat.db.edges"]


# ---- opportunistic scaling-launch gate: pure decision rule ----


def test_gate_decision_rule():
    from scaling_evidence import GATE_RATIO, LOWER_FLOOR_GBPS, gate_decision

    # healthy window: lower core 6 GB/s, upper set 4x that aggregate
    ratio, open_ = gate_decision(6.0, 24.0, 1, 4)
    assert ratio == pytest.approx(4.0) and open_

    # round-4 failure signature: upper cpuset granted ~1x one core
    ratio, open_ = gate_decision(17.9, 0.72, 1, 4)
    assert not open_ and ratio < 1

    # reverse-gaming guard: starved LOWER leg gives a huge ratio but must
    # NOT open the gate (it would overstate efficiency)
    ratio, open_ = gate_decision(0.18, 7.87, 1, 4)
    assert ratio > GATE_RATIO and not open_
    assert 0.18 < LOWER_FLOOR_GBPS

    # probe failure sentinel never opens
    assert gate_decision(-1.0, 24.0, 1, 4) == (-1.0, False)
    assert not gate_decision(6.0, -1.0, 1, 4)[1]

    # exactly-at-threshold opens (>= semantics); derive the probe value from
    # GATE_RATIO so a recalibration (3.0 -> 3.4 before session 11) cannot
    # desync this fixture again
    ratio, open_ = gate_decision(1.0, GATE_RATIO * 1.0, 1, 4)
    assert ratio == pytest.approx(GATE_RATIO) and open_
    # just-below-threshold stays closed
    assert not gate_decision(1.0, GATE_RATIO - 0.01, 1, 4)[1]


def test_no_window_session_record_renders_in_history(tmp_path, monkeypatch):
    """A NO-WINDOW record (gate held closed all attempts) must render in the
    BASELINE.md history table instead of crashing the publisher."""
    import scaling_evidence as se

    rec = {
        "ts": "2026-08-18 00:00:00 UTC",
        "n_docs": 100000,
        "levels": [1, 4],
        "no_window": True,
        "gate_attempts": 12,
        "probes_log": "BENCH/work/scaling_probes.jsonl",
    }
    sessions = tmp_path / "scaling_sessions.jsonl"
    sessions.write_text(json.dumps(rec) + "\n")
    monkeypatch.setattr(se, "SESSIONS", str(sessions))
    out_root = tmp_path
    (out_root / "BENCH").mkdir()
    monkeypatch.setattr(se, "ROOT", str(out_root))

    # minimal fake session context for the publisher
    run = {
        "edges_per_sec": 100.0,
        "steal_pct": 0.1,
        "queries": {"waterway_pipeline": 10.0},
        "n_edges": 1000,
        "tile_assign_sec": 1.0,
    }
    session = {
        "n_docs": 100000,
        "reps": 1,
        "cpusets": {"1": "1", "4": "1,9,17,25"},
        "paired_efficiencies": [1.0],
        "membw_gbps_runs": {"1": [6.0], "4": [24.0]},
        "interference_invalidated": False,
    }
    se.write_baseline_md(
        "/root/testdata/sf0.1", [1, 4], 4.0, {1: [run], 4: [run]}, [run, run], 1.0, session
    )
    text = (out_root / "BENCH" / "BASELINE.md").read_text()
    assert "NO-WINDOW" in text and "gate held closed 12 probes" in text


# ---- bench.py shared-docs validation (ADVICE r4) ----


def test_shared_docs_usable_validates_count(spark, tmp_path):
    import bench

    p = str(tmp_path / "docs")
    spark.range(3).selectExpr("cast(id as string) doc_id").write.parquet(p)
    assert bench.shared_docs_usable(spark, p, 3)
    assert not bench.shared_docs_usable(spark, p, 5)  # stale path, wrong count
    assert not bench.shared_docs_usable(spark, "", 3)
    assert not bench.shared_docs_usable(spark, str(tmp_path / "missing"), 3)


# ---- intersections whole-stage-codegen compiles (round-5 scaling fix) ----


def test_intersections_compile_without_fallback(spark):
    """The detect+insert plan fused the SMJ/BHJ self-join, the ~60-expression
    exact intersect test, and the distinct's partial hash aggregate into ONE
    whole-stage-codegen region whose consume method exceeded Janino's 64 KB
    limit — every fresh JVM then spent tens of driver seconds (59 s measured
    at 100k docs) compiling code it would throw away before silently running
    the subtree unfused. The coalesce() barrier in detect_intersections splits
    the region so everything genuinely compiles.

    With spark.sql.codegen.fallback=false a failed compile raises instead of
    falling back, so this test is red iff any part of the intersections plan
    stops compiling. Runs both join shapes (broadcast + sort-merge)."""
    from osmwaterwayextractor_spark.config import EngineConfig
    from osmwaterwayextractor_spark.operators.geometry_ops import (
        WAYS_SCHEMA,
        detect_intersections,
        insert_intersections,
    )

    ways = spark.createDataFrame(
        [
            (1, [0.0, 1.0], [0.0, 1.0], {}),
            (2, [1.0, 0.0], [0.0, 1.0], {}),
        ],
        schema=WAYS_SCHEMA,
    )
    cfg = EngineConfig(filter_waterway_types=False)
    conf = spark.conf
    prev_fb, prev_bc = conf.get("spark.sql.codegen.fallback", "true"), conf.get(
        "spark.sql.autoBroadcastJoinThreshold"
    )
    try:
        conf.set("spark.sql.codegen.fallback", "false")
        for bc in (prev_bc, "-1"):  # broadcast-hash and sort-merge shapes
            conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
            pts = detect_intersections(ways, cfg)
            assert [(round(r.plat, 6), round(r.plon, 6)) for r in pts.collect()] == [
                (0.5, 0.5)
            ]
            out = {
                r.way_id: list(zip(r.lats, r.lons))
                for r in insert_intersections(ways, detect_intersections(ways, cfg), cfg).collect()
            }
            assert (0.5, 0.5) in out[1] and (0.5, 0.5) in out[2]
    finally:
        conf.set("spark.sql.codegen.fallback", prev_fb)
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
