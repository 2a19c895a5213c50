"""EngineConfig: YAML loading against the actual reference configs and
step-param-hash invalidation semantics (reference :239-334)."""

from osmwaterwayextractor_spark.config import EngineConfig


def test_from_reference_yaml():
    cfg = EngineConfig.from_yaml("/root/reference/config.yaml")
    assert cfg.snap_tolerance_m == 6.0
    assert cfg.min_fragment_length_m == 50.0
    assert cfg.coordinate_precision == 5
    assert cfg.waterway_types == ("river", "canal")
    assert cfg.enable_geometry_simplification is True
    assert cfg.simplification_tolerance_m == 5.0
    assert cfg.max_displacement_multiplier == 3.0
    assert cfg.warning_displacement_multiplier == 2.0
    assert cfg.hash_length == 8


def test_from_no_simplify_yaml():
    cfg = EngineConfig.from_yaml("/root/reference/test_config_no_simplify.yaml")
    assert cfg.enable_geometry_simplification is False
    assert cfg.snap_tolerance_m == 5.0
    assert cfg.max_displacement_multiplier == 1.5


def test_step_param_hash_scoping():
    import dataclasses

    base = EngineConfig()
    # late-stage knob must not invalidate early stages
    late = dataclasses.replace(base, min_fragment_length_m=99.0)
    assert base.step_param_hash("processed") == late.step_param_hash("processed")
    assert base.step_param_hash("clustering") == late.step_param_hash("clustering")
    assert base.step_param_hash("edges") != late.step_param_hash("edges")
    # early-stage knob invalidates downstream
    early = dataclasses.replace(base, coordinate_precision=6)
    assert base.step_param_hash("processed") != early.step_param_hash("processed")
    assert base.step_param_hash("edges") != early.step_param_hash("edges")
    # parse stage rounds coordinates → precision must invalidate it
    assert base.step_param_hash("parsed") != early.step_param_hash("parsed")
    # ...but snapping knobs must not
    snap = dataclasses.replace(base, snap_tolerance_m=9.0)
    assert base.step_param_hash("parsed") == snap.step_param_hash("parsed")
    assert base.step_param_hash("assembled") == snap.step_param_hash("assembled")
