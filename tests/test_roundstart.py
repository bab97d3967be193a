"""Pin roundstart.py's decision logic (artifact classification and the
canonical-record clobber verdict) — the two calls that must never
auto-commit junk or overwrite a deliberate record."""

import importlib.util
import pathlib

_MOD = pathlib.Path(__file__).resolve().parents[1] / "roundstart.py"
_spec = importlib.util.spec_from_file_location("roundstart_mod", _MOD)
rs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rs)


def test_pending_artifacts_matches_only_driver_files():
    porcelain = "\n".join(
        [
            "?? CORRECTNESS_r11.json",
            "?? BENCH_r11.json",
            " M BENCH_FULL.json",
            "?? BENCH_FULL_r12.json",
            "?? notes.json",  # not a driver artifact
            "?? CORRECTNESS_r11.json.bak",  # suffix junk must not match
            " M bench.py",  # source files never auto-commit
            "?? tests/test_new.py",
        ]
    )
    assert rs.pending_artifacts(porcelain) == [
        "BENCH_FULL.json",
        "BENCH_FULL_r12.json",
        "BENCH_r11.json",
        "CORRECTNESS_r11.json",
    ]
    assert rs.pending_artifacts("") == []


def test_clobber_verdict_restores_only_on_load_evidence():
    idle = {"value": 88.0, "loadavg_start": [0.5, 1.0, 1.0]}
    loaded = {"value": 111.0, "loadavg_start": [3.7, 2.0, 1.5]}
    gate = 2.0
    # identical -> nothing to do
    ok, _ = rs.clobber_verdict(idle, idle, gate)
    assert not ok
    # loaded working copy vs idle committed -> restore
    ok, why = rs.clobber_verdict(loaded, idle, gate)
    assert ok and "clobber" in why
    # diverged but the working copy is ALSO idle -> maybe deliberate,
    # never auto-overwrite
    newer_idle = {"value": 84.0, "loadavg_start": [0.3, 0.5, 0.6]}
    ok, why = rs.clobber_verdict(newer_idle, idle, gate)
    assert not ok and "not restoring" in why
    # pre-r10 records without load fields -> no evidence, no restore
    legacy = {"value": 120.0}
    ok, _ = rs.clobber_verdict(legacy, idle, gate)
    assert not ok
    # both loaded -> no idle record to prefer; don't churn
    ok, _ = rs.clobber_verdict(loaded, loaded, gate)
    assert not ok
