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


def test_fix_commits_artifacts_and_restores_clobbered_record(tmp_path, monkeypatch):
    """--fix end-to-end in a REAL scratch git repo: the driver's
    dropped artifacts get committed, and a load-contaminated
    BENCH_FULL.json is restored from the newest committed idle
    r-record — while source files and non-artifact junk stay
    untouched."""
    import json
    import subprocess
    import sys

    def git(*args):
        subprocess.run(["git", *args], cwd=tmp_path, check=True, capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")

    idle = {"value": 88.0, "queries": {"a": 1.0}, "loadavg_start": [0.5, 1, 1]}
    loaded = {"value": 111.0, "queries": {"a": 1.5}, "loadavg_start": [3.7, 2, 2]}
    (tmp_path / "BENCH_FULL_r10.json").write_text(json.dumps(idle))
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(idle))
    git("add", "-A")
    git("commit", "-q", "-m", "seed")

    # the driver's round-boundary droppings + a clobbered canonical
    (tmp_path / "CORRECTNESS_r11.json").write_text("{}")
    (tmp_path / "BENCH_r11.json").write_text("{}")
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(loaded))
    (tmp_path / "scratch.txt").write_text("not an artifact")

    monkeypatch.setattr(rs, "_REPO", tmp_path)
    monkeypatch.setattr(sys, "argv", ["roundstart.py", "--fix"])
    assert rs.main() == 0

    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=tmp_path, capture_output=True, text=True
    ).stdout
    assert "CORRECTNESS_r11" not in status and "BENCH_r11" not in status
    assert "BENCH_FULL.json" not in status
    assert "?? scratch.txt" in status  # junk is never auto-committed
    # the canonical record is the idle one again
    assert json.loads((tmp_path / "BENCH_FULL.json").read_text()) == idle
    log = subprocess.run(
        ["git", "log", "--oneline"], cwd=tmp_path, capture_output=True, text=True
    ).stdout
    assert "Restore idle canonical bench record" in log
    assert "Commit driver round artifacts" in log


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
