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
            "?? bench_probes/r12_00.json",  # probe payloads ARE artifacts
            "?? bench_probes/readme.txt",  # ...but only rNN_kk payloads
        ]
    )
    assert rs.pending_artifacts(porcelain) == [
        "BENCH_FULL.json",
        "BENCH_FULL_r12.json",
        "BENCH_r11.json",
        "CORRECTNESS_r11.json",
        "bench_probes/r12_00.json",
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
    # the canonical record is the idle one again (git-restored from
    # HEAD, NOT committed as an artifact — the contaminated copy must
    # never enter history as if it were a deliberate record)
    assert json.loads((tmp_path / "BENCH_FULL.json").read_text()) == idle
    log = subprocess.run(
        ["git", "log", "--oneline"], cwd=tmp_path, capture_output=True, text=True
    ).stdout
    assert "Commit driver round artifacts" in log
    head_full = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"],
        cwd=tmp_path, capture_output=True, text=True,
    ).stdout
    assert json.loads(head_full) == idle


def test_fix_restores_torn_canonical_record(tmp_path, monkeypatch):
    """A torn/interrupted write leaves BENCH_FULL.json unparseable —
    exactly the damaged state a round-boundary repair command must
    classify as clobber evidence (and --fix restore), not crash on."""
    import json
    import subprocess
    import sys

    def git(*args):
        subprocess.run(["git", *args], cwd=tmp_path, check=True, capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    idle = {"value": 88.0, "queries": {"a": 1.0}, "loadavg_start": [0.5, 1, 1]}
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(idle))
    git("add", "-A")
    git("commit", "-q", "-m", "seed")
    (tmp_path / "BENCH_FULL.json").write_text('{"value": 88.0, "quer')  # torn

    monkeypatch.setattr(rs, "_REPO", tmp_path)
    monkeypatch.setattr(sys, "argv", ["roundstart.py"])
    assert rs.main() == 0  # report-only: classifies, does not crash

    monkeypatch.setattr(sys, "argv", ["roundstart.py", "--fix"])
    assert rs.main() == 0
    assert json.loads((tmp_path / "BENCH_FULL.json").read_text()) == idle


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


def _detailed(value, cpu_per_query, n=3, loadavg=0.2):
    return {
        "value": value,
        "loadavg_start": [loadavg, 1.0, 1.0],
        "query_detail": {
            f"q{i}": {
                "wall_sec": [value / n],
                "machine_cpu_sec": [cpu_per_query, cpu_per_query * 1.4],
            }
            for i in range(n)
        },
    }


def test_clobber_verdict_host_noise_cpu_evidence():
    gate = 2.0
    committed = _detailed(88.0, cpu_per_query=600.0)
    # idle-loadavg working copy, 1.5x worse wall, flat best-rep CPU ->
    # host-noise clobber even though the loadavg gate can't see it
    noisy = _detailed(132.0, cpu_per_query=610.0)
    ok, why = rs.clobber_verdict(noisy, committed, gate)
    assert ok and "host-noise" in why
    # ...but if the measured code CHANGED since the committed record,
    # the same signature could be an IO-bound regression of new code
    # (wall up, CPU flat, cores waiting on disk/locks) — report the
    # divergence, never auto-restore the stale record over it
    ok, why = rs.clobber_verdict(noisy, committed, gate, code_changed=True)
    assert not ok and "changed" in why
    # unchanged code keeps the restore; unknown (None) stays permissive
    ok, _ = rs.clobber_verdict(noisy, committed, gate, code_changed=False)
    assert ok
    ok, _ = rs.clobber_verdict(noisy, committed, gate, code_changed=None)
    assert ok
    # the loadavg branch is direct contamination evidence and restores
    # regardless of code churn
    loaded = {"value": 111.0, "loadavg_start": [3.7, 2.0, 1.5]}
    idle = {"value": 88.0, "loadavg_start": [0.5, 1.0, 1.0]}
    ok, _ = rs.clobber_verdict(loaded, idle, gate, code_changed=True)
    assert ok
    # worse wall WITH proportionally higher CPU -> real work; keep it
    regressed = _detailed(132.0, cpu_per_query=900.0)
    ok, _ = rs.clobber_verdict(regressed, committed, gate)
    assert not ok
    # worse wall but committed record lacks CPU detail -> no evidence
    legacy_committed = {"value": 88.0, "loadavg_start": [0.5, 1, 1]}
    ok, _ = rs.clobber_verdict(noisy, legacy_committed, gate)
    assert not ok
    # within the 1.10x worsening bound -> normal jitter, keep
    jitter = _detailed(95.0, cpu_per_query=605.0)
    ok, _ = rs.clobber_verdict(jitter, committed, gate)
    assert not ok
