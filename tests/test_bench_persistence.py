"""Pin bench.py's record-persistence rule.

The in-repo BENCH_FULL*.json records are the canonical sf0.1/32-cpu
numbers the per-round 2x-of-baseline bound is checked against; an
off-profile probe run must never overwrite them, and the canonical
driver profile must always persist (a silently-skipped write would
lose the round's record)."""

import importlib.util
import pathlib

_BENCH = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

CANON_DIR = "/root/testdata/sf0.1"


def test_canonical_profile_persists():
    assert bench.should_persist(CANON_DIR, 2, {})
    assert bench.should_persist(CANON_DIR + "/", 3, {"SPARK_GRAFT_CPUS": "32"})


def test_off_profile_probes_do_not_persist():
    assert not bench.should_persist("/root/testdata/sf0.01", 2, {})  # wrong sf
    assert not bench.should_persist(CANON_DIR, 1, {})  # single rep
    assert not bench.should_persist(CANON_DIR, 2, {"SPARK_GRAFT_CPUS": "8"})


def test_force_flag_overrides_everything():
    env = {"SPARK_GRAFT_BENCH_PERSIST": "1", "SPARK_GRAFT_CPUS": "8"}
    assert bench.should_persist("/root/testdata/sf0.001", 1, env)
    # but any other value of the flag does not force
    assert not bench.should_persist(
        "/root/testdata/sf0.001", 1, {"SPARK_GRAFT_BENCH_PERSIST": "0"}
    )


def test_loaded_machine_does_not_persist():
    # at-or-below the threshold persists; above refuses even on the
    # canonical profile (a load-contaminated record would poison the
    # 2x-of-baseline comparison)
    assert bench.should_persist(CANON_DIR, 2, {}, bench.MAX_CANONICAL_LOADAVG)
    assert not bench.should_persist(
        CANON_DIR, 2, {}, bench.MAX_CANONICAL_LOADAVG + 0.1
    )
    # unknown load (non-Linux getloadavg failure) stays permissive
    assert bench.should_persist(CANON_DIR, 2, {}, None)
    # the force flag overrides the load gate too (deliberate records)
    assert bench.should_persist(
        CANON_DIR, 2, {"SPARK_GRAFT_BENCH_PERSIST": "1"}, 999.0
    )


def _run_main_in_scratch(tmp_path, monkeypatch, *, total_sec=0.0):
    """Drive bench.main() end-to-end with stubbed Spark/entry modules
    and the repo rooted at tmp_path — exercises the REAL persist
    block (round-number scan, guard, file writes) without a JVM."""
    import importlib.util
    import json
    import sys
    import types

    spec = importlib.util.spec_from_file_location("bench_scratch", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.__file__ = str(tmp_path / "bench.py")

    class _DF:
        def count(self):
            import time

            time.sleep(0.02)  # measurable, so totals beat a tiny sentinel
            return 1

    entry = types.ModuleType("__spark_entry__")
    entry.entry = lambda spark: _DF()
    entry.queries = lambda: {"q1": lambda spark, sf: _DF()}
    sess = types.ModuleType("lavasmart_bank_sync_etl_spark.session")
    sess.get_spark = lambda name: object()
    pkg = types.ModuleType("lavasmart_bank_sync_etl_spark")
    pkg.session = sess
    monkeypatch.setitem(sys.modules, "__spark_entry__", entry)
    monkeypatch.setitem(sys.modules, "lavasmart_bank_sync_etl_spark", pkg)
    monkeypatch.setitem(sys.modules, "lavasmart_bank_sync_etl_spark.session", sess)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", CANON_DIR)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_PERSIST", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    # loadavg below the gate so the canonical profile persists
    monkeypatch.setattr(mod.os, "getloadavg", lambda: (0.1, 0.1, 0.1))
    # stub the host-speed canary: the real fixed loop costs ~3-5 s per
    # call and its value is irrelevant to the persistence logic
    monkeypatch.setattr(mod, "_canary_sec", lambda: 0.5)
    mod.main()
    out = tmp_path / "BENCH_FULL.json"
    return json.loads(out.read_text()) if out.exists() else None


def test_main_persist_block_end_to_end(tmp_path, monkeypatch, capsys):
    import json
    import subprocess

    # fresh scratch (no git): guard is permissive, record is written
    # with the r11 drift-control fields present
    payload = _run_main_in_scratch(tmp_path, monkeypatch)
    assert payload is not None and payload["n_queries"] == 1
    assert "query_detail" in payload and "steal_pct" in payload
    assert (tmp_path / "BENCH_FULL_r00.json").exists()
    capsys.readouterr()

    # now COMMIT a faster record of unchanged code: main() must refuse
    # to replace it (strict equal-or-better rule) and say so
    def git(*args):
        subprocess.run(["git", *args], cwd=tmp_path, check=True, capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    fast = dict(payload)
    fast["value"] = 0.001  # effectively unbeatable sentinel record
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(fast))
    (tmp_path / "BENCH_FULL_r00.json").write_text(json.dumps(fast))
    git("add", "-A")
    git("commit", "-q", "-m", "seed")
    payload2 = _run_main_in_scratch(tmp_path, monkeypatch)
    assert payload2["value"] == 0.001  # file untouched: guard refused
    err = capsys.readouterr().err
    assert "host-noise run" in err and "BENCH_FULL.json kept" in err


def test_canary_flag_prints_health_probe_only(tmp_path, monkeypatch, capsys):
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location("bench_canary", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.__file__ = str(tmp_path / "bench.py")
    monkeypatch.setattr(mod, "_canary_sec", lambda: 0.5)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--canary"])
    mod.main()
    out = json.loads(capsys.readouterr().out)
    assert out["canary_sec"] == 0.5 and "loadavg1" in out
    # no Spark, no record files touched
    assert not (tmp_path / "BENCH_FULL.json").exists()


def test_load_context_sampling():
    s = bench._proc_stat_sample()
    assert s is not None and s[1] >= s[0] >= 0  # Linux sandbox
    assert len(s) == 3 and s[2] >= 0  # steal jiffies present
    # busy% math: 40 busy of 100 total jiffies elapsed -> 40.0
    assert bench._cpu_busy_pct((100, 1000), (140, 1100)) == 40.0
    assert bench._cpu_busy_pct(None, (1, 2)) is None
    assert bench._cpu_busy_pct((100, 1000), (100, 1000)) is None  # no elapsed


def test_unchanged_code_guard_keeps_better_record():
    # no existing record / unparseable -> write
    ok, _ = bench.should_replace_canonical(120.0, None, False)
    assert ok
    # code changed (or git can't tell) -> fresh measurement always wins,
    # even when slower: a real regression must be recorded, not hidden
    ok, _ = bench.should_replace_canonical(150.0, 88.0, True)
    assert ok
    ok, _ = bench.should_replace_canonical(150.0, 88.0, None)
    assert ok
    # unchanged code: only an equal-or-better run replaces the record
    # (min-semantics — unchanged code does not get slower by itself)
    ok, _ = bench.should_replace_canonical(80.0, 88.0, False)
    assert ok
    ok, _ = bench.should_replace_canonical(88.0, 88.0, False)
    assert ok
    # unchanged code, worse -> host-noise run, existing kept
    ok, why = bench.should_replace_canonical(95.0, 88.0, False)
    assert not ok and "host-noise" in why
    ok, why = bench.should_replace_canonical(125.0, 88.0, False)
    assert not ok and "host-noise" in why


def test_package_change_detection_on_real_repo():
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    # a committed artifact exists, so git can answer; the result is a
    # bool either way (None would mean git itself failed here)
    assert bench._package_changed_since(repo, "BENCH_FULL.json") in (True, False)
    # a file git has never seen -> None (permissive: treated as changed)
    assert bench._package_changed_since(repo, "no_such_file_xyz.json") is None


def test_package_change_detection_covers_methodology_files(tmp_path):
    """bench.py and __spark_entry__.py ARE the measurement methodology
    (warmup, reps, query registration): a change to either must count
    as 'code changed' so an honestly-different total can refresh the
    canonical record without the force override."""
    import json
    import subprocess

    def git(*args):
        subprocess.run(["git", *args], cwd=tmp_path, check=True, capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps({"value": 88.0}))
    (tmp_path / "bench.py").write_text("REPS = 2\n")
    (tmp_path / "notes.md").write_text("irrelevant\n")
    git("add", "-A")
    git("commit", "-q", "-m", "seed")
    assert bench._package_changed_since(str(tmp_path), "BENCH_FULL.json") is False
    # a non-measured file changing does not count
    (tmp_path / "notes.md").write_text("still irrelevant\n")
    assert bench._package_changed_since(str(tmp_path), "BENCH_FULL.json") is False
    # a methodology change does — even uncommitted
    (tmp_path / "bench.py").write_text("REPS = 3\n")
    assert bench._package_changed_since(str(tmp_path), "BENCH_FULL.json") is True


def test_probe_payload_saved_per_canonical_run(tmp_path, monkeypatch, capsys):
    """Every canonical-profile run lands verbatim under bench_probes/
    with a fresh index — even when the canonical-record guard keeps the
    existing BENCH_FULL record — so a drift-day min-composite is
    reproducible from committed payloads."""
    import json

    _run_main_in_scratch(tmp_path, monkeypatch)
    _run_main_in_scratch(tmp_path, monkeypatch)
    p0 = tmp_path / "bench_probes" / "r00_00.json"
    p1 = tmp_path / "bench_probes" / "r00_01.json"
    assert p0.exists() and p1.exists()
    payload = json.loads(p0.read_text())
    assert payload["n_queries"] == 1 and "query_detail" in payload
    assert payload["canary_sec"] == 0.5  # min of the stubbed canary runs
    assert "probe payload saved" in capsys.readouterr().err


def test_drift_control_fields():
    # steal%: 5 steal jiffies of 100 elapsed -> 5.0
    assert bench._steal_pct((100, 1000, 10), (140, 1100, 15)) == 5.0
    assert bench._steal_pct(None, (1, 2, 3)) is None
    assert bench._steal_pct((100, 1000, 0), (100, 1000, 0)) is None
    # legacy 2-tuples (old payloads) degrade to None, not a crash
    assert bench._steal_pct((100, 1000), (140, 1100)) is None
    # machine CPU-seconds: busy jiffies / CLK_TCK, summed across cores
    tck = bench._clk_tck()
    assert tck > 0
    got = bench._busy_cpu_sec((100, 1000, 0), (100 + int(16 * tck), 99999, 0))
    assert got == 16.0
    assert bench._busy_cpu_sec(None, (1, 2, 3)) is None
