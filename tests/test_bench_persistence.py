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


def test_load_context_sampling():
    s = bench._proc_stat_sample()
    assert s is not None and s[1] >= s[0] >= 0  # Linux sandbox
    assert len(s) == 3 and s[2] >= 0  # steal jiffies present
    # busy% math: 40 busy of 100 total jiffies elapsed -> 40.0
    assert bench._cpu_busy_pct((100, 1000), (140, 1100)) == 40.0
    assert bench._cpu_busy_pct(None, (1, 2)) is None
    assert bench._cpu_busy_pct((100, 1000), (100, 1000)) is None  # no elapsed


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
