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
