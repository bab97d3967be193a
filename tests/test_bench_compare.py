"""Pin bench_compare.py's adjudication math — the tool that turns the
r11 drift-control fields (query_detail wall/CPU, machine_cpu_sec_total)
into a host-noise-vs-real-regression verdict."""

import importlib.util
import pathlib

_MOD = pathlib.Path(__file__).resolve().parents[1] / "bench_compare.py"
_spec = importlib.util.spec_from_file_location("bench_compare_mod", _MOD)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def _payload(queries, detail=None, cpu_total=None, **extra):
    p = {"queries": queries}
    if detail is not None:
        p["query_detail"] = detail
    if cpu_total is not None:
        p["machine_cpu_sec_total"] = cpu_total
    p.update(extra)
    return p


def test_adjudicate_verdicts():
    assert bc.adjudicate(None, None) == "not-comparable"
    assert bc.adjudicate(1.1, None) == "within-noise"
    assert bc.adjudicate(1.5, None) == "no-cpu-control"
    assert bc.adjudicate(1.5, 1.02) == "host-noise"  # wall up, CPU flat
    assert bc.adjudicate(1.5, 1.48) == "real-work"  # both up


def test_compare_flags_only_real_overruns():
    old = _payload({"a": 1.0, "b": 0.04, "c": 2.0, "gone": 1.0}, cpu_total=100.0)
    new = _payload(
        {"a": 2.5, "b": 0.09, "c": 2.1, "fresh": 0.5},
        detail={"a": {"wall_sec": [2.5], "machine_cpu_sec": [8.0]}},
        cpu_total=110.0,
    )
    rep = bc.compare(old, new, threshold=2.0)
    assert rep["shared_queries"] == 3
    assert rep["only_in_old"] == ["gone"] and rep["only_in_new"] == ["fresh"]
    # b is 2.25x but under the noise floor on BOTH sides -> not flagged;
    # c is 1.05x -> not flagged; a is 2.5x and real-sized -> flagged
    assert [f["query"] for f in rep["flagged"]] == ["a"]
    f = rep["flagged"][0]
    assert f["wall_ratio"] == 2.5
    # old record has no query_detail -> per-query CPU control missing
    assert f["cpu_ratio"] is None and f["verdict"] == "no-cpu-control"


def test_compare_run_level_adjudication():
    # wall total inflates 1.5x, machine CPU total flat -> host-noise
    old = _payload({"a": 10.0}, cpu_total=200.0)
    new = _payload({"a": 15.0}, cpu_total=204.0)
    rep = bc.compare(old, new)
    assert rep["total_wall_ratio"] == 1.5
    assert rep["run_verdict"] == "host-noise"
    # wall AND cpu inflate together -> real-work
    new2 = _payload({"a": 15.0}, cpu_total=310.0)
    assert bc.compare(old, new2)["run_verdict"] == "real-work"
    # no cpu fields at all (pre-r11 records) -> no-cpu-control
    assert bc.compare({"queries": {"a": 10.0}}, {"queries": {"a": 15.0}})[
        "run_verdict"
    ] == "no-cpu-control"


def test_compare_per_query_cpu_verdicts():
    old = _payload(
        {"q": 1.0},
        detail={"q": {"wall_sec": [1.0, 1.1], "machine_cpu_sec": [4.0, 4.2]}},
    )
    noisy = _payload(
        {"q": 3.0},
        detail={"q": {"wall_sec": [3.0], "machine_cpu_sec": [4.1]}},
    )
    worked = _payload(
        {"q": 3.0},
        detail={"q": {"wall_sec": [3.0], "machine_cpu_sec": [12.5]}},
    )
    assert bc.compare(old, noisy)["flagged"][0]["verdict"] == "host-noise"
    assert bc.compare(old, worked)["flagged"][0]["verdict"] == "real-work"


def test_failed_queries_excluded():
    old = _payload({"a": 1.0, "bad": -1.0})
    new = _payload({"a": 1.0, "bad": 2.0})
    rep = bc.compare(old, new)
    assert rep["shared_queries"] == 1  # -1 sentinel never compares
