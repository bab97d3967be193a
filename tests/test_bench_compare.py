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


def test_adjudicate_canary_outranks_cpu():
    # A frequency-scaled/steal-heavy host burns more time-based
    # CPU-jiffies for the same work, so wall AND CPU inflate together —
    # but so does the pure-python canary, which code changes cannot
    # move. Canary covering the wall inflation -> host-slowdown, even
    # though the CPU control alone would say real-work.
    assert bc.adjudicate(1.8, 1.7, 1.75) == "host-slowdown"
    assert bc.adjudicate(1.8, None, 1.75) == "host-slowdown"
    # wall inflation well beyond what the canary explains -> the CPU
    # control decides as before
    assert bc.adjudicate(3.0, 2.8, 1.1) == "real-work"
    assert bc.adjudicate(3.0, 1.05, 1.1) == "host-noise"
    # canary control only engages above the noise band
    assert bc.adjudicate(1.1, 1.0, 2.0) == "within-noise"
    # absent canary (pre-r12 records) -> unchanged behavior
    assert bc.adjudicate(1.5, 1.48, None) == "real-work"


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


def test_run_cpu_ratio_prefers_best_rep_detail():
    """Records taken with different SPARK_GRAFT_BENCH_REPS: the raw
    machine_cpu_sec_total scales with reps (and includes warmup), so a
    3-rep-old vs 2-rep-new comparison deflates the raw ratio and would
    mislabel a real regression as host-noise. Best-rep per-query sums
    are reps-independent and catch it."""
    old = _payload(
        {"q": 10.0},
        detail={"q": {"wall_sec": [10.0, 10.2, 10.1], "machine_cpu_sec": [90.0, 95.0, 92.0]}},
        cpu_total=300.0,  # 3 reps' worth of work + warmup
        reps=3,
    )
    new = _payload(
        {"q": 15.0},
        detail={"q": {"wall_sec": [15.0, 15.3], "machine_cpu_sec": [140.0, 150.0]}},
        cpu_total=310.0,  # raw ratio 1.03 -> would read "host-noise"
        reps=2,
    )
    rep = bc.compare(old, new)
    assert rep["cpu_ratio_basis"] == "query_detail_best_rep"
    assert rep["total_cpu_ratio"] == round(140.0 / 90.0, 3)
    assert rep["run_verdict"] == "real-work"
    # both records' reps are surfaced so a human can see the skew risk
    assert rep["context"]["old"]["reps"] == 3 and rep["context"]["new"]["reps"] == 2


def test_run_cpu_ratio_falls_back_without_detail():
    # either record lacking query_detail -> raw machine_cpu_sec_total,
    # and the report says which basis produced the number
    old = _payload({"a": 10.0}, cpu_total=200.0)
    new = _payload(
        {"a": 15.0},
        detail={"a": {"wall_sec": [15.0], "machine_cpu_sec": [150.0]}},
        cpu_total=204.0,
    )
    rep = bc.compare(old, new)
    assert rep["cpu_ratio_basis"] == "machine_cpu_sec_total"
    assert rep["total_cpu_ratio"] == round(204.0 / 200.0, 3)
    # no CPU fields at all -> basis is None
    assert bc.compare({"queries": {}}, {"queries": {}})["cpu_ratio_basis"] is None


def test_detail_cpu_total_filters_to_shared_names():
    p = _payload(
        {"a": 1.0, "b": 1.0},
        detail={
            "a": {"machine_cpu_sec": [4.0, 5.0]},
            "b": {"machine_cpu_sec": [6.0]},
        },
    )
    assert bc.detail_cpu_total(p) == 10.0
    assert bc.detail_cpu_total(p, {"a"}) == 4.0
    assert bc.detail_cpu_total({"queries": {}}) is None


def test_compare_canary_run_and_query_verdicts():
    """The r12 live case in miniature: byte-identical code, host 1.75x
    slower by the canary, wall and CPU both inflated ~1.5-1.8x."""
    old = _payload(
        {"q": 10.0},
        detail={"q": {"wall_sec": [10.0], "machine_cpu_sec": [90.0]}},
        canary_sec=2.9,
    )
    new = _payload(
        {"q": 17.0, "spiky": 0.0},
        detail={"q": {"wall_sec": [17.0], "machine_cpu_sec": [150.0]}},
        canary_sec=5.1,
    )
    old["queries"]["spiky"] = 1.0
    new["queries"]["spiky"] = 2.5
    rep = bc.compare(old, new, threshold=1.5)
    assert rep["canary_ratio"] == round(5.1 / 2.9, 3)
    # old-best vs new-worst across both samples: a healthy ENTRY canary
    # on the new run must not mask degradation that arrived mid-run
    old2 = dict(old, canary_sec=3.4, canary_sec_end=2.9)
    new2 = dict(new, canary_sec=2.6, canary_sec_end=5.1)
    rep2 = bc.compare(old2, new2, threshold=1.5)
    assert rep2["canary_ratio"] == round(5.1 / 2.9, 3)
    assert rep2["run_verdict"] == "host-slowdown"
    assert rep["run_verdict"] == "host-slowdown"
    # the machine-global canary covers per-query verdicts too
    by_name = {f["query"]: f["verdict"] for f in rep["flagged"]}
    assert by_name["q"] == "host-slowdown"
    # ...but not a query inflated far beyond the host factor
    assert by_name["spiky"] == "no-cpu-control"
    assert rep["context"]["new"]["canary_sec"] == 5.1


def test_merge_min_composite():
    p1 = _payload(
        {"a": 2.0, "b": 5.0, "c": -1.0},
        detail={"a": {"wall_sec": [2.0, 2.2], "machine_cpu_sec": [8.0, 9.0]}},
        cpu_total=500.0,
        sf=0.1, reps=2, cpus="32",
        loadavg_start=[0.5, 1.0, 1.0], steal_pct=2.0, value=7.0, canary_sec=3.0,
    )
    p2 = _payload(
        {"a": 3.0, "b": 4.0, "c": 6.0},
        detail={"a": {"wall_sec": [3.0], "machine_cpu_sec": [8.5]}},
        cpu_total=480.0,
        sf=0.1, reps=2, cpus="32",
        loadavg_start=[1.2, 1.0, 1.0], steal_pct=1.5, value=13.0, canary_sec=2.8,
    )
    m = bc.merge([p1, p2])
    # per-query minimum; a query that failed in one probe but ran in
    # the other keeps the real timing
    assert m["queries"] == {"a": 2.0, "b": 4.0, "c": 6.0}
    assert m["value"] == 12.0
    assert m["timing"] == "min_of_probes" and m["merged_from"] == 2
    # detail reps concatenate so compare() still finds best-rep CPU
    assert m["query_detail"]["a"]["machine_cpu_sec"] == [8.0, 9.0, 8.5]
    # CPU total / steal / loadavg / canary take the least-contaminated probe
    assert m["machine_cpu_sec_total"] == 480.0
    assert m["steal_pct"] == 1.5
    assert m["loadavg_start"] == [0.5, 1.0, 1.0]
    assert m["canary_sec"] == 2.8
    assert len(m["probes_context"]) == 2
    # the composite is itself comparable as a canonical-schema record
    rep = bc.compare(p1, m)
    assert rep["shared_queries"] == 2  # a, b (c failed in p1)


def test_merge_rejects_mixed_sf_and_empty():
    import pytest

    with pytest.raises(ValueError):
        bc.merge([_payload({}, sf=0.1), _payload({}, sf=0.01)])
    with pytest.raises(ValueError):
        bc.merge([])


def test_merge_all_probes_failed_query():
    m = bc.merge([_payload({"x": -1.0}, sf=0.1), _payload({"x": -1.0}, sf=0.1)])
    assert m["queries"] == {"x": -1.0}
    assert m["value"] == 0.0
