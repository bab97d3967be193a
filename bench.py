#!/usr/bin/env python
"""Benchmark harness (driver contract): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line with per-query seconds.

Each query is forced with a count() action (no driver-side collect of
payload rows). A warmup query amortizes JVM/session startup out of the
per-query numbers, and each query runs REPS times with the minimum
recorded ("reps"/"timing" keys in the JSON): a query's first execution
pays ~2 s of one-off whole-stage-codegen (Janino) compilation that a
steady-state pipeline never sees again, and single-run numbers proved
too sandbox-noisy to compare across rounds (BENCH_r02 vs r03 drifted
~1.3-1.7x uniformly with no plan changes).
"""

from __future__ import annotations

import json
import os
import sys
import time


# A canonical record must be taken on an idle machine: concurrent
# sandbox load inflates individual queries up to 10x and the whole
# suite up to ~1.4x (rounds 8 AND 9 both burned adjudication time on
# a loaded refresh). Measured calibration on this box (r10): a run
# entered at 1-min loadavg 0.48 landed at 0.97x the committed
# baseline; one entered at 3.75 landed at a uniform 1.35x with mm6/
# mm8 at 10x — so the gate sits at 2.0: above post-decay idle noise,
# below the mildest load level shown to corrupt a record.
MAX_CANONICAL_LOADAVG = 2.0


def should_persist(
    sf_dir: str, reps: int, env: dict, loadavg1: float | None = None
) -> bool:
    """Persist the in-repo BENCH_FULL*.json records only for
    canonical-profile runs (default sf0.1 dir, reps>=2, 32 cpus) on a
    machine that was idle going in (1-min loadavg at start <=
    MAX_CANONICAL_LOADAVG; None = unknown platform, allowed) — an
    off-profile or load-contaminated run must never clobber the
    committed canonical numbers. SPARK_GRAFT_BENCH_PERSIST=1 forces
    persistence for a deliberate off-profile record."""
    if env.get("SPARK_GRAFT_BENCH_PERSIST") == "1":
        return True
    if loadavg1 is not None and loadavg1 > MAX_CANONICAL_LOADAVG:
        return False
    return (
        sf_dir.rstrip("/") == "/root/testdata/sf0.1"
        and reps >= 2
        and env.get("SPARK_GRAFT_CPUS", "32") == "32"
    )


#: for UNCHANGED query code a candidate record replaces the existing
#: one only when effectively equal-or-better (min-semantics, like the
#: per-query min-of-reps): unchanged code does not get slower by
#: itself, so a markedly worse run is host noise by the existing
#: record's own evidence (r11: seven idle-entry runs on one HEAD
#: spanned 104.6-157.2 s around an 88.2 s record, CPU-seconds flat)
MAX_CANONICAL_WORSENING = 1.005


def should_replace_canonical(
    new_value: float, existing_value: float | None, code_changed: bool | None
) -> tuple[bool, str]:
    """May this run overwrite an existing canonical record file?

    The canonical records exist to answer "how fast is THIS code on an
    idle machine" — so a run that is markedly WORSE than the committed
    record of the SAME query code is, by that record's own evidence,
    a host-noise run (r11 measured seven idle-entry runs on one HEAD
    spanning 104.6-157.2 s vs the code's 88.2 s record, CPU-seconds
    flat) and must not replace the better measurement. When the query
    code HAS changed since the existing record — or git can't tell —
    the fresh measurement always wins regardless of being slower:
    re-measuring changed code is the point, and a real regression
    (which inflates CPU along with wall) must be recorded, not hidden.
    SPARK_GRAFT_BENCH_PERSIST=1 bypasses this like every other gate.
    """
    if existing_value is None or existing_value <= 0:
        return True, "no existing record"
    if code_changed is None or code_changed:
        return True, "query code changed since the existing record (or unknown)"
    if new_value <= existing_value * MAX_CANONICAL_WORSENING:
        return True, "equal-or-better than the existing record"
    return False, (
        f"unchanged code measured {new_value:.1f}s vs the existing "
        f"{existing_value:.1f}s record: host-noise run; existing "
        "record kept (SPARK_GRAFT_BENCH_PERSIST=1 overrides)"
    )


#: what counts as "the code being measured" for the unchanged-code
#: canonical guard: the query package PLUS the measurement methodology
#: itself (bench.py — warmup/reps/timing; __spark_entry__.py — query
#: registration and ordering). A methodology change that honestly
#: produces different totals must be able to refresh the record
#: without the SPARK_GRAFT_BENCH_PERSIST override.
_MEASURED_PATHS = ("lavasmart_bank_sync_etl_spark/", "bench.py", "__spark_entry__.py")


def _package_changed_since(repo: str, fname: str) -> bool | None:
    """Did any measured file (query package, bench.py,
    __spark_entry__.py) change — committed or working-tree — since the
    commit that last touched ``fname``? None when git can't answer
    (treat as changed — permissive)."""
    import subprocess

    def git(*args: str) -> str | None:
        try:
            proc = subprocess.run(
                ["git", *args], cwd=repo, capture_output=True, text=True, timeout=15
            )
        except (OSError, subprocess.SubprocessError):
            return None
        return proc.stdout if proc.returncode == 0 else None

    out = git("log", "--format=%H", "-n", "1", "--", fname)
    commit = (out or "").strip()
    if not commit:
        return None
    diff = git("diff", "--name-only", commit, "--", *_MEASURED_PATHS)
    if diff is None:
        return None
    return bool(diff.strip())


def _proc_stat_sample() -> tuple[int, int, int] | None:
    """(busy, total, steal) jiffies from /proc/stat line 1, or None
    off-Linux."""
    try:
        with open("/proc/stat") as fh:
            fields = [int(x) for x in fh.readline().split()[1:]]
    except (OSError, ValueError, IndexError):
        return None
    if len(fields) < 5:
        return None
    # fields: user nice system idle iowait irq softirq steal [guest
    # guest_nice]; guest time is ALREADY included in user/nice, so
    # summing all ten would double-count it on VM hosts — cap at the
    # first eight
    total = sum(fields[:8])
    idle = fields[3] + fields[4]  # idle + iowait
    steal = fields[7] if len(fields) >= 8 else 0
    return total - idle, total, steal


def _cpu_busy_pct(start, end) -> float | None:
    """Whole-machine busy%% between two _proc_stat_sample() readings."""
    if start is None or end is None:
        return None
    dbusy, dtotal = end[0] - start[0], end[1] - start[1]
    if dtotal <= 0:
        return None
    return round(100.0 * dbusy / dtotal, 1)


def _steal_pct(start, end) -> float | None:
    """Hypervisor steal%% between two samples — time the host scheduled
    AWAY from this VM. Wall-clock drift with near-zero steal and flat
    machine_cpu_sec is host-level timing noise, not a regression."""
    if start is None or end is None or len(start) < 3 or len(end) < 3:
        return None
    dsteal, dtotal = end[2] - start[2], end[1] - start[1]
    if dtotal <= 0:
        return None
    return round(100.0 * dsteal / dtotal, 2)


def _canary_sec() -> float:
    """Wall time of a FIXED single-threaded pure-python loop — an
    external host-speed control that none of the other drift fields
    can substitute for. On a frequency-scaled / steal-heavy host the
    same work burns MORE time-based CPU-jiffies, so wall and
    machine_cpu_sec inflate TOGETHER and the flat-CPU host-noise test
    reads "real-work" (observed r12: canary 2.9 s -> 5.2 s between
    two idle-loadavg hours; the 1.8x bench total that day tracked the
    canary, on byte-identical code). The canary moves with host speed
    and with nothing else.

    The workload is part of the record schema: changing the loop
    breaks cross-record comparability exactly like changing the
    benchmark queries would."""
    import time as _time

    t0 = _time.time()
    s = 0
    for i in range(40_000_000):
        s += i * 3 % 7
    return round(_time.time() - t0, 3)


def _clk_tck() -> float:
    try:
        return float(os.sysconf("SC_CLK_TCK")) or 100.0
    except (OSError, ValueError, AttributeError):
        return 100.0


def _busy_cpu_sec(start, end) -> float | None:
    """Whole-machine CPU-seconds consumed between two samples (summed
    across cores, so a 0.5 s query saturating 32 cores reports ~16).
    This is the in-run regression control: for a fixed plan the CPU
    work is ~constant across runs, so a record whose wall times
    inflate vs baseline while these stay flat adjudicates itself as
    hypervisor/scheduling wall-clock drift; a real regression inflates
    wall and CPU together."""
    if start is None or end is None:
        return None
    return round((end[0] - start[0]) / _clk_tck(), 2)


def main() -> None:
    if "--canary" in sys.argv[1:]:
        # Health probe only: is NOW a good time to take a canonical
        # record? Healthy on this box is ~2.8-3.1 s; degraded days
        # have measured 5-6 s at idle loadavg. No Spark, ~10 s total.
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            load1 = None
        print(json.dumps({
            "canary_sec": min(_canary_sec(), _canary_sec()),
            "loadavg1": load1,
        }))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from lavasmart_bank_sync_etl_spark.session import get_spark

    # Sample load BEFORE the session spins up: the 1-min loadavg here
    # reflects external work only, which is what decides whether this
    # run may become the canonical record.
    try:
        load_start = os.getloadavg()
    except OSError:
        load_start = None
    stat_start = _proc_stat_sample()
    # Host-speed canary BEFORE the session spins up (min of two runs;
    # ~6-10 s): on a healthy host this box does ~2.8-3.1 s. A record
    # whose wall total inflates vs baseline by about the same factor
    # as its canary is measuring a slow host, not slow code.
    canary = min(_canary_sec(), _canary_sec())

    spark = get_spark("lavasmart-bench")
    # warmup: trigger JVM + parquet footer reads

    t0 = time.time()
    entrymod.entry(spark).count()
    warmup = time.time() - t0

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    # Per-query drift control: every rep's wall time AND the machine
    # CPU-seconds consumed during it (VERDICT r10 task 4 — the loadavg
    # gate can't see hypervisor wall-clock drift at idle; flat CPU
    # under inflated wall can).
    detail: dict[str, dict] = {}
    for name in sorted(queries):
        best = None
        walls: list[float] = []
        cpu_secs: list[float | None] = []
        for _ in range(reps):
            rep_stat0 = _proc_stat_sample()
            start = time.time()
            try:
                queries[name](spark, sf_dir).count()
            except Exception as exc:  # record failures, don't abort the suite
                print(f"# bench FAIL {name}: {exc}", file=sys.stderr)
                break
            elapsed = time.time() - start
            walls.append(round(elapsed, 3))
            cpu_secs.append(_busy_cpu_sec(rep_stat0, _proc_stat_sample()))
            best = elapsed if best is None else min(best, elapsed)
        # a rep that ran is still a valid timing; -1.0 only when NO rep
        # succeeded (so a rep-2 hiccup can't mask a working query)
        timings[name] = round(best, 3) if best is not None else -1.0
        detail[name] = {"wall_sec": walls, "machine_cpu_sec": cpu_secs}

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Second canary sample: host speed oscillates WITHIN runs (r12
    # observed a healthy 2.6 s entry canary on a run whose totals
    # still came out ~1.3x) — bracketing the suite catches degradation
    # that arrives after entry.
    canary_end = _canary_sec()
    try:
        load_end = os.getloadavg()
    except OSError:
        load_end = None
    stat_end = _proc_stat_sample()
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "warmup_sec": round(warmup, 3),
        "reps": reps,
        "timing": "min_of_reps",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        # Load context: drift adjudication ("is 1.3x real?") should be a
        # field in the artifact, not a post-hoc inference. cpu_busy_pct
        # covers the run itself (bench alone saturates bursts, but a
        # suite-long >90%% mean on 32 cores means a co-tenant);
        # loadavg_start is the persistence gate.
        "loadavg_start": [round(x, 2) for x in load_start] if load_start else None,
        "loadavg_end": [round(x, 2) for x in load_end] if load_end else None,
        "cpu_busy_pct": _cpu_busy_pct(stat_start, stat_end),
        # In-run drift controls (the loadavg gate can't see hypervisor
        # wall-clock noise at idle): whole-run steal%% plus, per query,
        # every rep's wall time and the machine CPU-seconds it burned.
        # Adjudication rule: inflated wall + flat machine_cpu_sec (vs
        # the prior canonical record) = host timing noise; both
        # inflated = real extra work.
        "steal_pct": _steal_pct(stat_start, stat_end),
        "machine_cpu_sec_total": _busy_cpu_sec(stat_start, stat_end),
        # External host-speed control (fixed pure-python loop): catches
        # uniform host slowdowns (frequency scaling / steal) that
        # inflate wall AND time-based CPU-jiffies together and
        # therefore fool the flat-CPU host-noise test. Sampled at both
        # ends of the suite (host speed oscillates within runs);
        # canary_sec is the entry sample (min of two), canary_sec_end
        # the exit sample.
        "canary_sec": canary,
        "canary_sec_end": canary_end,
        "query_detail": detail,
    }
    # The driver tail-truncates stdout to ~62 per-query times; persist the
    # COMPLETE artifact in-repo so the 2x-of-baseline bound is checkable
    # for every query. Round number = newest CORRECTNESS round + 1 (the
    # driver writes CORRECTNESS_r{N} after bench, so at bench time the
    # newest correctness file belongs to the previous round).
    #
    # An off-profile probe (sf0.01, 8 cpus, 1 rep) used to silently
    # clobber the committed records, which then needed a manual
    # `git restore` — the clobber bit twice across rounds.
    loadavg1 = load_start[0] if load_start else None
    if not should_persist(sf_dir, reps, os.environ, loadavg1):
        print(
            "# bench NOTE off-profile or loaded run "
            f"(loadavg1={loadavg1}): BENCH_FULL*.json left untouched "
            "(set SPARK_GRAFT_BENCH_PERSIST=1 to persist)",
            file=sys.stderr,
        )
        print(json.dumps(payload))
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(f.split("_r")[1].split(".")[0])
        for f in os.listdir(repo)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    ]
    rnd = (max(rounds) + 1) if rounds else 0
    body = json.dumps(payload, indent=1, sort_keys=True)
    # Every canonical-profile run also lands verbatim under
    # bench_probes/ (never overwritten), even when the canonical-record
    # guard below keeps the existing BENCH_FULL record: on a
    # wall-drift day the adjudication composite ("per-query min across
    # N probes", bench_compare.py --merge) must be reproducible from
    # committed payloads, not from prose (r11 ran nine probes and
    # persisted one).
    probes_dir = os.path.join(repo, "bench_probes")
    try:
        os.makedirs(probes_dir, exist_ok=True)
        k = 0
        while os.path.exists(os.path.join(probes_dir, f"r{rnd:02d}_{k:02d}.json")):
            k += 1
        probe_path = os.path.join(probes_dir, f"r{rnd:02d}_{k:02d}.json")
        with open(probe_path, "w") as fh:
            fh.write(body + "\n")
        print(f"# bench NOTE probe payload saved: {probe_path}", file=sys.stderr)
    except OSError as exc:
        print(f"# bench WARN could not write probe payload: {exc}", file=sys.stderr)
    force = os.environ.get("SPARK_GRAFT_BENCH_PERSIST") == "1"
    for fname in ("BENCH_FULL.json", f"BENCH_FULL_r{rnd:02d}.json"):
        path = os.path.join(repo, fname)
        existing = None
        try:
            with open(path) as fh:
                existing = json.load(fh).get("value")
        except (OSError, ValueError):
            pass
        if not force:
            ok, why = should_replace_canonical(
                total, existing, _package_changed_since(repo, fname)
            )
            if not ok:
                print(f"# bench NOTE {fname} kept: {why}", file=sys.stderr)
                continue
        try:
            with open(path, "w") as fh:
                fh.write(body + "\n")
        except OSError as exc:
            print(f"# bench WARN could not write {fname}: {exc}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
