#!/usr/bin/env python
"""Adjudicate one bench record against another.

Usage: python bench_compare.py OLD.json NEW.json [threshold]

Compares two BENCH_FULL-style payloads (e.g. the r06 baseline
`BENCH_FULL_r06.json` vs a fresh record) and prints an indented JSON
report: shared-query totals, per-query wall ratios above the
threshold (default 2.0, the judge's per-query bound), and — when both
records carry the r11 `query_detail` / `machine_cpu_sec_total` drift
controls — the wall-vs-CPU adjudication that distinguishes hypervisor
wall-clock noise from real regression:

  inflated wall + flat machine CPU-seconds  -> "host-noise"
  wall and CPU inflated together            -> "real-work"

Rounds 8 and 9 each burned a judge pass making this call by
inference; the fields make it data and this tool makes it one
command. Pure stdlib, no Spark needed.
"""

from __future__ import annotations

import json
import sys

#: per-query wall times under this many seconds are startup/jitter
#: noise at sf0.1 — a 0.04 s query going 2.5x says nothing
NOISE_FLOOR_SEC = 0.1

#: wall inflated beyond this while CPU stays under CPU_FLAT_MAX
#: reads as host scheduling/steal noise, not added work
WALL_NOISY_MIN = 1.2
CPU_FLAT_MAX = 1.1


def _ratio(old: float | None, new: float | None) -> float | None:
    if not old or not new or old <= 0 or new <= 0:
        return None
    return round(new / old, 3)


def _min_cpu(detail: dict | None, name: str) -> float | None:
    """Smallest per-rep machine_cpu_sec for a query, or None."""
    if not detail or name not in detail:
        return None
    secs = [s for s in detail[name].get("machine_cpu_sec") or [] if s and s > 0]
    return min(secs) if secs else None


def adjudicate(wall_ratio: float | None, cpu_ratio: float | None) -> str:
    """One word for one query (or the whole run): is the inflation
    host noise or real added work? 'no-cpu-control' when either
    record predates the r11 fields."""
    if wall_ratio is None:
        return "not-comparable"
    if wall_ratio <= WALL_NOISY_MIN:
        return "within-noise"
    if cpu_ratio is None:
        return "no-cpu-control"
    return "host-noise" if cpu_ratio < CPU_FLAT_MAX else "real-work"


def compare(old: dict, new: dict, threshold: float = 2.0) -> dict:
    oq = {k: v for k, v in (old.get("queries") or {}).items() if v is not None and v >= 0}
    nq = {k: v for k, v in (new.get("queries") or {}).items() if v is not None and v >= 0}
    shared = sorted(set(oq) & set(nq))
    old_total = round(sum(oq[k] for k in shared), 3)
    new_total = round(sum(nq[k] for k in shared), 3)
    od, nd = old.get("query_detail"), new.get("query_detail")

    flagged = []
    for name in shared:
        r = _ratio(oq[name], nq[name])
        if r is None or r <= threshold:
            continue
        if max(oq[name], nq[name]) < NOISE_FLOOR_SEC:
            continue  # sub-noise-floor query, ratio is meaningless
        cr = _ratio(_min_cpu(od, name), _min_cpu(nd, name))
        flagged.append(
            {
                "query": name,
                "old_sec": oq[name],
                "new_sec": nq[name],
                "wall_ratio": r,
                "cpu_ratio": cr,
                "verdict": adjudicate(r, cr),
            }
        )
    flagged.sort(key=lambda f: -f["wall_ratio"])

    total_ratio = _ratio(old_total, new_total)
    cpu_total_ratio = _ratio(
        old.get("machine_cpu_sec_total"), new.get("machine_cpu_sec_total")
    )
    return {
        "shared_queries": len(shared),
        "only_in_old": sorted(set(oq) - set(nq)),
        "only_in_new": sorted(set(nq) - set(oq)),
        "old_total_sec": old_total,
        "new_total_sec": new_total,
        "total_wall_ratio": total_ratio,
        "total_cpu_ratio": cpu_total_ratio,
        "run_verdict": adjudicate(total_ratio, cpu_total_ratio),
        "threshold": threshold,
        "flagged": flagged,
        "context": {
            "old": {k: old.get(k) for k in ("loadavg_start", "cpu_busy_pct", "steal_pct")},
            "new": {k: new.get(k) for k in ("loadavg_start", "cpu_busy_pct", "steal_pct")},
        },
    }


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    with open(sys.argv[1]) as fh:
        old = json.load(fh)
    with open(sys.argv[2]) as fh:
        new = json.load(fh)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    print(json.dumps(compare(old, new, threshold), indent=1))


if __name__ == "__main__":
    main()
