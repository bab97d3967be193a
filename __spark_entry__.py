"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()``
exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares
against at sf0.01 (row-count + schema + order-insensitive value hash).

Column names are aliased identically on both sides; float aggregates
are rounded on both sides so cross-engine summation order cannot flip
the value hash.

The driver checks the FIRST ~50 registered queries each round, so the
registration ORDER is a verification schedule. It is derived from data
every round rather than hand-frozen lists:

1. For each query, find the newest round whose ``CORRECTNESS_r*.json``
   row is fully green (no err, rows+schema+hash all match).
2. A query is *touched* if any source file behind it (its defining
   module plus the package functions/modules that module imports)
   changed since the commit that recorded that round's correctness
   file — i.e. its shipped code is newer than its newest evidence.
   Never-verified queries are touched by definition.
3. Order by (touched first, oldest-green-round first, name).

This makes the window self-rotating: whatever was edited this round is
re-verified next round, and otherwise the longest-unverified queries
cycle back into the window.
"""

from __future__ import annotations

import functools
import json
import pathlib
import subprocess
import sys
import types
from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from lavasmart_bank_sync_etl_spark.queries import ORACLES, QUERIES

_REPO = pathlib.Path(__file__).resolve().parent
_PKG = "lavasmart_bank_sync_etl_spark"


def _row_green(row: object) -> bool:
    """Is one driver correctness row fully-green evidence?

    schema/hash: True passes; an explicit None passes only as the
    driver's documented rows-only mode (oracle-less query — the key is
    PRESENT with null). A MISSING key is a malformed artifact and must
    not fake-green a query, so membership is checked, not defaulted.
    """
    if not isinstance(row, dict):
        return False
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and all(
            k in row and (row[k] is True or row[k] is None)
            for k in ("schema_match", "hash_match")
        )
    )


def _green_rounds() -> dict[str, int]:
    """Newest fully-green driver round per query (0 = never green).

    A malformed round artifact only DROPS evidence (conservative: the
    affected queries re-verify sooner), but silently — so each skipped
    file gets a one-line stderr warning to make rotation-health
    regressions visible instead of invisible."""
    green: dict[str, int] = {}
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[1])
            rows = json.loads(path.read_text())
        except (ValueError, IndexError, OSError, json.JSONDecodeError) as exc:
            print(
                f"warning: skipping malformed correctness artifact "
                f"{path.name}: {exc}",
                file=sys.stderr,
            )
            continue
        if not isinstance(rows, dict):
            print(
                f"warning: skipping malformed correctness artifact "
                f"{path.name}: top-level JSON is not an object",
                file=sys.stderr,
            )
            continue
        for name, row in rows.items():
            if _row_green(row):
                green[name] = max(rnd, green.get(name, 0))
    return green


def _git(*args: str) -> str | None:
    try:
        proc = subprocess.run(
            ["git", *args],
            cwd=_REPO,
            capture_output=True,
            text=True,
            timeout=15,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return proc.stdout if proc.returncode == 0 else None


@functools.lru_cache(maxsize=None)
def _changed_since_round(rnd: int) -> frozenset[str] | None:
    """Repo-relative paths changed (committed or working-tree) since the
    commit that recorded ``CORRECTNESS_r{rnd}.json``; None if unknown."""
    fname = f"CORRECTNESS_r{rnd:02d}.json"
    if not (_REPO / fname).exists():
        return None
    out = _git("log", "--diff-filter=A", "--format=%H", "-n", "1", "--", fname)
    commit = (out or "").strip()
    if not commit:
        return None
    diff = _git("diff", "--name-only", commit)
    if diff is None:
        return None
    return frozenset(line.strip() for line in diff.splitlines() if line.strip())


def _query_files(fn: Callable) -> set[str]:
    """Repo-relative source files behind a query: its defining module plus
    the package functions/classes/modules its code ACTUALLY references,
    followed transitively (bounded BFS). Resolving only ``co_names``
    against each function's globals keeps this precise — expanding the
    whole defining-module namespace would mark every query as touched by
    any package edit, degenerating the rotation to oldest-green-first."""
    paths: set[str] = set()

    def add(filename: str | None) -> None:
        if not filename or _PKG not in filename:
            return
        try:
            rel = pathlib.Path(filename).resolve().relative_to(_REPO)
        except ValueError:
            return
        paths.add(str(rel))

    def referenced(func: Callable) -> list[object]:
        code = getattr(func, "__code__", None)
        globs = getattr(func, "__globals__", None) or {}
        if code is None:
            return []
        out: list[object] = []
        stack = [code]
        names: set[str] = set()
        while stack:
            c = stack.pop()
            names.update(c.co_names)
            for const in c.co_consts:
                if isinstance(const, types.CodeType):
                    stack.append(const)
        for name in names:
            if name in globs:
                out.append(globs[name])
        return out

    seen: set[int] = set()
    frontier: list[object] = [fn]
    for _ in range(4):  # query -> helper -> operator -> its helpers
        nxt: list[object] = []
        for obj in frontier:
            if id(obj) in seen:
                continue
            seen.add(id(obj))
            if isinstance(obj, types.ModuleType):
                add(getattr(obj, "__file__", None))
                continue
            code = getattr(obj, "__code__", None)
            if code is not None:
                add(code.co_filename)
                if _PKG in (code.co_filename or ""):
                    nxt.extend(referenced(obj))
                continue
            if isinstance(obj, type):  # class: its module + its methods
                mod = sys.modules.get(obj.__module__ or "")
                file = getattr(mod, "__file__", None)
                if file and _PKG in file:
                    add(file)
                    nxt.extend(
                        v for v in vars(obj).values()
                        if getattr(v, "__code__", None) is not None
                    )
        frontier = nxt
        if not frontier:
            break
    return paths


def _priority_order(
    names: Iterable[str],
    green: Mapping[str, int],
    touched: frozenset[str],
) -> list[str]:
    """Pure ordering: touched first, then oldest green evidence, then
    name for determinism. Never-green queries must be in ``touched``."""
    return sorted(names, key=lambda n: (n not in touched, green.get(n, 0), n))


@functools.lru_cache(maxsize=1)
def _ordered() -> tuple[str, ...]:
    green = _green_rounds()
    touched = set()
    for name, fn in QUERIES.items():
        rnd = green.get(name, 0)
        if rnd == 0:
            touched.add(name)  # never verified — always front of the line
            continue
        changed = _changed_since_round(rnd)
        if changed is None:
            continue  # git unavailable: fall back to oldest-green-first
        if _query_files(fn) & changed:
            touched.add(name)
    return tuple(_priority_order(QUERIES, green, frozenset(touched)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ``totales`` view — per-day, per-method
    totals over the cleaned+classified sales (SURVEY A3/P2)."""
    return QUERIES["a3_daily_totals_by_method"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for n in _ordered():
        sql = ORACLES.get(n)
        if callable(sql):
            # lazy oracle (text derived from an external artifact):
            # resolve once, memoize — including the None (rows-only)
            # outcome, as a stored value rather than a key deletion, so
            # the registry's key set stays stable for other readers and
            # a monkeypatched resolution can't leak a permanent del
            # across tests (ADVICE r8)
            sql = sql()
            ORACLES[n] = sql
        if sql is not None:
            out[n] = sql
    return out
