"""The driver verifies the first ~50 registered queries per round, so
``__spark_entry__`` must self-derive a rotation order: code changed
since its last green check first, then oldest evidence, then name.
These tests pin the pure ordering and the repo-state invariants."""

from __future__ import annotations

import importlib.util
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_touched_queries_come_first():
    e = _load_entry()
    green = {"old_clean": 2, "new_clean": 4, "old_edited": 2, "never": 0}
    order = e._priority_order(
        green, green, touched=frozenset({"old_edited", "never"})
    )
    # touched block first (never-green ranks before green=2 inside it),
    # then untouched by oldest evidence.
    assert order == ["never", "old_edited", "old_clean", "new_clean"]


def test_priority_order_is_deterministic_by_name():
    e = _load_entry()
    green = {"b": 3, "a": 3, "c": 3}
    assert e._priority_order(green, green, frozenset()) == ["a", "b", "c"]


def test_ordered_covers_every_query_once():
    e = _load_entry()
    order = e._ordered()
    assert sorted(order) == sorted(e.QUERIES)
    # oracle_sql() resolves lazy oracles in place; a None memo (absent
    # external artifact → rows-only) keeps its registry key but is
    # omitted from the driver-facing dict
    resolved = e.oracle_sql()
    assert len(resolved) == len(
        [n for n in order if e.ORACLES.get(n) is not None]
    )


def test_window_contains_all_stalest_queries():
    """Everything not green in the newest round must fit in the 50-query
    driver window (else the rotation has fallen behind)."""
    e = _load_entry()
    green = e._green_rounds()
    if not green:
        return
    newest = max(green.values())
    stale = [n for n in e.QUERIES if green.get(n, 0) < newest]
    window = set(e._ordered()[:50])
    overflow = [n for n in stale if n not in window]
    # The window can only hold 50; assert no stale query is left out
    # while a fresher one occupies a slot.
    if len(stale) <= 50:
        assert overflow == []


def test_row_green_rejects_partial_rows():
    """A malformed/truncated artifact row (missing schema_match or
    hash_match keys) must NOT count as green evidence; the driver's
    rows-only mode carries the keys explicitly as null."""
    e = _load_entry()
    full = {
        "err": None,
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
    }
    rows_only = {
        "err": None,
        "rows_match": True,
        "schema_match": None,
        "hash_match": None,
    }
    assert e._row_green(full)
    assert e._row_green(rows_only)
    assert not e._row_green({"err": None, "rows_match": True})  # partial
    assert not e._row_green(
        {"err": None, "rows_match": True, "schema_match": True}
    )
    assert not e._row_green({**full, "hash_match": False})
    assert not e._row_green({**full, "err": "boom"})
    assert not e._row_green("not-a-dict")


def test_query_files_resolve_to_package_sources():
    e = _load_entry()
    fn = e.QUERIES["a3_daily_totals_by_method"]
    files = e._query_files(fn)
    assert any(p.endswith("queries.py") for p in files)
    assert all(p.startswith("lavasmart_bank_sync_etl_spark") for p in files)


def test_green_rounds_warns_on_malformed_artifact(tmp_path, capsys, monkeypatch):
    """A malformed CORRECTNESS_r*.json silently DROPPED evidence
    before round 9 — conservative but invisible. Pin the one-line
    stderr warning per skipped file, and that healthy files still
    count."""
    import json as _json

    e = _load_entry()
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(_json.dumps(["a", "list"]))
    (tmp_path / "CORRECTNESS_r03.json").write_text(_json.dumps({
        "q_ok": {
            "err": None, "rows_match": True,
            "schema_match": True, "hash_match": True,
        }
    }))
    monkeypatch.setattr(e, "_REPO", tmp_path)
    green = e._green_rounds()
    err = capsys.readouterr().err
    assert green == {"q_ok": 3}
    assert "CORRECTNESS_r01.json" in err
    assert "CORRECTNESS_r02.json" in err
    assert "CORRECTNESS_r03.json" not in err
    assert err.count("warning: skipping malformed") == 2


def test_lazy_none_oracle_memoizes_without_deleting(monkeypatch):
    """An oracle resolving to None (absent external artifact) must be
    memoized AS None — repeat calls stay rows-only without re-probing,
    and the registry key set stays stable (ADVICE r8: the old ``del``
    made a transient failure sticky AND mutated shared state)."""
    e = _load_entry()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        return None

    name = next(iter(e.QUERIES))
    monkeypatch.setitem(e.ORACLES, name, flaky)
    out1 = e.oracle_sql()
    out2 = e.oracle_sql()
    assert name not in out1 and name not in out2
    assert calls["n"] == 1          # resolved once, memoized
    assert name in e.ORACLES        # key survives (stable registry)
    assert e.ORACLES[name] is None
