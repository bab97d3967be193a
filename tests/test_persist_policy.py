"""Persist policy (VERDICT r12): session-scoped `_shared_persist`
artifacts must have >=2 registered-query consumers — a single-consumer
session memo keyed on the test data would only exploit the bench's
min-of-reps semantics (benchmark gaming, not optimization).
Single-consumer intra-run reuse must go through `_run_persist`, which
rebuilds on every invocation so every bench rep pays the build."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

import __spark_entry__ as entrymod
from lavasmart_bank_sync_etl_spark import queries_llm as QL

PKG = Path(QL.__file__).parent


def _keys_of(helper: str) -> set[str]:
    """First-element string literals of every ``helper(spark, ("<key>"...``
    call in the query modules (the key prefix the registry is keyed on)."""
    pat = re.compile(helper + r"\(\s*\n?\s*spark,\s*\(\s*\n?\s*\"([a-z0-9_]+)\"")
    keys: set[str] = set()
    for f in PKG.glob("queries*.py"):
        keys |= set(pat.findall(f.read_text()))
    return keys


def test_registry_covers_every_shared_persist_key():
    """Every `_shared_persist` key literal in the source is declared."""
    used = _keys_of("_shared_persist")
    assert used, "source scan found no _shared_persist call sites"
    undeclared = used - set(QL._SHARED_CONSUMERS)
    assert not undeclared, f"undeclared _shared_persist keys: {undeclared}"


def test_direct_shared_dict_keys_declared():
    """Keys stored straight into `_SHARED` (the IVF-PQ parts tuple)
    are declared too."""
    pat = re.compile(
        r"key = \(spark\.sparkContext\.applicationId, \"([a-z0-9_]+)\"[^)]*\)\s*\n"
        r"\s*\w+ = _SHARED\.get\(key\)"
    )
    keys: set[str] = set()
    for f in PKG.glob("queries*.py"):
        keys |= {k for k in pat.findall(f.read_text()) if k}
    assert keys, "source scan found no direct _SHARED dict usages"
    assert keys <= set(QL._SHARED_CONSUMERS), keys - set(QL._SHARED_CONSUMERS)


def test_every_declared_artifact_has_two_registered_consumers():
    registered = set(entrymod.queries())
    for key, consumers in QL._SHARED_CONSUMERS.items():
        assert len(set(consumers)) >= 2, f"{key}: single consumer {consumers}"
        unknown = set(consumers) - registered
        assert not unknown, f"{key}: consumers not registered queries: {unknown}"


def test_run_persist_keys_are_not_session_registry_keys():
    """The single-consumer artifacts demoted by the policy (dd7 sigs,
    dd17 postings/sizes, tx18 feats) must stay out of the session
    registry — and the r12 offenders must not come back."""
    run_keys = _keys_of("_run_persist")
    assert run_keys, "source scan found no _run_persist call sites"
    overlap = run_keys & set(QL._SHARED_CONSUMERS)
    assert not overlap, f"keys both run-local and session-scoped: {overlap}"
    for offender in ("embdup_kmeans_k8i2", "neardup_simhash32", "ivfpq_idx_labeled"):
        assert offender not in QL._SHARED_CONSUMERS


def test_shared_persist_refuses_undeclared_keys():
    with pytest.raises(ValueError, match="not declared"):
        QL._shared_persist(None, ("bogus_artifact", "/nowhere"), None)
