"""Semantic properties of the curation-sampling wave (dd12 / cu2 /
cu3) that the cross-engine parity test can't express: planted-dup
recall, mixture-rate arithmetic, and permutation validity.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod


def _q(name):
    return entrymod.queries()[name]


def test_dd12_flags_planted_dups_sharing_a_cluster(spark, sf_dir):
    """Every planted near-copy (vec_id+100000, scaled ×1.01) that lands
    in the same k-means cluster as its source must be flagged, and the
    flagged pair must point at the original (dup_of < vec_id)."""
    out = _q("dd12_semantic_dedup")(spark, sf_dir).collect()
    assert out, "expected at least one semantic duplicate"
    for r in out:
        assert r.dup_of < r.vec_id
        assert r.cos_sim >= 0.999
    # planted copies are ids >= 100000; each flagged planted copy must
    # resolve to its true source when that source shares the cluster
    planted = {r.vec_id: r.dup_of for r in out if r.vec_id >= 100000}
    assert planted, "no planted copy was flagged"
    for copy_id, kept in planted.items():
        assert kept <= copy_id - 100000


def test_cu2_rates_and_flags_are_consistent(spark, sf_dir):
    rows = _q("cu2_mixture_sampling")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < 10000
        assert 0 < r.rate_bp <= 10000
        assert r.sampled == (r.bucket < r.rate_bp)
    # per-source rate is a single value
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, set()).add(r.rate_bp)
    assert all(len(v) == 1 for v in per_src.values())
    # at least one source is capped at 100% and one is downsampled
    rates = {next(iter(v)) for v in per_src.values()}
    assert max(rates) == 10000 and min(rates) < 10000


def test_cu3_positions_form_a_permutation_per_shard(spark, sf_dir):
    df = _q("cu3_training_shuffle")(spark, sf_dir)
    n_docs = df.count()
    per_shard = df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("distinct_pos"),
    ).collect()
    assert sum(r.n for r in per_shard) == n_docs
    for r in per_shard:
        assert (r.lo, r.hi, r.distinct_pos) == (1, r.n, r.n)
    # rerun is byte-identical (deterministic shuffle)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _q("cu3_training_shuffle")(spark, sf_dir).collect()))
    assert a == b


def test_cu6_temperature_flattens_the_planted_head(spark, sf_dir):
    """cu6 calibration: on the ×10-replicated src0 corpus, temperature
    α=0.3 must DOWN-sample the bloated head (epochs_x < 1) and
    UP-sample every tail domain (epochs_x > 1), while both share and
    p_t remain distributions (sum ≈ 1) and p_t stays ordered the same
    way as share (temperature flattens, never reorders)."""
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    rows = {r["source"]: r for r in
            QUERIES["cu6_temperature_mixture"](spark, sf_dir).collect()}
    head, tails = rows["src0"], [r for s, r in rows.items() if s != "src0"]
    assert head["epochs_x"] < 1 and head["share"] > max(r["share"] for r in tails)
    assert all(r["epochs_x"] > 1 for r in tails)
    assert abs(sum(r["share"] for r in rows.values()) - 1) < 1e-3
    assert abs(sum(r["p_t"] for r in rows.values()) - 1) < 1e-3
    by_share = sorted(rows.values(), key=lambda r: (r["share"], r["source"]))
    by_pt = sorted(rows.values(), key=lambda r: (r["p_t"], r["source"]))
    assert [r["source"] for r in by_share] == [r["source"] for r in by_pt]
    assert head["p_t"] < head["share"]  # flattened, still the largest
