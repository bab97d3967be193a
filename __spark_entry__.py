"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()``
exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares
against at sf0.01 (row-count + schema + order-insensitive value hash).

Column names are aliased identically on both sides; float aggregates
are rounded on both sides so cross-engine summation order cannot flip
the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lavasmart_bank_sync_etl_spark.queries import ORACLES, QUERIES

# The driver checks the FIRST ~50 of the registered queries each round.
# Ordering policy (round 4): queries whose newest CORRECTNESS row is
# broken/unverifiable go first, then queries whose only green row is
# from round 1 (the operators behind dd2/dd3/dd11/tx14 were refactored
# after that check), then everything already re-verified in round 3.

#: ERR or no_oracle in CORRECTNESS_r03.json — fixed/reshaped this
#: round — plus the queries first registered this round.
_NEEDS_FRESH = [
    "st3_stateful_first_seen", "st6_streaming_upsert",
    "w2_interarrival_gaps", "a9_approx_distinct_calibration",
    "a10_approx_percentile_calibration", "tx16_compression_ratio",
    "t7_incremental_agg_maintenance", "sk2_salted_join",
    "tx18_dsir_importance",
]

#: Green only in CORRECTNESS_r01.json; never re-checked since.
_R1_STALE = [
    "w1_running_total", "d1_first_wins_dedup", "d1_duplicate_losers_log",
    "j1_upsert_classify", "a4_run_summary", "c1_c3_typed_diff",
    "c4_change_narrative", "s4_merge_preserve_human_cols",
    "j2_r3_move_conflict_routing", "j3_deletion_detection",
    "j5_bank_match_candidates", "j6_broadcast_enrichment_backfill",
    "t1_lookback_window", "tx1_token_counts", "tx2_language_id",
    "tx3_quality_score", "tx4_fingerprint", "tx5_rolling_fingerprint",
    "dd1_exact_dedup", "dd2_minhash_signatures",
    "dd3_minhash_lsh_candidates", "dd4_ngram_jaccard_pairs",
    "dd5_simhash", "tx6_chunking", "tx8_sequence_packing",
    "tx7_deterministic_split", "dd7_simhash_hamming_pairs",
    "ev1_json_props_extract", "dd6_embedding_near_dup",
    "ss1_brute_force_topk", "ss2_lsh_topk", "ss3_ivf_topk",
    "mm1_multimodal_decode", "mm2_resize", "mm3_frame_sample",
    "st1_tumbling_window_agg", "st2_session_windows",
]


def _ordered() -> list[str]:
    priority = _NEEDS_FRESH + _R1_STALE
    assert all(n in QUERIES for n in priority), sorted(
        set(priority) - set(QUERIES)
    )
    rest = [n for n in QUERIES if n not in set(priority)]
    return priority + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ``totales`` view — per-day, per-method
    totals over the cleaned+classified sales (SURVEY A3/P2)."""
    return QUERIES["a3_daily_totals_by_method"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered() if n in ORACLES}
