"""Physical-plan regression tests: the scale properties SURVEY §4
claims (pushdown, pruning, broadcast, partial aggregation, no
accidental cartesian products) asserted against `.explain` output so
an optimizer-hostile refactor can't silently regress them."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

import __spark_entry__ as entrymod


def plan_of(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name: str) -> str:
        return plan_of(entrymod.queries()[name](spark, sf_dir))

    return run


def test_window_predicate_reaches_parquet_scan(q):
    """S1: the date window must appear in PushedFilters — at 100 TB
    this is the partition-pruning path."""
    plan = q("s1_partitioned_scan_window")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_column_pruning_reaches_scan(q):
    """S1/P1: a 2-column projection must read 2 columns, not ~9."""
    plan = q("s1_partitioned_scan_window")
    scan = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "o_totalprice" in scan and "o_orderdate" in scan
    assert "o_comment" not in scan and "o_custkey" not in scan


def test_small_dims_broadcast(q):
    """J4/J6: supplier-sized dimensions must broadcast, not shuffle
    the fact side."""
    for name in ("a2_j4_lot_reconciliation", "j6_broadcast_enrichment_backfill"):
        assert "BroadcastHashJoin" in q(name), name


def test_aggregates_are_partial(q):
    """A1/A3/dd1: map-side partial aggregation before the exchange —
    the shuffle carries one row per (partition, key), not per input."""
    for name in ("a1_sum_by_lot", "a3_daily_totals_by_method", "dd1_exact_dedup"):
        plan = q(name)
        assert "partial_" in plan and "Exchange" in plan, name


def test_merge_join_is_keyed_not_cartesian(q):
    """J1: the upsert classification is a keyed full-outer join."""
    plan = q("j1_upsert_classify")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_merge_folio_join_is_hash_not_sort_merge(q):
    """S4/J1: the protected-column merge joins on folio as a shuffled
    hash join with the delta-sized source as build side — full-outer
    can't broadcast, and a sort-merge fallback would sort the (huge at
    scale) dest side for nothing."""
    for name in ("s4_merge_preserve_human_cols", "j1_upsert_classify"):
        plan = q(name)
        assert "ShuffledHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_merge_human_cols_come_from_dest_verbatim(q):
    """S4: script columns coalesce src→dst, but human columns must pass
    through from the destination with NO src fallback — a coalesce on
    conciliado_raw/observaciones would let the script overwrite
    human-owned cells (Code.gs:1836-1844 writes only A–F)."""
    plan = q("s4_merge_preserve_human_cols")
    assert "coalesce(folio" in plan
    assert "coalesce(conciliado_raw" not in plan
    assert "coalesce(observaciones" not in plan


def test_a12_sketch_agg_and_broadcast_calibration(q):
    """a12: the HLL sketches build through ObjectHashAggregate
    (mergeable fixed-size state, map-side partials) and the tiny
    merged/exact sides meet in a broadcast join — no corpus-sized
    shuffle beyond the two aggregates."""
    import re
    plan = q("a12_sketch_merge_rollup")
    assert "ObjectHashAggregate" in plan  # datasketches HLL agg path
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) >= 1
    assert "SortMergeJoin" not in plan


def test_ss9_rerank_fetch_is_broadcast_lookup(q):
    """ss9: the rerank stage fetches candidate vectors via a
    broadcast-hash lookup (shortlist broadcast into the corpus scan)
    — the corpus never shuffles, and no exchange carries a
    fixed-point vector column."""
    import re
    plan = q("ss9_ivfpq_rerank")
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) >= 2
    assert "CartesianProduct" not in plan
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "embedding#" not in args, args
        for col in (r"\bvec#", r"\be#\d", r"\bqe#", r"\bce#"):
            assert not re.search(col, args), args


def test_w6_rolling_window_is_equi_not_range_join(q):
    """w6: the 7-day sliding distinct resolves as bounded replication
    + equi-joins — a range-predicate join would fall back to a
    nested loop and die at scale."""
    plan = q("w6_rolling_distinct_users")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ml5_ml6_inference_is_pure_projection(q):
    """ml5/ml6: both frozen models (linear, tree ensemble) run as
    codegen'd expressions over the scan — zero exchanges, zero Python
    evaluation nodes; at 100 TB the scan is the entire cost and
    scoring rides it for free."""
    for name in ("ml5_classifier_inference", "ml6_tree_ensemble_inference"):
        plan = q(name)
        assert "Exchange" not in plan, name
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, (name, node)
        assert "codegen id" in plan  # formatted explain's whole-stage marker


def test_mm6_shuffle_carries_hashes_not_payload(q):
    """mm6: after the mapInPandas synth/decode/hash stage, every
    exchange carries (video, frame, 64-bit hash) — the frame payload
    bytes never shuffle (dd1's principle applied to video frames)."""
    import re
    plan = q("mm6_video_frame_dedup")
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" not in plan  # hash path is mapInPandas only
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "payload#" not in args, args


def test_ivfpq_search_path_is_code_only(q):
    """ss8: the IVF-PQ search path moves only (cell, codes) — every
    exchange carries narrow key/code columns, never a float vector
    (the raw embedding stays behind for reranking); probes broadcast
    into the candidate join, so the corpus never shuffles to meet the
    queries."""
    import re
    plan = q("ss8_ivfpq_topk")
    # candidate join: broadcast probes × index on cell
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) >= 1
    assert "CartesianProduct" not in plan
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "embedding#" not in args, args
        assert not re.search(r"\bvec#", args), args
        assert not re.search(r"\be#\d", args), args
        assert not re.search(r"\bqe#", args), args


def test_ss10_filter_is_inside_the_candidate_join(q):
    """ss10: the label predicate is part of the candidate hash-join
    key — (cell, label) — not a post-filter over unfiltered
    candidates; no exchange carries a vector column."""
    import re
    plan = q("ss10_filtered_ivfpq")
    keys = [l for l in plan.splitlines() if "keys" in l.lower() and "cell#" in l]
    assert any("label#" in l for l in keys), keys
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "embedding#" not in args and not re.search(r"vec#", args), args


def test_no_unbounded_cartesian_anywhere(q):
    """Cross joins are only ever bounded-broadcast (query set × corpus,
    n_cells × corpus, B² block keys) — never a shuffle cartesian of
    two big relations."""
    for name in sorted(entrymod.queries()):
        plan = q(name)
        assert "CartesianProduct" not in plan, name


def test_lsh_candidates_join_on_bucket(q):
    """dd3/ss2: candidate generation must be an equi-join (hash join on
    band-hash / bucket), never a nested-loop over all pairs."""
    for name, key in (("dd3_minhash_lsh_candidates", "band_hash"),
                      ("ss2_lsh_topk", "bucket")):
        plan = q(name)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, name
        assert key in plan, name


def test_blocked_near_dup_uses_cogroup_kernel(q):
    """dd6: the exact all-pairs scorer runs as the blocked cogroup
    numpy kernel, not an expression-interpreted nested loop."""
    assert "FlatMapCoGroupsInPandas" in q("dd6_embedding_near_dup")


def test_auto_num_blocks_self_sizes():
    """dd6: the block count derives from corpus rows × vector width so
    the per-block matrix honours the memory budget — monotone in both
    inputs, exact at the budget boundary, clamped at both ends."""
    from hypothesis import given, settings, strategies as st

    from lavasmart_bank_sync_etl_spark.operators.similarity import auto_num_blocks

    budget = 64 << 20

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**12),
        dim=st.integers(min_value=0, max_value=65536),
        dn=st.integers(min_value=0, max_value=10**9),
        ddim=st.integers(min_value=0, max_value=1024),
    )
    def check(n, dim, dn, ddim):
        b = auto_num_blocks(n, dim)
        assert 1 <= b <= 4096
        # monotone: more rows / wider vectors never shrink B
        assert auto_num_blocks(n + dn, dim) >= b
        assert auto_num_blocks(n, dim + ddim) >= b
        # the budget actually holds (unless clamped at max_blocks):
        # expected rows per block never exceed what the budget allows
        # (floor of 1 row when a single vector alone exceeds it)
        if 0 < n and 0 < dim and b < 4096:
            assert -(-n // b) <= max(1, budget // (dim * 8))

    check()


def n_scans(plan: str) -> int:
    """Distinct parquet-scan nodes (formatted explain repeats each node
    in the tree and the details section)."""
    import re

    return len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))


def test_interval_join_is_equi_with_range_residual(q):
    """ST5: the interval join must hash-join on user_id with the time
    range as residual — a pure-inequality encoding would fall back to
    BroadcastNestedLoopJoin and explode at scale."""
    plan = q("st5_interval_join")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprint_aggregates_partially(q):
    """CH1: the XOR digest must partial-aggregate map-side — at 100 TB
    only one row per (task, month) may reach the exchange."""
    plan = q("ch1_sync_fingerprint")
    assert "partial_" in plan and "Exchange" in plan


def test_pivot_is_single_pass(q):
    """A7: explicit pivot values = exactly one scan of the source (the
    implicit form runs a second values-discovery scan)."""
    plan = q("a7_method_pivot")
    assert n_scans(plan) == 1


def test_cube_uses_expand_one_scan(q):
    """A8: CUBE expands grouping sets inside one pass — Expand node,
    one scan, still partially aggregated."""
    plan = q("a8_cube_totals")
    assert "Expand" in plan
    assert n_scans(plan) == 1
    assert "partial_" in plan


def test_kmeans_broadcasts_centroids(q):
    """ml1: the per-iteration join must broadcast the k centroid rows
    against the never-collected vector table."""
    plan = q("ml1_kmeans_assign")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_salted_agg_is_single_pass(q):
    """SK1: sum+count share one (key, salt) pre-aggregation — one scan
    of events, no self-join of two aggregate passes."""
    plan = q("sk1_salted_hot_key_agg")
    assert n_scans(plan) == 1
    assert "Join" not in plan


def test_quality_deciles_have_no_global_sort(q):
    """tx14: exact-ntile bucketing must not globally sort the corpus.
    The only single-partition exchange allowed is the one over the
    ≤10001-row quality histogram; the per-document window must be
    hash-partitioned by quality."""
    plan = q("tx14_quality_deciles")
    assert "ntile" not in plan
    assert "hashpartitioning(quality" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_mixture_rate_table_broadcasts(q):
    """cu2: the per-source rate table must broadcast back to the scan —
    the corpus itself never shuffles for the keep/drop decision."""
    plan = q("cu2_mixture_sampling")
    assert "BroadcastHashJoin" in plan


def test_training_shuffle_has_no_global_sort(q):
    """cu3: the epoch permutation must come from per-shard windows
    (hash-partitioned), never a corpus-wide single-partition sort."""
    plan = q("cu3_training_shuffle")
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning" in plan


def test_semantic_dedup_scores_per_cluster(q):
    """dd12: pair scoring must be the Arrow per-cluster kernel
    (FlatMapGroupsInPandas keyed by cluster), not a per-pair join."""
    plan = q("dd12_semantic_dedup")
    assert "FlatMapGroupsInPandas" in plan


def test_funnel_dedup_shuffles_never_carry_text(q):
    """cu4: the funnel's wide ops move hashes/signatures; the anti-join
    against LSH losers must be a real join (no cartesian), and the
    exact-dedup window must partition by content hash."""
    plan = q("cu4_pipeline_funnel")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(chash" in plan


def test_ivf_assignment_is_shuffle_free(q):
    """ss3: nearest-centroid assignment must be a scan-stage projection
    — no exchange hash-partitioned on the vector id (the old shape
    shuffled n_cells copies of every embedding through a groupBy(vid)
    argmax)."""
    plan = q("ss3_ivf_topk")
    assert "hashpartitioning(vid" not in plan
    assert "array_max" in plan


def test_ivf_index_is_built_once(q):
    """ss3: the one-row centroid array (the IVF index) is persisted and
    read by BOTH consumers — corpus assignment and query probing — so
    the centroid aggregation's shuffles run once per invocation, not
    per consumer."""
    plan = q("ss3_ivf_topk")
    assert plan.count("InMemoryTableScan") >= 2


def test_incremental_maintenance_joins_broadcast(q):
    """t7: the affected-keys set must broadcast to both the untouched
    anti-join and the recompute semi-join — history is pruned, never
    shuffled wholesale against the delta."""
    plan = q("t7_incremental_agg_maintenance")
    assert "BroadcastHashJoin" in plan
    assert plan.count("LeftAnti") >= 1 and plan.count("LeftSemi") >= 1
    assert "SortMergeJoin" not in plan


def test_funnel_is_single_conditional_aggregate(q):
    """cu4: the five funnel rows must come from ONE aggregate exploded,
    not five per-stage re-aggregations (which re-scanned the corpus
    per stage before this shape)."""
    plan = q("cu4_pipeline_funnel")
    assert "Union" not in plan
    assert "explode" in plan


def test_lsh_prefiltered_jaccard_scores_candidates_only(q):
    """dd13: the exact Jaccard stage must consume the LSH candidate
    join — corpus pruned by a semi-join on candidate ids, verification
    as an array_intersect projection — never a shingle-level self-join
    of the full corpus (that is dd4's shape; dd13's point is the
    prefilter)."""
    plan = q("dd13_lsh_prefiltered_jaccard")
    assert "LeftSemi" in plan
    assert "array_intersect" in plan
    assert "hashpartitioning(shingle" not in plan
    # the shingle-set table is read from the session-persisted index
    # artifact, not re-shingled per run (r12)
    assert "InMemoryTableScan" in plan


def _outside_cached_relations(plan: str) -> str:
    """Tree-section lines of a formatted plan that are NOT inside any
    InMemoryRelation subtree. Spark may print a cached relation's plan
    under one scan or under every scan depending on whether the persist
    was already materialized in the session, so any count over the raw
    string is fragile; the top-level slice is stable either way."""
    import re

    tree = plan.split("\n\n", 1)[0]
    out = []
    cache_indent = None
    for line in tree.splitlines():
        op = re.sub(r"^[\s:+*-]*", "", line)
        indent = len(line) - len(op)
        if cache_indent is not None:
            if indent > cache_indent:
                continue  # still inside the cached relation's subtree
            cache_indent = None
        if op.startswith("InMemoryRelation"):
            cache_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def test_containment_pair_emit_reads_posting_index(q):
    """dd17: pair emission must consume the session-persisted
    posting-list index table (the Generate's input is an
    InMemoryTableScan), and the per-run plan must not re-run the
    by-shingle cap shuffle — the WindowGroupLimit cap pass lives only
    inside the index build (its InMemoryRelation), never at top level."""
    import re

    plan = q("dd17_containment_pairs")
    assert re.search(r"Generate \(\d+\)\n[\s:]*\+- InMemoryTableScan", plan), plan
    top = _outside_cached_relations(plan)
    assert "WindowGroupLimit" not in top, top
    # the cap does exist — inside the cached index build
    assert "WindowGroupLimit" in plan


def test_salted_join_spreads_hot_keys(q):
    """sk2: the probe side must join on (key, salt) with the build side
    replicated — the hot key's rows land on num_salts partitions."""
    plan = q("sk2_salted_join")
    assert "_salt" in plan


def test_bucketed_join_query_has_no_join_exchange(q):
    """b1: both sides are bucketed on the join key, so the sort-merge
    join must consume the bucketed layout directly — the ONLY exchange
    allowed in the plan is the final group-by-segment aggregation."""
    import re

    plan = q("b1_bucketed_join")
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    # exactly one Exchange node in the whole plan: the group-by-segment
    # aggregation; the join itself reads the bucketed layout in place
    assert len(set(re.findall(r"\((\d+)\) Exchange", plan))) == 1, plan


def test_fuzzy_match_broadcasts_catalog(q):
    """j9: the canonical catalog must broadcast (the fact side never
    shuffles for the linkage) with the cheap length-difference bound
    as the join condition; levenshtein runs JVM-side on the pruned
    pairs — never a shuffle cartesian of the fact table."""
    plan = q("j9_fuzzy_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "levenshtein" in plan


def test_ols_is_one_aggregation_pass(q):
    """ml3: the regression must be a single partial-aggregated pass
    over lineitem — one scan, no join, no second pass for the means."""
    plan = q("ml3_linear_regression")
    assert n_scans(plan) == 1
    assert "Join" not in plan
    assert "partial_" in plan


def test_robust_outliers_broadcasts_stats(q):
    """w3: both stats joins (median, then median+MAD) must broadcast
    the per-method table back to the facts — the fact side never
    shuffles for the screen."""
    plan = q("w3_robust_outliers")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_passage_spans_shuffle_hashes_not_text(q):
    """dd16: the posting-list cap and the match join must both ride
    (hash[, pos]) partitionings — window text is projected away before
    any exchange, and the pair join is an equi-join on the hash."""
    plan = q("dd16_duplicate_passage_spans")
    assert "hashpartitioning(h" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "win" not in plan.split("Exchange", 1)[1].splitlines()[0]


def test_binned_interval_join_is_equi_not_nested_loop(q):
    """j10: the time-range join must run as an equi-join on the
    (user, bin) key — the binning exists precisely to avoid the
    BroadcastNestedLoopJoin Spark picks for bare inequality joins."""
    plan = q("j10_binned_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # any HASH equi-join qualifies (broadcast at test scale, shuffled
    # at 100 TB); the range predicate must survive only as a residual
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "Join condition" in plan and "cts" in plan.split("Join condition", 1)[1][:120]


def test_pq_encode_is_shuffle_free_projection(q):
    """ss6: PQ encoding must be a projection over the corpus scan
    against the broadcast one-row codebook — no exchange of the
    corpus for either encode or ADC scoring; the only exchange in the
    whole plan serves the final top-k window."""
    plan = q("ss6_pq_adc_topk")
    assert plan.count("BroadcastExchange") >= 2  # codebook (x2) + queries
    import re
    shuffles = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(s.startswith("query_id") for s in shuffles), shuffles


def test_merge_on_read_broadcasts_delta_keys(q):
    """t9: the base side resolves via a broadcast anti-join on the
    delta key set — the 100 TB base never shuffles for the MOR read;
    the only keyed exchange belongs to the delta log's latest-wins
    window."""
    plan = q("t9_merge_on_read")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_sessionize_windows_share_one_user_exchange(q):
    """ev4: the lag window, the running sum, and the per-session
    aggregate must all ride ONE (user)-keyed exchange on top of the
    tie-collapse aggregate's (user, ts) exchange — exactly two
    exchanges total, no per-window re-shuffle."""
    import re
    plan = q("ev4_batch_sessionization")
    keys = re.findall(r"Arguments: hashpartitioning\(([^)]*?), \d+\)", plan)
    assert len(keys) == 2, keys
    assert plan.count(") Window") == 2


def test_boilerplate_shuffles_never_carry_sentence_text(q):
    """tx20: every exchange partitions on hash/id columns only — the
    sentence strings (and document text) stay inside their scan
    stage; the cleaned-text rebuild is a projection, not a join."""
    import re
    plan = q("tx20_boilerplate_lines")
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "sent#" not in args and "text#" not in args, args
    assert "SortMergeJoin" not in plan


def test_streaks_ride_one_user_exchange_after_distinct(q):
    """w4: DISTINCT (user, day) pays its own exchange; the island
    window and the streak aggregate then share a single (user)-keyed
    exchange — two total."""
    import re
    plan = q("w4_activity_streaks")
    keys = re.findall(r"Arguments: hashpartitioning\(([^)]*?), \d+\)", plan)
    assert len(keys) == 2, keys


def test_tx17_lm_joins_broadcast(q):
    """tx17: the whole hashed LM (≤2×10007 counts) collapses into one
    broadcast row of maps and scoring is a pure projection — the
    Zipf-tailed bigram stream joins NOTHING on vocabulary keys; the
    only exchanges are the tiny fused (kind, bucket) aggregate and the
    per-doc rollup."""
    import re
    plan = q("tx17_bigram_lm_score")
    # formatted explain lists each node twice (tree + "(N) Op" detail);
    # count the detail entries for an exact node count
    assert len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)) == 1
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "w1#" not in args and "w12#" not in args and "text#" not in args, args


def test_b3_zorder_stays_map_side_until_zone_maps(q):
    """b3: the layout operator's whole point at 100 TB is that the
    z-value is MAP-SIDE arithmetic — the only stats input is a 1-row
    min/max frame broadcast back (BroadcastNestedLoopJoin, never a
    keyed shuffle of the facts against stats), no window function
    anywhere (files are fixed z-ranges, not a global row_number), and
    the zone-map aggregation partial-aggregates before its exchange."""
    import re
    plan = q("b3_zorder_layout")
    # exactly 2: the layouts union re-derives the map-side pipeline in
    # each branch (recomputing codegen arithmetic is cheaper than
    # materializing the z column at scale), each with ONE 1-row
    # stats broadcast
    assert len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)) == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" not in plan
    # facts are only ever hash-partitioned by the zone/group keys
    for args in re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "layout#" in args or "file_id#" in args, args


def test_workbook_renders_broadcast_and_partial_aggregate(q):
    """xlsx2/xlsx3: the spine join is dimension-grade (≤396 dates) —
    it must resolve as a broadcast hash join, never a sort-merge
    exchange of the fact aggregation; the per-lot SUMIF must
    partial-aggregate before its exchange (the shuffle carries one
    row per (partition, lot), not per card)."""
    plan = q("xlsx2_totales_render")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan  # the per-day SUMIFS partial-aggregates
    plan3 = q("xlsx3_cierres_lotes_render")
    assert "partial_" in plan3
    assert "SortMergeJoin" not in plan3
