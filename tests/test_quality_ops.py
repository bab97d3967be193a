"""Targeted semantics + plan tests for the data-quality wave (dq1-dq3,
ev5, a14, cu5, w7): handcrafted inputs where the intended math is
known a priori, plus physical-plan pins for the scale claims in the
docstrings (one-scan profile, broadcast stats, key-only orphan joins).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name: str):
        return entrymod.queries()[name](spark, sf_dir)

    return run


# ---------------------------------------------------------------------------
# semantics on handcrafted / known data
# ---------------------------------------------------------------------------

def test_dq1_profile_matches_table_facts(spark, sf_dir, q):
    """Profile numbers must equal the directly-computed facts."""
    rows = {r["column_name"]: r for r in q("dq1_column_profile").collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert r["n_distinct"] <= n - r["n_null"]
    k = rows["o_orderkey"]
    assert k["n_distinct"] == o.select("o_orderkey").distinct().count()
    mn, mx = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    assert k["min_repr"] == str(mn) and k["max_repr"] == str(mx)
    # money extremes are VALUE extremes in exact cents, not
    # lexicographic over the repr
    pmn, pmx = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    p = rows["o_totalprice"]
    assert p["min_repr"] == str(round(pmn * 100))
    assert p["max_repr"] == str(round(pmx * 100))


def test_dq2_zscores_sum_to_zero_and_flag_matches(q):
    """z-scores of a sample against its own mean sum to ~0, and the
    flag is exactly |z|>2 on the emitted (rounded) z."""
    rows = q("dq2_volume_anomaly").collect()
    assert abs(sum(r["z"] for r in rows)) < 1e-6 * len(rows)
    for r in rows:
        assert r["is_anomaly"] == (abs(r["z"]) > 2.0)


def test_dq3_counts_children_and_finds_planted_orphan(spark, tmp_path, q):
    """On the synthetic star schema every FK resolves (0 orphans, child
    counts equal table counts); with a planted dangling key the same
    logic reports exactly one orphan."""
    rows = {r["relationship"]: r for r in q("dq3_referential_orphans").collect()}
    assert set(rows) == {
        "orders.o_custkey->customer",
        "lineitem.l_orderkey->orders",
        "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier",
    }
    for r in rows.values():
        assert r["n_orphans"] == 0

    # plant an orphan in a scratch copy of the same layout
    d = str(tmp_path)
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=10), Row(o_orderkey=2, o_custkey=99)]
    )
    customer = spark.createDataFrame([Row(c_custkey=10)])
    lineitem = spark.createDataFrame([Row(l_orderkey=1, l_partkey=5, l_suppkey=7)])
    part = spark.createDataFrame([Row(p_partkey=5)])
    supplier = spark.createDataFrame([Row(s_suppkey=7)])
    for name, df in [
        ("orders", orders), ("customer", customer), ("lineitem", lineitem),
        ("part", part), ("supplier", supplier),
    ]:
        df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    planted = {
        r["relationship"]: r["n_orphans"]
        for r in entrymod.queries()["dq3_referential_orphans"](spark, d).collect()
    }
    assert planted["orders.o_custkey->customer"] == 1
    assert planted["lineitem.l_orderkey->orders"] == 0


def test_ev5_probabilities_row_normalize(q):
    """Per prev_type the transition counts are consistent and the
    probabilities are n/tot rounded 4dp (so each row's p reproduces
    from the counts)."""
    rows = q("ev5_event_transitions").collect()
    tot = {}
    for r in rows:
        tot[r["prev_type"]] = tot.get(r["prev_type"], 0) + r["n"]
    for r in rows:
        assert r["p"] == round(r["n"] / tot[r["prev_type"]], 4)


def test_ev5_transitions_on_toy_sequence(spark, tmp_path):
    """One user, sequence A,B,A,B → transitions A→B ×2, B→A ×1."""
    import datetime as dt

    d = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, ts=t0 + dt.timedelta(minutes=i), user_id=1,
            event_type=ty, value=1.0, props="{}")
        for i, ty in enumerate(["A", "B", "A", "B"])
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = {
        (r["prev_type"], r["event_type"]): (r["n"], r["p"])
        for r in entrymod.queries()["ev5_event_transitions"](spark, d).collect()
    }
    assert out == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_a14_emits_exactly_topk_with_deterministic_ties(q):
    """Every month emits ranks 1..3 (or fewer months' customers), and
    ranks are unique per month."""
    rows = q("a14_topk_per_group").collect()
    by_month = {}
    for r in rows:
        by_month.setdefault(r["month"], []).append(r)
    for month, rs in by_month.items():
        ranks = sorted(x["rk"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3
        totals = [x["total"] for x in sorted(rs, key=lambda x: x["rk"])]
        assert totals == sorted(totals, reverse=True)


def test_cu5_weights_collapse_duplicates(spark, tmp_path):
    """Three copies of one text + one unique text in one source →
    n_docs 4, unique 2, effective_docs 2.0 (3·⅓ + 1)."""
    d = str(tmp_path)
    docs = [
        Row(doc_id=i, text=t, lang="en", source="web", n_chars=len(t))
        for i, t in enumerate(["same text here"] * 3 + ["another doc"])
    ]
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    r = entrymod.queries()["cu5_dedup_weighted_mass"](spark, d).collect()[0]
    assert (r["n_docs"], r["n_unique_texts"], r["effective_docs"]) == (4, 2, 2.0)
    # "same text here" = 3 tokens ×3 docs ×⅓ + "another doc" = 2 tokens
    assert r["effective_tokens"] == 5.0


def test_w7_ema_is_the_halving_fold(spark, tmp_path):
    """Daily cents 100, 200, 400 (in day order) → fold (100+200)/2=150,
    (150+400)/2=275 → ema 2.75; insertion order of the raw rows must
    not matter (the fold sorts by day)."""
    import datetime as dt

    d = str(tmp_path)
    rows = [  # deliberately written out of day order
        Row(event_id=3, ts=dt.datetime(2024, 1, 3), user_id=1,
            event_type="A", value=4.0, props="{}"),
        Row(event_id=1, ts=dt.datetime(2024, 1, 1), user_id=1,
            event_type="A", value=1.0, props="{}"),
        Row(event_id=2, ts=dt.datetime(2024, 1, 2), user_id=1,
            event_type="A", value=2.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    r = entrymod.queries()["w7_ema_daily_value"](spark, d).collect()[0]
    assert r["n_days"] == 3 and r["last_day"] == "2024-01-03"
    assert r["ema"] == 2.75


# ---------------------------------------------------------------------------
# plan pins for the docstrings' scale claims
# ---------------------------------------------------------------------------

def test_dq1_profile_is_one_scan(spark, sf_dir):
    """DQ1's claim: the whole profile rides ONE scan of orders."""
    plan = plan_of(entrymod.queries()["dq1_column_profile"](spark, sf_dir))
    # one "Location:" detail line per FileScan node in formatted mode
    assert plan.count("Location:") == 1


def test_dq2_stats_join_is_broadcast(spark, sf_dir):
    """DQ2's one-row stats frame must broadcast back onto the daily
    rollup — no shuffle-join of a 1-row table."""
    plan = plan_of(entrymod.queries()["dq2_volume_anomaly"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_ev5_normalization_join_is_broadcast(spark, sf_dir):
    """EV5's |types|² transition table row-normalizes via a broadcast
    hash join, never a sort-merge."""
    plan = plan_of(entrymod.queries()["ev5_event_transitions"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cu5_join_shuffles_digests_not_text(spark, sf_dir):
    """CU5's claim: the cluster-size join carries (doc_id, source,
    n_tokens, h) — the raw text column never reaches an Exchange."""
    plan = plan_of(entrymod.queries()["cu5_dedup_weighted_mass"](spark, sf_dir))
    for line in plan.splitlines():
        if line.strip().startswith("Arguments:") and "hashpartitioning" in line:
            assert "text" not in line, line


def test_dq4_lag_counts_minute_boundaries(spark, tmp_path):
    """Freshness lag counts MINUTE-BOUNDARY crossings (both engines'
    semantics): 20 s apart across a boundary → 1; 20 s apart within
    one minute → 0; the head row itself → 0."""
    import datetime as dt
    from pyspark.sql import Row

    d = str(tmp_path)
    rows = [
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 10, 0, 10), user_id=1,
            event_type="head", value=1.0, props="{}"),
        Row(event_id=2, ts=dt.datetime(2024, 1, 1, 9, 59, 50), user_id=1,
            event_type="cross", value=1.0, props="{}"),
        Row(event_id=3, ts=dt.datetime(2024, 1, 1, 10, 0, 5), user_id=1,
            event_type="same_min", value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = {
        r["event_type"]: r["lag_minutes"]
        for r in entrymod.queries()["dq4_ingestion_lag"](spark, d).collect()
    }
    assert out == {"head": 0, "cross": 1, "same_min": 0}


def test_dq5_flags_planted_duplicate_key(spark, tmp_path):
    """A planted duplicate key flips is_unique and reports the excess
    row and multiplicity."""
    from pyspark.sql import Row

    d = str(tmp_path)
    spark.createDataFrame(
        [Row(o_orderkey=k) for k in [1, 2, 2, 3]]
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame([Row(event_id=1)]).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    spark.createDataFrame([Row(c_custkey=1)]).write.mode("overwrite").parquet(
        f"{d}/customer.parquet"
    )
    rows = {
        r["key_name"]: r
    for r in entrymod.queries()["dq5_key_uniqueness"](spark, d).collect()}
    o = rows["orders.o_orderkey"]
    assert (o["n_rows"], o["n_keys"], o["n_excess_rows"],
            o["max_multiplicity"], o["is_unique"]) == (4, 3, 1, 2, False)
    assert rows["events.event_id"]["is_unique"] is True


def test_a15_topk_exact_and_flags(spark, sf_dir):
    """a15's exact side equals the directly-computed top-10 heaviest
    users, and both CMS guarantees hold on real data."""
    rows = entrymod.queries()["a15_cms_frequency_calibration"](
        spark, sf_dir
    ).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = sorted(
        ((r["user_id"], r["cnt"]) for r in
         e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = sorted(((r["user_id"], r["exact_n"]) for r in rows),
                 key=lambda t: (-t[1], t[0]))
    assert got == want
    for r in rows:
        assert r["overestimates"] and r["within_bound"], r


def test_a15_topk_is_heap_not_window(spark, sf_dir):
    """The top-k must lower to TakeOrderedAndProject (per-partition
    heaps), never a global-sort window."""
    plan = plan_of(
        entrymod.queries()["a15_cms_frequency_calibration"](spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_w8_bins_are_equal_depth_and_ordered(spark, sf_dir):
    """Per type: four buckets, populations equal to ±1, and bucket
    value ranges strictly ordered (hi of bucket b ≤ lo of bucket
    b+1 — ties may share a boundary cent but never invert)."""
    rows = entrymod.queries()["w8_equi_depth_bins"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rs] == [0, 1, 2, 3], t
        depths = [r["n_rows"] for r in rs]
        assert max(depths) - min(depths) <= 1, (t, depths)
        for a, b in zip(rs, rs[1:]):
            assert a["hi_cents"] <= b["lo_cents"], (t, a, b)


def test_dq6_counts_planted_violations_and_nulls(spark, tmp_path):
    """Planted violations: wrong n_chars, 3-letter lang, NULL text
    (counts against BOTH the text and the n_chars constraints — NULL
    can't prove conformance), negative doc_id."""
    d = str(tmp_path)
    docs = [
        Row(doc_id=0, text="good doc", lang="en", n_chars=8, source="s"),
        Row(doc_id=1, text="bad count", lang="en", n_chars=3, source="s"),
        Row(doc_id=2, text="bad lang", lang="eng", n_chars=8, source="s"),
        Row(doc_id=3, text=None, lang="en", n_chars=0, source="s"),
        Row(doc_id=-1, text="bad id", lang="en", n_chars=6, source="s"),
    ]
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    rows = {
        r["constraint_name"]: r
        for r in entrymod.queries()["dq6_field_conformance"](spark, d).collect()
    }
    v = {k: (r["n_violations"], r["passes"]) for k, r in rows.items()}
    assert v == {
        "n_chars_matches_text": (2, False),   # bad count + NULL text
        "lang_is_iso2": (1, False),
        "text_nonempty": (1, False),
        "doc_id_nonnegative": (1, False),
    }
    assert all(r["n_rows"] == 5 for r in rows.values())


def test_dq6_is_one_scan(spark, sf_dir):
    """All conformance constraints ride ONE scan of documents."""
    plan = plan_of(entrymod.queries()["dq6_field_conformance"](spark, sf_dir))
    assert plan.count("Location:") == 1


def test_dq7_psi_calibration_and_fixed_point_total(q):
    """dq7's self-calibration contract: the organic (stationary) half
    split stays under the 0.2 action threshold with drifted=false; the
    planted 3/10-range shift must trip it. The total equals the
    integer-fixed-point sum of the per-bin terms exactly (no float
    summation drift), and each scenario's histogram covers the same
    row population."""
    rows = q("dq7_distribution_drift").collect()
    by_scen = {}
    for r in rows:
        by_scen.setdefault(r["scenario"], []).append(r)
    assert set(by_scen) == {"organic", "shifted"}
    for scen, rs in by_scen.items():
        total = rs[0]["psi_total"]
        assert all(r["psi_total"] == total for r in rs)
        assert round(sum(r["psi_term"] for r in rs), 6) == round(total, 6)
        assert all((total >= 0.2) == r["drifted"] for r in rs)
    assert not by_scen["organic"][0]["drifted"]
    assert by_scen["shifted"][0]["drifted"]
    assert by_scen["shifted"][0]["psi_total"] > by_scen["organic"][0]["psi_total"]
    # same underlying population in both scenarios
    n = lambda rs, k: sum(r[k] for r in rs)  # noqa: E731
    assert n(by_scen["organic"], "n_ref") == n(by_scen["shifted"], "n_ref")
    assert n(by_scen["organic"], "n_cur") == n(by_scen["shifted"], "n_cur")


def test_dq7_plan_narrow_scan_no_window(q):
    """dq7's scale claims, plan-pinned: every events scan reads ONLY
    the (ts, value) projection (never props/user_id — the wide
    columns), and no window function ever touches the facts — the only
    windows allowed are the per-scenario totals over the ≤40-row
    histogram (r13: they replaced aggregate-then-rejoin, which
    re-planned the corpus chain once per join side)."""
    import re

    plan = plan_of(q("dq7_distribution_drift"))
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs, "expected the per-scenario histogram windows"
    assert set(specs) == {"scenario"}, specs
    for rs in [ln for ln in plan.splitlines() if "ReadSchema" in ln]:
        assert "props" not in rs and "user_id" not in rs and "event_id" not in rs
