"""Driver-facing queries: warehouse/reporting wave — pivoted method
reports, CUBE subtotal lattices, sliding event-time windows, SCD2
validity intervals built from a change stream, and an
order-insensitive table fingerprint for sync verification.

These extend the reference's reporting surface (the `totales` sheet
and per-method tables, SURVEY.md §2.7) with the standard warehouse
shapes Spark gives us natively; same oracle conventions as
queries.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query, sales_cte
from .sources.tables import read_table, sales_view

# ---------------------------------------------------------------------------
# A7 — pivoted per-day method report (the `totales` sheet, widened)
# ---------------------------------------------------------------------------

_METHODS = ["TRANSFERENCIA", "TARJETA", "EFECTIVO", "OTROS"]


@query(
    "a7_method_pivot",
    sales_cte(
        """
        SELECT CAST(sale_date AS VARCHAR) AS sale_date_iso,
               ROUND(SUM(CASE WHEN metodo = 'TRANSFERENCIA' THEN monto END), 2) AS transferencia,
               ROUND(SUM(CASE WHEN metodo = 'TARJETA' THEN monto END), 2) AS tarjeta,
               ROUND(SUM(CASE WHEN metodo = 'EFECTIVO' THEN monto END), 2) AS efectivo,
               ROUND(SUM(CASE WHEN metodo = 'OTROS' THEN monto END), 2) AS otros
        FROM sales
        WHERE sale_date BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
        GROUP BY 1
        """
    ),
)
def a7_method_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — the reference's `totales` sheet as a *wide* report: one row
    per day, one column per payment method (the xlsx keeps separate
    per-method sheets; SURVEY A3). ``pivot`` with an explicit value
    list so the plan is a single hash aggregate — no second pass to
    discover pivot values, which at 100 TB would be a full extra
    scan."""
    s = sales_view(spark, sf_dir).where(
        F.col("sale_date").between("1998-01-01", "1998-12-31")
    )
    wide = (
        s.groupBy(F.col("sale_date").cast("string").alias("sale_date_iso"))
        .pivot("metodo", _METHODS)
        .agg(F.round(F.sum("monto"), 2))
    )
    return wide.select(
        "sale_date_iso",
        *[F.col(m).alias(m.lower()) for m in _METHODS],
    )


# ---------------------------------------------------------------------------
# A8 — CUBE subtotal lattice (method × year)
# ---------------------------------------------------------------------------

@query(
    "a8_cube_totals",
    sales_cte(
        """
        SELECT CAST(GROUPING(metodo) * 2 + GROUPING(year(sale_date)) AS BIGINT) AS gid,
               COALESCE(metodo, '(all)') AS metodo_g,
               CAST(COALESCE(year(sale_date), -1) AS BIGINT) AS yr,
               COUNT(*) AS n,
               ROUND(SUM(monto), 2) AS total
        FROM sales
        GROUP BY CUBE (metodo, year(sale_date))
        """
    ),
)
def a8_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — full subtotal lattice over (method, year) via CUBE: grand
    total, per-method, per-year, and per-cell in ONE aggregation pass
    (Catalyst expands the grouping sets; partial aggregation still
    happens map-side, so the 100 TB scan is read once, not four
    times). The reference computes only the finest cell (A3) and
    leaves subtotals to spreadsheet formulas; the lattice replaces
    those formulas. Null grouping keys are disambiguated from real
    nulls with grouping()."""
    s = sales_view(spark, sf_dir).withColumn("yr0", F.year("sale_date"))
    return (
        s.cube("metodo", "yr0")
        .agg(
            (F.grouping("metodo") * 2 + F.grouping("yr0")).cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("monto"), 2).alias("total"),
        )
        .select(
            "gid",
            F.coalesce(F.col("metodo"), F.lit("(all)")).alias("metodo_g"),
            F.coalesce(F.col("yr0"), F.lit(-1)).cast("long").alias("yr"),
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# ST4 — sliding (hopping) event-time windows
# ---------------------------------------------------------------------------

@query(
    "st4_sliding_window",
    """
    WITH ex AS (
      SELECT ts, value, unnest([0, 1, 2]) AS k FROM events
    )
    SELECT strftime(make_timestamp(
             (CAST(floor(epoch(ts) / 300) AS BIGINT) - k) * 300 * 1000000),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total
    FROM ex
    GROUP BY 1
    """,
)
def st4_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 — sliding windows (15-minute size, 5-minute slide) over
    event time: each event lands in exactly 3 overlapping windows.
    Spark's ``window()`` does the 1→3 expansion inside the aggregate
    (epoch-aligned starts); the same query under ``readStream`` with a
    watermark is the streaming rollup (the tumbling twin is ST1). The
    oracle expands windows arithmetically — both engines align buckets
    to the epoch, so starts agree exactly."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# J8 — SCD2 validity intervals from a change stream
# ---------------------------------------------------------------------------

@query(
    "j8_scd2_intervals",
    """
    WITH ch AS (
      SELECT user_id, ts, ROUND(MAX(value), 2) AS attr_value
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY user_id, ts
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           attr_value,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL) AS is_current
    FROM ch
    """,
)
def j8_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — slowly-changing-dimension (type 2) build: turn a keyed
    change stream into validity intervals ``[valid_from, valid_to)``
    with an ``is_current`` flag — the dimension-table twin of the
    reference's audit log (SURVEY S5 records the changes; this
    reconstructs historical state from them). One window per key
    (lead), parallel across keys; ties collapsed by a pre-aggregate
    per (key, ts) so interval edges are deterministic."""
    e = read_table(spark, sf_dir, "events")
    ch = (
        e.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("attr_value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w)
    return ch.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "attr_value",
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# CH1 — order-insensitive table fingerprint (sync verification)
# ---------------------------------------------------------------------------

@query(
    "ch1_sync_fingerprint",
    sales_cte(
        """
        SELECT strftime(sale_date, '%Y-%m') AS month,
               COUNT(*) AS n_rows,
               bit_xor(CAST(('0x' || substr(md5(
                 folio || '|' || CAST(sale_date AS VARCHAR) || '|' ||
                 CAST(CAST(round(monto * 100) AS BIGINT) AS VARCHAR) || '|' || metodo
               ), 1, 15)) AS BIGINT)) AS xor_fingerprint,
               CAST(SUM(CAST(round(monto * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM sales
        GROUP BY 1
        """
    ),
)
def ch1_sync_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH1 — per-partition sync fingerprint: row count, XOR of a
    60-bit row digest, and an exact cents total per month. This is how
    a source↔destination sync (the reference's whole purpose) is
    *verified* at 100 TB without moving data: both sides compute the
    same commutative digest independently and compare 1 row per
    partition. XOR makes the digest order-insensitive and
    overflow-free; money is digested in integer cents so float
    formatting can never skew it. Fully map-side partial-aggregated."""
    s = sales_view(spark, sf_dir)
    cents = F.round(F.col("monto") * 100).cast("long")
    row_repr = F.concat_ws(
        "|", F.col("folio"), F.col("sale_date").cast("string"),
        cents.cast("string"), F.col("metodo"),
    )
    h60 = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    prepped = s.select(
        F.date_format("sale_date", "yyyy-MM").alias("month"),
        cents.alias("cents"),
        h60.alias("h60"),
    )
    return prepped.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h60)").alias("xor_fingerprint"),
        F.sum("cents").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# SK1 — salted aggregation over a hot key
# ---------------------------------------------------------------------------

@query(
    "sk1_salted_hot_key_agg",
    """
    SELECT event_type, COUNT(*) AS value_count, ROUND(SUM(value), 2) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def sk1_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SK1 — two-phase salted aggregation on a pathologically-hot key
    (event_type has a handful of values, so a plain groupBy funnels
    the whole table into ≤|types| reducers). The salted form
    (operators/skew.py) pre-aggregates on (key, salt) across 16
    reducers per key, then combines partials — same algebra, even
    load. The oracle is the plain GROUP BY: salting must be
    semantics-free. The reference's analog is its per-method routing:
    4 payment methods = 4 hot keys at 100 TB."""
    from .operators.skew import salted_agg

    e = read_table(spark, sf_dir, "events")
    out = salted_agg(
        e.select("event_type", "value"),
        key_cols=["event_type"],
        aggs=[("value", "count"), ("value", "sum")],
        num_salts=16,
    )
    return out.select(
        "event_type", "value_count", F.round("value_sum", 2).alias("value_sum")
    )


# ---------------------------------------------------------------------------
# EV2 — retention cohorts
# ---------------------------------------------------------------------------

@query(
    "ev2_retention_cohorts",
    """
    WITH fm AS (
      SELECT user_id, strftime(MIN(ts), '%Y-%m-%d') AS cohort_day FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS activity_day FROM events
    )
    SELECT fm.cohort_day, act.activity_day, COUNT(*) AS n_users
    FROM act JOIN fm USING (user_id)
    GROUP BY fm.cohort_day, act.activity_day
    """,
)
def ev2_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV2 — retention cohort matrix: users bucketed by first-seen
    day, counted in every day they remain active — the classic
    warehouse triangle report. Two hash aggregates + one join on
    user_id; the cohort dimension (1 row/user) broadcasts against the
    distinct-activity set, and both aggregates partial map-side. The
    reference's analog is its per-client first-appearance in the
    folio maps (SURVEY S2)."""
    e = read_table(spark, sf_dir, "events")
    fm = e.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("cohort_day")
    )
    act = e.select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("activity_day")
    ).distinct()
    return (
        act.join(fm, "user_id")
        .groupBy("cohort_day", "activity_day")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# W2 — inter-arrival gaps (lag window)
# ---------------------------------------------------------------------------

@query(
    "w2_interarrival_gaps",
    """
    WITH e AS (
      SELECT user_id, ts, ROUND(MAX(value), 2) AS value
      FROM events GROUP BY user_id, ts
    ),
    g AS (
      SELECT user_id, ts,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_us
      FROM e
    )
    SELECT user_id, COUNT(*) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def w2_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — per-user inter-arrival gap statistics via lag(): the
    session/health signal behind bot detection and engagement scoring
    (and the window-family member — lag — the other queries don't
    exercise). Ties collapsed per (user, ts) first; gaps computed in
    whole seconds from the epoch so both engines aggregate exact
    integers. One window + one aggregate, both partitioned by user."""
    e = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    g = e.select("user_id", "ts", gap.alias("gap_us")).where(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
    )


# ---------------------------------------------------------------------------
# A9 — sketch calibration (HLL approx distinct vs exact)
# ---------------------------------------------------------------------------

def a9_calibration_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full HLL++ calibration frame (exact, approx, rel_error) — the
    approx values are engine-specific, so this detail view backs the
    pytest bound assertion (tests/test_warehouse.py), not the driver
    oracle. rsd is pinned at 0.01 (Spark's default is 0.05) so the
    5% within_bound contract is a 5-sigma bound, not a one-sigma
    coin-flip on regenerated data."""
    e = read_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.01)
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        approx.alias("approx_users"),
        F.round(
            F.abs(approx - F.count_distinct("user_id"))
            / F.count_distinct("user_id"),
            4,
        ).alias("rel_error"),
    )


@query(
    "a9_approx_distinct_calibration",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def a9_approx_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — HyperLogLog++ calibration: approx_count_distinct vs the
    exact distinct count per event_type. At 100 TB the sketch is THE
    way to count distinct folios/users — it partial-aggregates
    map-side into a fixed-size register set, where exact distinct must
    shuffle every distinct value. The HLL estimate itself is
    engine-specific, so the driver-checkable contract is (exact count,
    Spark-computed ``within_bound`` = estimate within 5% of exact,
    with the sketch rsd pinned to 1% so the bound is ~5 standard
    deviations); the oracle asserts the exact counts and expects
    ``within_bound`` TRUE everywhere. Raw estimates:
    ``a9_calibration_detail`` (pytest)."""
    return a9_calibration_detail(spark, sf_dir).select(
        "event_type",
        "exact_users",
        (F.col("rel_error") <= 0.05).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# A10 — quantile-sketch calibration (approx_percentile vs exact)
# ---------------------------------------------------------------------------

def a10_calibration_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full GK-sketch calibration frame (exact, approx, rel errors) —
    backs the pytest bound assertion; approx values are
    engine-specific so they stay out of the driver oracle."""
    e = read_table(spark, sf_dir, "events")
    exact = F.expr("percentile(value, array(0.5, 0.95))")
    approx = F.expr("approx_percentile(value, array(0.5, 0.95), 1000)")
    return e.groupBy("event_type").agg(
        F.round(exact[0], 2).alias("exact_p50"),
        F.round(approx[0], 2).alias("approx_p50"),
        F.round(exact[1], 2).alias("exact_p95"),
        F.round(approx[1], 2).alias("approx_p95"),
        F.round(F.abs(approx[0] - exact[0]) / F.abs(exact[0]), 4).alias("rel_err_p50"),
        F.round(F.abs(approx[1] - exact[1]) / F.abs(exact[1]), 4).alias("rel_err_p95"),
    )


@query(
    "a10_approx_percentile_calibration",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 2) AS exact_p50,
           ROUND(quantile_cont(value, 0.95), 2) AS exact_p95,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def a10_approx_percentile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — quantile-sketch calibration, the companion of A9 for the
    other sketch every 100 TB pipeline needs: approx_percentile
    (Greenwald-Khanna, mergeable partials — fixed-size state
    map-side) against the exact per-group median/p95. Exact
    percentiles need a full sort per group; the sketch reads the same
    scan once and ships bounded state. The sketch output is
    engine-specific, so the driver contract is (exact p50/p95 —
    Spark ``percentile`` ≡ DuckDB ``quantile_cont``, both linear
    interpolation — plus Spark-computed ``within_bound`` = both
    estimates within 5% of exact); the oracle checks the exact values
    and expects TRUE. Raw estimates: ``a10_calibration_detail``."""
    return a10_calibration_detail(spark, sf_dir).select(
        "event_type",
        "exact_p50",
        "exact_p95",
        (
            (F.col("rel_err_p50") <= 0.05) & (F.col("rel_err_p95") <= 0.05)
        ).alias("within_bound"),
    )


@query(
    "a15_cms_frequency_calibration",
    """
    WITH pk AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
    )
    SELECT user_id, exact_n, TRUE AS overestimates, TRUE AS within_bound
    FROM pk ORDER BY exact_n DESC, user_id LIMIT 10
    """,
)
def a15_cms_frequency_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — count-min sketch calibration: the FREQUENCY sketch
    completing the trio with A9 (distinct, HLL) and A10 (quantiles,
    GK) — heavy-hitter queries ("which users/domains dominate the
    corpus") without materializing the full per-key table. The sketch
    is d=4 hash rows × w=256 counters; an update adds the key's count
    to one counter per row, an estimate is the MIN over the key's d
    counters. Counters are linear, so partial aggregation composes
    freely and sketches from different partitions/days merge by
    cell-wise addition (the a12 property, for frequencies).

    The estimate is hash-layout-specific, so the driver contract is
    the a9 device: exact counts of the top-10 heaviest keys
    (deterministic tiebreak on key) plus two Spark-verified flags —
    ``overestimates`` (CMS can never undercount: every counter the key
    touches contains its full count) and ``within_bound``
    (est ≤ exact + 8·⌈(e/w)·N⌉) — which the oracle expects TRUE
    everywhere. The slack is deliberately 8× the classic ε·N bound:
    the 1× bound is only PROBABILISTIC (per key it fails with
    ~e⁻⁴ ≈ 1.8% at d=4 — ~17% that at least one of 10 keys trips on
    a fresh dataset/hash layout), so a hardcoded-TRUE oracle over it
    would be fixture-dependent. At 8× the per-row Markov bound gives
    P[fail] ≤ (1/8e)⁴ ≈ 4.5e-6 per key (~5e-5 across the 10), so the
    flag is a stable engine contract while still certifying the
    estimate lands within a small constant factor of ε·N.

    Scale shape: one per-key aggregate (the thing being sketched —
    kept here because the calibration needs exact truth), a 1024-cell
    sketch built by bounded ×4 fan-out of the KEY table (not the
    facts), a broadcast join of the tiny sketch back onto keys, and
    top-k via sort+limit = per-partition heaps + driver merge
    (TakeOrderedAndProject), NOT a global window. In production the
    exact per-key truth drops out and the facts update the sketch
    directly map-side."""
    e = read_table(spark, sf_dir, "events")
    d_rows, width = 4, 256
    pk = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    keyed = pk.select(
        "user_id",
        "exact_n",
        F.explode(F.array(*[F.lit(j) for j in range(d_rows)])).alias("seed"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("user_id"), F.col("seed")), F.lit(width))
    )
    sketch = keyed.groupBy("seed", "bucket").agg(F.sum("exact_n").alias("cell"))
    est = (
        keyed.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
    )
    total = e.agg(F.count(F.lit(1)).alias("n_total"))
    eps_slack = 8 * F.ceil(F.lit(2.718281828) / width * F.col("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "exact_n",
            (F.col("cms_est") >= F.col("exact_n")).alias("overestimates"),
            (F.col("cms_est") <= F.col("exact_n") + eps_slack).alias("within_bound"),
        )
        .orderBy(F.col("exact_n").desc(), F.col("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A12 — mergeable-sketch rollup (incremental COUNT DISTINCT maintenance)
# ---------------------------------------------------------------------------

@query(
    "a12_sketch_merge_rollup",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def a12_sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — sketch MERGEABILITY, the property a9 doesn't exercise and
    the one that matters most at 100 TB: per-day HLL sketches
    (Datasketches ``hll_sketch_agg``, lgK 14 → ~16 KB each) are built
    once as the stored incremental state, and the monthly distinct
    estimate per event_type comes from ``hll_union_agg`` over ~30
    daily sketch rows —
    t7's incremental-view maintenance applied to COUNT DISTINCT,
    which unlike SUM is not algebraic and can ONLY be maintained
    incrementally through a mergeable sketch. In production the daily
    sketch table is appended per ingest batch and the events scan
    never re-runs; the exact side here exists purely as calibration.
    The estimate is engine-specific, so the driver contract is a9's:
    (exact count, Spark-computed ``within_bound`` = merged estimate
    within 5% of exact — ~25 standard errors at lgK 14), oracle
    expects TRUE everywhere."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users") <= 0.05
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# EV3 — daily conversion funnel
# ---------------------------------------------------------------------------

@query(
    "ev3_conversion_funnel",
    """
    WITH c AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS d, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS d, MAX(ts) AS last_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.d AS day,
           COUNT(*) AS n_clicked,
           COUNT(p.user_id) AS n_purchased,
           COUNT(CASE WHEN p.user_id IS NOT NULL
                       AND c.first_click <= p.last_purchase THEN 1 END) AS n_converted,
           ROUND(COUNT(CASE WHEN p.user_id IS NOT NULL
                             AND c.first_click <= p.last_purchase THEN 1 END)
                 / COUNT(*), 4) AS conv_rate
    FROM c LEFT JOIN p ON c.user_id = p.user_id AND c.d = p.d
    GROUP BY c.d
    """,
)
def ev3_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV3 — daily click→purchase funnel: per day, users who clicked,
    users who purchased, and users who converted (first click at or
    before their last purchase that day), with the conversion rate.
    Both step tables pre-aggregate per (user, day) — so the funnel
    join is keyed on already-reduced rows (|users|·|days|, not
    |events|) and every aggregate partial-applies map-side."""
    e = read_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    c = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", day.alias("d"))
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", day.alias("d"))
        .agg(F.max("ts").alias("last_purchase"))
    )
    j = c.join(p, ["user_id", "d"], "left")
    converted = F.count(
        F.when(
            F.col("last_purchase").isNotNull()
            & (F.col("first_click") <= F.col("last_purchase")),
            1,
        )
    )
    return j.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("n_clicked"),
        F.count("last_purchase").alias("n_purchased"),
        converted.alias("n_converted"),
        F.round(converted / F.count(F.lit(1)), 4).alias("conv_rate"),
    )


# ---------------------------------------------------------------------------
# T7 — incremental aggregate maintenance (materialized-view refresh)
# ---------------------------------------------------------------------------

@query(
    "t7_incremental_agg_maintenance",
    sales_cte(
        """
        SELECT CAST(sale_date AS VARCHAR) AS sale_date_iso, metodo,
               ROUND(SUM(monto), 2) AS total, COUNT(*) AS n
        FROM sales GROUP BY sale_date, metodo
        """
    ),
)
def t7_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — incremental maintenance of the A3 daily-totals
    materialization: when a delta batch arrives, only the (day,
    method) groups the batch touches are recomputed; every other
    group's stored row is reused untouched. This is THE 100 TB refresh
    pattern — the reference re-scans a 10-day lookback window daily
    (Code.gs:22 DIAS_LOOKBACK) for exactly this reason, and at scale
    the affected-keys semi-join prunes the historical scan to the
    touched partitions instead of re-aggregating history.

    Harness: sales split deterministically into historical
    (folio % 10 != 0 — the rows whose aggregate is 'already stored')
    and delta (folio % 10 == 0 — 'new arrivals'); the maintained
    result must equal the full recompute, which is the oracle.
    """
    s = sales_view(spark, sf_dir)
    is_delta = F.col("folio").cast("long") % 10 == 0

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("sale_date", "metodo").agg(
            F.round(F.sum("monto"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )

    historical, delta = s.where(~is_delta), s.where(is_delta)
    materialized = agg(historical)  # at rest: a stored table, not a scan
    affected = delta.select("sale_date", "metodo").distinct().alias("aff")

    # eqNullSafe, not USING: a null-keyed group must match itself, or it
    # would survive the anti-join AND be recomputed — appearing twice.
    def touch_cond(side: DataFrame) -> F.Column:
        return side["sale_date"].eqNullSafe(F.col("aff.sale_date")) & side[
            "metodo"
        ].eqNullSafe(F.col("aff.metodo"))

    m = materialized.alias("m")
    untouched = m.join(F.broadcast(affected), touch_cond(m), "left_anti")
    h = historical.alias("h")
    recomputed = agg(
        h.join(F.broadcast(affected), touch_cond(h), "left_semi").unionByName(delta)
    )
    return untouched.unionByName(recomputed).select(
        F.col("sale_date").cast("string").alias("sale_date_iso"),
        "metodo", "total", "n",
    )


# ---------------------------------------------------------------------------
# SK2 — salted skew join (operators/skew.py::salted_join as a query)
# ---------------------------------------------------------------------------

@query(
    "sk2_salted_join",
    """
    WITH dim AS (
      SELECT event_type, COUNT(*) AS type_total FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           MAX(d.type_total) AS type_total
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def sk2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SK2 — the salted-join skew mitigation as a driver query: events
    (probe side — 5 event types over ~millions of rows is exactly the
    hot-key shape that stalls a plain shuffle join on one task) joined
    to a per-type dim through operators/skew.salted_join, which
    spreads each hot key over num_salts tasks by replicating the
    build side. Results must be IDENTICAL to a plain join — the
    oracle is the unsalted SQL join. Money summed in integer cents so
    cross-engine float summation order can't flip the hash."""
    from .operators.skew import salted_join

    e = read_table(spark, sf_dir, "events").select("event_type", "value")
    dim = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
    joined = salted_join(e, dim, key="event_type", num_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("total_cents"),
        F.max("type_total").alias("type_total"),
    )


# ---------------------------------------------------------------------------
# J9 — blocked fuzzy match (record linkage with edit distance)
# ---------------------------------------------------------------------------

@query(
    "j9_fuzzy_match",
    """
    WITH canon AS (
      SELECT DISTINCT p_name AS canon_name FROM part
    ),
    dirty AS (
      SELECT p_partkey AS dirty_key, substr(p_name, 2) AS dirty_name
      FROM part WHERE p_partkey % 7 < 2
    ),
    cands AS (
      SELECT d.dirty_key, c.canon_name,
             levenshtein(d.dirty_name, c.canon_name) AS distance
      FROM dirty d JOIN canon c
        ON abs(length(d.dirty_name) - length(c.canon_name)) <= 2
      WHERE levenshtein(d.dirty_name, c.canon_name) <= 2
    )
    SELECT dirty_key, canon_name, distance FROM (
      SELECT *, row_number() OVER (PARTITION BY dirty_key
                                   ORDER BY distance ASC, canon_name ASC) AS r
      FROM cands) WHERE r = 1
    """,
)
def j9_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — fuzzy record linkage against a canonical catalog, the
    generalization of the reference's tolerant bank-row matching
    (Code.gs:1518-1560 matches on normalized folio + fecha±1): a
    corrupted name (first character dropped — a deterministic,
    SQL-reproducible 'typo') is re-linked to its canonical form by
    edit distance, rank-1 per dirty row.

    Scale shape: the catalog (DISTINCT names — merchant/product
    vocabularies are small even when the fact table is 100 TB) is
    BROADCAST, so the fact side never shuffles; a length-difference
    bound (|len(a)-len(b)| ≤ k is implied by levenshtein ≤ k) prunes
    pairs before the O(len²) scorer runs; ``levenshtein`` is a JVM
    builtin so the whole thing is codegen'd, no Python. If the catalog
    itself were huge, the escalation is q-gram/LSH blocking — the dd3
    prefilter pattern — in place of the broadcast."""
    part = read_table(spark, sf_dir, "part")
    canon = part.select(F.col("p_name").alias("canon_name")).distinct()
    dirty = part.where(F.col("p_partkey") % 7 < 2).select(
        F.col("p_partkey").alias("dirty_key"),
        F.expr("substr(p_name, 2)").alias("dirty_name"),
    )
    cand = (
        dirty.join(
            F.broadcast(canon),
            F.abs(F.length("dirty_name") - F.length("canon_name")) <= 2,
        )
        .withColumn("distance", F.levenshtein("dirty_name", "canon_name"))
        .where(F.col("distance") <= 2)
        .select("dirty_key", "canon_name", "distance")
    )
    w = Window.partitionBy("dirty_key").orderBy(
        F.col("distance").asc(), F.col("canon_name").asc()
    )
    return (
        cand.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .drop("r")
    )


# ---------------------------------------------------------------------------
# ML3 — closed-form grouped linear regression (exact-sum OLS)
# ---------------------------------------------------------------------------

@query(
    "ml3_linear_regression",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS slope,
           ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / n, 2) AS intercept,
           ROUND(POWER(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM s
    """,
)
def ml3_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3 — per-group ordinary least squares (price ~ quantity per
    return flag) in closed form from sufficient statistics. The moment
    sums are accumulated in DECIMAL so they are EXACT — shuffle/merge
    order cannot perturb them — and only the final slope/intercept/r²
    divisions run in float, making the result bit-stable across
    engines and cluster sizes. This is the distributed-ML pattern:
    one aggregation pass, O(groups) driver math, no iteration."""
    li = read_table(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(18,2)")
    yd = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy, syy = (F.col(c).cast("double") for c in ("sxx", "sxy", "syy"))
    cov_n, var_n = n * sxy - sx * sy, n * sxx - sx * sx
    slope = cov_n / var_n
    return s.select(
        "l_returnflag", "n",
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 2).alias("intercept"),
        F.round(F.pow(cov_n, F.lit(2)) / (var_n * (n * syy - sy * sy)), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# B1 — bucketed co-located join (shuffle-free keyed join at rest)
# ---------------------------------------------------------------------------

#: applicationId -> the sf_dir whose data the b1_* tables currently
#: hold in THIS session (same per-session idempotence the
#: _STAGED_DIRS/_STREAM_SINKS staging helpers use — nothing persists
#: across bench invocations). Keyed on the VALUE, not a seen-set,
#: because the table names are fixed: a call with a different sf_dir
#: must rebuild, and switching back must rebuild again.
_B1_BUILT: dict[str, str] = {}


def _b1_table_names(app_id: str) -> tuple[str, str]:
    """Per-process catalog names for b1's bucketed tables. The suffix
    is derived from the applicationId so concurrent processes sharing
    one spark-warehouse directory build and read DISJOINT tables
    instead of clobbering each other's live parquet parts."""
    import hashlib

    suffix = hashlib.md5(app_id.encode()).hexdigest()[:8]
    return f"b1_orders_{suffix}", f"b1_customer_{suffix}"


def _gc_stale_b1_dir(p, live_names: tuple[str, str], cutoff: float) -> None:
    import shutil

    if p.name in live_names:
        return
    try:
        if p.stat().st_mtime < cutoff:
            shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


@query(
    "b1_bucketed_join",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — the 100 TB keyed-join layout: both sides written
    ``bucketBy(custkey)`` so the join is co-located and NEITHER side
    shuffles (tests/test_bucketing.py pins the no-Exchange plan; this
    query makes the layout driver-verified end-to-end). The ``merge``
    hint forces the sort-merge path so the bucketed layout — not a
    broadcast — is what's exercised even at driver scale. Results
    must equal the plain join, which is the oracle.

    The bucketed tables are (re)built once per (session, sf_dir) —
    the at-rest-layout analog of the jl1/csv1 staged dirs: the
    production shape is a join against tables ALREADY bucketed on
    disk, so rebuilding them on every call (every bench rep paid two
    table writes) measured the write, not the co-located join. Table
    names carry a per-process suffix: two processes sharing one
    spark-warehouse (driver + a probe, two bench runs) must not
    overwrite each other's live tables — a fixed name let process B's
    rebuild delete parquet parts process A had already planned a scan
    over (FileNotFoundException mid-join; observed when the full test
    suite ran concurrently with a bench probe). Dead sessions' dirs
    are garbage-collected opportunistically once they are a day old."""
    import pathlib
    import shutil
    import time as _time
    from urllib.parse import urlparse

    app_id = spark.sparkContext.applicationId
    names = _b1_table_names(app_id)
    if _B1_BUILT.get(app_id) != sf_dir:
        orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
        for name, df, key in [(names[0], orders, "o_custkey"), (names[1], cust, "c_custkey")]:
            # a stale location can outlive the in-memory catalog (previous
            # session/crash) — clear both so the rebuild is idempotent
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(pathlib.Path(warehouse) / name, ignore_errors=True)
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        # GC sibling b1_* dirs from sessions long gone (>1 day): only
        # age-gated removal is safe — a fresh dir may belong to a LIVE
        # concurrent process
        cutoff = _time.time() - 24 * 3600
        for p in pathlib.Path(warehouse).glob("b1_orders_*"):
            _gc_stale_b1_dir(p, names, cutoff)
        for p in pathlib.Path(warehouse).glob("b1_customer_*"):
            _gc_stale_b1_dir(p, names, cutoff)
        _B1_BUILT[app_id] = sf_dir
    o, c = spark.table(names[0]).hint("merge"), spark.table(names[1]).hint("merge")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# W3 — robust outlier detection (median / MAD, two-pass)
# ---------------------------------------------------------------------------

@query(
    "w3_robust_outliers",
    sales_cte(
        """
        , med AS (
          SELECT metodo, quantile_cont(monto, 0.5) AS med
          FROM sales GROUP BY metodo
        ), dev AS (
          SELECT s.metodo, abs(s.monto - m.med) AS adev, m.med
          FROM sales s JOIN med m USING (metodo)
        ), mad AS (
          SELECT metodo, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY metodo
        )
        SELECT s.metodo,
               COUNT(*) AS n,
               ROUND(MAX(m.med), 2) AS median_monto,
               ROUND(MAX(m.mad), 2) AS mad_monto,
               CAST(COUNT(*) FILTER (abs(s.monto - m.med) > 3 * m.mad) AS BIGINT) AS n_outliers
        FROM sales s JOIN mad m USING (metodo)
        GROUP BY s.metodo
        """
    ),
)
def w3_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — robust anomaly detection on payment amounts: per method,
    exact median and MAD (median absolute deviation), then count rows
    beyond 3 MAD — the outlier screen a reconciliation pipeline runs
    before trusting bank totals (mean/stddev would be dragged by the
    very outliers it hunts).

    Shape: two aggregation passes (median, then MAD over deviations)
    with the tiny per-method stats table broadcast back between them —
    the facts never shuffle for the stats join. Exact interpolated
    percentiles demand a per-group sort, fine for grouped data; the
    100 TB whole-corpus variant swaps in approx_percentile, whose
    error a10 calibrates against this exact path."""
    s = sales_view(spark, sf_dir).select("metodo", "monto")
    med = s.groupBy("metodo").agg(F.percentile("monto", F.lit(0.5)).alias("med"))
    dev = s.join(F.broadcast(med), "metodo").select(
        "metodo", "monto", "med", F.abs(F.col("monto") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("metodo").agg(
        F.max("med").alias("med"), F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        s.join(F.broadcast(mad), "metodo")
        .groupBy("metodo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 2).alias("median_monto"),
            F.round(F.max("mad"), 2).alias("mad_monto"),
            F.sum(
                (F.abs(F.col("monto") - F.col("med")) > 3 * F.col("mad")).cast("long")
            ).cast("long").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# T8 — snapshot time travel (versioned table reads)
# ---------------------------------------------------------------------------

#: per-(applicationId, sf_dir) memo of t8 warehouse roots; the
#: versioned snapshots ARE the payload being tested.
_T8_ROOTS: dict[tuple, str] = {}

#: bump when the fixture's contents change (transform, snapshot
#: layout): the on-disk path is versioned, so a stale machine-level
#: fixture can never serve a newer query definition.
_T8_FIXTURE_VERSION = 2


def _t8_fixture_root(spark: SparkSession, sf_dir: str) -> str:
    """Machine-persistent t8 fixture (two committed snapshots of the
    sales table), built at a DETERMINISTIC temp path keyed by
    (sf_dir hash, fixture version) with an atomic rename + completion
    marker. Deterministic-from-testdata, so it is safe to reuse across
    processes — which is the point: the build (two full-table
    rewrites) was the single most load-sensitive moment in the bench
    suite (0.12 s idle vs 2.9 s loaded driver refresh, r9
    adjudication); with the fixture persisted, every bench rep after
    the machine's first run measures only the read path."""
    import hashlib
    import shutil
    import tempfile

    from .sources.warehouse import Warehouse

    key = (spark.sparkContext.applicationId, sf_dir)
    root = _T8_ROOTS.get(key)
    if root is not None:
        return root
    # the tag fingerprints the SOURCE as well as the path: if the
    # testdata is regenerated between rounds, a stale fixture must
    # miss (the oracle recomputes from the live parquet) and rebuild
    # rather than serve yesterday's rows
    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir.rstrip('/')}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = sf_dir.rstrip("/")
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_t8_{tag}_v{_T8_FIXTURE_VERSION}",
    )
    marker = os.path.join(root, "_FIXTURE_COMPLETE")

    def trusted() -> bool:
        """Complete AND ours: a shared-/tmp path is only reused when
        the marker exists and the dir is owned by this uid — a
        foreign pre-planted dir must never be served as fixture data
        (fall through and the build's rename-publish will fail onto
        it loudly rather than silently adopting it)."""
        try:
            return os.path.exists(marker) and os.stat(root).st_uid == os.getuid()
        except OSError:
            return False

    if not trusted():
        # sweep OUR crashed build husks from prior runs (never another
        # live builder's: only husks older than an hour, matched by
        # prefix and uid) — the build dirs are full table copies and
        # nothing else reclaims them
        import time

        tmp = tempfile.gettempdir()
        try:
            for n in os.listdir(tmp):
                p = os.path.join(tmp, n)
                try:
                    if (
                        n.startswith("spark_graft_t8_build_")
                        and os.stat(p).st_uid == os.getuid()
                        and time.time() - os.stat(p).st_mtime > 3600
                    ):
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    continue
        except OSError:
            pass
        build = tempfile.mkdtemp(prefix="spark_graft_t8_build_")
        wh = Warehouse(spark, build)
        s = sales_view(spark, sf_dir).select(
            F.col("sale_date").alias("fecha"),
            "folio", "cliente", "servicio",
            F.lit("BANCO_A").alias("banco"),
            "monto",
            F.lit(None).cast("boolean").alias("conciliado"),
            F.lit(None).cast("string").alias("concepto_banco"),
            F.lit(None).cast("string").alias("observaciones"),
        )
        wh.rewrite("transfers", s.where(F.col("folio").cast("long") % 10 != 0))
        wh.rewrite("transfers", s)
        open(os.path.join(build, "_FIXTURE_COMPLETE"), "w").close()
        if os.path.isdir(root) and not trusted():
            # a markerless husk (crashed earlier build) blocks the
            # publish: rename it ASIDE rather than rmtree — if a
            # racing winner published between our check and this
            # rename, we move their COMPLETE root, not delete it, and
            # our identical build lands in its place (deterministic
            # content, so any reader mid-scan sees the same rows);
            # the aside copy is then ours to discard
            aside = f"{root}.aside.{os.getpid()}"
            try:
                os.rename(root, aside)
                shutil.rmtree(aside, ignore_errors=True)
            except OSError:
                pass  # someone else moved/cleared it first
        try:
            os.rename(build, root)
        except OSError:
            # lost a publish race — the winner's fixture is complete
            # and identical (deterministic build); discard ours
            shutil.rmtree(build, ignore_errors=True)
            if not trusted():
                raise
    _T8_ROOTS[key] = root
    return root


@query(
    "t8_time_travel",
    sales_cte(
        """
        SELECT 'v1' AS version, COUNT(*) AS n_rows,
               CAST(SUM(CAST(round(monto * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               bit_xor(CAST(('0x' || substr(md5(folio), 1, 15)) AS BIGINT)) AS folio_xor
        FROM sales WHERE CAST(folio AS BIGINT) % 10 != 0
        UNION ALL
        SELECT 'v2' AS version, COUNT(*) AS n_rows,
               CAST(SUM(CAST(round(monto * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               bit_xor(CAST(('0x' || substr(md5(folio), 1, 15)) AS BIGINT)) AS folio_xor
        FROM sales
        """
    ),
)
def t8_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 — snapshot-versioned reads (time travel): the warehouse's
    rewrite protocol writes every state as an immutable ``v_*``
    snapshot behind an atomic ``_CURRENT`` pointer, so yesterday's
    table is still addressable after today's merge. Here: v(n-1) =
    the historical rows, v(n) = after the delta batch lands; the query
    reads BOTH through the store (``read_version`` / ``read``) and
    fingerprints each — the oracle recomputes both states from the
    raw source, proving the retained snapshot is byte-faithful, not
    just present. This is the audit/debug primitive ('what did the
    sync see yesterday?') Delta/Iceberg call time travel; the store
    keeps it under the same TableStore protocol. The fixture is
    machine-persistent (``_t8_fixture_root``) so the timed path here
    is reads only."""
    from .sources.warehouse import Warehouse

    root = _t8_fixture_root(spark, sf_dir)
    wh = Warehouse(spark, root)
    versions = wh.history("transfers")
    h60 = F.conv(F.substring(F.md5(F.col("folio")), 1, 15), 16, 10).cast("long")

    def fingerprint(df: DataFrame, label: str) -> DataFrame:
        return df.withColumn("h60", h60).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("monto") * 100).cast("long")).cast("long").alias("total_cents"),
            F.expr("bit_xor(h60)").alias("folio_xor"),
        ).select(F.lit(label).alias("version"), "n_rows", "total_cents", "folio_xor")

    # history = [empty ensure() snapshot, historical, full]
    prior = fingerprint(wh.read_version("transfers", versions[-2]), "v1")
    current = fingerprint(wh.read("transfers"), "v2")
    return prior.unionByName(current)


# ---------------------------------------------------------------------------
# EV4 — batch sessionization (gaps-and-islands over event time)
# ---------------------------------------------------------------------------

def sessionize_events(events: DataFrame, gap: int = 1_800_000_000) -> DataFrame:
    """Core of EV4, factored for handcrafted-input tests: sessionize
    ``(user_id, ts, value)`` rows at silences longer than ``gap``
    microseconds. See ev4_batch_sessionization for the plan-shape
    rationale."""
    e = events.groupBy("user_id", "ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > gap), 1).otherwise(0)
    s = e.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy(
        "user_id", F.col("session_seq").cast("long").alias("session_seq")
    ).agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.sum("n").cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


@query(
    "ev4_batch_sessionization",
    """
    WITH e AS (
      SELECT user_id, ts, COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id, ts
    ), g AS (
      SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(SUM(n) AS BIGINT) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM s GROUP BY user_id, session_seq
    """,
)
def ev4_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV4 — batch sessionization: split each user's event stream into
    sessions at >30-minute silences (gaps-and-islands), then aggregate
    per session — the batch twin of ST2's streaming session windows,
    and the shape every engagement/funnel pipeline needs over a raw
    100 TB event log.

    Shape: ties collapsed per (user, ts), ONE lag window + ONE running
    sum riding the SAME (user, ts-sorted) partitioning — Catalyst
    plans a single Exchange+Sort for both window functions and the
    final per-(user, session) aggregate is partial map-side on top.
    Value totals carried as integer cents so cross-engine summation
    order cannot flip the hash (SURVEY §2.9 T2 rationale)."""
    return sessionize_events(
        read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    )


# ---------------------------------------------------------------------------
# W4 — consecutive-day activity streaks (calendar gaps-and-islands)
# ---------------------------------------------------------------------------

def activity_streaks(days: DataFrame) -> DataFrame:
    """Core of W4, factored for handcrafted-input tests: maximal runs
    of consecutive calendar days per user from ``(user_id, day)``
    rows (need not be distinct)."""
    d = days.distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    r = d.withColumn("island", F.date_sub(F.col("day"), rn))
    return (
        r.groupBy("user_id", "island")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("island")
    )


@query(
    "w4_activity_streaks",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), r AS (
      SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d
    )
    SELECT user_id,
           strftime(MIN(day), '%Y-%m-%d') AS streak_start,
           strftime(MAX(day), '%Y-%m-%d') AS streak_end,
           COUNT(*) AS streak_days
    FROM r GROUP BY user_id, day - CAST(rn AS INTEGER)
    """,
)
def w4_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — consecutive-day activity streaks via the classic
    day-minus-row_number island key: days in an unbroken run share
    ``date_sub(day, rn)``, so one window + one aggregate finds every
    streak without self-joins (the naive LEFT JOIN day-1 formulation
    is a second shuffle of the whole activity set and can't handle
    arbitrary streak lengths in one pass).

    Shape: DISTINCT (user, day) collapses the 100 TB event log to at
    most users×days narrow rows FIRST; the window and aggregate ride
    one (user)-keyed exchange of that collapsed set."""
    return activity_streaks(
        read_table(spark, sf_dir, "events").select(
            "user_id", F.to_date("ts").alias("day")
        )
    )


# ---------------------------------------------------------------------------
# J10 — binned interval join (range join as an equi-join)
# ---------------------------------------------------------------------------

def binned_preceding_join(
    targets: DataFrame,
    sources: DataFrame,
    window_us: int = 600 * 1_000_000,
) -> DataFrame:
    """Core of J10, factored for handcrafted-input tests: for every
    target row ``(err_id, user_id, ets)``, count/last the source rows
    ``(cuser, cts)`` of the same user strictly before it and within
    ``window_us`` microseconds, via bin-replicated equi-join (see
    j10_binned_interval_join for the scale rationale)."""
    # floor, not truncate-toward-zero: a pre-1970 timestamp has negative
    # microseconds, and truncation would fold -1µs and +1µs into bin 0,
    # breaking the same-or-next-bin pairing invariant.
    err = targets.withColumn(
        "bin", F.floor(F.unix_micros("ets") / F.lit(window_us)).cast("long")
    )
    clk = sources.withColumn(
        "cbin0", F.floor(F.unix_micros("cts") / F.lit(window_us)).cast("long")
    ).select(
        "cuser", "cts",
        F.explode(F.array(F.col("cbin0"), F.col("cbin0") + 1)).alias("cbin"),
    )
    j = err.join(
        clk,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("bin") == F.col("cbin"))
        & (F.col("cts") < F.col("ets"))
        & (F.unix_micros("cts") >= F.unix_micros("ets") - F.lit(window_us)),
        "left",
    )
    return j.groupBy("err_id", "user_id", "ets").agg(
        F.count("cts").alias("n_clicks_10m"),
        F.date_format(F.max("cts"), "yyyy-MM-dd HH:mm:ss").alias("last_click"),
    ).select(
        "err_id", "user_id",
        F.date_format("ets", "yyyy-MM-dd HH:mm:ss").alias("err_ts"),
        "n_clicks_10m", "last_click",
    )


@query(
    "j10_binned_interval_join",
    """
    WITH err AS (
      SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error'
    ), clk AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    )
    SELECT e.err_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
           COUNT(c.cts) AS n_clicks_10m,
           strftime(MAX(c.cts), '%Y-%m-%d %H:%M:%S') AS last_click
    FROM err e LEFT JOIN clk c
      ON c.user_id = e.user_id
     AND c.cts < e.ts
     AND c.cts >= e.ts - INTERVAL 10 MINUTE
    GROUP BY e.err_id, e.user_id, e.ts
    """,
)
def j10_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — interval join at scale: for every error event, the click
    activity of the same user in the preceding 10 minutes (the
    "what led up to this failure" query). A naive time-range join is
    an inequality predicate — Spark would fall back to
    broadcast-nested-loop (quadratic per user at 100 TB). Instead the
    time axis is BINNED at the window width: each error keys to its
    own 10-minute bin, each click is replicated to its bin and the
    next (a click can only precede an error in the same or the next
    bin), and the join becomes a plain equi-join on
    ``(user_id, bin)`` — one bounded-fanout shuffle — with the exact
    range predicate applied as a post-filter in the join condition.
    Every qualifying (error, click) pair lands in exactly one bin
    replica, so no dedup pass is needed. Same trick as the salted
    skew join (sk2): restructure the key space so the shuffle does
    the work. Left join keeps zero-click errors (COUNT over the null
    side = 0), matching the oracle's LEFT JOIN. Column names are kept
    distinct across the two sides (one events scan feeds both — a
    self-join) so no ambiguous attribute refs exist."""
    e = read_table(spark, sf_dir, "events")
    err = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("ets")
    )
    clk = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"), F.col("ts").alias("cts")
    )
    return binned_preceding_join(err, clk)


@query(
    "j11_interval_overlap_join",
    """
    WITH a AS (
      SELECT event_id AS err_id, user_id,
             epoch_us(ts) AS a_s, epoch_us(ts) + 1800000000 AS a_e
      FROM events WHERE event_type = 'error'
    ), b AS (
      SELECT event_id AS pur_id, user_id,
             epoch_us(ts) - 600000000 AS b_s, epoch_us(ts) + 600000000 AS b_e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.err_id, b.pur_id,
           CAST(least(a.a_e, b.b_e) - greatest(a.a_s, b.b_s) AS BIGINT) AS overlap_us
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.a_s <= b.b_e AND b.b_s <= a.a_e
    """,
)
def j11_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 — interval OVERLAP join: error-impact windows ([ts, ts+30m]
    per error) intersected with purchase-attribution windows
    ([ts−10m, ts+10m] per purchase) of the same user — "which
    purchases were exposed to an active incident". j10's
    point-in-preceding-window is a special case; generic overlap is
    the harder shape (session × outage, ad × visit).

    Scale rationale: the naive predicate is two inequalities — a
    broadcast-nested-loop at 100 TB. Binning the time axis at
    W = 30 min (≥ the longest interval on EITHER side, so every
    interval touches ≤ 2 bins) turns it into an equi-join on
    ``(user_id, bin)`` with bounded ≤2× replication of both sides and
    the exact overlap test as a residual. Dedup is algebraic, not a
    distinct pass: a pair is emitted only in the bin containing the
    overlap's left edge ``max(a_start, b_start)`` — a bin both sides'
    replicas provably cover — so each qualifying pair lands exactly
    once. Bins use FLOOR (not cast-truncation), keeping pre-1970
    timestamps in the right bin."""
    w_us = 30 * 60 * 1_000_000
    e = read_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.unix_micros("ts").alias("a_s"),
        (F.unix_micros("ts") + F.lit(w_us)).alias("a_e"),
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"),
        F.col("user_id").alias("b_user"),
        (F.unix_micros("ts") - F.lit(600_000_000)).alias("b_s"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("b_e"),
    )

    def binned(df: DataFrame, s: str, e_: str) -> DataFrame:
        lo = F.floor(F.col(s) / F.lit(w_us)).cast("long")
        hi = F.floor(F.col(e_) / F.lit(w_us)).cast("long")
        return df.withColumn("bin", F.explode(F.array_distinct(F.array(lo, hi))))

    ab = binned(a, "a_s", "a_e")
    bb = binned(b, "b_s", "b_e").withColumnRenamed("bin", "b_bin")
    left_edge_bin = F.floor(
        F.greatest(F.col("a_s"), F.col("b_s")) / F.lit(w_us)
    ).cast("long")
    j = ab.join(
        bb,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("bin") == F.col("b_bin"))
        & (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        & (F.col("bin") == left_edge_bin),
    )
    return j.select(
        "user_id",
        "err_id",
        "pur_id",
        (
            F.least(F.col("a_e"), F.col("b_e"))
            - F.greatest(F.col("a_s"), F.col("b_s"))
        ).alias("overlap_us"),
    )


# ---------------------------------------------------------------------------
# T9 — merge-on-read CDC view (base snapshot + delta log, no base rewrite)
# ---------------------------------------------------------------------------

def merge_on_read(base: DataFrame, delta: DataFrame, key: str, seq: str, op: str) -> DataFrame:
    """Core of T9: resolve a base snapshot against an append-only
    delta log WITHOUT rewriting the base. Latest delta per key wins
    (``row_number`` over the delta log only — the log is batch-sized,
    the base is the 100 TB side); base rows with any delta are
    anti-joined out on the key (the delta key set broadcasts); 'D'
    tombstones emit nothing. Payload columns = base columns.

    Ties at the same sequence number resolve deterministically:
    tombstone beats update beats insert (the safe direction), and
    same-seq same-op rows order by a payload hash so the winner never
    depends on partitioning. A well-formed CDC log has unique seqs
    per key; the tiebreak keeps malformed input reproducible.

    The resolved-latest frame feeds BOTH outputs (survivor rows and the
    anti-join's broadcast key set), so Spark executes the delta subtree
    twice per run — keep the delta cheap (a single-scan log, not a
    multi-branch union; r13 measured staging it with a run-scoped
    persist as no better once the subtree is one scan)."""
    cols = base.columns
    op_rank = (
        F.when(F.col(op) == "D", 3).when(F.col(op) == "U", 2).otherwise(1)
    )
    w = Window.partitionBy(key).orderBy(
        F.col(seq).desc(), op_rank.desc(), F.xxhash64(*cols).asc()
    )
    latest = (
        delta.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.where(F.col(op) != "D").select(*cols)
    untouched = base.join(
        F.broadcast(latest.select(key)), key, "left_anti"
    )
    return untouched.unionByName(survivors)


@query(
    "t9_merge_on_read",
    sales_cte(
        """
        SELECT metodo,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(round(
                 CASE WHEN CAST(folio AS BIGINT) % 7 = 0 THEN monto + 5 ELSE monto END
                 * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               bit_xor(CAST(('0x' || substr(md5(folio), 1, 15)) AS BIGINT)) AS folio_xor
        FROM sales
        WHERE CAST(folio AS BIGINT) % 13 != 0
        GROUP BY metodo
        """
    ),
)
def t9_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 — merge-on-read: the write path appends CDC deltas to a log
    and the READ resolves them against the base snapshot, so a 100 TB
    base is never rewritten per batch (rewrite amortizes into an
    occasional compaction — which is exactly ``Warehouse.rewrite``,
    t8's path). Deltas here are derived deterministically from the
    corpus so the oracle can state the closed-form final table:
    folio%10==0 rows are withheld from the base and re-INSERTed,
    folio%7==0 get a superseded-then-final UPDATE chain (seq 1 then
    2 — proving latest-wins, not any-wins), folio%13==0 get a DELETE
    tombstone at seq 3 (proving tombstones beat earlier updates).

    Scale shape: the only window runs over the batch-sized delta log;
    the base-side anti-join broadcasts the delta key set; the base
    never shuffles and is never read twice. The final aggregate is
    the proof fingerprint, not part of the pattern."""
    s = sales_view(spark, sf_dir)
    fol = F.col("folio").cast("long")
    base = s.where(fol % 10 != 0).select("folio", "metodo", "monto")
    # CDC log: op, seq, payload — all derived from the corpus. ONE pass
    # over the source emits every delta row via explode (a row matching
    # several mod-conditions emits each of its ops), instead of four
    # separately-planned scan+filter branches unioned together (r13,
    # guide §2.4: the union form re-read and re-parsed the sales view
    # four times per delta evaluation). Row multiset identical by
    # construction: per source row, the same (op, seq, monto) tuples.
    mk = lambda monto, op, seq: F.struct(
        monto.alias("monto"), F.lit(op).alias("op"), F.lit(seq).alias("seq")
    )
    empty = F.array().cast("array<struct<monto:double,op:string,seq:int>>")
    ops = F.concat(
        F.when(fol % 10 == 0, F.array(mk(F.col("monto"), "I", 1))).otherwise(empty),
        F.when(
            fol % 7 == 0,
            F.array(
                mk(F.col("monto") + 999, "U", 1),  # must be superseded
                mk(F.col("monto") + 5, "U", 2),
            ),
        ).otherwise(empty),
        F.when(fol % 13 == 0, F.array(mk(F.col("monto"), "D", 3))).otherwise(empty),
    )
    delta = (
        s.where((fol % 10 == 0) | (fol % 7 == 0) | (fol % 13 == 0))
        .select("folio", "metodo", F.explode(ops).alias("_d"))
        .select("folio", "metodo", "_d.monto", "_d.op", "_d.seq")
    )
    resolved = merge_on_read(base, delta, key="folio", seq="seq", op="op")
    h60 = F.conv(F.substring(F.md5(F.col("folio")), 1, 15), 16, 10).cast("long")
    return (
        resolved.withColumn("h60", h60)
        .groupBy("metodo")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("monto") * 100).cast("long")).cast("long").alias("total_cents"),
            F.expr("bit_xor(h60)").alias("folio_xor"),
        )
    )


# ---------------------------------------------------------------------------
# W5 — cumulative distinct users (running distinct via first-seen)
# ---------------------------------------------------------------------------

@query(
    "w5_cumulative_unique_users",
    """
    WITH act AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    daily AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM act GROUP BY day
    ),
    fs AS (
      SELECT user_id, MIN(day) AS first_day FROM act GROUP BY user_id
    ),
    newu AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY first_day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           d.dau,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (
             ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily d LEFT JOIN newu n USING (day)
    """,
)
def w5_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — the growth-dashboard primitive: per day, active users
    (DAU), first-time users, and the CUMULATIVE distinct-user count.
    The naive running distinct (COUNT(DISTINCT) over an expanding
    window) cannot partial-aggregate — every day would re-scan all
    history. The scalable identity: cumulative distinct at day d =
    running SUM of first-seen counts ≤ d, so the whole curve costs
    one per-user MIN, one tiny per-day aggregate, and a running sum
    over the (small) day axis — each partial-aggregating map-side;
    the single-partition window runs over one row per day, never per
    event. ev2's cohort matrix shares the first-seen building block;
    this query is its cumulative-curve complement."""
    act = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = act.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    newu = (
        act.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(newu, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w).cast("long"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "new_users", "cumulative_users",
        )
    )


# ---------------------------------------------------------------------------
# W6 — rolling 7-day distinct users (bounded replication, no range join)
# ---------------------------------------------------------------------------

@query(
    "w6_rolling_distinct_users",
    """
    WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM daily),
    expanded AS (
      SELECT day + CAST(i AS INTEGER) AS anchor, user_id
      FROM daily, UNNEST(range(0, 7)) AS t(i)
    ),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM daily GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS rolling_7d_users
    FROM days d
    JOIN expanded e ON e.anchor = d.day
    JOIN dau ON dau.day = d.day
    GROUP BY d.day, dau.dau
    """,
)
def w6_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — rolling 7-day distinct users per day, the growth-dashboard
    primitive COUNT DISTINCT windows can't express (distinct is not
    algebraic over sliding frames). Scale shape: collapse events to
    day-grain DISTINCT (day, user) pairs FIRST (the only events-sized
    shuffle), then replicate each pair to the ≤7 anchor days it
    contributes to — a bounded ×7 fan-out equi-aggregated on anchor,
    instead of the range join (nested-loop at scale) or a per-day
    re-scan of 7 days of raw events. Anchors past the observed day
    range drop out via the semi-join with the day list. When 7×
    replication of the day grain is still too much (billions of DAU),
    a12's mergeable HLL sketches are the approximate path: union 7
    daily sketches per anchor."""
    e = read_table(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = daily.select("day").distinct()
    expanded = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "user_id"
    ).select(F.expr("date_add(day, i)").alias("anchor"), "user_id")
    dau = daily.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    rolling = (
        days.join(expanded, days["day"] == expanded["anchor"])
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("rolling_7d_users"))
    )
    return (
        rolling.join(dau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "rolling_7d_users",
        )
    )


# ---------------------------------------------------------------------------
# A13 — rolling distinct via sketch union (w6's scale path, calibrated)
# ---------------------------------------------------------------------------

@query(
    "a13_rolling_sketch_users",
    """
    WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM daily),
    expanded AS (
      SELECT day AS src_day, day + CAST(i AS INTEGER) AS anchor, user_id
      FROM daily, UNNEST(range(0, 7)) AS t(i)
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT e.src_day) AS BIGINT) AS n_days_in_window,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_rolling_users,
           TRUE AS within_bound
    FROM days d JOIN expanded e ON e.anchor = d.day
    GROUP BY d.day
    """,
)
def a13_rolling_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — w6's sliding distinct at the scale where even the
    day-grain replication is too much: ONE fixed-size HLL sketch per
    day is the stored state, and each anchor's rolling estimate is
    ``hll_union_agg`` over its ≤7 daily sketches — kilobytes moved
    per anchor regardless of DAU, the sketch-union form of sliding
    COUNT DISTINCT (a12's mergeability applied along the time axis;
    in production the daily sketch table is what the ingest job
    appends, and this query never touches raw events). Contract is
    the a9/a12 calibration shape: exact rolling count (computed
    w6's way) + Spark-verified ``within_bound`` (merged estimate
    within 5% — ~6σ at lgK 14); the oracle checks the exact side and
    expects TRUE everywhere. ``n_days_in_window`` pins the window
    arithmetic (ramps 1..7 then stays 7)."""
    e = read_table(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = daily.select("day").distinct()
    daily_sk = daily.groupBy("day").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
    )
    sk_expanded = daily_sk.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "sk"
    ).select(F.expr("date_add(day, i)").alias("anchor"), "sk")
    est = (
        days.join(sk_expanded, days["day"] == sk_expanded["anchor"])
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_days_in_window"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        )
    )
    exact_expanded = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "user_id"
    ).select(F.expr("date_add(day, i)").alias("anchor"), "user_id")
    exact = (
        days.join(exact_expanded, days["day"] == exact_expanded["anchor"])
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_rolling_users"))
    )
    return (
        est.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_days_in_window",
            "exact_rolling_users",
            (
                F.abs(F.col("est") - F.col("exact_rolling_users"))
                / F.col("exact_rolling_users")
                <= 0.05
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# W8 — equi-depth quantile binning (feature bucketing, exact-rank form)
# ---------------------------------------------------------------------------

@query(
    "w8_equi_depth_bins",
    """
    WITH r AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, CAST((4 * (rk - 1)) // n AS BIGINT) AS bucket,
           COUNT(*) AS n_rows,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM r GROUP BY event_type, bucket
    """,
)
def w8_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — equi-depth (quantile) binning: every value assigned to its
    within-group quartile by EXACT integer rank arithmetic,
    ``bucket = (4·(rank−1)) div n`` — the feature-bucketing /
    histogram-equalization op an ML pipeline runs before hashing
    continuous features. Pure integer bucketing (rank and count, never
    an interpolated cut point) makes the bin assignment bit-identical
    across engines, with (value, event_id) ordering so ties are
    deterministic; bucket populations are equal to ±1 by construction.

    Scale shape: this is the exact-truth form — one window exchange
    per group (rank and count share the same partition spec). At
    100 TB the cut points come from ``approx_percentile`` instead
    (a10 calibrates that sketch) and binning collapses to a
    scan-stage projection against 3 broadcast thresholds; this query
    is the truth it's calibrated against, same division of labor as
    w6 (exact) vs a13 (sketch)."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.withColumn("bucket", F.expr("CAST((4 * (rk - 1)) DIV n AS BIGINT)"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )
