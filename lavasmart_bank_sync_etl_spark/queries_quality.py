"""Driver-facing queries: data-quality & pipeline-analytics wave —
the Deequ-style checks and sequence analytics a 100 TB training-data
pipeline runs before and after every ingest: per-column profiling,
volume-anomaly detection, referential-integrity orphan counts,
event-transition matrices, dedup-weighted corpus mass, top-k per
group, and exponential smoothing over daily series.

Same oracle conventions as queries.py: identical aliases on both
sides, floats rounded (2dp money, 4dp ratios) so cross-engine
summation order cannot flip the value hash, money summed as exact
integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .sources.tables import read_table

# ---------------------------------------------------------------------------
# DQ1 — per-column profile of a table in one scan
# ---------------------------------------------------------------------------

# (column, null-safe min/max representation) — money is profiled in
# exact integer cents and dates as ISO day strings so the min/max
# REPRESENTATION is engine-independent (Java's Double.toString uses
# scientific notation above 1e7; DuckDB's never does).
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_repr(name: str, aggregated):
    """Engine-stable string representation of an aggregated VALUE
    extreme — applied AFTER min/max so ordering is value order, never
    lexicographic over the repr."""
    if name == "o_totalprice":
        return F.round(aggregated * 100).cast("long").cast("string")
    if name == "o_orderdate":
        return aggregated.cast("date").cast("string")
    return aggregated.cast("string")


_PROFILE_ORACLE_REPR = {
    "o_totalprice": "CAST(CAST(round({c} * 100) AS BIGINT) AS VARCHAR)",
    "o_orderdate": "CAST(CAST({c} AS DATE) AS VARCHAR)",
}


def _profile_oracle() -> str:
    parts = []
    for name in _PROFILE_COLS:
        rep = _PROFILE_ORACLE_REPR.get(name, "CAST({c} AS VARCHAR)")
        parts.append(
            f"""
            SELECT '{name}' AS column_name,
                   COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({name}) AS n_null,
                   COUNT(DISTINCT {name}) AS n_distinct,
                   {rep.format(c=f"MIN({name})")} AS min_repr,
                   {rep.format(c=f"MAX({name})")} AS max_repr
            FROM orders
            """
        )
    return " UNION ALL ".join(parts)


@query("dq1_column_profile", _profile_oracle())
def dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ1 — one-scan column profile (the Deequ/great-expectations
    shape): per column emit row count, null count, distinct count and
    min/max representation, as a long-format table.

    Scale shape: ONE pass over the fact table. All per-column
    aggregates ride the same scan; the multi-column COUNT(DISTINCT)
    lowers to Spark's Expand (5 rows per input row of only the
    profiled columns, never the full payload), partial-aggregated
    map-side. The result is 5 rows — the explode to long format
    happens on a one-row DataFrame, driver-weight zero. At 100 TB the
    exact distinct swaps for approx_count_distinct (a9 calibrates the
    HLL error) and Expand drops out entirely.

    Min/max aggregate the VALUE and only then convert the extreme to
    an engine-stable representation (exact cents / ISO day / raw
    string) — representing first and aggregating the strings would
    silently turn value order into lexicographic order, and Java's
    Double.toString (scientific notation above 1e7) would diverge from
    DuckDB's float formatting.
    """
    o = read_table(spark, sf_dir, "orders")
    per_col = [
        F.struct(
            F.lit(name).alias("column_name"),
            F.sum(F.col(name).isNull().cast("long")).alias("n_null"),
            F.count_distinct(F.col(name)).alias("n_distinct"),
            _profile_repr(name, F.min(name)).alias("min_repr"),
            _profile_repr(name, F.max(name)).alias("max_repr"),
        ).alias(name)
        for name in _PROFILE_COLS
    ]
    one = o.agg(F.count(F.lit(1)).alias("n_rows"), *per_col)
    exploded = one.select(
        "n_rows", F.explode(F.array(*[F.col(n) for n in _PROFILE_COLS])).alias("p")
    )
    return exploded.select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_repr").alias("min_repr"),
        F.col("p.max_repr").alias("max_repr"),
    )


# ---------------------------------------------------------------------------
# DQ2 — daily volume anomaly (z-score against the table's own history)
# ---------------------------------------------------------------------------

@query(
    "dq2_volume_anomaly",
    """
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT AVG(n_events) AS mu, STDDEV_SAMP(n_events) AS sigma FROM daily
    )
    SELECT day, n_events,
           ROUND((n_events - mu) / NULLIF(sigma, 0), 4) AS z,
           ABS(ROUND((n_events - mu) / NULLIF(sigma, 0), 4)) > 2.0 AS is_anomaly
    FROM daily, stats
    """,
)
def dq2_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ2 — ingest-volume anomaly check: per-day row counts z-scored
    against the mean/stddev of the table's own daily history; |z| > 2
    flags the day. The check every scheduled pipeline runs before
    promoting a partition.

    Scale shape: first aggregate collapses the fact table to one row
    per day (partial-agg absorbs everything map-side); the second
    collapses the day axis to a ONE-ROW stats frame that broadcasts
    back onto it. No unpartitioned window over the data, no second
    scan of the facts — the z-score join touches only the tiny daily
    rollup. The anomaly flag tests the ROUNDED z on both sides so the
    boolean can never disagree with the printed score. A degenerate
    history (>=2 days with identical counts → sigma exactly 0) yields
    NULL z / NULL flag on BOTH engines: sigma is NULLIF'd to NULL
    before the division rather than letting Spark's NULL-on-/0 and
    DuckDB's IEEE inf semantics diverge."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = daily.agg(
        F.avg("n_events").alias("mu"), F.stddev_samp("n_events").alias("sigma")
    )
    safe_sigma = F.when(F.col("sigma") != 0, F.col("sigma"))
    z = F.round((F.col("n_events") - F.col("mu")) / safe_sigma, 4)
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_events",
        z.alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# DQ3 — referential-integrity orphan counts across the star schema
# ---------------------------------------------------------------------------

_RELATIONSHIPS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def _orphan_oracle() -> str:
    parts = []
    for child, ckey, parent, pkey in _RELATIONSHIPS:
        parts.append(
            f"""
            SELECT '{child}.{ckey}->{parent}' AS relationship,
                   COUNT(*) AS n_child_rows,
                   CAST(COALESCE(SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
            FROM {child} c LEFT JOIN {parent} p ON c.{ckey} = p.{pkey}
            """
        )
    return " UNION ALL ".join(parts)


@query("dq3_referential_orphans", _orphan_oracle())
def dq3_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ3 — referential-integrity audit: for each FK edge of the star
    schema, count child rows and orphans (child keys with no parent).
    Parent keys are primary keys (unique), so the left join preserves
    child cardinality on both engines.

    Scale shape: each edge is a key-only equi-join — the child side
    projects JUST the FK column before joining, so no payload
    shuffles; the parent side projects its PK. Dimension parents
    (customer/part/supplier) broadcast at typical star ratios; the
    lineitem→orders edge shuffles keys only, with the count folded
    into partial aggregates. Output is 4 rows."""
    frames = []
    for child, ckey, parent, pkey in _RELATIONSHIPS:
        c = read_table(spark, sf_dir, child).select(ckey)
        p = read_table(spark, sf_dir, parent).select(pkey)
        joined = c.join(p, c[ckey] == p[pkey], "left")
        frames.append(
            joined.agg(
                F.lit(f"{child}.{ckey}->{parent}").alias("relationship"),
                F.count(F.lit(1)).alias("n_child_rows"),
                F.coalesce(
                    F.sum(F.col(pkey).isNull().cast("long")), F.lit(0)
                ).alias("n_orphans"),
            ).select("relationship", "n_child_rows", "n_orphans")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# DQ4 — ingestion lag / freshness per stream partition
# ---------------------------------------------------------------------------

@query(
    "dq4_ingestion_lag",
    """
    WITH per_type AS (
      SELECT event_type, MAX(ts) AS head_ts, COUNT(*) AS n_events
      FROM events GROUP BY event_type
    ),
    head AS (SELECT MAX(head_ts) AS global_head FROM per_type)
    SELECT event_type, n_events,
           strftime(head_ts, '%Y-%m-%d %H:%M:%S') AS head_ts_str,
           CAST(date_diff('minute', head_ts, global_head) AS BIGINT) AS lag_minutes
    FROM per_type, head
    """,
)
def dq4_ingestion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ4 — freshness check: how far each event type's newest row
    lags behind the newest row anywhere in the table. Anchoring on the
    table's own head (not wall-clock) keeps the check deterministic
    and replayable; a scheduler alerts on `lag_minutes > SLA`.

    Scale shape: one aggregate collapses the facts to |types| rows;
    the global head is a one-row frame broadcast back onto them.
    Minute arithmetic uses whole-minute boundary counting (epoch-
    minute difference), mirrored on both engines."""
    e = read_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("head_ts"), F.count(F.lit(1)).alias("n_events")
    )
    head = per_type.agg(F.max("head_ts").alias("global_head"))
    lag = (
        F.floor(F.unix_micros("global_head") / 60_000_000)
        - F.floor(F.unix_micros("head_ts") / 60_000_000)
    ).cast("long")
    return per_type.crossJoin(F.broadcast(head)).select(
        "event_type",
        "n_events",
        F.date_format("head_ts", "yyyy-MM-dd HH:mm:ss").alias("head_ts_str"),
        lag.alias("lag_minutes"),
    )


# ---------------------------------------------------------------------------
# DQ5 — key-uniqueness expectation across tables
# ---------------------------------------------------------------------------

_UNIQUE_KEYS = [("orders", "o_orderkey"), ("events", "event_id"), ("customer", "c_custkey")]


def _unique_oracle() -> str:
    parts = []
    for table, key in _UNIQUE_KEYS:
        parts.append(
            f"""
            SELECT '{table}.{key}' AS key_name,
                   COUNT(*) AS n_rows,
                   COUNT(DISTINCT {key}) AS n_keys,
                   CAST(COUNT(*) - COUNT(DISTINCT {key}) AS BIGINT) AS n_excess_rows,
                   CAST((SELECT MAX(c) FROM (
                        SELECT COUNT(*) AS c FROM {table} GROUP BY {key})) AS BIGINT)
                     AS max_multiplicity,
                   COUNT(*) = COUNT(DISTINCT {key}) AS is_unique
            FROM {table}
            """
        )
    return " UNION ALL ".join(parts)


@query("dq5_key_uniqueness", _unique_oracle())
def dq5_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ5 — uniqueness expectation on declared keys: per key emit row
    count, distinct keys, excess rows, worst multiplicity, and the
    pass/fail flag. The primary-key audit run before any table is
    trusted as a merge target (the reference's dedup-on-folio
    assumption, turned into a measurable check).

    Scale shape: per key ONE hash aggregate on the key column only
    (count per key), then a tiny second agg folds counts into the
    summary — no distinct-expand, no payload columns, fully
    partial-aggregated. NULL keys: the synthetic keys are non-null;
    with nullable keys the groupBy treats NULL as a key value on both
    engines alike."""
    frames = []
    for table, key in _UNIQUE_KEYS:
        per_key = (
            read_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        frames.append(
            per_key.agg(
                F.lit(f"{table}.{key}").alias("key_name"),
                F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                (F.sum("c") - F.count(F.lit(1))).alias("n_excess_rows"),
                F.max("c").alias("max_multiplicity"),
                (F.sum("c") == F.count(F.lit(1))).alias("is_unique"),
            ).select(
                "key_name", "n_rows", "n_keys", "n_excess_rows",
                "max_multiplicity", "is_unique",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# DQ6 — cross-field conformance constraints in one scan
# ---------------------------------------------------------------------------

# (name, SQL predicate, Spark predicate builder) — the predicate states
# what a CONFORMING row satisfies; violations are its negation.
_CONFORMANCE = [
    ("n_chars_matches_text", "n_chars = length(text)",
     lambda: F.col("n_chars") == F.length("text")),
    ("lang_is_iso2", "regexp_matches(lang, '^[a-z]{2}$')",
     lambda: F.col("lang").rlike("^[a-z]{2}$")),
    ("text_nonempty", "text IS NOT NULL AND length(text) > 0",
     lambda: F.col("text").isNotNull() & (F.length("text") > 0)),
    ("doc_id_nonnegative", "doc_id >= 0",
     lambda: F.col("doc_id") >= 0),
]


def _conformance_oracle() -> str:
    parts = []
    for name, pred, _ in _CONFORMANCE:
        parts.append(
            f"""
            SELECT '{name}' AS constraint_name,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN NOT COALESCE(({pred}), FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
                   SUM(CASE WHEN NOT COALESCE(({pred}), FALSE)
                       THEN 1 ELSE 0 END) = 0 AS passes
            FROM documents
            """
        )
    return " UNION ALL ".join(parts)


@query("dq6_field_conformance", _conformance_oracle())
def dq6_field_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ6 — cross-field conformance audit: declarative row-level
    constraints (redundant-field consistency, domain regex, non-empty
    payload, key range) evaluated in ONE scan, reported as
    (constraint, rows, violations, pass). The complement of dq1's
    statistics: dq1 describes, dq6 asserts. NULLs count as violations
    (a row that can't prove conformance fails it) — COALESCE(...,
    FALSE) on both engines.

    Scale shape: every constraint is a scan-local boolean expression;
    all of them fold into one partial-aggregated pass over the table
    (no Expand — unlike dq1 there are no distincts), and the long
    format explodes a single driver-weight row. Adding a constraint
    is adding one column expression, not a pass."""
    d = read_table(spark, sf_dir, "documents")
    per_c = [
        F.struct(
            F.lit(name).alias("constraint_name"),
            F.sum(
                (~F.coalesce(build(), F.lit(False))).cast("long")
            ).alias("n_violations"),
        ).alias(name)
        for name, _, build in _CONFORMANCE
    ]
    one = d.agg(F.count(F.lit(1)).alias("n_rows"), *per_c)
    return one.select(
        "n_rows",
        F.explode(F.array(*[F.col(n) for n, _, _ in _CONFORMANCE])).alias("c"),
    ).select(
        F.col("c.constraint_name").alias("constraint_name"),
        "n_rows",
        F.col("c.n_violations").alias("n_violations"),
        (F.col("c.n_violations") == 0).alias("passes"),
    )


# ---------------------------------------------------------------------------
# EV5 — event-transition matrix (first-order Markov over user streams)
# ---------------------------------------------------------------------------

@query(
    "ev5_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    totals AS (
      SELECT prev_type, SUM(n) AS tot FROM counts GROUP BY prev_type
    )
    SELECT c.prev_type, c.event_type, c.n,
           ROUND(c.n / t.tot, 4) AS p
    FROM counts c JOIN totals t USING (prev_type)
    """,
)
def ev5_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV5 — first-order transition matrix over per-user event
    streams: LAG within (user, time) order, then (prev → next) counts
    and row-normalized probabilities. The funnel-debugging view next
    to ev3's fixed funnel.

    Scale shape: the window partitions by user_id — millions of
    independent partitions, no global sort; (ts, event_id) ordering
    makes ties deterministic. The transition table is at most
    |types|² rows, so its row-normalization is a broadcast join, and
    n/tot divides exact integers — both engines produce the identical
    double before the shared 4dp round."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.col("tot"), 4).alias("p"),
    )


# ---------------------------------------------------------------------------
# A14 — top-k per group (monthly top spenders)
# ---------------------------------------------------------------------------

@query(
    "a14_topk_per_group",
    """
    WITH per_cust AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY 1, 2
    )
    SELECT month, o_custkey, total, rk FROM (
      SELECT month, o_custkey, total,
             ROW_NUMBER() OVER (PARTITION BY month ORDER BY total DESC, o_custkey) AS rk
      FROM per_cust
    ) WHERE rk <= 3
    """,
)
def a14_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — top-3 customers by spend per month: pre-aggregate, then
    rank within group. The per-group leaderboard every reporting layer
    needs.

    Scale shape: the heavy lifting is the (month, custkey) aggregate
    — partial-agg absorbs the fact table map-side and the window then
    runs over the SMALL rollup, partitioned by month (no global
    sort). Ranking on the ROUNDED total with custkey as tiebreak makes
    row_number deterministic across engines. At extreme group
    cardinality the window swaps for a per-partition top-k
    (min-heap in applyInPandas), but month × customer is nowhere near
    that."""
    o = read_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_custkey"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    w = Window.partitionBy("month").orderBy(
        F.col("total").desc(), F.col("o_custkey")
    )
    return (
        per_cust.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("month", "o_custkey", "total", "rk")
    )


# ---------------------------------------------------------------------------
# CU5 — dedup-weighted corpus mass per source
# ---------------------------------------------------------------------------

@query(
    "cu5_dedup_weighted_mass",
    """
    WITH docs AS (
      SELECT doc_id, source, md5(text) AS h,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    sizes AS (
      SELECT h, COUNT(*) AS csize FROM docs GROUP BY h
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT d.h) AS BIGINT) AS n_unique_texts,
           ROUND(SUM(1.0 / s.csize), 4) AS effective_docs,
           ROUND(SUM(CAST(d.n_tokens AS DOUBLE) / s.csize), 4) AS effective_tokens
    FROM docs d JOIN sizes s USING (h)
    GROUP BY d.source
    """,
)
def cu5_dedup_weighted_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CU5 — duplication-adjusted corpus mass: each document counts
    1/cluster_size (exact-dup clusters via content digest), giving the
    per-source share of UNIQUE data — the number mixture weighting
    (cu2) should be fed instead of raw doc counts, since raw counts
    double-fund duplicated sources.

    Scale shape: cluster sizes aggregate on the 32-char digest only;
    the join back to documents is digest↔digest with (doc_id, source,
    n_tokens) as the only payload — full text never shuffles (tokens
    are counted before the join). Cluster-size table ≈ corpus
    cardinality but 40 bytes/row; per-source rollup partial-aggs.
    Weights are 1/int sums rounded 4dp on both sides."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    sizes = d.groupBy("h").agg(F.count(F.lit(1)).alias("csize"))
    joined = d.join(sizes, "h")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("h").alias("n_unique_texts"),
        F.round(F.sum(F.lit(1.0) / F.col("csize")), 4).alias("effective_docs"),
        F.round(
            F.sum(F.col("n_tokens").cast("double") / F.col("csize")), 4
        ).alias("effective_tokens"),
    )


# ---------------------------------------------------------------------------
# W7 — exponential moving average over daily series (deterministic fold)
# ---------------------------------------------------------------------------

@query(
    "w7_ema_daily_value",
    """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           MAX(day) AS last_day,
           ROUND(list_reduce(list(CAST(cents AS DOUBLE) ORDER BY day),
                             (acc, x) -> (acc + x) / 2) / 100, 4) AS ema
    FROM daily GROUP BY event_type
    """,
)
def w7_ema_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — exponential moving average (α = 0.5) of daily value per
    event type, as a LEFT FOLD over the day-ordered series: the
    recurrence s₁ = x₁, sₜ = (sₜ₋₁ + xₜ)/2. The trend line next to
    w1's running total; α = ½ keeps every step a power-of-two scale.

    Determinism: Spark's ``F.aggregate`` and DuckDB's ``list_reduce``
    execute the IDENTICAL sequence of IEEE doubles ops over the same
    day-sorted list of exact integer cents, so the fold is bitwise
    reproducible across engines (same device as
    operators/clustering.py). Scale shape: the fact table collapses to
    (type, day) partials first; only the tiny daily rollup is
    collected into per-group arrays (state = O(#days), bounded axis —
    documented like w5). An unbounded-key variant would move the fold
    into applyInPandasWithState; the day axis never needs it."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    grouped = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("day").alias("last_day"),
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("xs"),
    )
    vals = F.transform("xs", lambda s: s.getField("cents").cast("double"))
    ema = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise((acc + x) / 2),
    )
    return grouped.select(
        "event_type",
        "n_days",
        "last_day",
        F.round(ema / 100, 4).alias("ema"),
    )


# ---------------------------------------------------------------------------
# DQ7 — distribution drift (PSI) between time windows, with calibration
# ---------------------------------------------------------------------------

_DQ7_SQL = """
WITH bounds AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us FROM events
),
base AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vi,
         epoch_us(ts) <= mid_us AS is_ref
  FROM events, bounds
  WHERE value IS NOT NULL
),
edges AS (
  SELECT MIN(vi) AS lo, MAX(vi) - MIN(vi) + 1 AS span
  FROM base WHERE is_ref
),
binned AS (
  SELECT 'organic' AS scenario, is_ref,
         LEAST(9, GREATEST(0, ((vi - lo) * 10) // span)) AS bin
  FROM base, edges
  UNION ALL
  SELECT 'shifted', is_ref,
         LEAST(9, GREATEST(0,
           (((CASE WHEN is_ref THEN vi
                   ELSE vi + (span * 3) // 10 END) - lo) * 10) // span))
  FROM base, edges
),
hist AS (
  SELECT scenario, bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT scenario, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
  FROM hist GROUP BY 1
),
terms AS (
  SELECT scenario, bin, n_ref, n_cur,
         CAST(ROUND(
           ((n_cur + 1.0) / (t_cur + 10) - (n_ref + 1.0) / (t_ref + 10))
           * LN(((n_cur + 1.0) / (t_cur + 10)) / ((n_ref + 1.0) / (t_ref + 10)))
           * 1000000) AS BIGINT) AS term_i
  FROM hist JOIN tot USING (scenario)
),
total AS (SELECT scenario, SUM(term_i) AS psi_i FROM terms GROUP BY 1)
SELECT scenario, bin, n_ref, n_cur,
       term_i / 1000000.0 AS psi_term,
       psi_i / 1000000.0 AS psi_total,
       psi_i >= 200000 AS drifted
FROM terms JOIN total USING (scenario)
"""


@query("dq7_distribution_drift", _DQ7_SQL)
def dq7_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ7 — Population Stability Index between the table's two time
    halves: the standard drift check a feature pipeline runs before
    trusting a new partition (PSI < 0.1 stable, > 0.2 action). The
    query is self-calibrating like a12/a15: the 'organic' scenario
    scores the real data (stationary fixture → stable), the 'shifted'
    scenario re-scores it with the current window displaced by 3/10 of
    the reference range and must trip the drifted flag — detector
    sensitivity and false-positive silence in one result.

    Cross-engine determinism: values go fixed-point (cents) BEFORE
    binning, bin edges are all-integer rational arithmetic (`div` on
    longs — Spark truncates where DuckDB `//` floors, and the two
    only disagree on NEGATIVE non-integer quotients; the one place a
    negative numerator occurs is a current-window value below the
    reference minimum, whose quotient is ≤ 0 under either rule, so
    the GREATEST(0, _) clamp maps it to bin 0 on both engines — the
    clamp, not numerator sign, is the divergence shield), per-bin
    PSI terms are
    rounded to 1e-6 fixed-point and SUMMED AS INTEGERS (the tx18
    pattern), so the total and flag can't drift on float summation
    order.

    Scale shape: three passes over the NARROW (ts, value) projection —
    two collapse immediately to one-row broadcast frames (time bounds;
    reference bin edges) and only the third does real work (bin +
    20-group partial-agg histogram; the ×2 scenario fan-out rides
    post-scan narrow rows). At 100 TB the first two passes come from
    table statistics / the previous run's dq1 profile instead of
    rescanning, collapsing this to the single histogram pass — the
    honest production shape, not an extra engine feature. No window
    function ever touches the facts."""
    e = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = e.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").alias("mid_us")
    )
    base = e.crossJoin(F.broadcast(bounds)).select(
        F.round(F.col("value") * 100).cast("long").alias("vi"),
        (F.unix_micros("ts") <= F.col("mid_us")).alias("is_ref"),
    )
    edges = base.where("is_ref").agg(
        F.min("vi").alias("lo"),
        (F.max("vi") - F.min("vi") + 1).alias("span"),
    )
    rowed = base.crossJoin(F.broadcast(edges)).withColumn(
        "svi",
        F.when(F.col("is_ref"), F.col("vi")).otherwise(
            F.col("vi") + F.expr("(span * 3) div 10")
        ),
    )
    bin_org = F.expr("least(9, greatest(0, ((vi - lo) * 10) div span))")
    bin_shift = F.expr("least(9, greatest(0, ((svi - lo) * 10) div span))")
    binned = rowed.select(
        "is_ref",
        F.explode(
            F.array(
                F.struct(F.lit("organic").alias("scenario"), bin_org.alias("bin")),
                F.struct(F.lit("shifted").alias("scenario"), bin_shift.alias("bin")),
            )
        ).alias("s"),
    ).select("is_ref", F.col("s.scenario").alias("scenario"), F.col("s.bin").alias("bin"))
    hist = binned.groupBy("scenario", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    # Per-scenario totals and the PSI sum as WINDOWS over the (≤40-row)
    # histogram instead of aggregate-then-rejoin: the join form planned
    # the hist subtree — and with it the whole corpus-sized bin chain —
    # once per join side (up to 4 corpus passes per run); both windows
    # share one by-scenario partitioning of the tiny frame (r13, guide
    # §2.4). Same long sums, identical values.
    ws = Window.partitionBy("scenario")
    p_cur = (F.col("n_cur") + 1.0) / (F.sum("n_cur").over(ws) + 10)
    p_ref = (F.col("n_ref") + 1.0) / (F.sum("n_ref").over(ws) + 10)
    terms = hist.select(
        "scenario", "bin", "n_ref", "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * 1000000)
        .cast("long").alias("term_i"),
    )
    psi_i = F.sum("term_i").over(ws)
    return terms.select(
        "scenario", "bin", "n_ref", "n_cur",
        (F.col("term_i") / 1000000.0).alias("psi_term"),
        (psi_i / 1000000.0).alias("psi_total"),
        (psi_i >= 200000).alias("drifted"),
    )
