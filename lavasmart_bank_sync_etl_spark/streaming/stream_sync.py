"""Structured Streaming analog of the incremental sync (SURVEY.md
§2.9, T1-T3, build plan M7).

The reference simulates incrementality with a daily trigger + 10-day
lookback re-scan. The idiomatic Spark expression:

- ``withWatermark(ts, '10 days')`` = the lookback window (T1): late
  rows inside the watermark still land; beyond it they're dropped.
- ``dropDuplicates(['folio'])`` under watermark = first-wins dedup
  with bounded state (D1/T3).
- ``foreachBatch(SyncJob-like upsert)`` = the keyed MERGE per
  micro-batch — re-delivery safe because the upsert is idempotent on
  the key (T3: rerunning a day creates zero duplicates).

At scale this runs with checkpointing on durable storage and the same
gold-table writes; state stores hold only (folio, max-ts) pairs inside
the watermark, so state is bounded by the window's key cardinality,
not history.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming tumbling-window aggregation with late-data tolerance
    — the streaming twin of queries_llm.st1 (batch equivalence is the
    oracle check)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def _duration_ms(duration: str) -> int:
    qty, unit = duration.split()
    unit_ms = {"day": 86_400_000, "hour": 3_600_000, "minute": 60_000, "second": 1_000}[
        unit.rstrip("s")
    ]
    return int(qty) * unit_ms


def first_wins_payload_dedup(
    stream: DataFrame,
    key: str = "folio",
    ts_col: str = "sale_ts",
    watermark: str = "10 days",
) -> DataFrame:
    """Streaming first-wins dedup that PRESERVES the full row payload
    and ENFORCES the watermark as a lateness bound (T1/T2).

    Spark's built-in streaming ``dropDuplicates`` /
    ``dropDuplicatesWithinWatermark`` use the watermark only to bound
    state — a row arriving BEYOND the watermark whose key state was
    already evicted is re-emitted as new, violating the reference's
    lookback contract (beyond DIAS_LOOKBACK the daily sync must not
    touch it; recovery is an explicit T4 backfill, Code.gs:22,
    requerimientos.md:126-130). Verified empirically on Spark 4.1:
    with the watermark at 2025-11-10, a 2025-09-01 row in a later
    micro-batch still passed both builtins.

    Same machinery as ``first_seen_registry`` (which the late-drop
    test pins): per-key state, manual late filter against
    ``getCurrentWatermarkMs`` (``*WithState`` operators get no
    pre-filtering), event-time timeout so state dies once the
    watermark passes the key's horizon — state stays bounded by keys
    inside the lookback window.
    """
    schema = stream.schema
    cols = schema.fieldNames()
    lifetime_ms = _duration_ms(watermark)

    def update(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        first = None
        for pdf in pdfs:
            if wm_ms > 0:
                pdf = pdf[pdf[ts_col] >= pd.Timestamp(wm_ms, unit="ms")]
            if pdf.empty:
                continue
            batch_first = pdf.sort_values(ts_col).iloc[[0]]
            if first is None or batch_first[ts_col].iloc[0] < first[ts_col].iloc[0]:
                first = batch_first
        if state.hasTimedOut:
            state.remove()
            return
        if first is None:
            return  # everything late — the row never enters the sync
        if state.exists:
            return  # re-delivery within the window — first already won
        state.update((1,))
        first_ms = int(pd.Timestamp(first[ts_col].iloc[0]).value // 1_000_000)
        state.setTimeoutTimestamp(
            max(first_ms + lifetime_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield first[cols]

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=schema,
            stateStructType="seen int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_upsert(
    spark: SparkSession,
    source_stream: DataFrame,
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    key: str = "folio",
    ts_col: str = "sale_ts",
    watermark: str = "10 days",
) -> StreamingQuery:
    """The incremental sync as a stream: watermark-enforced first-wins
    dedup (T1/T2/D1) + ``foreachBatch`` applying the batch MERGE —
    exactly-once *effect* via the idempotent keyed upsert (T3).

    ``apply_batch(batch_df, batch_id)`` is typically
    ``lambda df, _: SyncJob(...).run(df)``. Rows beyond the watermark
    are dropped by the dedup operator (see
    ``first_wins_payload_dedup``), matching the reference's lookback:
    out-of-window data is the T4 backfill's job, not the stream's.
    """
    deduped = first_wins_payload_dedup(source_stream, key, ts_col, watermark)
    return (
        deduped.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: Output schema of first_seen_registry.
FIRST_SEEN_SCHEMA = StructType([
    StructField("folio", StringType()),
    StructField("first_ts", TimestampType()),
    StructField("n_dups_dropped", LongType()),
])

_STATE_SCHEMA = "first_ts timestamp, dups long"


def first_seen_registry(
    stream: DataFrame,
    key: str = "folio",
    ts_col: str = "sale_ts",
    watermark: str = "10 days",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): the
    reference's in-run folio map (Code.gs:680-698, 752-765) promoted to
    cross-micro-batch streaming state.

    Emits one row per key on FIRST sighting; every later sighting
    (within state lifetime) only bumps that key's duplicate counter —
    the streaming form of D1 first-wins dedup with T3 idempotence
    across re-deliveries. State per key is (first_ts, dup count) — a
    few bytes — and is dropped by event-time timeout once the
    watermark passes ``watermark`` beyond the key's first sighting, so
    state size is bounded by key cardinality inside the lookback
    window, not by history (exactly the reference's 10-day contract,
    Code.gs:22).
    """
    lifetime_ms = _duration_ms(watermark)

    def update(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Spark does NOT pre-filter late rows for *WithState operators
        # (the watermark only drives timeouts) — enforce the lookback
        # contract ourselves: rows older than the watermark are beyond
        # the window and ignored (T2; the reference never re-scans
        # past DIAS_LOOKBACK).
        wm_ms = state.getCurrentWatermarkMs()
        n_new = 0
        min_ts = None
        for pdf in pdfs:
            if wm_ms > 0:
                pdf = pdf[pdf[ts_col] >= pd.Timestamp(wm_ms, unit="ms")]
            if pdf.empty:
                continue
            n_new += len(pdf)
            batch_min = pdf[ts_col].min()
            min_ts = batch_min if min_ts is None else min(min_ts, batch_min)
        if state.hasTimedOut:
            state.remove()
            return
        if n_new == 0:
            return  # everything late — no sighting, no state
        if state.exists:
            first_ts, dups = state.get
            state.update((first_ts, dups + n_new))
            return  # not first — emit nothing
        state.update((min_ts, n_new - 1))
        first_ms = int(pd.Timestamp(min_ts).value // 1_000_000)
        state.setTimeoutTimestamp(
            max(first_ms + lifetime_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {"folio": [key_tuple[0]], "first_ts": [min_ts], "n_dups_dropped": [n_new - 1]}
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
