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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


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


def stream_upsert(
    spark: SparkSession,
    source_stream: DataFrame,
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    key: str = "folio",
    ts_col: str = "sale_ts",
    watermark: str = "10 days",
) -> StreamingQuery:
    """The incremental sync as a stream: watermark (T1/T2) +
    key-dedup (D1/T3) + ``foreachBatch`` applying the batch MERGE —
    exactly-once *effect* via the idempotent keyed upsert.

    ``apply_batch(batch_df, batch_id)`` is typically
    ``lambda df, _: SyncJob(...).run(df)``.
    """
    deduped = source_stream.withWatermark(ts_col, watermark).dropDuplicates([key])
    return (
        deduped.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
