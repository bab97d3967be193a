"""M7 — Structured Streaming analog tests (SURVEY §2.9):

1. the streaming windowed aggregation equals its batch twin when fed
   the same events (rate-limited file stream, availableNow);
2. the foreachBatch upsert is re-delivery safe: streaming the same
   source twice leaves the warehouse identical (T3 idempotence).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.plans.sync_job import SyncJob
from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
from lavasmart_bank_sync_etl_spark.sources.tables import read_table
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse
from lavasmart_bank_sync_etl_spark.streaming.stream_sync import (
    first_seen_registry,
    stream_upsert,
    windowed_event_counts,
)
from tests.test_sync_job import SRC_SCHEMA, row, src_df


def test_stream_window_agg_matches_batch(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    events_dir = str(tmp_path / "events_in")
    events.write.parquet(events_dir)

    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n", "total_value",
            )
            .collect()
        )
    }
    assert got == expected and len(got) > 0


def test_stream_upsert_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = [row("0-1", 2, monto=100.0), row("0-2", 3, metodo="EFECTIVO"),
            row("0-1", 2, monto=100.0, idx=1)]  # in-stream duplicate
    src = src_df(spark, rows).withColumn(
        "sale_ts", F.col("sale_date").cast("timestamp")
    )
    src_dir = str(tmp_path / "src")
    src.write.parquet(src_dir)

    def apply_batch(batch_df, _batch_id):
        SyncJob(spark, wh, "2025-11-01", "2025-11-10").run(batch_df)

    for i in range(2):  # stream the same data twice = re-delivery
        stream = spark.readStream.schema(src.schema).parquet(src_dir)
        q = stream_upsert(
            spark, stream, apply_batch,
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
            key="folio", ts_col="sale_ts",
        )
        q.awaitTermination(180)

    assert wh.read("transfers").count() == 1
    assert wh.read("cash").count() == 1
    t = wh.read("transfers").collect()[0]
    assert t["folio"] == "0-1" and t["monto"] == 100.0


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    """T2 — late data inside the watermark lands; beyond it, dropped.
    Batch 1 advances the watermark to (max_ts − 10 days); batch 2's
    ancient event is older than that and must not surface."""
    f1 = [("0-1", dt.datetime(2025, 11, 20, 10, 0))]
    f2 = [
        ("0-2", dt.datetime(2025, 11, 15, 9, 0)),   # late but inside 10d → kept
        ("0-3", dt.datetime(2025, 1, 1, 9, 0)),     # months late → dropped
    ]
    src_dir = str(tmp_path / "src")
    for i, rows in enumerate([f1, f2]):
        spark.createDataFrame(rows, "folio string, sale_ts timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema("folio string, sale_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = first_seen_registry(stream, key="folio", ts_col="sale_ts")
    q = (
        out.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["folio"] for r in spark.sql("select * from late_drop").collect()}
    assert "0-1" in got
    assert "0-2" in got or "0-3" not in got  # 0-3 must never appear
    assert "0-3" not in got


@pytest.mark.parametrize("store_cls", [Warehouse, CatalogStore])
def test_late_beyond_watermark_caught_by_batch_backfill(
    spark, tmp_path, store_cls
):
    """T2 + T4 — the reference's lookback rationale (Code.gs:22
    DIAS_LOOKBACK, requerimientos.md:126-130) end to end: an event
    older than the 10-day watermark delivered in a LATER micro-batch
    is dropped by the streaming path (its dedup state is already
    evicted, so it cannot be processed reliably); the designed recovery
    is a batch backfill — a T4 range job over the old window — which
    must land the row through the same idempotent MERGE. Runs on both
    TableStore backends."""
    import datetime as dt

    store = store_cls(spark, str(tmp_path / "late_wh"))
    ancient = ("9-1", dt.date(2025, 9, 1), "Ana", "Sala", 100.0,
               "TRANSFERENCIA", "SANTANDER", 0)

    with_ts = lambda df: df.withColumn("sale_ts", F.col("sale_date").cast("timestamp"))
    src_dir = str(tmp_path / "src")
    # file 1 (recent) advances the watermark to ~2025-11-10; file 2's
    # September event is then beyond it
    with_ts(src_df(spark, [row("0-1", 20)])).coalesce(1).write.parquet(src_dir)
    with_ts(src_df(spark, [ancient])).coalesce(1).write.mode("append").parquet(src_dir)

    def apply_batch(batch_df, _batch_id):
        # window deliberately covers September: the ONLY thing that can
        # drop the ancient row in the stream path is the watermark
        SyncJob(spark, store, "2025-09-01", "2025-11-30").run(batch_df)

    stream = (
        spark.readStream.schema(with_ts(src_df(spark, [row("0-1", 20)])).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_upsert(
        spark, stream, apply_batch,
        checkpoint_dir=str(tmp_path / "ckpt_late"),
        key="folio", ts_col="sale_ts",
    )
    assert q.awaitTermination(180)

    streamed = {r["folio"] for r in store.read("transfers").collect()}
    assert "0-1" in streamed
    assert "9-1" not in streamed  # dropped by the stream path

    # T4 backfill over the ancient window catches what the stream
    # legitimately refused
    SyncJob(spark, store, "2025-09-01", "2025-09-10").run(src_df(spark, [ancient]))
    backfilled = {r["folio"] for r in store.read("transfers").collect()}
    assert "9-1" in backfilled
    assert "0-1" in backfilled  # untouched by the out-of-window job


def test_first_seen_registry_stateful_dedup(spark, tmp_path):
    """The custom applyInPandasWithState operator: each folio is
    emitted exactly once (its first sighting); duplicates across AND
    within micro-batches only bump the state counter."""
    rows = [
        ("0-1", dt.datetime(2025, 11, 3, 10, 0)),
        ("0-1", dt.datetime(2025, 11, 3, 11, 0)),  # same-batch dup
        ("0-2", dt.datetime(2025, 11, 4, 9, 0)),
        ("0-1", dt.datetime(2025, 11, 5, 8, 0)),  # later-file dup
        ("0-3", dt.datetime(2025, 11, 5, 9, 0)),
    ]
    src = spark.createDataFrame(rows, "folio string, sale_ts timestamp")
    src_dir = str(tmp_path / "src")
    # two files → at least two input splits for maxFilesPerTrigger
    src.where(F.col("sale_ts") < "2025-11-05").coalesce(1).write.parquet(src_dir)
    src.where(F.col("sale_ts") >= "2025-11-05").coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = first_seen_registry(stream, key="folio", ts_col="sale_ts")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["folio"]: r for r in spark.sql("select * from first_seen").collect()}
    assert set(got) == {"0-1", "0-2", "0-3"}
    assert got["0-1"]["first_ts"] == dt.datetime(2025, 11, 3, 10, 0)
    assert got["0-1"]["n_dups_dropped"] == 1  # the same-batch dup
    assert got["0-2"]["n_dups_dropped"] == 0


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """The st5 interval join, run as a watermarked stream-stream join:
    both sides file streams, two-sided time bound so join state can be
    aged out; availableNow output must equal the batch join."""
    from lavasmart_bank_sync_etl_spark.operators.asof import interval_join

    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    p_dir, c_dir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.write.parquet(p_dir)
    clicks.write.parquet(c_dir)

    p_stream = (
        spark.readStream.schema(purchases.schema).parquet(p_dir)
        .withWatermark("ts", "1 hour")
    )
    c_stream = (
        spark.readStream.schema(clicks.schema).parquet(c_dir)
        .withWatermark("click_ts", "1 hour")
    )
    joined = interval_join(
        p_stream, c_stream, key="user_id", left_ts="ts", right_ts="click_ts",
        lookback="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["event_id"], r["click_ts"].isoformat())
        for r in spark.sql("select event_id, click_ts from ssj").collect()
    )
    expected = sorted(
        (r["event_id"], r["click_ts"].isoformat())
        for r in interval_join(
            purchases, clicks, key="user_id", left_ts="ts", right_ts="click_ts",
            lookback="30 minutes",
        ).collect()
    )
    assert got == expected and len(got) > 0


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming dedup with bounded state: duplicate folios arriving
    within the watermark horizon collapse to one row, and dedup state
    is evicted past it (the D1 first-wins rule under streaming
    delivery, without the unbounded-state trap of plain
    dropDuplicates)."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("folio", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("monto", T.DoubleType()),
    ])
    rows = [
        ("0-1", dt.datetime(2025, 11, 1, 10, 0), 100.0),
        ("0-1", dt.datetime(2025, 11, 1, 10, 5), 100.0),   # dup within horizon
        ("0-2", dt.datetime(2025, 11, 1, 10, 1), 50.0),
        ("0-2", dt.datetime(2025, 11, 1, 10, 2), 50.0),    # dup within horizon
        ("0-3", dt.datetime(2025, 11, 1, 11, 0), 75.0),
    ]
    src_dir = str(tmp_path / "dedup_in")
    spark.createDataFrame(rows, schema).write.parquet(src_dir)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["folio"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["folio"] for r in spark.sql("select folio from wm_dedup").collect())
    assert got == ["0-1", "0-2", "0-3"]


def test_stream_static_broadcast_join(spark, sf_dir, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension (the J6 broadcast-enrichment shape under readStream) —
    no watermark needed on the static side, and the result equals the
    batch join."""
    e = read_table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.min("ts").alias("first_seen"))  # static user dim
    facts = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    facts_dir = str(tmp_path / "facts")
    facts.write.parquet(facts_dir)

    stream = spark.readStream.schema(facts.schema).parquet(facts_dir)
    joined = stream.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", (F.col("ts") >= F.col("first_seen")).alias("sane")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_static")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_static"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["sane"] for r in spark.sql("select * from ssj_static").collect()}
    expected = {
        r["event_id"]: r["ts"] >= r["first_seen"]
        for r in facts.join(dim, "user_id").collect()
    }
    assert got == expected and all(got.values()) and len(got) > 0
