"""Structured-Streaming ingest: AvailableNow micro-batches, idempotent
re-ingest, additive update semantics, watermarked windowed dedup, and the
applyInPandasWithState cross-batch first-seen operator (SURVEY.md §2.8)."""

import os
from datetime import datetime, timedelta

from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.sources.files import synth_files
from smqtk_indexing_spark.streaming.ingest import (
    first_seen_keys,
    ingest_available_now,
    windowed_first_events,
)

CFG = DedupConfig()


def _drain(stream_out, ck_dir, out_dir):
    # durable sink: checkpoint recovery across drains (memory sink forbids
    # restarting from an existing checkpoint)
    q = (
        stream_out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_ingest_available_now(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sig_dir = str(tmp_path / "sigs")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    files, _ = synth_files(n=120, seed=3)
    batch1 = files.iloc[:80]
    batch2 = files.iloc[80:]

    spark.createDataFrame(batch1).write.mode("append").parquet(in_dir)
    ingest_available_now(spark, in_dir, sig_dir, ck_dir, CFG)
    sigs = spark.read.parquet(sig_dir)
    assert sigs.count() == 80
    assert sigs.select("doc_id").distinct().count() == 80

    # second batch arrives; stream checkpoint processes only the new files
    spark.createDataFrame(batch2).write.mode("append").parquet(in_dir)
    ingest_available_now(spark, in_dir, sig_dir, ck_dir, CFG)
    sigs = spark.read.parquet(sig_dir)
    assert sigs.count() == 120
    assert sigs.select("doc_id").distinct().count() == 120

    # re-run with nothing new: idempotent
    ingest_available_now(spark, in_dir, sig_dir, ck_dir, CFG)
    assert spark.read.parquet(sig_dir).count() == 120


def test_windowed_first_events_with_late_data(spark, tmp_path):
    # watermarked tumbling-window dedup: append mode emits each window once
    # the watermark passes; a late-but-within-delay event still lands in
    # its original window
    in_dir, ck_dir = str(tmp_path / "ev"), str(tmp_path / "ck")
    os.makedirs(in_dir)
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [
        (1, 7, "click", t0 + timedelta(seconds=10)),
        (2, 7, "click", t0 + timedelta(seconds=200)),   # same window, later
        (3, 8, "view", t0 + timedelta(seconds=30)),
        # event far ahead: advances the watermark past the first window
        (4, 9, "click", t0 + timedelta(minutes=40)),
    ]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(in_dir)
    out_dir = str(tmp_path / "out")
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = windowed_first_events(stream, "5 minutes", "10 minutes")
    _drain(out, ck_dir, out_dir)
    got = {
        (r.w_start.strftime("%H:%M"), r.user_id, r.event_type): (
            r.first_event_id, r.n_in_window,
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    # windows before the watermark (12:40 - 10 min = 12:30) are final
    assert got[("12:00", 7, "click")] == (1, 2)
    assert got[("12:00", 8, "view")] == (3, 1)
    # the 12:40 window (event 4) is still open: watermark hasn't passed
    assert ("12:40", 9, "click") not in got
    # a within-delay event lands in its window; a far-ahead event advances
    # the watermark past both open windows so this drain finalizes them
    rows2 = [
        (5, 8, "view", t0 + timedelta(minutes=31)),
        (6, 9, "click", t0 + timedelta(minutes=90)),
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(in_dir)
    _drain(windowed_first_events(
        spark.readStream.schema(schema).parquet(in_dir), "5 minutes", "10 minutes"
    ), ck_dir, out_dir)
    got2 = {
        (r.w_start.strftime("%H:%M"), r.user_id, r.event_type): (
            r.first_event_id, r.n_in_window,
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2[("12:30", 8, "view")] == (5, 1)
    assert got2[("12:40", 9, "click")] == (4, 1)


def test_first_seen_keys_cross_batch_state(spark, tmp_path):
    # applyInPandasWithState: a key emitted in batch 1 is NEVER re-emitted
    # in later drains (state persists in the stream checkpoint)
    in_dir, ck_dir = str(tmp_path / "docs"), str(tmp_path / "ck2")
    os.makedirs(in_dir)
    schema = "sha256 string, doc_id long"
    spark.createDataFrame(
        [("ka", 10), ("ka", 11), ("kb", 20)], schema
    ).write.mode("append").parquet(in_dir)
    out_dir = str(tmp_path / "out2")
    stream = spark.readStream.schema(schema).parquet(in_dir)
    _drain(first_seen_keys(stream), ck_dir, out_dir)
    got1 = {(r.sha256, r.doc_id) for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {("ka", 10), ("kb", 20)}
    # second batch: kb repeats (suppressed by state), kc is new
    spark.createDataFrame(
        [("kb", 21), ("kc", 30)], schema
    ).write.mode("append").parquet(in_dir)
    _drain(first_seen_keys(
        spark.readStream.schema(schema).parquet(in_dir)
    ), ck_dir, out_dir)
    got2 = {(r.sha256, r.doc_id) for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {("ka", 10), ("kb", 20), ("kc", 30)}  # sink accumulates; kb not re-emitted
