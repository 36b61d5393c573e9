"""Streaming / incremental ingest — Structured Streaming over a file source.

The reference has no streaming runtime, but its docs specify an operational
incremental workflow (``/root/reference/docs/examples/nnss_incremental_update/
incremental_example.rst:1-30``: compute descriptors for the new batch ->
hash codes -> live-reload index) and ``update_index`` defines the additive
contract (``interfaces/nearest_neighbor_index.py:62-79``). Spark mapping
(SURVEY.md §2.8): ``readStream`` + ``Trigger.AvailableNow`` micro-batches,
each batch anti-joined against already-indexed ids (duplicate-insert
warn+skip, ``impls/nn_index/faiss.py:590-598``) then appended — idempotent
exactly-once per id, with the stream checkpoint as the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.operators.signatures import compute_signatures

FILES_DDL = "doc_id long, repo string, path string, commit string, lang string, content string"


def ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    sig_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    schema_ddl: str = FILES_DDL,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> None:
    """Drain all currently-available input files into the signature table.

    Each micro-batch: drop ids already in ``sig_dir`` (idempotent re-ingest),
    run the vectorized signature pass, append. Re-running after new files
    arrive processes only the new files (stream checkpoint) and only the
    genuinely-new ids (anti-join).
    """
    cfg = cfg or DedupConfig()
    stream = (
        spark.readStream.schema(schema_ddl).parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new = batch_df.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
        ).dropDuplicates(["doc_id"])
        if os.path.exists(os.path.join(sig_dir, "_SUCCESS")) or any(
            f.endswith(".parquet") for f in (os.listdir(sig_dir) if os.path.isdir(sig_dir) else [])
        ):
            existing = spark.read.parquet(sig_dir).select("doc_id")
            new = new.join(existing, "doc_id", "left_anti")
        compute_signatures(new, cfg).write.mode("append").parquet(sig_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_first_events(
    stream: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    key_cols: tuple = ("user_id", "event_type"),
    id_col: str = "event_id",
) -> DataFrame:
    """Watermarked streaming twin of the batch ``events_windowed_dedup``
    query: the FIRST event per key per tumbling window, with late data
    accepted up to ``watermark_delay`` (SURVEY §2.8 late-data contract).

    Pure built-in streaming aggregation: watermark -> tumbling window ->
    ``min_by``; in append output mode a window's row is emitted exactly
    once, when the watermark passes its end — so downstream sinks see a
    deduplicated, late-tolerant event stream with no custom state.
    """
    w = stream.withColumn(
        "_ts", F.col(ts_col).cast("timestamp")
    ).withWatermark("_ts", watermark_delay)
    return (
        w.groupBy(F.window("_ts", window_duration).alias("w"), *key_cols)
        .agg(
            F.min_by(F.col(id_col), F.struct("_ts", id_col)).alias("first_event_id"),
            F.count("*").alias("n_in_window"),
        )
        .select(
            F.col("w.start").alias("w_start"), *key_cols,
            "first_event_id", "n_in_window",
        )
    )


FIRST_SEEN_STATE = "seen byte"


def first_seen_keys(
    stream: DataFrame,
    key_col: str = "sha256",
    payload_col: str = "doc_id",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    emit each key the FIRST time it is ever seen across all micro-batches
    — the streaming form of the exact-dedup fast path (cross-batch: state
    lives in the stream checkpoint, so a restart resumes, unlike
    ``dropDuplicates`` within a batch). One tiny state row (a seen flag)
    per key group; NoTimeout keeps keys forever, the dedup contract.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, {payload_col} long"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            return
        best = None  # deterministic representative: min payload in batch
        for pdf in pdfs:
            if len(pdf):
                row = pdf.loc[pdf[payload_col].idxmin()]
                if best is None or int(row[payload_col]) < best[1]:
                    best = (str(row[key_col]), int(row[payload_col]))
        if best is None:
            return
        state.update((1,))
        import pandas as pd

        yield pd.DataFrame({key_col: [best[0]], payload_col: [best[1]]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=FIRST_SEEN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
