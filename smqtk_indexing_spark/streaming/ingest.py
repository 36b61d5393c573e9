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
