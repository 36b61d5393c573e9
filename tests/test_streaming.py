"""Structured-Streaming ingest: AvailableNow micro-batches, idempotent
re-ingest, additive update semantics (SURVEY.md §2.8)."""

import os

from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.sources.files import synth_files
from smqtk_indexing_spark.streaming.ingest import ingest_available_now

CFG = DedupConfig()


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
