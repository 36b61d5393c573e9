"""Bucket construction + candidate-pair generation — the heart of the engine.

Reference analog: the hash->uuids multimap build (``/root/reference/
smqtk_indexing/impls/nn_index/lsh.py:315-323``) and the near-hash -> candidate
UUID expansion (``lsh.py:489-497``), generalized from single-query lookup to
an all-pairs self-join: every document is simultaneously query and corpus.

Scale design (north rule: "partitioning / shuffle / skew handled explicitly"):
- band keys already fold the band index (kernels.band_keys), so the bucket key
  is one LongType column — a single hash-partitionable shuffle key.
- pair explosion is quadratic per bucket. Buckets are split into a *normal*
  path (self-equi-join; Catalyst/AQE pick the physical join and split skewed
  partitions) and a *salted* path for giant buckets: members are striped into
  blocks of ~``salt_block_rows`` and block-pairs are enumerated via an
  exploded block-index join, so one hot key's O(m^2) work spreads over
  O((m/r)^2) independent tasks. No pairs are lost — salting redistributes,
  it does not sample.
- buckets larger than ``bucket_cap`` are dropped (recall boundary, logged):
  at corpus scale those are boilerplate whose members are already collapsed
  by the exact-sha fast path upstream (plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smqtk_indexing_spark.config import DedupConfig


def band_buckets(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (band_hash, doc_id) bucket membership rows.

    The un-aggregated form of the reference's KV multimap (``lsh.py:224-225``)
    — kept exploded so downstream groupBy/self-join shuffles on the bucket
    key directly.
    """
    return sig_df.select(
        F.col("doc_id"), F.explode("bands").alias("band_hash")
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Bucket-size profile — operator A2/S6 analog (``lsh.py:271-281``)."""
    return (
        buckets.groupBy("band_hash")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("sz")
    )


def candidate_pairs(
    buckets: DataFrame,
    cfg: DedupConfig,
    salt_threshold: int | None = None,
) -> DataFrame:
    """All unordered candidate pairs (a < b) sharing >= 1 band bucket.

    Returns distinct (a, b). Corresponds to J1+J3 in SURVEY.md §2.4.
    """
    salt_threshold = salt_threshold or cfg.salt_block_rows
    # ONE unified salted path: nb = ceil(sz / threshold) blocks per bucket.
    # Normal buckets get nb=1 (blk=0, no row replication — degenerates to a
    # plain self-equi-join on (band_hash, 0)); giant buckets stripe into
    # blocks so one hot key's O(m^2) pair work spreads over O(nb^2/2)
    # independent join tasks. Bucket sizes come from a window count over the
    # same band_hash exchange the join itself needs — Catalyst reuses that
    # single shuffle for both sides (ReusedExchange) instead of a separate
    # groupBy + join pass over the bucket table.
    w = Window.partitionBy("band_hash")
    m = (
        buckets.withColumn("sz", F.count("*").over(w))
        .where((F.col("sz") > 1) & (F.col("sz") <= cfg.bucket_cap))
        .withColumn("nb", F.ceil(F.col("sz") / F.lit(salt_threshold)).cast("int"))
        .withColumn("blk", F.pmod(F.xxhash64("doc_id"), F.col("nb")).cast("int"))
    )
    left = m.withColumn(
        "jb", F.explode(F.sequence(F.col("blk"), F.col("nb") - 1))
    ).select("band_hash", F.col("doc_id").alias("ld"), F.col("blk").alias("lb"), "jb")
    right = m.select(
        F.col("band_hash").alias("bh_r"),
        F.col("doc_id").alias("rd"),
        F.col("blk").alias("rb"),
    )
    pairs = (
        left.join(
            right,
            (F.col("band_hash") == F.col("bh_r")) & (F.col("jb") == F.col("rb")),
        )
        .where(
            (F.col("lb") < F.col("rb"))
            | ((F.col("lb") == F.col("rb")) & (F.col("ld") < F.col("rd")))
        )
        .select(F.least("ld", "rd").alias("a"), F.greatest("ld", "rd").alias("b"))
    )
    return pairs.distinct()
