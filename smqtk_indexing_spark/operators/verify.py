"""Verification stage: candidate pairs -> exact-Jaccard-verified dup pairs.

Reference analog: exact-distance verification + threshold/top-k over LSH
candidates (``/root/reference/smqtk_indexing/impls/nn_index/lsh.py:505-519``)
— here the exact measure is set Jaccard over shingle sets and the "top-k" is
a tau threshold (all-pairs dedup keeps every pair above tau).

Plan shape: two equi-joins fetch each side's shingle array (J2 in SURVEY.md
§2.4 — ``get_many_descriptors``, ``lsh.py:499-501``), then a pure Catalyst
expression computes Jaccard (no Python). An optional MinHash-agreement
prefilter (M6) drops hopeless candidates before the exact compute, the same
candidate-pruning idea the reference applies one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.functions import metrics as M


def verify_pairs(
    cand: DataFrame,
    sig_df: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """(a, b) candidates -> (a, b, jaccard) with jaccard >= cfg.tau.

    ``sig_df`` needs columns (doc_id, shingles[, minhash]). Shingle arrays
    are sorted-distinct int64 (kernels.text_shingles), so array_intersect /
    array_union sizes give exact set Jaccard.
    """
    use_prefilter = cfg.minhash_prefilter > 0.0
    cols = ["doc_id", "shingles"] + (["minhash"] if use_prefilter else [])
    s = sig_df.select(*cols)
    sa = s.select(
        F.col("doc_id").alias("a"),
        F.col("shingles").alias("sh_a"),
        *([F.col("minhash").alias("mh_a")] if use_prefilter else []),
    )
    sb = s.select(
        F.col("doc_id").alias("b"),
        F.col("shingles").alias("sh_b"),
        *([F.col("minhash").alias("mh_b")] if use_prefilter else []),
    )
    j = cand.join(sa, "a").join(sb, "b")
    if use_prefilter:
        j = j.where(
            M.minhash_agreement("mh_a", "mh_b") >= F.lit(cfg.minhash_prefilter)
        )
    return (
        j.withColumn("jaccard", M.jaccard_arrays("sh_a", "sh_b"))
        .where(F.col("jaccard") >= F.lit(cfg.tau))
        .select("a", "b", "jaccard")
    )
