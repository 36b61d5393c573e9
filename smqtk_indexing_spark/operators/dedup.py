"""Exact-duplicate detection — the sha256 fast path.

Per-row content sha256 is the BASELINE input_hint invariant (P10 in
SURVEY.md §2.2); grouping on it is the exact-equality fast path that both
answers exact-dup queries in one aggregation and removes the worst bucket
skew before LSH (identical documents would otherwise collide in *every*
band — the reference's identical-hash bucketing, ``/root/reference/
smqtk_indexing/impls/nn_index/lsh.py:315-323``, is the same idea one level
weaker).

All pure Catalyst expressions — `sha2` is a JVM built-in, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_sha256(df: DataFrame, text_col: str = "text", out: str = "sha256") -> DataFrame:
    return df.withColumn(out, F.sha2(F.encode(F.col(text_col), "utf-8"), 256))


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(sha256, n_dups, doc_ids sorted, rep_id = min) for groups of size > 1."""
    return (
        with_sha256(df, text_col)
        .groupBy("sha256")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("rep_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def exact_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unordered (a < b) pairs of byte-identical documents."""
    h = with_sha256(df, text_col).select(F.col(id_col).alias("doc_id"), "sha256")
    x, y = h.alias("x"), h.alias("y")
    return (
        x.join(y, "sha256")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )


def representatives(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Collapse exact duplicates before LSH.

    Returns (reps, member_map):
    - reps: one row per distinct content — the min-id member, all original
      columns preserved.
    - member_map: (doc_id, rep_id) for every input row.
    """
    h = with_sha256(df, text_col)
    w_rep = h.groupBy("sha256").agg(F.min(id_col).alias("rep_id"))
    member_map = h.select(id_col, "sha256").join(w_rep, "sha256").select(
        F.col(id_col).alias("doc_id"), "rep_id"
    )
    reps = (
        h.join(w_rep, (h["sha256"] == w_rep["sha256"]) & (h[id_col] == w_rep["rep_id"]))
        .select(*[h[c] for c in df.columns])
    )
    return reps, member_map
