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

from pyspark.sql import DataFrame, Window
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


def member_map(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, rep_id) for every row, rep_id = min doc_id sharing the same
    content sha256.

    Scale note: ONE exchange of (doc_id, sha256) — content itself never
    shuffles (sha256 is computed in the projection before the exchange, and
    a window-min replaces the groupBy+join-back pattern)."""
    h = with_sha256(df, text_col).select(F.col(id_col).alias("doc_id"), "sha256")
    return member_map_from_sigs(h)


def member_map_from_sigs(sig_df: DataFrame) -> DataFrame:
    """(doc_id, rep_id) from any table already carrying (doc_id, sha256) —
    the pipeline feeds it the signature stage's output
    (``compute_signatures(..., include=(..., "sha256"))``), so the exact-dup
    map costs one LEAN (doc_id, sha256) exchange with NO second content
    scan (round-4 stage table: the standalone scan was 6.3 s at local[2]
    with 0.44 scaling efficiency 2->8 — a pure scan floor)."""
    w = Window.partitionBy("sha256")
    return (
        sig_df.select("doc_id", "sha256")
        .withColumn("rep_id", F.min("doc_id").over(w))
        .select("doc_id", "rep_id")
    )


def representatives(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Collapse exact duplicates before LSH.

    Returns (reps, member_map):
    - reps: one row per distinct content — the min-id member, all original
      columns preserved.
    - member_map: (doc_id, rep_id) for every input row.

    Note: ``reps`` semi-joins the full rows and therefore shuffles content;
    the pipeline avoids it (plans/pipeline.py filters the lean signature
    table instead). Provided for API parity and small-corpus use.
    """
    mm = member_map(df, id_col, text_col)
    reps_ids = mm.where(F.col("doc_id") == F.col("rep_id")).select("doc_id")
    reps = df.join(
        reps_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
    return reps, mm
