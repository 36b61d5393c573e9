"""Substring-containment operators: CDC anchor join + per-partition
suffix-array pass, against a brute-force truth."""

import pytest

from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.operators.substrings import (
    substring_pairs,
    substring_pairs_within_partitions,
)
from smqtk_indexing_spark.sources.files import synth_files

CFG = DedupConfig()


@pytest.fixture(scope="module")
def corpus(spark):
    files, _truth = synth_files(n=400, seed=7)
    df = (
        spark.createDataFrame(files)
        .select("doc_id", "content")
        .withColumnRenamed("content", "text")
    )
    brute = {
        (int(a.doc_id), int(b.doc_id))
        for a in files.itertuples()
        for b in files.itertuples()
        if a.doc_id != b.doc_id
        and len(a.content) < len(b.content)
        and a.content in b.content
    }
    return df, brute


def test_cdc_substring_exact(spark, corpus):
    # CDC anchor join + short-containee broadcast path = EXACT containment
    df, brute = corpus
    got = [(r.inner, r.outer) for r in substring_pairs(df, CFG).collect()]
    assert len(got) == len(set(got))  # disjoint paths -> no duplicate rows
    assert set(got) == brute


def test_short_containees_found(spark):
    # docs below the CDC floor (< min_containee_chars / < 3 chunks) are
    # caught by the broadcast short path, including the empty document
    rows = [
        (1, "tiny"),
        (2, ""),
        (3, "prefix tiny suffix padding to make this one much longer " * 3),
        (4, "unrelated content with nothing shared at all " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.inner, r.outer) for r in substring_pairs(df, CFG).collect()}
    brute = {
        (a, b)
        for a, ta in rows
        for b, tb in rows
        if a != b and len(ta) < len(tb) and ta in tb
    }
    assert got == brute
    assert (1, 3) in got and (2, 3) in got and (2, 4) in got


def test_rarest_mode_equals_all_interior(spark, corpus):
    df, brute = corpus
    got = {
        (r.inner, r.outer)
        for r in substring_pairs(df, CFG, mode="rarest").collect()
    }
    assert got <= brute
    assert len(got) >= 0.99 * len(brute)


def test_suffix_array_pass_exhaustive_single_partition(spark, corpus):
    df, brute = corpus
    got = {
        (r.inner, r.outer)
        for r in substring_pairs_within_partitions(df, CFG, num_partitions=1).collect()
    }
    assert got == brute


def test_suffix_array_pass_partitioned_subset(spark, corpus):
    df, brute = corpus
    got = {
        (r.inner, r.outer)
        for r in substring_pairs_within_partitions(df, CFG, num_partitions=6).collect()
    }
    assert got <= brute
