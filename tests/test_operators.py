"""Spark-operator tests: signature stage, candidate generation (normal +
salted paths), verification, exact dedup, incremental lifecycle.

Mirrors the reference's state-transition + seeded-property patterns
(``/root/reference/tests/impls/nn_index/test_lsh.py:190-814``).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smqtk_indexing_spark import kernels as K
from smqtk_indexing_spark.config import DedupConfig
from smqtk_indexing_spark.operators import dedup, incremental
from smqtk_indexing_spark.operators.candidates import band_buckets, candidate_pairs
from smqtk_indexing_spark.operators.signatures import compute_signatures
from smqtk_indexing_spark.operators.verify import verify_pairs

CFG = DedupConfig()


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i j"),          # exact dup of 0
        (2, "a b c d e f g h i XX"),          # near dup of 0
        (3, "completely different tokens here now ok yes no maybe"),
        (4, "ti ny"),                          # < k tokens -> no shingles
        (5, None),                             # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_signatures_schema_and_kernel_parity(spark, small_docs):
    sigs = compute_signatures(small_docs, CFG).orderBy("doc_id").collect()
    assert [r.doc_id for r in sigs] == [0, 1, 2, 3, 4, 5]
    r0 = sigs[0]
    # parity with the pure kernel
    a, b = K.make_minhash_perms(CFG.num_perm, CFG.seed)
    sh = K.text_shingles("a b c d e f g h i j", CFG.shingle_k)
    exp_sig = K.minhash_signature(sh, a, b).view(np.int64)
    assert r0.minhash == exp_sig.tolist()
    assert r0.simhash == np.uint64(K.simhash64(sh)).view(np.int64)
    assert r0.n_shingles == sh.size
    assert len(r0.bands) == CFG.bands
    # exact dup -> identical signature; empty/null docs -> no bands
    assert sigs[1].minhash == r0.minhash
    assert sigs[4].bands == [] and sigs[5].bands == []
    assert sigs[5].n_tokens == 0


def test_candidates_find_dups_and_skip_empty(spark, small_docs):
    sigs = compute_signatures(small_docs, CFG)
    pairs = {
        (r.a, r.b)
        for r in candidate_pairs(band_buckets(sigs, CFG), CFG).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs and (1, 2) in pairs
    for a, b in pairs:
        assert a < b
        assert 4 not in (a, b) and 5 not in (a, b)


def test_salted_path_equals_normal_path(spark):
    # 40 docs all sharing identical content -> one giant bucket per band;
    # salted block join must enumerate exactly the same C(40,2) pairs.
    rows = [(i, "x y z w " * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = compute_signatures(df, CFG)
    buckets = band_buckets(sigs, CFG)
    normal = {
        (r.a, r.b)
        for r in candidate_pairs(buckets, CFG, salt_threshold=1000).collect()
    }
    salted = {
        (r.a, r.b)
        for r in candidate_pairs(buckets, CFG, salt_threshold=8).collect()
    }
    assert normal == salted
    assert len(normal) == 40 * 39 // 2


def test_giant_bucket_at_bucket_cap_bounded_rows(spark):
    # one bucket at EXACTLY bucket_cap members, many blocks (round-4
    # VERDICT item 4): the block-pair machinery must enumerate all
    # C(m, 2) pairs without materializing the nested block-pair array in
    # a single row — index pairs explode first, blocks are sliced per
    # exploded row (peak per-row = one block pair, ~2 x salt rows).
    from dataclasses import replace

    m, salt = 2000, 64
    cfg = replace(CFG, bucket_cap=m, salt_block_rows=salt)
    buckets = spark.createDataFrame(
        [(7, i) for i in range(m)], "band_hash long, doc_id long"
    )
    out = candidate_pairs(buckets, cfg, salt_threshold=salt)
    assert out.count() == m * (m - 1) // 2
    # spot parity with the unsalted path on a slice of the id space
    sample = {
        (r.a, r.b)
        for r in out.where((F.col("a") < 10) & (F.col("b") < 10)).collect()
    }
    assert sample == {(a, b) for a in range(10) for b in range(a + 1, 10)}


def test_hybrid_mixed_small_and_giant_buckets(spark):
    # corpus with BOTH a giant bucket family (30 identical docs -> giant at
    # salt_threshold=8) and small-bucket near-dup groups in the same run:
    # the small-bucket window-join leg and the giant salted in-row leg must
    # union + dedupe into exactly the brute-force co-bucket pair set
    rows = [(i, "giant family content a b c d " * 5) for i in range(30)]
    rows += [(100 + i, f"small group one {i % 2} x y z w " * 4) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = compute_signatures(df, CFG)
    buckets = band_buckets(sigs, CFG)
    want = {
        (r.a, r.b)
        for r in candidate_pairs(buckets, CFG, salt_threshold=10_000).collect()
    }
    got_rows = candidate_pairs(buckets, CFG, salt_threshold=8).collect()
    got = {(r.a, r.b) for r in got_rows}
    assert len(got_rows) == len(got)  # cross-leg duplicates removed
    assert got == want
    giant_ids = set(range(30))
    assert {(a, b) for a, b in got if a in giant_ids} >= {
        (a, b) for a in range(30) for b in range(a + 1, 30)
    }


def test_candidate_pairs_local_parity(spark):
    # r07: the one-exchange per-partition generator must emit exactly the
    # hybrid all-mode pair set — mixed small + giant buckets, cap drops,
    # cross-band duplicates removed — for every salt threshold.
    from dataclasses import replace

    from smqtk_indexing_spark.operators.candidates import candidate_pairs_local

    rows = [(i, "giant family content a b c d " * 5) for i in range(30)]
    rows += [(100 + i, f"small group one {i % 2} x y z w " * 4) for i in range(4)]
    rows += [(200 + i, f"unique doc {i} alpha beta gamma delta " * 3) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    buckets = band_buckets(compute_signatures(df, CFG), CFG)
    for salt in (8, 64, 10_000):
        want = {
            (r.a, r.b)
            for r in candidate_pairs(buckets, CFG, salt_threshold=salt).collect()
        }
        got_rows = candidate_pairs_local(buckets, CFG, salt_threshold=salt).collect()
        got = {(r.a, r.b) for r in got_rows}
        assert len(got_rows) == len(got)  # distinct
        assert got == want, salt
    # bucket_cap drop parity: cap below the giant family size drops it in
    # both generators
    cfg_cap = replace(CFG, bucket_cap=20)
    want = {
        (r.a, r.b) for r in candidate_pairs(buckets, cfg_cap, mode="all").collect()
    }
    got = {(r.a, r.b) for r in candidate_pairs_local(buckets, cfg_cap).collect()}
    assert got == want


def test_verify_thresholds(spark, small_docs):
    sigs = compute_signatures(small_docs, CFG)
    cand = candidate_pairs(band_buckets(sigs, CFG), CFG)
    out = {(r.a, r.b): r.jaccard for r in verify_pairs(cand, sigs, CFG).collect()}
    assert out[(0, 1)] == 1.0
    # (0,2): 7 shared of 7+7-7... shingles of 10 tokens k=4 -> 7 each, 6 shared
    assert (0, 2) in out and 0.7 < out[(0, 2)] < 1.0 or (0, 2) not in out
    assert all(j >= CFG.tau for j in out.values())


def test_exact_dedup_and_representatives(spark, small_docs):
    d = small_docs.where(F.col("text").isNotNull())
    groups = dedup.exact_dup_groups(d).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [0, 1] and groups[0].rep_id == 0
    pairs = {(r.a, r.b) for r in dedup.exact_dup_pairs(d).collect()}
    assert pairs == {(0, 1)}
    reps, member_map = dedup.representatives(d)
    assert reps.count() == 4  # 0(rep of {0,1}), 2, 3, 4
    mm = {r.doc_id: r.rep_id for r in member_map.collect()}
    assert mm[1] == 0 and mm[0] == 0 and mm[2] == 2


def test_sha256_matches_python(spark, small_docs):
    rows = dedup.with_sha256(small_docs.where(F.col("text").isNotNull())).collect()
    for r in rows:
        assert r.sha256 == K.sha256_hex(r.text)


def test_incremental_update_skips_existing(spark, small_docs):
    base = small_docs.where(F.col("doc_id") < 3)
    sigs = incremental.build_index(base, CFG)
    assert incremental.count(sigs) == 3
    new = spark.createDataFrame(
        [(2, "a b c d e f g h i XX"), (7, "brand new document text here ok")],
        "doc_id long, text string",
    )
    updated = incremental.update_index(sigs, new, CFG)
    assert incremental.count(updated) == 4  # id 2 skipped, id 7 added
    # update with only-existing ids is a no-op
    again = incremental.update_index(updated, new, CFG)
    assert incremental.count(again) == 4


def test_incremental_remove_contract(spark, small_docs):
    sigs = incremental.build_index(small_docs.where(F.col("doc_id") < 4), CFG)
    out = incremental.remove_from_index(sigs, [1, 3])
    assert {r.doc_id for r in out.select("doc_id").collect()} == {0, 2}
    # KeyError on unknown id, index unmodified (nearest_neighbor_index.py:89-91)
    with pytest.raises(KeyError):
        incremental.remove_from_index(sigs, [0, 99])
    assert incremental.count(sigs) == 4


def test_empty_input_guard(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        incremental.build_index(empty, CFG)


def test_bounded_sample_draws_from_all_partitions(spark):
    # VERDICT r1 item 7: the model-fit sample must not be a partition
    # prefix. Rows are range-partitioned so ids 0..999 and 1000..1999 land
    # in different partitions; a 400-row bounded_sample must hit both, and
    # must be deterministic.
    from pyspark.sql import functions as F

    from smqtk_indexing_spark.operators.sample import bounded_sample

    df = spark.range(0, 2000, 1, 2).select(F.col("id").cast("long"))
    s1 = [r.id for r in bounded_sample(df, 400, seed=1).collect()]
    s2 = [r.id for r in bounded_sample(df, 400, seed=1).collect()]
    assert s1 == s2
    assert len(s1) == 400
    lo = sum(1 for i in s1 if i < 1000)
    assert 100 < lo < 300  # both partitions represented, roughly evenly
    # different seed -> different draw
    s3 = [r.id for r in bounded_sample(df, 400, seed=2).collect()]
    assert s1 != s3
