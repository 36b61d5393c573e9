"""Golden / property tests for the numpy signature kernels.

Mirrors the reference's test patterns (SURVEY.md §5): known-value goldens
(``/root/reference/tests/impls/lsh_functor/test_itq.py:255-335``), seeded
property tests (``tests/impls/nn_index/test_lsh.py:754-814``), and metric
identities (``tests/utils/test_metrics.py:29-57``).
"""

import hashlib

import numpy as np
import pytest

from smqtk_indexing_spark import kernels as K
from smqtk_indexing_spark.config import DedupConfig


def test_sha256_matches_hashlib():
    # input_hint invariant: per-row content sha256 equality
    for s in ["", "hello", "def f(x):\n    return x\n", "ünïcode ✓"]:
        assert K.sha256_hex(s) == hashlib.sha256(s.encode()).hexdigest()


def test_tokenize():
    assert K.tokenize("  a  b\tc\n") == ["a", "b", "c"]
    assert K.tokenize("") == []
    assert K.tokenize("A B", lowercase=True) == ["a", "b"]


def test_tokenize_ascii_whitespace_only():
    # Unicode whitespace (NBSP, LINE SEPARATOR) must NOT split: the Java and
    # RE2 tokenizer twins are ASCII-only, and all three must agree.
    assert K.tokenize("a\xa0b") == ["a\xa0b"]          # NBSP
    assert K.tokenize("a\u2028b") == ["a\u2028b"]      # LINE SEPARATOR
    # \x0b (vertical tab) IS in the shared explicit class
    assert K.tokenize("a\x0bb") == ["a", "b"]


def test_shingles_deterministic_and_set_semantics():
    s1 = K.text_shingles("a b c d e", 4)
    s2 = K.text_shingles("a b c d e", 4)
    np.testing.assert_array_equal(s1, s2)
    assert s1.size == 2  # 'a b c d', 'b c d e'
    # repeated shingle collapses (set semantics)
    s3 = K.text_shingles("a b a b a b a b", 2)
    assert s3.size == len(set(s3)) == 2  # 'a b' and 'b a'
    # fewer than k tokens -> empty
    assert K.text_shingles("a b", 4).size == 0


def test_shingle_order_sensitivity():
    assert set(K.text_shingles("a b c d", 4)) != set(K.text_shingles("d c b a", 4))


def test_hash_strs64_length_buckets_and_long_tokens():
    # round-2 ADVICE: one long whitespace-free token in a batch must not
    # inflate the padded matrix to n_tokens x max_len (executor OOM). The
    # bucketed batch path and the chunked long-token path must both stay
    # bit-identical to the scalar twin — including empties, boundary
    # widths, and tokens straddling the long_token_bytes cutoff.
    rng = np.random.default_rng(3)
    toks = ["", "a", "ab", "x" * 63, "y" * 64, "z" * 8192, "w" * 8193,
            "long" * 5000] + [
        "t" * int(n) for n in rng.integers(0, 300, size=200)
    ]
    got = K.hash_strs64(toks)
    want = np.array([K.hash_str64(t) for t in toks], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    # memory bound: 10 MB outlier among 100k short tokens — the old
    # pad-to-max path would allocate ~8 TB here; the bucketed path is
    # linear in real bytes (would MemoryError long before finishing)
    big = [f"tok{i}" for i in range(100_000)] + ["Q" * 10_000_000]
    out = K.hash_strs64(big)
    assert int(out[0]) == K.hash_str64("tok0")
    assert int(out[-1]) == K.hash_str64("Q" * 10_000_000)


def test_minhash_identical_and_estimate():
    cfg = DedupConfig()
    a, b = K.make_minhash_perms(cfg.num_perm, cfg.seed)
    s1 = K.text_shingles("x y z w v u t s r q p o", 4)
    sig1 = K.minhash_signature(s1, a, b)
    sig2 = K.minhash_signature(s1.copy(), a, b)
    np.testing.assert_array_equal(sig1, sig2)
    assert K.minhash_estimate(sig1, sig2) == 1.0


def test_minhash_estimates_jaccard():
    # seeded property test: estimate within ~3 sigma of true Jaccard
    rng = np.random.default_rng(7)
    base = [f"tok{i}" for i in rng.integers(0, 5000, size=400)]
    edit = list(base)
    for i in rng.integers(0, 400, size=20):
        edit[int(i)] = f"mut{i}"
    a, b = K.make_minhash_perms(128, 42)
    sa = K.shingle_hashes(K.hash_strs64(base), 4)
    sb = K.shingle_hashes(K.hash_strs64(edit), 4)
    true_j = K.jaccard(sa, sb)
    est = K.minhash_estimate(
        K.minhash_signature(sa, a, b), K.minhash_signature(sb, a, b)
    )
    assert abs(est - true_j) < 3 * np.sqrt(true_j * (1 - true_j) / 128) + 0.02


def test_band_keys_collide_iff_rows_equal():
    cfg = DedupConfig()
    a, b = K.make_minhash_perms(cfg.num_perm, cfg.seed)
    s = K.text_shingles(" ".join(f"t{i}" for i in range(50)), 4)
    sig = K.minhash_signature(s, a, b)
    bk = K.band_keys(sig, cfg.bands, cfg.rows_per_band)
    assert bk.shape == (cfg.bands,)
    bk2 = K.band_keys(sig.copy(), cfg.bands, cfg.rows_per_band)
    np.testing.assert_array_equal(bk, bk2)
    # batch form agrees with single form
    batch = K.band_keys_batch(np.stack([sig, sig]), cfg.bands, cfg.rows_per_band)
    np.testing.assert_array_equal(batch[0], bk)
    # different band contents -> different keys (w.h.p.)
    assert len(set(bk.tolist())) == cfg.bands


def test_simhash_similar_docs_near_in_hamming():
    t1 = " ".join(f"w{i}" for i in range(200))
    t2 = t1.replace("w100", "zz")  # one-token edit
    t3 = " ".join(f"q{i}" for i in range(200))
    h1 = K.simhash_batch([K.text_shingles(t1, 4)])[0]
    h2 = K.simhash_batch([K.text_shingles(t2, 4)])[0]
    h3 = K.simhash_batch([K.text_shingles(t3, 4)])[0]
    assert K.hamming64(h1, h2) <= 8
    assert K.hamming64(h1, h3) > 16
    # single-doc form agrees with batch form
    assert K.simhash64(K.text_shingles(t1, 4)) == int(h1)


def test_hamming64_basics():
    # utils/metrics.py:140-155 semantics on 64-bit ints
    assert K.hamming64(0, 0) == 0
    assert K.hamming64(0b1011, 0b0010) == 2
    assert K.hamming64(2**63, 0) == 1


def test_jaccard():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([2, 3, 4], dtype=np.uint64)
    assert K.jaccard(a, b) == pytest.approx(2 / 4)
    assert K.jaccard(a, a) == 1.0
    assert K.jaccard(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 0.0


# --- CDC / substring ---

def test_cdc_interior_chunks_align_for_substring():
    rng = np.random.default_rng(3)
    inner = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=400))
    outer = "PREFIX-" * 10 + inner + "-SUFFIX" * 10
    ci = K.cdc_chunk_hashes(inner, 8, 4)
    co = K.cdc_chunk_hashes(outer, 8, 4)
    interior = set(ci[1:-1].tolist())
    assert len(interior) > 0
    assert interior <= set(co.tolist())


def test_cdc_determinism_and_coverage():
    t = "hello world " * 20
    h1 = K.cdc_chunk_hashes(t, 8, 4)
    h2 = K.cdc_chunk_hashes(t, 8, 4)
    np.testing.assert_array_equal(h1, h2)
    b = K.cdc_boundaries(t.encode(), 8, 4)
    assert b[-1] == len(t.encode())


def _chunk_table_naive(texts, window, mask_bits):
    """The former per-doc/per-chunk loop — kept as the golden twin."""
    rows = set()
    for di, text in enumerate(texts):
        t = text or ""
        ch = K.cdc_chunk_hashes(t, window, mask_bits).view(np.int64)
        inter = set(ch[1:-1].tolist()) if len(ch) >= 3 else set()
        for h in set(ch.tolist()):
            rows.add((di, len(t), h, h in inter))
    return rows


@pytest.mark.parametrize("window,mask_bits", [(8, 4), (4, 2)])
def test_cdc_chunk_table_batch_matches_naive(window, mask_bits):
    # round-3 VERDICT item 2: the batched chunk-table kernel must be
    # row-identical to the per-doc loop on a nasty corpus — unicode,
    # empty docs, docs shorter than the window, exact repeats, and a doc
    # embedded in another (multi-byte chars make byte-len != char-len)
    rng = np.random.default_rng(9)
    body = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=600))
    texts = [
        body,
        "PRE-" * 5 + body + "-POST" * 5,
        "",
        "ab",
        "x" * (window - 1),
        "héllo wörld ☃ " * 30,
        body,  # exact repeat
        None,
        "short",
        "the quick brown fox jumps over the lazy dog " * 10,
    ]
    di, nc, h, inter = K.cdc_chunk_table_batch(texts, window, mask_bits)
    got = set(zip(di.tolist(), nc.tolist(), h.tolist(), inter.tolist()))
    assert got == _chunk_table_naive(texts, window, mask_bits)
    # row count equals sum of per-doc distinct chunk counts (no dup rows)
    assert len(got) == len(di)


def test_suffix_array_matches_naive():
    for s in [b"banana", b"mississippi", b"aaaa", b"", b"ab"]:
        sa = K.suffix_array(s)
        naive = sorted(range(len(s)), key=lambda i: s[i:])
        assert sa.tolist() == naive


def test_find_containments():
    texts = ["abc", "xxabcxx", "zzz", "xxabcxx"]
    got = K.find_containments(texts)
    assert (0, 1) in got and (0, 3) in got
    assert (2, 1) not in got
    # equal texts are NOT containment (proper substring only)
    assert (1, 3) not in got and (3, 1) not in got


def test_find_containments_sa_matches_brute_short_heavy():
    # round-3 VERDICT item 3: the suffix-array kernel is the production
    # per-partition pass — must equal the brute find twin on a short-heavy
    # corpus with repeats, overlaps, unicode and adversarial patterns
    rng = np.random.default_rng(17)
    body = "".join(chr(97 + int(c)) for c in rng.integers(0, 4, size=500))
    texts = [
        body,
        "A" + body + "Z",
        body[10:60],
        body[10:60],  # duplicate containee
        "",  # empty: skipped at min_len=1
        "aa", "aaa", "aaaa" * 50,  # nested periodic strings
        "héllo ☃", "xx héllo ☃ yy",
        "zzz-unique-zzz",
        body[:30] + "#" + body[:30],  # needle occurs twice in one doc
        body[:30],
    ]
    want = K.find_containments(texts, min_len=1)
    got = K.find_containments_sa(texts, min_len=1)
    assert got == want
    assert (2, 0) in got and (3, 0) in got and (5, 6) in got
    # randomized cross-check: substrings of random docs, several sizes
    docs = ["".join(chr(97 + int(c)) for c in rng.integers(0, 3, size=int(s)))
            for s in rng.integers(1, 80, size=40)]
    assert K.find_containments_sa(docs) == K.find_containments(docs)
    # min_len=0 with EMPTY texts: both kernels must agree that an empty
    # text is never a proper-substring candidate (ADVICE r4 twin parity)
    edge = ["", "abc", "", "abcabc", "b"]
    assert K.find_containments_sa(edge, min_len=0) == K.find_containments(
        edge, min_len=0
    ) == [(1, 3), (4, 1), (4, 3)]


# --- vector functors (reference parity) ---

def test_itq_fit_collinear_golden():
    # reference golden: 5 collinear 2-D points, 1 bit -> mean 0, rotation
    # +-[1/sqrt2, 1/sqrt2] (tests/impls/lsh_functor/test_itq.py:255-270)
    x = np.array([[-2, -2], [-1, -1], [0, 0], [1, 1], [2, 2]], dtype=float)
    mean, rot = K.itq_fit(x, bits=1, n_iter=50, seed=0)
    np.testing.assert_allclose(mean, [0, 0], atol=1e-12)
    np.testing.assert_allclose(np.abs(rot.ravel()), [2**-0.5, 2**-0.5], atol=1e-8)


def test_itq_hash_decision_boundary():
    # probes around the y=-x boundary (test_itq.py:304-335 analog)
    x = np.array([[-2, -2], [-1, -1], [0, 0], [1, 1], [2, 2]], dtype=float)
    mean, rot = K.itq_fit(x, bits=1, n_iter=50, seed=0)
    h = K.itq_hash(np.array([[1.0, 1.0], [-1.0, -1.0]]), mean, rot)
    assert h[0, 0] != h[1, 0]  # opposite sides of the boundary


def test_rp_hash_shapes_and_determinism():
    rps = K.rp_fit(16, 8, seed=9)
    np.testing.assert_array_equal(rps, K.rp_fit(16, 8, seed=9))
    x = np.random.default_rng(1).standard_normal((10, 16))
    h = K.rp_hash(x, rps)
    assert h.shape == (10, 8) and h.dtype == bool


def test_bits_pack_roundtrip_msb_first():
    bits = np.array([[1, 0, 1, 1] + [0] * 60], dtype=bool)
    v = K.bits_to_int64(bits)
    # MSB-first: bit index 0 is the most significant (itq.py:46-49 convention)
    assert v[0] == np.int64(np.uint64(0b1011 << 60).view(np.int64))
    np.testing.assert_array_equal(K.int64_to_bits(v, 64), bits)


def test_metric_identities():
    # tests/utils/test_metrics.py:29-57 analogs
    z = np.zeros(4)
    assert K.histogram_intersection_distance(z, z) == 1.0
    a = np.array([0.25, 0.25, 0.25, 0.25])
    assert K.histogram_intersection_distance(a, a) == pytest.approx(0.0)
    assert K.euclidean_distance(a, a) == 0.0
    assert K.cosine_similarity(a, a) == pytest.approx(1.0)
    assert K.cosine_distance(a, a) == pytest.approx(0.0)
    b = np.array([1.0, 0, 0, 0])
    c = np.array([0, 1.0, 0, 0])
    assert K.cosine_distance(b, c) == pytest.approx(0.5)  # orthogonal -> 90deg/pi


def test_norm_vectors_zero_guard():
    x = np.array([[0.0, 0.0], [3.0, 4.0]])
    n = K.norm_vectors(x)
    np.testing.assert_allclose(n[1], [0.6, 0.8])
    np.testing.assert_allclose(n[0], [0.0, 0.0])


def test_segmented_kernels_match_per_doc():
    # the batch/segmented hot path must be bit-identical to the per-doc
    # reference kernels (tokenize_bytes == tokenize after encoding;
    # shingle_sets_batch == shingle_hashes; signatures_segmented ==
    # minhash_batch/simhash_batch), including empty and short docs
    import pandas as pd

    texts = [
        "a b c d e f g h",
        "",
        "one two",
        "x " * 50,
        "a\x0bb c d e",
        " ".join(f"t{i % 7}" for i in range(100)),
    ]
    a, b = K.make_minhash_perms(128, 42)
    tl = [K.tokenize_bytes(t) for t in texts]
    for t, toks in zip(texts, tl):
        assert [w.encode() for w in K.tokenize(t)] == toks
    nt = np.fromiter((len(t) for t in tl), np.int64, len(tl))
    flat = [x for ts in tl for x in ts]
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    th = K.hash_strs64(list(uniq))[codes]
    # scalar twin agreement
    assert int(th[0]) == K.hash_str64(tl[0][0].decode())
    values, offsets = K.shingle_sets_batch(th, nt, 4)
    off = np.concatenate([[0], np.cumsum(nt)])
    ss = []
    for i in range(len(tl)):
        s = (
            K.shingle_hashes(th[off[i] : off[i + 1]], 4)
            if nt[i]
            else np.empty(0, np.uint64)
        )
        np.testing.assert_array_equal(values[offsets[i] : offsets[i + 1]], s)
        ss.append(s)
    mh, sim = K.signatures_segmented(values, offsets, a, b)
    np.testing.assert_array_equal(mh, K.minhash_batch(ss, a, b))
    np.testing.assert_array_equal(sim, K.simhash_batch(ss))


def test_multiword_pack_roundtrip():
    # >64-bit codes: words layout is MSB-first with word 0 most significant
    rng = np.random.default_rng(5)
    for width in [64, 65, 128, 200, 256]:
        bits = rng.integers(0, 2, size=(20, width)).astype(bool)
        words = K.bits_to_words(bits)
        assert words.shape == (20, (width + 63) // 64)
        np.testing.assert_array_equal(K.words_to_bits(words, width), bits)
    # 64-bit words agree with the single-word packer
    bits = rng.integers(0, 2, size=(10, 64)).astype(bool)
    np.testing.assert_array_equal(
        K.bits_to_words(bits)[:, 0], K.bits_to_int64(bits)
    )


def test_hamming_words_kernel():
    rng = np.random.default_rng(6)
    for width in [64, 128, 256]:
        b1 = rng.integers(0, 2, size=(1, width)).astype(bool)
        b2 = b1.copy()
        flip = rng.choice(width, size=7, replace=False)
        b2[0, flip] = ~b2[0, flip]
        w1, w2 = K.bits_to_words(b1)[0], K.bits_to_words(b2)[0]
        assert K.hamming_words(w1, w2) == 7
        assert K.hamming_words(w1, w1) == 0


def test_itq_multiword_bits():
    # ITQ at 128/256 bits (reference supports up to 256, itq.py:71-78):
    # decision boundary properties hold and codes roundtrip through words
    rng = np.random.default_rng(8)
    for bits in [128, 256]:
        x = rng.standard_normal((300, 256))
        mean, rot = K.itq_fit(x, bits=bits, n_iter=10, seed=1)
        assert rot.shape == (256, bits)
        h = K.itq_hash(x[:20], mean, rot)
        assert h.shape == (20, bits)
        words = K.bits_to_words(h)
        np.testing.assert_array_equal(K.words_to_bits(words, bits), h)
        # determinism
        mean2, rot2 = K.itq_fit(x, bits=bits, n_iter=10, seed=1)
        np.testing.assert_allclose(rot, rot2)
