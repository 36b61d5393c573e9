"""ITQ train/apply operator tests — reference pattern: self-consistency and
perturbation stability (test_itq.py:304-335, test_lsh.py:790-802 analogs)."""

import numpy as np
import pytest

from smqtk_indexing_spark import kernels as K
from smqtk_indexing_spark.operators.itq import itq_fit, itq_hash_codes


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(21)
    base = rng.standard_normal((50, 16))
    pert = base + 0.01 * rng.standard_normal((50, 16))
    vecs = np.vstack([base, pert]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    return df, vecs


def test_itq_fit_apply_matches_kernel(spark, emb):
    df, vecs = emb
    model = itq_fit(df, bits=16, seed=5)
    got = {r.vec_id: r.itq_code for r in itq_hash_codes(df, model).collect()}
    exp = K.bits_to_int64(K.itq_hash(vecs.astype(np.float64), model.mean, model.rotation))
    for i in range(100):
        assert got[i] == exp[i]


def test_itq_perturbed_codes_close_in_hamming(spark, emb):
    df, _ = emb
    model = itq_fit(df, bits=16, seed=5)
    codes = {r.vec_id: r.itq_code for r in itq_hash_codes(df, model).collect()}
    dists = [K.hamming64(codes[i], codes[i + 50]) for i in range(50)]
    assert np.mean(dists) <= 2  # tiny perturbation -> near-identical codes


def test_itq_bits_exceed_dim_raises(spark, emb):
    df, _ = emb
    with pytest.raises(ValueError):
        itq_fit(df, bits=64, seed=5)  # dim is 16


def test_itq_model_save_load_roundtrip(spark, emb, tmp_path):
    # persistence round-trip (reference pattern: test_itq.py:272-302)
    df, _ = emb
    model = itq_fit(df, bits=16, seed=5)
    p = str(tmp_path / "itq_model.npz")
    model.save(p)
    from smqtk_indexing_spark.operators.itq import ItqModel

    loaded = ItqModel.load(p)
    np.testing.assert_array_equal(loaded.mean, model.mean)
    np.testing.assert_array_equal(loaded.rotation, model.rotation)
    assert loaded.normalize is None
    c1 = {r.vec_id: r.itq_code for r in itq_hash_codes(df, model).collect()}
    c2 = {r.vec_id: r.itq_code for r in itq_hash_codes(df, loaded).collect()}
    assert c1 == c2


def test_itq_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        itq_fit(empty, bits=8)
