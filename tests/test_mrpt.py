"""MRPT operator tests — reference patterns: leaf-count math, perturbed
query returns its source, pathological collinear input degrades gracefully
(tests/impls/nn_index/test_mrpt.py:184-258 analogs)."""

import numpy as np
import pytest

from smqtk_indexing_spark import kernels as K
from smqtk_indexing_spark.operators.mrpt import (
    MrptModel,
    mrpt_fit,
    mrpt_leaf_table,
    mrpt_topk,
)


def test_mrpt_kernel_split_balance():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((512, 8))
    bases, splits = K.mrpt_fit(x, n_trees=2, depth=3, seed=1)
    leaves = K.mrpt_leaves(x, bases, splits)
    assert leaves.shape == (512, 2)
    assert leaves.min() >= 0 and leaves.max() < 8
    # median splits -> roughly balanced leaves
    for t in range(2):
        counts = np.bincount(leaves[:, t], minlength=8)
        assert counts.max() <= 512 // 8 * 2


def test_mrpt_collinear_degrades_gracefully():
    # all-collinear fixture (test_mrpt.py:184-258 analog): must not crash
    x = np.outer(np.linspace(-1, 1, 64), np.ones(4))
    bases, splits = K.mrpt_fit(x, n_trees=1, depth=2, seed=0)
    leaves = K.mrpt_leaves(x, bases, splits)
    assert leaves.shape == (64, 1)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 16))
    pert = base + 0.02 * rng.standard_normal((40, 16))
    vecs = np.vstack([base, pert]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    return df, vecs


def test_mrpt_leaf_table_shape_and_determinism(spark, emb):
    df, vecs = emb
    model = mrpt_fit(df, n_trees=4, depth=3, seed=9)
    rows = mrpt_leaf_table(df, model).collect()
    assert len(rows) == 80 * 4
    exp = K.mrpt_leaves(vecs.astype(np.float64), model.bases, model.splits)
    got = {(r.vec_id, r.tree_id): r.leaf_id for r in rows}
    for i in range(80):
        for t in range(4):
            assert got[(i, t)] == exp[i, t]


def test_mrpt_topk_planted_neighbors(spark, emb):
    df, _ = emb
    got = {
        r.query_id: r.neighbor_id
        for r in mrpt_topk(df, k=1, n_trees=8, depth=3, seed=9).collect()
        if r.rank == 1
    }
    hits = sum(1 for i in range(40) if got.get(i) == i + 40)
    hits += sum(1 for i in range(40) if got.get(i + 40) == i)
    assert hits >= 0.85 * 80, f"planted-neighbor recall too low: {hits}/80"


def test_mrpt_model_roundtrip(spark, emb, tmp_path):
    df, _ = emb
    model = mrpt_fit(df, n_trees=2, depth=3, seed=9)
    p = str(tmp_path / "mrpt.npz")
    model.save(p)
    loaded = MrptModel.load(p)
    np.testing.assert_array_equal(loaded.bases, model.bases)
    np.testing.assert_array_equal(loaded.splits, model.splits)
