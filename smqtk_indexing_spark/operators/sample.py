"""Unbiased bounded sampling for model-fit stages.

The reference trains its functors on whatever descriptor iterable it is
handed (``/root/reference/smqtk_indexing/impls/lsh_functor/itq.py:291-344``,
``impls/nn_index/mrpt.py:239-266``); the Spark analog must bound the
driver-collected sample WITHOUT biasing it. A bare ``.limit(n)`` takes whole
partitions in order — at corpus scale that trains the model on one shard's
prefix. Ordering by a seeded hash of the row first turns the limit into a
uniform-at-random (but fully deterministic) draw across ALL partitions, and
Catalyst executes sort+limit as TakeOrderedAndProject: a per-partition
top-n heap + driver merge, never a full sort/shuffle of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_sample(df: DataFrame, n: int, seed: int = 0) -> DataFrame:
    """Deterministic pseudo-random sample of ``n`` rows drawn from every
    partition (hash-ordered TakeOrdered), not a partition prefix."""
    key = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    return df.orderBy(key).limit(n)
