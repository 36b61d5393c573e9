"""Partition-local BallTree k-NN with a global top-k merge — operator J6
(reference: ``/root/reference/smqtk_indexing/impls/hash_index/
sklearn_balltree.py:337-375``, the ``BallTree.query`` call).

Spark mapping (SURVEY.md §2.4 J6): the corpus stays sharded across
partitions; each task indexes ITS shard — with ``sklearn.neighbors.BallTree``
when the library is importable (the reference's exact dependency; not baked
into this container) and an exact vectorized scan otherwise — and reports
the shard-local top-k for every query in the broadcast query batch. A
window-rank merge keeps the global top-k. Both local paths are EXACT, so
results are identical with or without sklearn and equal the brute-force
euclidean ranking (oracle-checkable).

Scale shape: the query batch is the broadcast small side (the reference's
``nn()`` is called with one or a few query descriptors); the corpus never
moves. Per-task work is O(|shard| * |queries|) without the tree and
O(|queries| * log|shard|) with it; the merge shuffles only
O(|queries| * k * n_partitions) candidate rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_topk(qx: np.ndarray, x: np.ndarray, k: int):
    """Exact per-shard top-k: sklearn BallTree when available, else a
    vectorized distance scan. Returns (dists (nq, k'), idx (nq, k'))."""
    k = min(k, x.shape[0])
    try:  # pragma: no cover - container has no sklearn; exercised elsewhere
        from sklearn.neighbors import BallTree

        tree = BallTree(x)
        d, i = tree.query(qx, k=k)
        return d, i
    except ImportError:
        d2 = (
            (qx * qx).sum(axis=1)[:, None]
            - 2.0 * (qx @ x.T)
            + (x * x).sum(axis=1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(qx.shape[0])[:, None]
        order = np.argsort(d2[rows, idx], axis=1, kind="stable")
        idx = idx[rows, order]
        return np.sqrt(d2[rows, idx]), idx


def balltree_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN (euclidean) of each query against the full corpus.

    ``queries`` defaults to the corpus itself (all-pairs form, self-matches
    excluded). The query batch is collected and broadcast — it is the small
    side by contract, mirroring the reference's per-query ``nn()`` surface.
    """
    queries = queries if queries is not None else corpus
    qrows = queries.select(
        F.col(id_col).cast("long"), F.col(vec_col)
    ).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_vecs = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_vecs))
    # +1 so a shard containing a query's own row still yields k neighbors
    k_local = k + 1

    def per_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, qx = bq.value
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ids_x = pdf[id_col].to_numpy()
            if x.shape[0] == 0:
                continue
            d, i = _local_topk(qx, x, k_local)
            nq, kk = d.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_q, kk),
                    "neighbor_id": ids_x[i].ravel().astype(np.int64),
                    "dist": d.ravel(),
                }
            )

    locals_df = corpus.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col)
    ).mapInPandas(per_shard, schema="query_id long, neighbor_id long, dist double")
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        locals_df.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("dist", 6).alias("score"),
        )
    )
