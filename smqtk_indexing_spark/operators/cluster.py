"""Distributed connected components — large-star/small-star.

The clustering the north rule requires on top of the reference's pairwise
core: verified dup pairs -> transitive closure -> cluster assignments with
``cluster_id = min(doc_id)`` of the component (deterministic labels, so
cluster comparisons never depend on arbitrary ids).

Algorithm: alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — converges in O(log n)
rounds, each round two shuffles. Spark has no fixpoint operator; the driver
loops DataFrame jobs with ``localCheckpoint`` per round to cut lineage
(SURVEY.md §4 item 4).

No reference analog: the reference stops at ranked neighbor lists; the
closure is the "maximize hash collision for similar items" contract
(``/root/reference/smqtk_indexing/interfaces/lsh_functor.py:16-18``) taken
to a fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """edges (u,v) canonical u>v -> for each node, link every strictly-larger
    neighbor to the neighborhood minimum."""
    sym = edges.select(F.col("u"), F.col("v")).unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """edges (u,v) with u>v -> for each node, link all smaller-or-equal
    neighbors (and itself) to the minimum of that set."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        edges.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionAll(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return linked.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )


def _union_find_labels(a, b):
    """Vectorized driver-side connected components: (nodes, labels) numpy
    arrays with label = component-minimum doc_id (same labels as the
    distributed star fixpoint).

    Min-label propagation with pointer jumping and edge contraction — every
    step is a whole-array numpy op (no per-edge Python loop): relax each
    edge to the smaller endpoint label (``np.minimum.at`` handles duplicate
    indices), pointer-jump ``lab = lab[lab]`` to a fixpoint, then CONTRACT —
    re-express edges between component labels, drop intra-component edges,
    dedupe — so the live edge set shrinks geometrically (a dedup graph of
    many small clusters is fully solved after round one). O(log n) rounds
    worst case.

    ``np.unique`` returns nodes SORTED, so index order == doc_id order and
    the index-space minimum maps back to the value-space minimum.

    Measured (this box, 1 thread): 2M random edges over 1M nodes — a
    near-worst-case giant sparse component — = 3.1 s in 4 rounds, vs ~6 s
    for the per-edge dict union-find it replaced PLUS that path's ~100x
    per-Row py4j boxing on the collect (ADVICE r4; sort+reduceat and
    pandas-groupby relaxation variants measured 2-3x slower). This
    measurement backs ``driver_edge_cap=2M``: ~32 MB of raw int64, ~3 s
    worst-case driver CPU, far under the ~1 s/round x O(log n) star-loop
    job latency it replaces.
    """
    import numpy as np

    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while len(ia):
        m = np.minimum(lab[ia], lab[ib])
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        ia, ib = lab[ia], lab[ib]
        live = ia != ib
        ia, ib = ia[live], ib[live]
        if len(ia):
            key = np.minimum(ia, ib) * len(nodes) + np.maximum(ia, ib)
            _, first = np.unique(key, return_index=True)
            ia, ib = ia[first], ib[first]
    return nodes, nodes[lab]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    fused_rounds: int = 1,
    driver_edge_cap: int = 2_000_000,
) -> DataFrame:
    """(a, b) undirected edges -> (doc_id, cluster_id=min of component).

    ``nodes`` (single column ``doc_id``) optionally adds isolated vertices,
    which come back as singleton clusters.

    Hybrid execution (``driver_edge_cap``): ONE probe job fetches the
    distinct edge set via ``limit(cap+1)`` + Arrow; at or below the cap
    (default 2M edges ~= 32 MB of int64 — the same bounded-driver-collect
    budget family as the IVF sample fit; measured ~3.1 s of numpy
    union-find at the cap worst-case, see :func:`_union_find_labels`) the closure
    runs as a vectorized driver-side union-find — the star loop's
    per-round job latency (~1 s x O(log n) rounds) is pure fixed cost on
    a graph this small, the dominant non-scaling term in the bench's
    clusters stage. Above the cap: the distributed large-star/small-star
    fixpoint, unchanged — at 10^12-file scale the exact-dup member edges
    alone are O(corpus) and must never be collected. Labels are identical
    on both paths (component minimum; parity pytest on random graphs).
    ``driver_edge_cap=0`` forces the distributed path.

    ``fused_rounds`` large/small-star rounds run per materialized job.
    MEASURED ANTI-OPTIMIZATION above 1 (round-2 VERDICT item 6 tried and
    rejected with data): the star DAG references its input several times,
    so the unoptimized plan grows ~4x per fused round and Catalyst
    optimization time dominates — sf0.1 wall 2.2 s at 1, 4.9 s at 2,
    30.5 s at 3. Convergence semantics are safe at any value (each star
    step strictly decreases the Kiveris et al. potential until the
    star-graph fixpoint, so a fused-step fingerprint repeat implies every
    inner step was a fixpoint), but job-count savings never repay the
    optimizer blowup; kept parameterized as documentation of the result.
    """
    e_lazy = (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    if driver_edge_cap:
        # ONE job probes AND fetches: distinct -> limit(cap+1) -> Arrow
        # collect. At or below the cap the whole edge set is already on the
        # driver as two int64 numpy columns (no eager checkpoint, no count
        # job, no py4j Row boxing — the previous shape paid three jobs and
        # ~100x per-Row overhead, ADVICE r4). Over the cap the probe's
        # distinct is recomputed by the checkpoint below — the rare branch
        # pays one extra pass; the common branch saves two fixed-latency
        # jobs per clustering call.
        pdf = e_lazy.limit(driver_edge_cap + 1).toPandas()
        if len(pdf) <= driver_edge_cap:
            import pandas as pd

            spark = edges.sparkSession
            uf_nodes, uf_labels = _union_find_labels(
                pdf["u"].to_numpy("int64"), pdf["v"].to_numpy("int64")
            )
            out = spark.createDataFrame(
                pd.DataFrame({"doc_id": uf_nodes, "cluster_id": uf_labels}),
                schema="doc_id long, cluster_id long",
            )
            if nodes is not None:
                singletons = (
                    nodes.select(
                        F.col(nodes.columns[0]).cast("long").alias("doc_id")
                    )
                    .join(out, "doc_id", "left_anti")
                    .withColumn("cluster_id", F.col("doc_id"))
                )
                # no trailing distinct: assignments are unique per doc_id by
                # construction and the anti-joined singleton set is disjoint
                out = out.unionByName(singletons)
            return out
    e = e_lazy.localCheckpoint(eager=True)

    def _sig(df: DataFrame) -> tuple:
        # one-action convergence fingerprint: (count, wrapped hash sum)
        row = df.agg(
            F.count("*").alias("c"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # overflow-free fold
        ).collect()[0]
        return (row.c, row.h)

    sig = _sig(e)
    for _ in range(max_iter):
        # LAZY localCheckpoint: the convergence-fingerprint action is the
        # one job that materializes the round (an eager checkpoint would
        # add a second job per round — pure fixed cost), while the
        # checkpoint still truncates the logical plan every round (the
        # star DAG references its input several times, so an untruncated
        # plan grows ~4x per round and optimizer time explodes).
        e2 = e
        for _ in range(max(1, fused_rounds)):
            e2 = _small_star(_large_star(e2))
        e2 = e2.localCheckpoint(eager=False)
        sig2 = _sig(e2)
        old = e
        e = e2
        old.unpersist()
        if sig2 == sig:
            break
        sig = sig2
    assign = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    out = assign.unionByName(roots)
    if nodes is not None:
        singletons = (
            nodes.select(F.col(nodes.columns[0]).cast("long").alias("doc_id"))
            .join(out, "doc_id", "left_anti")
            .withColumn("cluster_id", F.col("doc_id"))
        )
        out = out.unionByName(singletons)
    return out.distinct()
