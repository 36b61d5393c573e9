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


def _union_find_assign(pairs: list) -> dict:
    """Driver-side union-find with path compression; root = component min
    (same labels as the distributed star fixpoint)."""
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    seen = set()
    for a, b in pairs:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


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

    Hybrid execution (``driver_edge_cap``): the distinct edge set is
    counted once; at or below the cap (default 2M edges ~= 32 MB of
    longs — the same bounded-driver-collect budget family as the IVF
    sample fit) the closure runs as driver-side union-find in one pass —
    the star loop's per-round job latency (~1 s x O(log n) rounds) is
    pure fixed cost on a graph this small, the dominant non-scaling term
    in the bench's clusters stage. Above the cap: the distributed
    large-star/small-star fixpoint, unchanged — at 10^12-file scale the
    exact-dup member edges alone are O(corpus) and must never be
    collected. Labels are identical on both paths (component minimum;
    parity pytest on random graphs). ``driver_edge_cap=0`` forces the
    distributed path.

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
    e = (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if driver_edge_cap and e.count() <= driver_edge_cap:
        spark = edges.sparkSession
        # plain collect: the cap bounds this at ~32 MB of longs, and a
        # single fetch beats toLocalIterator's per-partition round-trips
        assign = _union_find_assign([(r[0], r[1]) for r in e.collect()])
        rows = [(int(k), int(v)) for k, v in assign.items()]
        out = (
            spark.createDataFrame(rows, "doc_id long, cluster_id long")
            if rows
            else spark.createDataFrame([], "doc_id long, cluster_id long")
        )
        if nodes is not None:
            singletons = (
                nodes.select(
                    F.col(nodes.columns[0]).cast("long").alias("doc_id")
                )
                .join(out, "doc_id", "left_anti")
                .withColumn("cluster_id", F.col("doc_id"))
            )
            out = out.unionByName(singletons)
        return out.distinct()

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
