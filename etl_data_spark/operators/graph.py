"""Iterative graph algorithms as DataFrame loops (PageRank).

The Pregel-on-DataFrames shape, same machinery as operators/dedup.py's
connected components: the edge list (partitioned by source) is joined to
the current rank frame each superstep, contributions are partial-agg
summed by destination, and ``localCheckpoint`` truncates the growing
lineage every few supersteps so the plan stays bounded.

Scale: each iteration is exactly one shuffle (the groupBy on dst); the
edge list and degree frame are computed once and persisted. At 100 TB the
standard refinements are (a) pre-partition edges and ranks on the same
key so the per-iteration join is co-located, (b) AQE skew handling for
celebrity vertices; both compose with this loop unchanged. A GraphX port
would buy vertex-cut partitioning, but the DataFrame loop keeps the
whole-stage-codegen path and needs no extra dependency.

Determinism: rank updates are double sums over each vertex's neighbor
set; fold order varies per run/engine at ~1e-15 relative, and damping
(0.85 < 1) contracts rather than amplifies it across iterations — so
emitting ranks rounded to 8dp is hash-stable (the registered query also
*orders* by the rounded value, so cross-engine ties cannot reorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_spark.caching import truncate_lineage

CHECKPOINT_EVERY = 3


def symmetrize(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Undirected view: every edge contributes both directions."""
    return edges.select(src, dst).unionAll(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Synchronous label propagation (community detection); returns (v, label).

    Labels start as vertex ids; each superstep every vertex adopts the
    most frequent label among its neighbors, ties broken by the SMALLEST
    label — a fully integer-exact update rule, so results are
    bit-identical across engines and partitionings with no rounding at
    all. Fixed ``iters`` synchronous supersteps (the deterministic spec;
    convergence detection would add a count action per step).

    Same execution shape as :func:`pagerank`: one shuffle per superstep
    (the neighbor-label histogram groupBy), persisted symmetrized edges,
    ``localCheckpoint`` lineage truncation.
    """
    g = symmetrize(edges, src, dst).persist()
    try:
        labels = g.select(F.col(src).alias("v")).distinct().select(
            "v", F.col("v").alias("label")
        )
        for it in range(1, iters + 1):
            hist = (
                g.join(labels.withColumnRenamed("v", src), src)
                .groupBy(F.col(dst).alias("v"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # most frequent neighbor label, smallest label on ties — as a
            # partial-agg min over (-cnt, label), not a per-vertex window
            labels = hist.groupBy("v").agg(
                F.min(F.struct((-F.col("cnt")).alias("neg"), "label"))
                .getField("label")
                .alias("label")
            )
            if it % CHECKPOINT_EVERY == 0 and it < iters:
                labels = truncate_lineage(labels)
        # materialize (|V| rows) so the returned frame no longer references
        # the scratch edge frame, which the finally releases — the operator
        # leaves no storage behind (self-containment contract, caching.py)
        return truncate_lineage(labels)
    finally:
        g.unpersist()


def bfs_hops(
    edges: DataFrame,
    source,
    max_hops: int = 6,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Single/multi-source BFS hop distances; returns (v, hops).

    Frontier expansion on the undirected graph: each superstep joins the
    previous frontier to the (persisted, symmetrized) edge list, anti-joins
    against everything already reached, and tags survivors with the hop
    number — exactly one shuffle pair (join + distinct) per level, and the
    per-level anti-join keeps the frontier monotone so a vertex's first
    discovery IS its shortest hop count (unweighted). Runs a FIXED
    ``max_hops`` supersteps with no convergence action, so the plan is
    deterministic and matches the unrolled-CTE oracle level for level;
    an empty frontier makes the remaining levels no-ops (empty joins),
    which Spark executes in microseconds.

    ``source`` is a Column predicate seed: vertices where it evaluates
    true start at hops=0. Integer-exact throughout — no floats, so results
    are bit-identical across engines and partitionings.

    Scale: state is one (v, hops) row per REACHED vertex; each level
    shuffles only the frontier joined to its adjacency, not the whole
    graph. ``localCheckpoint`` truncates the union lineage every level
    (the dist frame is |V| rows at most). At 100 TB the standard
    refinement is partitioning edges and dist on the same key so the
    per-level join is co-located; the loop is unchanged.
    """
    g = symmetrize(edges, src, dst).persist()
    try:
        verts = g.select(F.col(src).alias("v")).distinct()
        dist = verts.filter(source).select("v", F.lit(0).alias("hops"))
        frontier = dist.select("v")
        for h in range(1, max_hops + 1):
            reached = (
                g.join(frontier.withColumnRenamed("v", src), src)
                .select(F.col(dst).alias("v"))
                .distinct()
            )
            new = reached.join(dist, "v", "left_anti").select(
                "v", F.lit(h).alias("hops")
            )
            dist = truncate_lineage(dist.unionByName(new))
            # derive the next frontier FROM the checkpointed dist, not from
            # `new` — `new`'s lineage (join + distinct + anti-join) would be
            # re-executed by the next level's join (the plan-branch reuse
            # rule, SCALE.md §11; measured 8.0s -> ~2s at sf0.1)
            frontier = dist.filter(F.col("hops") == h).select("v")
        # dist is already checkpointed every level, so releasing the edge
        # frame here leaves the returned plan self-contained
        return dist
    finally:
        g.unpersist()


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """PageRank over an undirected edge list; returns (v, r).

    ``edges`` is one row per undirected edge (u < v); both directions are
    materialized here. Every vertex in the symmetrized list has degree
    >= 1, so there is no dangling mass to redistribute.
    """
    g = symmetrize(edges, src, dst).persist()
    ge = None
    try:
        deg = g.groupBy(src).agg(F.count(F.lit(1)).cast("double").alias("deg"))
        # one scalar to the driver: the vertex count (N of the formula)
        n = float(deg.count())
        ge = g.join(deg, src).persist()

        ranks = deg.select(
            F.col(src).alias("v"), (F.lit(1.0) / F.lit(n)).alias("r")
        )
        for it in range(1, iters + 1):
            contrib = ge.join(
                ranks.withColumnRenamed("v", src), src
            ).groupBy(F.col(dst).alias("v"))
            ranks = contrib.agg(
                (
                    F.lit(1.0 - damping) / F.lit(n)
                    + F.lit(damping) * F.sum(F.col("r") / F.col("deg"))
                ).alias("r")
            )
            if it % CHECKPOINT_EVERY == 0 and it < iters:
                # truncate lineage: the rank frame is |V| rows — cheap to
                # materialize; the alternative is a 2*it-join mega-plan
                ranks = truncate_lineage(ranks)
        # materialize (|V| rows) to decouple from the scratch frames the
        # finally releases (self-containment contract, caching.py)
        return truncate_lineage(ranks)
    finally:
        g.unpersist()
        if ge is not None:
            ge.unpersist()
