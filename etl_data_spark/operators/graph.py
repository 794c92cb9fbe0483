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
            labels = labels.localCheckpoint(eager=True)
    return labels


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
    deg = g.groupBy(src).agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # one scalar to the driver: the vertex count (N of the PageRank formula)
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
            # materialize, and the alternative is a 2*it-join mega-plan
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
