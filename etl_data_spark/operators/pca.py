"""Distributed PCA over an embedding column via one-pass Gram matrix.

The 100 TB shape: a d-dim embedding table of N rows needs only the d x d
Gram matrix X'X (plus the column mean for centering) to compute principal
components — d^2 doubles of driver state regardless of N. Each Arrow batch
contributes a partial Gram with one BLAS syrk-style matmul; partials are
element-wise sums, so the aggregation is a partial-agg groupBy on (i, j)
over d^2-row batch outputs — kilobytes per batch, never the vectors again.
The eigendecomposition runs on the driver (d x d, microseconds), and the
projection is a second vectorized pass.

Two Gram constructions:

- :func:`gram_matrix` — exact decimal path (posexplode + self-join on the
  vector id, decimal(18,9) products). Fold-order-independent, hence
  hash-verifiable against a SQL oracle; the d^2 row blow-up of the explode
  makes it the small-d / verification path.
- :func:`gram_matrix_blas` — Arrow-batched mapInPandas partial Grams.
  Float64 BLAS, O(batch * d^2) flops with no row blow-up: the production
  path. Equality to the exact path is asserted in tests at 1e-6 (float
  fold order), mirroring brute_force_topk vs its vectorized twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact upper-triangle Gram: (i, j, gram) for i <= j, decimal sums."""
    x = df.select(
        id_col, F.posexplode(vec_col).alias("i", "x")
    ).select(
        id_col,
        "i",
        F.col("x").cast("double").cast("decimal(18,9)").alias("x"),
    )
    a, b = x.alias("a"), x.alias("b")
    # round the EXACT decimal sum to 9dp before the double cast: a
    # scale-18 decimal -> double conversion is not correctly rounded in
    # every engine (int128 / 1e18 in float arithmetic), which shows up as
    # last-ulp hash mismatches; at scale 9 the integer part is
    # double-exact and the division by 1e9 is a single correctly-rounded
    # IEEE op, so both engines emit the identical double
    return (
        a.join(b, on=id_col)
        .filter(F.col("a.i") <= F.col("b.i"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.round(F.sum(F.col("a.x") * F.col("b.x")), 9)
            .cast("double")
            .alias("gram")
        )
    )


def gram_matrix_blas(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Partial-Gram mapInPandas: each batch emits its d^2 contribution."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = mat.T @ mat
            d = g.shape[0]
            i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            keep = i <= j
            yield pd.DataFrame(
                {"i": i[keep], "j": j[keep], "gram": g[keep]}
            )

    partials = df.select(vec_col).mapInPandas(
        partial, schema="i int, j int, gram double"
    )
    return partials.groupBy("i", "j").agg(F.sum("gram").alias("gram"))


def pca_project(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project vectors onto the top-k principal components.

    Pass 1 aggregates mean + Gram (via :func:`gram_matrix_blas` partials
    and a mean reduction); the d x d eigenproblem solves on the driver;
    pass 2 is a vectorized mapInPandas matmul against the broadcast
    component matrix. Component sign is fixed (largest-|loading| entry
    made positive) so results are deterministic up to float fold order.
    """
    import numpy as np
    import pandas as pd

    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at(vec_col, i + 1).cast("double")).alias(f"s{i}")
            for i in range(_dim(df, vec_col))
        ],
    ).collect()[0]
    d = _dim(df, vec_col)
    n = stats["n"]
    mean = np.array([stats[f"s{i}"] for i in range(d)]) / n

    gram_rows = gram_matrix_blas(df, vec_col).collect()
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["i"], r["j"]] = r["gram"]
        g[r["j"], r["i"]] = r["gram"]
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for c in range(comps.shape[1]):
        pivot = np.argmax(np.abs(comps[:, c]))
        if comps[pivot, c] < 0:
            comps[:, c] = -comps[:, c]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (mat - mean) @ comps
            out = {id_col: pdf[id_col].to_numpy()}
            for c in range(proj.shape[1]):
                out[f"pc{c}"] = proj[:, c]
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"pc{c} double" for c in range(k)]
    )
    return df.select(id_col, vec_col).mapInPandas(project, schema=schema)


def _dim(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])
