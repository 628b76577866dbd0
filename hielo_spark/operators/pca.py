"""Distributed PCA over an embedding column — the dimensionality-reduction
step before visualization, coarse clustering, or cheap pre-filtering of
ANN candidates.

Scale shape: one pass computes the sufficient statistics (n, Σx, ΣxxT)
as mapInPandas partials — each Arrow batch contributes a single row
holding its count, dim-sum and flattened dim×dim outer-product sum — and
the partials reduce through a posexplode→groupBy(pos) sum whose map-side
partial aggregation collapses every task to ≤ dim(dim+1) rows before the
shuffle. Only the dim×dim covariance (bounded, e.g. 64² = 4 Ki values)
reaches the driver for the eigendecomposition; the projection runs as a
numpy matmul kernel per Arrow batch. No iteration, no driver data-plane
state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA; returns (components (k, dim), explained_variance_ratio
    (k,), mean (dim,)). Component signs are canonicalized (largest-|coef|
    element positive) so results are deterministic."""

    def partials(batches):
        for pdf in batches:
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(X) == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    part = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    )
    stats = part.select(
        "n", F.posexplode(F.concat(F.col("s"), F.col("ss"))).alias("pos", "val")
    )
    summed = (
        stats.groupBy("pos").agg(F.sum("val").alias("v")).orderBy("pos").collect()
    )  # dim + dim² rows — bounded by the embedding dimension, deliberate
    n_total = part.agg(F.sum("n")).first()[0]
    flat = np.array([r["v"] for r in summed])
    # infer dim from dim + dim² = len(flat)
    dim = int((-1 + np.sqrt(1 + 4 * len(flat))) / 2)
    s, ss = flat[:dim], flat[dim:].reshape(dim, dim)
    mean = s / n_total
    cov = (ss - n_total * np.outer(mean, mean)) / max(n_total - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, dim)
    # canonical sign: largest-|coef| element of each component is positive
    for i in range(comps.shape[0]):
        j = np.abs(comps[i]).argmax()
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratios = evals[order] / evals.sum()
    return comps, ratios, mean


def pca_transform(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted components — one matmul per Arrow
    batch against the broadcast (k, dim) matrix."""
    C, m = components, mean

    @pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs]) - m
        return pd.Series(list((X @ C.T)))

    return df.withColumn(out_col, project(F.col(vec_col)))
