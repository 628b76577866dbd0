"""K-means (Lloyd) over an embedding column — full iterative clustering,
the corpus-partitioning primitive behind IVF indexing, domain discovery,
and diversity sampling (similarity.ivf_topk inlines a single round of
this; here the loop runs to convergence).

Scale shape: per iteration, ONE pass over the corpus — assignment is a
numpy argmin over the broadcast k×dim centroid matrix inside an
Arrow-batched kernel (no k-fold row blow-up, unlike the join+window
argmin), and the centroid update is a per-cluster array-mean
aggregation. Driver state is only the k×dim centroid matrix (same
bounded-collect policy as similarity.ivf_topk); the vector frame is
persisted across iterations so parquet is read once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf


def _assign_udf(centroids: np.ndarray):
    """pandas_udf mapping a vector to (nearest cluster, squared dist).
    ||x−c||² = ||x||² − 2x·c + ||c||², argmin over the centroid axis —
    one matmul per Arrow batch."""
    C = centroids  # (k, dim)
    c_sq = np.einsum("ij,ij->i", C, C)  # (k,)

    @pandas_udf("struct<cluster: int, sq_dist: double>")
    def assign(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"cluster": [], "sq_dist": []})
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])  # (n, dim)
        d2 = np.einsum("ij,ij->i", X, X)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
        best = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": best.astype(np.int32),
             "sq_dist": np.maximum(d2[np.arange(len(X)), best], 0.0)}
        )

    return assign


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray, int]:
    """Lloyd's algorithm with deterministic init (k vectors in xxhash64
    order — no RNG state, reproducible on any partitioning). Returns
    (assignments frame ``(id, cluster, sq_dist)``, final k×dim centroid
    matrix, iterations run). Stops when the max centroid L2 shift drops
    below ``tol`` or after ``max_iter`` rounds. Empty clusters keep their
    previous centroid."""
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    try:
        init_rows = (
            vecs.orderBy(F.xxhash64(F.col("id"), F.lit(seed)))
            .limit(k)
            .collect()  # k rows — bounded, deliberate (same policy as IVF)
        )
        C = np.array([r["v"] for r in init_rows], dtype=np.float64)
        dim = C.shape[1]
        iters = 0
        for _ in range(max_iter):
            iters += 1
            assigned = vecs.select(
                "id", "v", _assign_udf(C)(F.col("v")).alias("a")
            ).select("id", "v", "a.cluster")
            means = (
                assigned.groupBy("cluster")
                .agg(
                    F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("m"),
                )
                .collect()  # ≤ k rows
            )
            new_C = C.copy()  # empty clusters keep their previous centroid
            for r in means:
                new_C[r["cluster"]] = np.asarray(r["m"], dtype=np.float64)
            shift = float(np.sqrt(((new_C - C) ** 2).sum(axis=1)).max())
            C = new_C
            if shift < tol:
                break
        out = vecs.select("id", _assign_udf(C)(F.col("v")).alias("a")).select(
            F.col("id").alias(id_col), "a.cluster", "a.sq_dist"
        )
        return out, C, iters
    finally:
        vecs.unpersist()
