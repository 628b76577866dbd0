"""Hashing-trick linear quality classifier (SURVEY §2.8 X4 extension):
the fastText-style shape every large corpus pipeline uses for quality /
domain filtering (train a linear model on weak labels, score every
document, keep the top fraction) — implemented as distributed
full-batch logistic regression in pure DataFrame ops + one numpy
weight vector.

Scale design: features are token counts hashed into ``dim`` buckets
(fixed-width model, vocabulary-free). Per iteration:

* forward pass — an Arrow-batched pandas UDF computes each document's
  margin against the BROADCAST weight vector (dim × 8 bytes, ~2 MB at
  2^18 — small by construction, the model is the only driver-side
  state);
* gradient — the (doc, bucket, count) edge frame joins the per-doc
  residual (one row per doc) and partial-aggregates per bucket; the
  collected gradient is bounded by ``dim`` rows, never by corpus size.

Both frames are computed once and persisted; iterations touch no raw
text. No label collection, no per-row Python in the hot edge path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _edges(docs: DataFrame, text_col: str, id_col: str, dim: int) -> DataFrame:
    """(id, bucket, cnt) token-count edges with hashed feature ids."""
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+", -1)
            ).alias("_tok"),
        )
        .filter(F.length("_tok") > 0)
        .select("_id", F.pmod(F.xxhash64("_tok"), F.lit(dim)).alias("_bucket"))
        .groupBy("_id", "_bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )


def _perdoc_features(docs, text_col, id_col, dim):
    """(id, _bs, _xs): per-doc hashed-bucket lists with L2-normalized
    counts — the ONE feature assembly both training and scoring use (a
    divergence here would silently corrupt every score)."""
    edges = _edges(docs, text_col, id_col, dim)
    norm = edges.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_cnt") * F.col("_cnt"))).alias("_nrm")
    )
    normalized = edges.join(norm, "_id").select(
        "_id", "_bucket", (F.col("_cnt") / F.col("_nrm")).alias("_x")
    )
    perdoc = normalized.groupBy("_id").agg(
        F.collect_list("_bucket").alias("_bs"),
        F.collect_list("_x").alias("_xs"),
    )
    return normalized, perdoc


def _margin_udf(bw, bias: float):
    """Arrow-batched sigmoid(bias + w·x) over (bucket-list, value-list)
    columns against the broadcast weight vector. The ragged per-doc
    lists flatten into one CSR-shaped (values, segment-starts) pair per
    batch, so the dots are a single gather-multiply +
    ``np.add.reduceat`` — no per-row Python arithmetic (r10; the loop
    this replaces was the last per-row numpy loop in the package)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def prob(bs, xs):
        import pandas as pd

        wv = bw.value
        n = len(bs)
        # ragged → CSR: per-row conversion only reshapes (no math)
        arrs_b = [
            np.asarray(b, dtype=np.int64)
            if b is not None else np.empty(0, dtype=np.int64)
            for b in bs
        ]
        arrs_x = [
            np.asarray(x, dtype=np.float64)
            if x is not None else np.empty(0, dtype=np.float64)
            for x in xs
        ]
        lens = np.fromiter((a.size for a in arrs_b), np.int64, count=n)
        xlens = np.fromiter((a.size for a in arrs_x), np.int64, count=n)
        if not np.array_equal(lens, xlens):
            # the old per-row np.dot raised on ragged corruption; the
            # CSR form segments by bucket lengths, so a mismatch would
            # silently MISALIGN every later row — keep it loud
            bad = int(np.flatnonzero(lens != xlens)[0])
            raise ValueError(
                f"bucket/value list length mismatch at batch row {bad}: "
                f"{int(lens[bad])} buckets vs {int(xlens[bad])} values"
            )
        dots = np.zeros(n, dtype=np.float64)
        if n and lens.any():
            prods = wv[np.concatenate(arrs_b)] * np.concatenate(arrs_x)
            starts = np.cumsum(lens) - lens
            nz = lens > 0
            # reduceat over the NONZERO segment starts only: an empty
            # segment would alias its successor's first element
            dots[nz] = np.add.reduceat(prods, starts[nz])
        return pd.Series(1.0 / (1.0 + np.exp(-(bias + dots))))

    return prob


def train_hashed_logreg(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 1e-6,
) -> dict:
    """Train on ``label_col`` (0/1) and return ``{"weights": np.ndarray,
    "bias": float, "dim": int, "losses": [float per iteration]}``.
    Full-batch gradient descent with L2; counts are per-doc
    L2-normalized so document length doesn't dominate the margin."""
    spark = docs.sparkSession
    edges, perdoc = _perdoc_features(docs, text_col, id_col, dim)
    edges = edges.persist()
    perdoc = perdoc.join(
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("double").alias("_y"),
        ),
        "_id",
    ).persist()
    n_docs = perdoc.count()
    if n_docs == 0:
        raise ValueError("no documents with tokens to train on")

    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0
    losses: list[float] = []
    sc = spark.sparkContext
    for _ in range(iters):
        bw = sc.broadcast(w)
        prob = _margin_udf(bw, float(bias))

        scored = perdoc.select(
            "_id", "_y", prob("_bs", "_xs").alias("_p")
        ).persist()
        eps = 1e-12
        loss_row = scored.agg(
            F.avg(
                -(
                    F.col("_y") * F.log(F.col("_p") + eps)
                    + (1 - F.col("_y")) * F.log(1 - F.col("_p") + eps)
                )
            ).alias("loss"),
            F.avg(F.col("_p") - F.col("_y")).alias("gb"),
        ).collect()[0]
        losses.append(float(loss_row["loss"]))

        grad_rows = (
            edges.join(
                scored.select("_id", (F.col("_p") - F.col("_y")).alias("_r")),
                "_id",
            )
            .groupBy("_bucket")
            .agg(F.sum(F.col("_x") * F.col("_r")).alias("_g"))
            .collect()  # bounded by dim (distinct buckets), not corpus
        )
        scored.unpersist()
        g = np.zeros(dim, dtype=np.float64)
        for r in grad_rows:
            g[int(r["_bucket"])] = float(r["_g"])
        w = w - lr * (g / n_docs + l2 * w)
        bias = bias - lr * float(loss_row["gb"])
        bw.destroy()
    edges.unpersist()
    perdoc.unpersist()
    return {"weights": w, "bias": bias, "dim": dim, "losses": losses}


def score_hashed_logreg(
    docs: DataFrame,
    model: dict,
    text_col: str,
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Attach the model's probability to every document (one explode +
    one groupBy + the broadcast dot product; empty/whitespace docs score
    at the bias)."""
    spark = docs.sparkSession
    dim = int(model["dim"])
    bias = float(model["bias"])
    bw = spark.sparkContext.broadcast(np.asarray(model["weights"], dtype=np.float64))

    _, perdoc = _perdoc_features(docs, text_col, id_col, dim)
    prob = _margin_udf(bw, bias)
    scored = perdoc.select("_id", prob("_bs", "_xs").alias(out_col))
    return docs.join(
        scored.withColumnRenamed("_id", id_col), id_col, "left"
    ).withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.lit(1.0 / (1.0 + float(np.exp(-bias))))),
    )
