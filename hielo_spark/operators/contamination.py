"""Train/eval contamination detection (SURVEY §2.8 extension).

The standard decontamination step in LLM-data pipelines: find training
documents that share word n-grams with a benchmark/eval set, so they can
be dropped before training. Same candidate-generation-by-collision shape
as the MinHash dedup path (`operators/dedup.py`): explode each side into
(shingle-hash, doc) postings, equi-join on the hash, aggregate per pair —
never an all-pairs comparison.

Scale notes
-----------
* Train side: one pass, explode to distinct shingles, shuffle keyed by
  shingle hash. The benchmark side is tiny by construction (eval suites
  are thousands of docs, not billions) → `broadcast()` it and the join
  is shuffle-free on the train side.
* Shingle arrays are md5-hashed to fixed-width strings before the join —
  join keys stay ~32 bytes however long the n-gram text is.
* All expressions are built-in (codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..io import fan_out
from .text import words


def shingles(text_col: Column | str = "text", n: int = 8) -> Column:
    """Distinct word n-gram strings of `text` (empty when the doc has
    fewer than `n` words)."""
    ws = words(text_col)
    n_pos = F.size(ws) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    # sequence(1, 0) would count DOWN ([1, 0]); guard short docs explicitly
    return F.when(n_pos >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _postings(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (doc, shingle-hash) postings.

    Deliberately NOT ``explode(shingles(...))``: higher-order lambdas run
    interpreted (no codegen), and projection collapse re-evaluates the
    whole transform for every referencing expression — measured 11-18 s
    on the 5k-doc fixture. Exploding the *positions* instead leaves one
    plain ``slice``/``concat_ws``/``md5`` per output row inside
    whole-stage codegen (≈10× faster), with per-doc distinctness restored
    by ``dropDuplicates`` on the already-exchanged (doc, hash) pair.

    Repartition first: the fixture is a single parquet file (one scan
    task); at real scale the scan is already parallel and this is one
    cheap round-robin exchange of the raw docs."""
    df = fan_out(df)
    ws = words(text_col)
    base = df.select(F.col(id_col), ws.alias("_ws")).filter(F.size("_ws") >= n)
    pos = base.select(
        id_col,
        "_ws",
        F.explode(F.sequence(F.lit(1), F.size("_ws") - (n - 1))).alias("_i"),
    )
    return pos.select(
        id_col,
        F.md5(F.concat_ws(" ", F.slice("_ws", F.col("_i"), n))).alias("_h"),
    ).dropDuplicates([id_col, "_h"])


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """(train doc, benchmark doc) pairs sharing ≥ `min_shared` distinct
    word n-grams, with the contaminated fraction of the train doc's
    shingles. Output: train_id, bench_id, n_shared, contamination."""
    t = _postings(train, id_col, text_col, n).withColumnRenamed(id_col, "train_id")
    b = _postings(bench, id_col, text_col, n).withColumnRenamed(id_col, "bench_id")
    # per-train-doc distinct-shingle counts: one row per doc, joined onto
    # the (already tiny) pair aggregate — cheaper than carrying the count
    # on every posting, which would force a second shingle evaluation
    n_train = t.groupBy("train_id").agg(F.count("*").alias("_n_train"))
    pairs = (
        t.join(F.broadcast(b), "_h")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.join(n_train, "train_id").select(
        "train_id",
        "bench_id",
        "n_shared",
        F.round(F.col("n_shared") / F.col("_n_train"), 6).alias("contamination"),
    )
