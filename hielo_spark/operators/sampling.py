"""Training-data sampling & sharding operators (SURVEY §2.8 extension).

A 100 TB curation pipeline needs *deterministic* sampling — `df.sample()`
is seed-stable only per partitioning, so a repartition silently changes
the sample. Everything here keys off a Lehmer (MINSTD) hash of the
document id instead: the sample is a pure function of the data, identical
across engines (DuckDB oracle included), re-runs, and cluster layouts.

Scale notes
-----------
* `hash_sample` / `stratified_sample` are narrow one-pass filters — no
  shuffle, fully pushed into the scan stage.
* `pack_shards` windows inside each partition key (shuffle on that key
  only); shard numbering never serializes through a single task unless
  the caller genuinely asks for one global sequence.
* `train_shuffle` is a global sort on the hash — Spark executes it as a
  sampled range partition (each task sorts its range independently), the
  standard distributed shuffle-for-training pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

# Lehmer / MINSTD constants: multiplier 48271, modulus 2^31-1 (public
# constants from Park & Miller 1988). Intermediate product stays < 2^47,
# so BIGINT-safe in every engine — unlike Knuth's 2^32 multiplier, whose
# product overflows 64-bit for 32-bit inputs.
_MINSTD_A = 48271
_MINSTD_M = 2147483647


def sample_hash(id_col: Column | str, buckets: int = 1000) -> Column:
    """Deterministic sampling key in [0, buckets): two Lehmer rounds over
    a numeric id. TWO rounds matter: a single round is order-preserving
    for ids below M/48271 ≈ 44k (no modular wraparound), which would make
    the "shuffle" an identity sort on small sequential ids. The second
    multiply always wraps. Same arithmetic in ANSI SQL for oracles:
    ``((((id % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647
    % buckets`` — intermediates stay < 2^47, BIGINT-safe everywhere."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h1 = ((c % _MINSTD_M) * _MINSTD_A) % _MINSTD_M
    return (h1 * _MINSTD_A) % _MINSTD_M % F.lit(buckets)


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~`fraction` of rows, deterministically (hash-gated, not RNG).
    A narrow filter: no shuffle, survives any repartitioning."""
    thresh = int(round(fraction * 1000))
    return df.filter(sample_hash(id_col) < thresh)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` shape, but
    reproducible): each stratum keeps its own fraction — e.g. downsample
    dominant languages while keeping all of the rare ones."""
    thresh = F.lit(int(round(default * 1000)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value, int(round(frac * 1000))).otherwise(thresh)
    return df.filter(sample_hash(id_col) < thresh)


def pack_shards(
    df: DataFrame,
    id_col: str,
    weight: Column,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Greedy sequential shard packing: walk rows in `id_col` order,
    accumulate `weight` (e.g. token count), and cut a new shard every
    `budget` — the standard "pack documents into ~N-token training
    shards" step.

    shard_id = floor(exclusive-prefix-sum / budget), so a row that
    crosses the budget boundary starts the next shard. With
    `partition_col`, numbering restarts per partition value and the
    window runs per-key in parallel; without it the window is global
    (single-task sort — only for small curated sets, flagged here rather
    than hidden).
    """
    keys = [partition_col] if partition_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(weight).over(w), F.lit(0))
    return df.withColumn("shard_id", F.floor(prefix / F.lit(budget)).cast("bigint"))


def train_shuffle(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic global shuffle order for training: position = rank
    of the Lehmer hash (ties broken by id). One global sort — Spark range
    -partitions it from a sample, so each task sorts independently; no
    single-point bottleneck beyond the final rank numbering, which the
    optimizer evaluates as a single window — acceptable for emitting an
    explicit position column; writing shard files would instead use
    `sortWithinPartitions` after a range repartition."""
    w = Window.orderBy(sample_hash(id_col, _MINSTD_M), F.col(id_col))
    return df.withColumn("shuffle_pos", F.row_number().over(w).cast("bigint"))


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    shares: dict[str, float],
) -> DataFrame:
    """Deterministically downsample strata to a target mixture — the
    "domain mixing" step of a training pipeline (rebalance en/zh/code/...
    to prescribed proportions without upsampling).

    The achievable corpus size is ``n_out = min_g(count_g / share_g)``;
    stratum g then keeps ``floor(min(1, share_g·n_out/count_g)·1000)``
    of its 1000 Lehmer-hash buckets. Strata absent from ``shares`` are
    dropped.

    Scale: the per-stratum count aggregate (|strata| rows) and the
    scalar ``n_out`` both stay in-plan and re-enter as broadcast join
    sides — no driver collect; the final filter is a narrow hash
    predicate evaluated in the scan stage."""
    share_expr = None
    for value, share in sorted(shares.items()):
        lit = F.lit(float(share))
        share_expr = (
            F.when(F.col(strata_col) == value, lit)
            if share_expr is None
            else share_expr.when(F.col(strata_col) == value, lit)
        )
    counts = (
        df.filter(F.col(strata_col).isin(*shares))
        .groupBy(strata_col)
        .agg(F.count("*").alias("_n"))
        .withColumn("_share", share_expr)
    )
    n_out = counts.agg(F.min(F.col("_n") / F.col("_share")).alias("_n_out"))
    thresholds = (
        counts.crossJoin(F.broadcast(n_out))
        .select(
            strata_col,
            F.floor(
                F.least(F.lit(1.0), F.col("_share") * F.col("_n_out") / F.col("_n"))
                * 1000
            ).alias("_thresh"),
        )
    )
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(sample_hash(id_col) < F.col("_thresh"))
        .drop("_thresh")
    )
