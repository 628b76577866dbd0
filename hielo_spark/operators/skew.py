"""Skew-mitigation utilities (SURVEY §2.8 X6; brief: 'skewed keys →
salting or AQE skew-join').

AQE's skew-join handles shuffle-size skew automatically; these helpers
cover the cases AQE can't: aggregation hot keys (two-phase salted agg)
and joins where one hot key floods a task (replicate the small side over
salt buckets)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _row_salt(df: DataFrame, salt_buckets: int):
    """DETERMINISTIC per-row salt: xxhash64 over every column. A
    nondeterministic salt (rand / monotonically_increasing_id) re-salts
    rows differently when a lost shuffle output forces partial stage
    recomputation — phase-2 merges then double-count some rows and drop
    others, exactly in the executor-loss scenarios salting exists for.
    Content hashing is stable across reruns; the documented trade is
    that fully-IDENTICAL rows share a bucket (dedup'd/keyed data — the
    normal case — is unaffected; a hot key made of byte-identical rows
    would need an upstream row id to spread)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase count per key: phase 1 aggregates (key, salt) — spreading
    a hot key over salt_buckets tasks — phase 2 merges per key. Identical
    result to ``groupBy(key).count()``; twice the (tiny) shuffles, none of
    the single-hot-task stalls."""
    salted = df.withColumn("_salt", _row_salt(df, salt_buckets))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    merges: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """General two-phase salted aggregation: phase 1 computes ``aggs``
    per (keys, salt) — a hot key's rows spread over ``salt_buckets``
    tasks instead of stalling one — phase 2 re-aggregates the partials
    per key with ``merges`` (referencing the phase-1 aliases). Exact for
    any decomposable aggregate (count→sum, sum→sum, min→min, …); pass
    decimal-cast sums when cross-engine bit-stability matters (double
    re-summation is accumulation-order sensitive).

    Same guarantee Spark's own partial aggregation gives — EXCEPT that
    built-in partials still hash-shuffle every pre-aggregated (key)
    group to ONE reducer task, which for a key holding 10%+ of the data
    means one task receives the whole hot key's partials AND, worse,
    map-side partials only help when upstream partitions see repeated
    keys. The salt guarantees a ``salt_buckets``-way split regardless
    of upstream layout (deterministic content hash — see _row_salt)."""
    salted = df.withColumn("_salt", _row_salt(df, salt_buckets))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[c.alias(n) for n, c in merges.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across salt buckets:
    big rows get a random salt, the small side is replicated once per
    bucket, and the join runs on (key, salt). Result equals
    ``big.join(small, key)``; use when AQE skew-split can't help (e.g.
    the skew is in the build side's match fan-out)."""
    big_s = big.withColumn("_salt", _row_salt(big, salt_buckets))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
