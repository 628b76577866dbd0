"""Data-layout operators: z-order (Morton) keys for multi-dimensional
clustering at write time.

The scale story behind Iceberg's `rewrite_data_files(strategy => 'sort',
sort_order => 'zorder(a, b)')` (the [EXT] arm of the reference's
compaction recommendations, SURVEY S11): sorting a table by an
interleaved-bit key co-locates rows that are close in EVERY keyed
dimension, so min/max file statistics prune scans for range predicates
on any subset of those dimensions — one layout serving N query shapes,
where a lexicographic sort serves only its prefix.

All expressions are built-in shift/mask arithmetic (whole-stage codegen,
no Python): bits × n_cols shift-or terms, e.g. 16 bits × 3 cols = 48
terms in one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def zorder_key(
    norm_cols: list[Column], bits: int = 16
) -> Column:
    """Interleave the low ``bits`` bits of already-normalized non-negative
    integer columns: column k's bit i lands at output bit
    ``i * n_cols + k``. Result fits a bigint for bits × n_cols ≤ 63."""
    n = len(norm_cols)
    if bits * n > 63:
        raise ValueError("bits * n_cols must be ≤ 63 to fit a bigint key")
    key = F.lit(0).cast("bigint")
    for k, c in enumerate(norm_cols):
        c = c.cast("bigint")
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + k
            )
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Attach a z-order key over ``cols``. Each column is min-max
    normalized to ``[0, 2^bits)``; ranges come from ``ranges`` when the
    caller knows them (stable across incremental writes — the production
    choice) or are computed in-plan as a broadcast 1-row aggregate
    (re-derived per batch; fine for one-shot rewrites)."""
    if ranges is None:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"{c}__min") for c in cols],
            *[F.max(c).cast("double").alias(f"{c}__max") for c in cols],
        )
        df = df.crossJoin(F.broadcast(stats))
        lo = {c: F.col(f"{c}__min") for c in cols}
        hi = {c: F.col(f"{c}__max") for c in cols}
    else:
        lo = {c: F.lit(float(ranges[c][0])) for c in cols}
        hi = {c: F.lit(float(ranges[c][1])) for c in cols}
    top = (1 << bits) - 1
    norm = []
    for c in cols:
        span = hi[c] - lo[c]
        scaled = F.when(
            span > 0,
            F.floor((F.col(c).cast("double") - lo[c]) / span * top),
        ).otherwise(F.lit(0))
        norm.append(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)))
    out = df.withColumn(key_col, zorder_key(norm, bits))
    return out.drop(*[f"{c}__min" for c in cols], *[f"{c}__max" for c in cols])


def zorder_sort(
    df: DataFrame, cols: list[str], bits: int = 16, n_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort by the z-key — the write-side layout op.
    Each output partition covers a contiguous z-range, i.e. a compact
    multi-dimensional tile, giving every file tight min/max stats on all
    keyed columns."""
    keyed = with_zorder_key(df, cols, bits)
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, "zkey").sortWithinPartitions("zkey")
