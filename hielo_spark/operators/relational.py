"""Custom relational operators Spark lacks as built-ins (SURVEY §2.3 /
brief: as-of join, range join), expressed as compositions of DataFrame
ops — no UDFs, no driver loops.

As-of join: union-tag + window carry-forward — ONE shuffle on
(key, time) instead of a per-row backward probe. The classic scalable
pattern for "latest right-row at or before each left-row".

Range join: time-bucket equi-join + residual filter — turns an
inequality join (which Spark would execute as broadcast-nested-loop)
into an equi-join on overlapping buckets, at the cost of duplicate
candidate generation bounded by range/bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` within the same ``on`` key (backward
    as-of). ``tolerance_ms`` drops matches older than the tolerance.

    Implementation: union both sides tagged, sort within key by
    (time, side) via a window, carry the last right values forward with
    ``last(..., ignorenulls=True)``, keep left rows. Single shuffle on
    the key; no range probe, no skewed nested loop.
    """
    lt = F.col(left_time)
    rt = F.col(right_time)
    l_tag = left.withColumn("_t", lt.cast("timestamp")).withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        rt.cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
    )
    # align columns for the union: left gets null right_cols and vice versa
    for c in right_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_cols = [c for c in left.columns]
    unioned = l_tag.select(
        F.col(on), F.col("_t"), F.col("_side"),
        *[F.col(c) for c in l_cols if c != on],
        *[F.col(f"{c}{suffix}") for c in right_cols],
    ).unionByName(
        r_tag.select(
            F.col(on), F.col("_t"), F.col("_side"),
            *[F.lit(None).cast(dict(l_tag.dtypes)[c]).alias(c) for c in l_cols if c != on],
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        )
    )
    # right rows sort before left rows at the same instant (side 0 < 1),
    # so an exactly-simultaneous right row IS visible to the left row.
    # The right_cols values are a tertiary sort key: two right rows sharing
    # (key, time) would otherwise carry a partition-order-dependent value —
    # with the tiebreak the carried value is the max right_cols tuple,
    # deterministic across runs.
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side", *[F.col(f"{c}{suffix}") for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the carry is ONE struct = the entire latest right row (time +
    # every carried column together). Carrying columns independently
    # with last(ignorenulls) would stitch values from DIFFERENT right
    # rows whenever the newest right row holds a null in some carried
    # column — a row that never existed; true as-of (and DuckDB's ASOF
    # JOIN, the oracle) has whole-row semantics, nulls included.
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_t").alias("_rt"),
            *[F.col(f"{c}{suffix}").alias(c) for c in right_cols],
        ),
    )
    carried = unioned.select(
        "*", F.last(right_row, ignorenulls=True).over(w).alias("_carry")
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        in_tol = (
            F.unix_millis(F.col("_t")) - F.unix_millis(F.col("_carry._rt"))
        ) <= tolerance_ms
        carry = {
            c: F.when(in_tol, F.col(f"_carry.{c}")) for c in right_cols
        }
    else:
        carry = {c: F.col(f"_carry.{c}") for c in right_cols}
    return out.select(
        F.col(on),
        F.col("_t").alias(left_time),
        *[F.col(c) for c in l_cols if c not in (on, left_time)],
        *[carry[c].alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_ms: int,
    upper_ms: int,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Pairs (l, r) with the same key and ``r.time - l.time`` in
    [lower_ms, upper_ms]. Equi-join on overlapping time buckets +
    residual filter — never a nested-loop inequality join.

    Each left row joins its own bucket plus the buckets its window can
    reach; candidates per row ≈ window/bucket + 1.
    """
    span = upper_ms - lower_ms
    bucket_ms = bucket_ms or max(span, 1)
    l_ms = F.unix_millis(F.col(left_time).cast("timestamp"))
    r_ms = F.unix_millis(F.col(right_time).cast("timestamp"))
    # left row needs buckets covering [l+lower, l+upper]
    lo_b = F.floor((l_ms + lower_ms) / bucket_ms)
    hi_b = F.floor((l_ms + upper_ms) / bucket_ms)
    l_exp = left.withColumn("_lms", l_ms).withColumn(
        "_bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    r_exp = right.withColumn("_rms", r_ms).withColumn("_bucket", F.floor(r_ms / bucket_ms))
    joined = l_exp.join(r_exp, [on, "_bucket"])
    delta = F.col("_rms") - F.col("_lms")
    return joined.filter((delta >= lower_ms) & (delta <= upper_ms)).drop("_bucket", "_lms", "_rms")


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` + ``pd.merge_asof`` —
    the Arrow-batched alternative to the union+window form (`asof_join`).

    Same semantics (backward match, ties visible, deterministic carry);
    different physical shape: both sides shuffle ONCE on the key, then
    each key's partitions meet in a single Python worker running the
    vectorized pandas merge. Prefer this when per-key data fits a worker
    and the carried column list is wide (the window form evaluates one
    `last() over` per carried column); prefer the window form to stay
    entirely JVM-side. Both are one-shuffle plans.
    """
    import pandas as pd

    l_cols = list(left.columns)
    lt = left_time
    # both time columns go through timestamp, exactly like the window
    # form (epoch-longs / ISO strings would otherwise crash merge_asof's
    # Timedelta tolerance); the output carries left_time as timestamp
    left = left.withColumn(lt, F.col(lt).cast("timestamp"))
    out_fields = ", ".join(
        [
            f"`{c}` {'timestamp' if c == lt else t}"
            for c, t in left.dtypes
        ]
        + [f"`{c}{suffix}` {dict(right.dtypes)[c]}" for c in right_cols]
    )
    tol = pd.Timedelta(milliseconds=tolerance_ms) if tolerance_ms is not None else None

    # Rename the right side's non-key columns to private names BEFORE the
    # cogroup: when both children share attribute names (and lineage, as
    # in a self-cogroup), Spark resolves the conflicting right attributes
    # against the left and prunes the right child down to just the
    # grouping key — the right pandas frame arrives with only `on` in it.
    r_in = right.select(
        F.col(on),
        F.col(right_time).cast("timestamp").alias("_r_t"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = l_cols + [f"{c}{suffix}" for c in right_cols]
        if not len(lpdf):
            return pd.DataFrame(columns=out_cols)
        lpdf = lpdf.sort_values([lt] + l_cols, kind="mergesort")
        if not len(rpdf):
            for c in right_cols:
                lpdf[f"{c}{suffix}"] = None
            return lpdf[out_cols]
        # deterministic carry on (time, right_cols) ties: keep the max
        # right tuple per timestamp, matching the window form's tiebreak
        rpdf = (
            rpdf.sort_values(
                ["_r_t"] + [f"_r_{c}" for c in right_cols], kind="mergesort"
            )
            .groupby("_r_t", as_index=False)
            .nth(-1)  # row-wise last: .last() is per-column and would
        )             # stitch tied rows' values across null gaps
        rsel = pd.DataFrame({"_rt": rpdf["_r_t"].to_numpy()})
        for c in right_cols:
            rsel[f"{c}{suffix}"] = rpdf[f"_r_{c}"].to_numpy()
        merged = pd.merge_asof(
            lpdf,
            rsel,
            left_on=lt,
            right_on="_rt",
            direction="backward",
            tolerance=tol,
        )
        return merged[out_cols]

    return (
        left.groupby(on)
        .cogroup(r_in.groupby(on))
        .applyInPandas(lambda lp, rp: merge(lp, rp), schema=out_fields)
    )


def interval_union(
    df,
    key_cols: list[str],
    start_col: str,
    end_col: str,
):
    """Coalesce overlapping/touching intervals per key (the canonical
    gaps-and-islands operator): rows whose ``[start, end]`` intervals
    overlap or abut merge into one island. Returns one row per island —
    ``(*key_cols, island_start, island_end, n_intervals)``.

    Classic single-window formulation: an interval starts a new island
    exactly when its start exceeds the running maximum of all previous
    ends (per key, ordered by start); the prefix sum of those flags is
    the island id, and the rest is a plain groupBy. Two window passes +
    one aggregation, all shuffling only on the key columns — the same
    cost as a per-key sort at any scale.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    order = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(F.col(end_col)).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        (prev_max_end.isNull() | (F.col(start_col) > prev_max_end)).cast("int"),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .drop("_island")
    )
