"""Table profiling — per-column null/distinct/min/max stats in one pass.

The data-quality primitive every curation pipeline runs before training:
null fractions, cardinalities, and value ranges per column, computed as a
single aggregation job over the table (one scan, no per-column jobs).

Scale: all metrics land in ONE agg row — count/sum-of-nulls/min/max are
plain partial aggregates; exact ``count_distinct`` over C columns makes
Catalyst expand the input C-fold before the shuffle (the standard
multi-distinct plan), so the default is ``approx_count_distinct`` (HLL,
no expand) and ``exact=True`` is the opt-in for oracle parity / small
tables. The wide→long unpivot happens on the single result row —
driver-weight zero, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value)
    per profiled column; min/max are stringified after aggregating on the
    native type (so numeric/date ordering, not lexicographic).

    ``exact=False`` (default) uses approx_count_distinct — the 100 TB
    path; ``exact=True`` switches to exact count_distinct (C-fold expand)
    for oracle comparison or small tables.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single result row: one struct per column, then explode —
    # operates on 1 row, so this adds no distributed work
    packed = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(dtypes[c]).alias("dtype"),
                        F.col(f"{c}__rows").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
