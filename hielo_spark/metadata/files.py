"""A7 exact mode — file-size analysis from a files frame (SURVEY §2.5).

The reference *estimates* the size distribution from the average file
size because it only has snapshot summaries ("This is a simplified
approach - in production, we'd analyze manifest files",
analytics.rs:90-105); this module is that production mode: exact CASE
buckets over ``file_size_in_bytes`` with the HealthThresholds band edges
(analytics.rs:11-13 — tiny < 16 MB, small 16-64, optimal 64-512
inclusive, large > 512).

Input shape follows Iceberg's ``t.files`` metadata table
(``table_name, file_path, file_size_in_bytes, record_count``): when a
live catalog is attached the input is ``spark.table(f"{t}.files")``;
the fixture path (metadata/fixtures.files_from_orders) derives the same
shape from orders so the math is oracle-checkable today.

One groupBy — partial aggregation map-side, a histogram is a few rows
per table no matter how many files the table has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

#: display order of the reference's four bands
BUCKETS = ("tiny(<16MB)", "small(16-64MB)", "optimal(64-512MB)", "large(>512MB)")


def size_bucket(size: Column | str = "file_size_in_bytes") -> Column:
    """File-size band label; edges per HealthThresholds
    (analytics.rs:11-13; 512 MB is inclusive-optimal, matching
    ``avg_file_size_mb <= OPTIMAL_FILE_MAX``)."""
    size = F.col(size) if isinstance(size, str) else size
    mb = size.cast("double") / 1048576.0
    return (
        F.when(mb < 16.0, BUCKETS[0])
        .when(mb < 64.0, BUCKETS[1])
        .when(mb <= 512.0, BUCKETS[2])
        .otherwise(BUCKETS[3])
    )


def file_size_histogram(files: DataFrame) -> DataFrame:
    """Per (table, band): file count, total bytes, and percent of the
    table's files (2 dp). The window re-aggregation runs over the
    already-tiny histogram, not the files frame."""
    h = files.groupBy(
        "table_name", size_bucket().alias("bucket")
    ).agg(
        F.count("*").alias("n_files"),
        F.sum("file_size_in_bytes").alias("total_bytes"),
    )
    per_table = Window.partitionBy("table_name")
    return h.select(
        "table_name",
        "bucket",
        "n_files",
        "total_bytes",
        F.round(F.col("n_files") * 100.0 / F.sum("n_files").over(per_table), 2).alias(
            "pct_files"
        ),
    )


def file_health_exact(files: DataFrame) -> DataFrame:
    """The FileHealthMetrics fields (analytics.rs:107-119) computed
    exactly from a files frame instead of the summary heuristic: one
    conditional-sum aggregation per table."""
    mb = F.col("file_size_in_bytes").cast("double") / 1048576.0

    def n_in(lo: float | None, hi: float | None, hi_inclusive: bool = False) -> Column:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (mb >= lo)
        if hi is not None:
            cond = cond & ((mb <= hi) if hi_inclusive else (mb < hi))
        return F.sum(F.when(cond, 1).otherwise(0))

    return files.groupBy("table_name").agg(
        F.count("*").alias("total_files"),
        n_in(None, 16.0).alias("tiny_files"),
        n_in(16.0, 64.0).alias("small_files"),
        n_in(64.0, 512.0, hi_inclusive=True).alias("optimal_files"),
        n_in(512.0, None).alias("_large_lo"),
        F.round(F.avg(mb), 6).alias("avg_file_size_mb"),
    ).select(
        "table_name",
        "total_files",
        "tiny_files",
        "small_files",
        "optimal_files",
        # 512 MB exactly is optimal, so "large" is the strict remainder
        (F.col("total_files") - F.col("tiny_files") - F.col("small_files") - F.col("optimal_files")).alias("large_files"),
        (F.col("tiny_files") + F.col("small_files")).alias("small_files_count"),
        F.round(
            (F.col("tiny_files") + F.col("small_files")) / F.col("total_files"), 6
        ).alias("small_file_ratio"),
        "avg_file_size_mb",
    )
