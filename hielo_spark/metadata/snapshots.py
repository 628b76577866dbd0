"""Snapshot-plane operators (SURVEY §2: S8, F1, F5-F7, O1, O6, C5).

All functions take/return DataFrames with the canonical snapshots schema
(fixtures.SNAPSHOT_SCHEMA): ``table_name, snapshot_id, committed_at,
manifest_list, schema_id, summary: map<string,string>``.

Expressions are ANSI-safe (``try_element_at`` / ``try_cast``) because the
hosting session may run with ``spark.sql.ansi.enabled=true`` (Spark 4
default) and Iceberg summary values are untrusted strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Summary keys surfaced by the reference (iceberg_adapter.rs:191-201).
SUMMARY_KEYS = (
    "added-data-files",
    "deleted-data-files",
    "added-records",
    "deleted-records",
    "total-records",
    "added-files-size",
    "removed-files-size",
    "total-size",
)


def summary_value(key: str, summary: Column | str = "summary") -> Column:
    """``summary[key]`` as string, null-safe on a null map (C6)."""
    summary = F.col(summary) if isinstance(summary, str) else summary
    return F.try_element_at(summary, F.lit(key))


def summary_long(key: str, summary: Column | str = "summary", default: int | None = 0) -> Column:
    """Numeric summary value with the reference's ``parse().unwrap_or(0)``
    null/junk tolerance (analytics.rs:75-79; SURVEY F7/C4)."""
    c = summary_value(key, summary).try_cast("long")
    return F.coalesce(c, F.lit(default)) if default is not None else c


def infer_operation(summary: Column | str = "summary") -> Column:
    """Operation with the reference's inference chain
    (iceberg_adapter.rs:169-187 + data.rs:156-161):

      summary NULL                       → 'unknown'
      summary['operation'] present       → it
      summary['spark.app.id'] present    → 'append'
      added-data-files / added-records   → 'append'
      deleted-data-files / deleted-recs  → 'delete'
      total-data-files                   → 'overwrite'
      otherwise                          → 'append'
    """
    summary = F.col(summary) if isinstance(summary, str) else summary

    def has(k: str) -> Column:
        return F.try_element_at(summary, F.lit(k)).isNotNull()

    inferred = (
        F.coalesce(
            F.try_element_at(summary, F.lit("operation")),
            F.when(has("spark.app.id"), F.lit("append")),
            F.when(has("added-data-files") | has("added-records"), F.lit("append")),
            F.when(has("deleted-data-files") | has("deleted-records"), F.lit("delete")),
            F.when(has("total-data-files"), F.lit("overwrite")),
            F.lit("append"),
        )
    )
    return F.when(summary.isNull(), F.lit("unknown")).otherwise(inferred)


def with_operation(df: DataFrame) -> DataFrame:
    """Add the inferred ``operation`` column (S8)."""
    return df.withColumn("operation", infer_operation())


def size_change(summary: Column | str = "summary") -> Column:
    """Display string ``"+{added} -{removed}"`` / ``"+{added}"`` / ``"N/A"``
    (data.rs:169-183; SURVEY C5)."""
    added = summary_value("added-files-size", summary)
    removed = summary_value("removed-files-size", summary)
    return (
        F.when(added.isNotNull() & removed.isNotNull(), F.concat(F.lit("+"), added, F.lit(" -"), removed))
        .when(added.isNotNull(), F.concat(F.lit("+"), added))
        .otherwise(F.lit("N/A"))
    )


def records_added(summary: Column | str = "summary") -> Column:
    """``added-records`` string, default "0" (data.rs:163-168)."""
    return F.coalesce(summary_value("added-records", summary), F.lit("0"))


IS_COMPACTION = "operation LIKE '%rewrite%' OR operation LIKE '%compact%'"


def is_compaction(op: Column | str = "operation") -> Column:
    """Compaction predicate (analytics.rs:157; SURVEY F5)."""
    op = F.col(op) if isinstance(op, str) else op
    return op.contains("rewrite") | op.contains("compact")


@dataclass
class SnapshotFilter:
    """Multi-predicate snapshot filter state (components.rs:8-35, 698-786;
    SURVEY F1). Predicates AND together; rows with missing summary values
    pass the numeric/range predicates (reference lets them through)."""

    operations: list[str] = field(default_factory=list)  # empty = all
    min_added_files: int | None = None
    max_added_files: int | None = None
    min_added_records: int | None = None
    max_added_records: int | None = None
    date_from: str | None = None  # 'YYYY-MM-DD' inclusive day start
    date_to: str | None = None    # 'YYYY-MM-DD' inclusive day end

    def predicate(self) -> Column:
        p = F.lit(True)
        if self.operations:
            p = p & F.col("operation").isin(self.operations)
        files = summary_value("added-data-files").try_cast("long")
        if self.min_added_files is not None:
            p = p & (files.isNull() | (files >= self.min_added_files))
        if self.max_added_files is not None:
            p = p & (files.isNull() | (files <= self.max_added_files))
        recs = summary_value("added-records").try_cast("long")
        if self.min_added_records is not None:
            p = p & (recs.isNull() | (recs >= self.min_added_records))
        if self.max_added_records is not None:
            p = p & (recs.isNull() | (recs <= self.max_added_records))
        if self.date_from is not None:  # day start 00:00:00 (components.rs:754-766)
            p = p & (F.col("committed_at") >= F.to_timestamp(F.lit(f"{self.date_from} 00:00:00")))
        if self.date_to is not None:  # day end 23:59:59
            p = p & (F.col("committed_at") <= F.to_timestamp(F.lit(f"{self.date_to} 23:59:59")))
        return p

    def is_filtered(self) -> bool:
        """F8: any predicate active."""
        return self.active_filter_count() > 0

    def active_filter_count(self) -> int:
        n = 0
        if self.operations:
            n += 1
        if self.min_added_files is not None or self.max_added_files is not None:
            n += 1
        if self.min_added_records is not None or self.max_added_records is not None:
            n += 1
        if self.date_from is not None or self.date_to is not None:
            n += 1
        return n


def apply_filters(df: DataFrame, flt: SnapshotFilter) -> DataFrame:
    """F1 over a snapshots frame that already has ``operation``."""
    return df.filter(flt.predicate())


def timeline(df: DataFrame, flt: SnapshotFilter | None = None) -> DataFrame:
    """The snapshot-timeline rows (§3.2 render path): filter → sort desc →
    display columns (snapshot_id, committed_at, operation, records_added,
    size_change). One narrow plan: filter + project + global sort.
    """
    out = with_operation(df)
    if flt is not None:
        out = apply_filters(out, flt)
    return out.select(
        "table_name",
        "snapshot_id",
        "committed_at",
        "operation",
        records_added().alias("records_added"),
        size_change().alias("size_change"),
    ).orderBy(F.col("committed_at").desc(), F.col("snapshot_id").desc())


def latest_snapshot(df: DataFrame) -> DataFrame:
    """O6 — current state per table: max_by over (committed_at, snapshot_id).

    The reference takes ``snapshots.last()`` assuming catalog order is
    chronological (analytics.rs:72); we order explicitly. Single partial+final
    aggregation — no window, no shuffle beyond the groupBy.
    """
    ord_key = F.struct(F.col("committed_at"), F.col("snapshot_id"))
    return df.groupBy("table_name").agg(
        F.max_by(F.col("snapshot_id"), ord_key).alias("snapshot_id"),
        F.max(F.col("committed_at")).alias("committed_at"),
        F.max_by(F.col("summary"), ord_key).alias("summary"),
        F.max_by(F.col("schema_id"), ord_key).alias("schema_id"),
    )


def operation_counts(df: DataFrame) -> DataFrame:
    """A1 — operation distribution (components.rs:1275-1284)."""
    return with_operation(df).groupBy("table_name", "operation").agg(F.count("*").alias("n"))


def snapshot_span(df: DataFrame) -> DataFrame:
    """A2 — oldest/newest per table + span in whole days (integer ms
    division, components.rs:1295-1305)."""
    return df.groupBy("table_name").agg(
        F.min("committed_at").alias("oldest"),
        F.max("committed_at").alias("newest"),
        F.floor(
            (F.unix_millis(F.max("committed_at")) - F.unix_millis(F.min("committed_at")))
            / F.lit(86400000)
        ).alias("span_days"),
    )
