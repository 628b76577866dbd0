"""Scalar function layer (SURVEY §2.6 C1-C8) — the reference's display/
conversion helpers as reusable Column expressions. Aggregation-level
logic lives in analytics/; these are the row-level pieces.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

from ..analytics.health import health_band  # C8 (re-export)
from ..metadata.snapshots import records_added, size_change, summary_long, summary_value  # C5/C6

__all__ = [
    "health_band",
    "records_added",
    "size_change",
    "summary_long",
    "summary_value",
    "format_bytes",
    "epoch_ms_to_display",
    "truncate_display",
    "parse_long_or_zero",
]


def format_bytes(n: Column | str) -> Column:
    """C3 — 1024-based size display (B/KiB/MiB/GiB/TiB, one decimal),
    mirroring the reference's MiB/GiB conversions. Plain %.1f rendering —
    no locale thousands separators — to match the reference display."""
    n = F.col(n) if isinstance(n, str) else n
    n = n.cast("double")

    def fmt(v: Column, unit: str) -> Column:
        return F.concat(F.format_string("%.1f", v), F.lit(f" {unit}"))

    return (
        F.when(n >= 1024.0**4, fmt(n / 1024.0**4, "TiB"))
        .when(n >= 1024.0**3, fmt(n / 1024.0**3, "GiB"))
        .when(n >= 1024.0**2, fmt(n / 1024.0**2, "MiB"))
        .when(n >= 1024.0, fmt(n / 1024.0, "KiB"))
        .otherwise(F.concat(n.cast("long").cast("string"), F.lit(" B")))
    )


def epoch_ms_to_display(ms: Column | str) -> Column:
    """C2 — epoch-ms → `%Y-%m-%d %H:%M:%S UTC` (data.rs:151-154; session
    timezone is pinned to UTC by session.configure)."""
    ms = F.col(ms) if isinstance(ms, str) else ms
    return F.concat(
        F.date_format(F.timestamp_millis(ms.cast("long")), "yyyy-MM-dd HH:mm:ss"),
        F.lit(" UTC"),
    )


def truncate_display(s: Column | str, max_len: int = 40) -> Column:
    """C1 — display truncation with ellipsis."""
    s = F.col(s) if isinstance(s, str) else s
    return F.when(F.length(s) > max_len, F.concat(F.substring(s, 1, max_len - 1), F.lit("…"))).otherwise(s)


def parse_long_or_zero(s: Column | str) -> Column:
    """C4 — string→long with the reference's unwrap_or(0) tolerance."""
    s = F.col(s) if isinstance(s, str) else s
    return F.coalesce(s.try_cast("long"), F.lit(0))
