"""Stream-stream event-time join (SURVEY §2.7-S depth).

Attribution shape: each click joins to the views by the same user in the
preceding ``max_delay`` — the canonical stream-stream interval join. The
transform is written once and applied to both static and streaming frames
(on a static frame ``withWatermark`` is a no-op), so batch/stream parity
is by construction and the batch twin is DuckDB-oracle-checkable.

Scale: Spark keeps per-side join state keyed on user_id; the two
watermarks plus the ``v.ts ∈ [c.ts − max_delay, c.ts]`` bound give the
state-eviction watermark, so state is bounded by (delay window + lateness
allowance) × arrival rate, not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def attribution_pairs(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, view_id, click_id, delay_s) for every click within
    ``max_delay`` after a view by the same user. Works identically on
    static and streaming inputs."""
    v = (
        views.select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
        .alias("v")
    )
    c = (
        clicks.select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
        .alias("c")
    )
    cond = (
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("c.click_ts") >= F.col("v.view_ts"))
        & (F.col("c.click_ts") <= F.col("v.view_ts") + F.expr(f"interval {max_delay}"))
    )
    return v.join(c, cond).select(
        F.col("v.user_id").alias("user_id"),
        "view_id",
        "click_id",
        (
            F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("view_ts"))
        ).alias("delay_us"),
    )
