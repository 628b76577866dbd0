"""A12 exact mode — regression trends over the last N snapshots.

The reference stubs TrendMetrics with constants after slicing the last
10 snapshots ("Simplified trend analysis - would use more sophisticated
algorithms in production", analytics.rs:278-288); this module is that
production mode [EXT]: a least-squares slope per metric over the same
last-10 window, classified Improving / Stable / Degrading according to
each metric's good direction. The parity constants remain the default in
analytics/health.py — this is the opt-in exact path.

Metrics (one per TrendMetrics field):
  file_count           added-data-files per snapshot   (growth = Degrading)
  avg_file_size_mb     added-files-size / added files  (growth = Improving)
  commit_interval_secs gap to the previous snapshot    (growth = Improving —
                       longer gaps = lower snapshot frequency)
  storage_size_gb      total-size                      (growth = Degrading,
                       matching the reference's storage_growth_trend)

Shape: the per-table window ranks the last N snapshots (one shuffle on
table_name), explodes to a long (table, metric, x, y) series, and one
groupBy computes `regr_slope` + mean — metadata-scale work even for a
million tables. x is the negated recency rank (affine-invariant for
slope, deterministic under committed_at ties via the snapshot_id
tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..metadata import snapshots as snap

#: metrics whose *positive* slope means Improving; the rest degrade as
#: they grow. Matches the TrendMetrics field semantics above.
GROWTH_IS_GOOD = ("avg_file_size_mb", "commit_interval_secs")

#: |slope| relative to the metric's mean below which the trend is Stable
REL_EPS = 0.01


def metric_series(snapshots: DataFrame, last_n: int = 10) -> DataFrame:
    """Long (table_name, metric, x, y) series over each table's last
    ``last_n`` snapshots."""
    flat = snapshots.select(
        "table_name",
        "snapshot_id",
        "committed_at",
        snap.summary_long("added-data-files", default=None).alias("added_files"),
        snap.summary_long("added-files-size", default=None).alias("added_bytes"),
        snap.summary_long("total-size", default=None).alias("total_bytes"),
    )
    recency = Window.partitionBy("table_name").orderBy(
        F.desc("committed_at"), F.desc("snapshot_id")
    )
    recent = flat.withColumn("rn", F.row_number().over(recency)).filter(
        F.col("rn") <= last_n
    )
    chrono = Window.partitionBy("table_name").orderBy("committed_at", "snapshot_id")
    recent = recent.withColumn("x", -F.col("rn")).withColumn(
        "interval_secs",
        (
            F.unix_millis("committed_at")
            - F.unix_millis(F.lag("committed_at").over(chrono))
        )
        / 1000.0,
    )
    metrics = [
        ("file_count", F.col("added_files").cast("double")),
        (
            "avg_file_size_mb",
            F.when(
                F.col("added_files") > 0,
                F.col("added_bytes") / 1048576.0 / F.col("added_files"),
            ),
        ),
        ("commit_interval_secs", F.col("interval_secs")),
        ("storage_size_gb", F.col("total_bytes") / 1073741824.0),
    ]
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("metric"), col.cast("double").alias("y"))
            for name, col in metrics
        ]
    )
    return recent.select("table_name", "x", F.explode(pairs).alias("p")).select(
        "table_name", F.col("p.metric").alias("metric"), "x", F.col("p.y").alias("y")
    )


def metric_trends(
    snapshots: DataFrame, last_n: int = 10, rel_eps: float = REL_EPS
) -> DataFrame:
    """(table_name, metric, slope, direction) — slope per metric over the
    last ``last_n`` snapshots; direction Stable when the relative slope is
    within ``rel_eps`` of the metric's mean (or too few observations),
    else Improving/Degrading by the metric's good direction."""
    g = metric_series(snapshots, last_n).groupBy("table_name", "metric").agg(
        F.round(F.regr_slope("y", "x"), 6).alias("slope6"),
        F.round(F.avg("y"), 6).alias("avg_y"),
        F.count("y").alias("n_obs"),
    )
    rel = F.when(
        F.col("slope6").isNotNull()
        & (F.col("n_obs") >= 3)
        & (F.abs(F.col("avg_y")) > 1e-9),
        F.col("slope6") / F.abs(F.col("avg_y")),
    )
    growth_good = F.col("metric").isin(*GROWTH_IS_GOOD)
    direction = (
        F.when(rel.isNull() | (F.abs(rel) <= rel_eps), "Stable")
        .when(growth_good == (rel > 0), "Improving")
        .otherwise("Degrading")
    )
    return g.select(
        "table_name",
        "metric",
        F.coalesce(F.round(F.col("slope6"), 4), F.lit(0.0)).alias("slope"),
        direction.alias("direction"),
    )
