"""[meta] operator queries (SURVEY §2: S8, F1, F5-F7, O1, O6, A1-A8, C5)
made DuckDB-oracle-checkable by deriving a snapshots table from ``orders``
with pure-SQL rules (metadata/fixtures.py). The Spark side runs the real
engine operators over a genuine ``map<string,string>`` summary column; the
oracle reconstructs the same results from the flattened derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..analytics.health import health_band, health_metrics
from ..metadata.fixtures import ORACLE_SNAPSHOTS_CTE, snapshots_from_orders
from ..metadata import snapshots as snap

QUERIES = {}
ORACLE = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


#: fixed evaluation instant for the orders-derived snapshot world
#: (replaces Utc::now(); orders span 1995-01-01 .. 2001-08-01).
AS_OF_META = "2001-08-01 12:00:00"


# --------------------------------------------------------------------------
# A1 — operation distribution with S8 inference underneath.
# --------------------------------------------------------------------------
@query(
    "meta_operation_counts",
    f"""
    WITH {ORACLE_SNAPSHOTS_CTE}
    SELECT table_name, operation, count(*) AS n FROM snapshots GROUP BY 1, 2
    """,
)
def meta_operation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return snap.operation_counts(snapshots_from_orders(spark, sf_dir))


# --------------------------------------------------------------------------
# F1 + O1 + C5 — filtered snapshot timeline with display formatting.
# --------------------------------------------------------------------------
@query(
    "meta_snapshot_timeline",
    f"""
    WITH {ORACLE_SNAPSHOTS_CTE}
    SELECT table_name, snapshot_id,
           strftime(committed_at, '%Y-%m-%d %H:%M:%S') AS committed,
           operation,
           coalesce(CAST(added_records AS VARCHAR), '0') AS records_added,
           CASE
             WHEN added_files_size IS NOT NULL AND removed_files_size IS NOT NULL
               THEN '+' || CAST(added_files_size AS VARCHAR) || ' -' || CAST(removed_files_size AS VARCHAR)
             WHEN added_files_size IS NOT NULL THEN '+' || CAST(added_files_size AS VARCHAR)
             ELSE 'N/A'
           END AS size_change
    FROM snapshots
    WHERE operation IN ('append', 'overwrite')
      AND (added_data_files IS NULL OR added_data_files BETWEEN 5 AND 90)
      AND committed_at >= TIMESTAMP '1996-01-01 00:00:00'
      AND committed_at <= TIMESTAMP '1999-12-31 23:59:59'
    """,
)
def meta_snapshot_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    flt = snap.SnapshotFilter(
        operations=["append", "overwrite"],
        min_added_files=5,
        max_added_files=90,
        date_from="1996-01-01",
        date_to="1999-12-31",
    )
    t = snap.timeline(snapshots_from_orders(spark, sf_dir), flt)
    return t.select(
        "table_name",
        "snapshot_id",
        F.date_format("committed_at", "yyyy-MM-dd HH:mm:ss").alias("committed"),
        "operation",
        "records_added",
        "size_change",
    )


# --------------------------------------------------------------------------
# A2 — per-table snapshot span.
# --------------------------------------------------------------------------
@query(
    "meta_snapshot_span",
    f"""
    WITH {ORACLE_SNAPSHOTS_CTE}
    SELECT table_name,
           strftime(min(committed_at), '%Y-%m-%d %H:%M:%S') AS oldest,
           strftime(max(committed_at), '%Y-%m-%d %H:%M:%S') AS newest,
           CAST(floor((epoch_ms(max(committed_at)) - epoch_ms(min(committed_at))) / 86400000.0) AS BIGINT) AS span_days
    FROM snapshots GROUP BY table_name
    """,
)
def meta_snapshot_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = snap.snapshot_span(snapshots_from_orders(spark, sf_dir))
    return s.select(
        "table_name",
        F.date_format("oldest", "yyyy-MM-dd HH:mm:ss").alias("oldest"),
        F.date_format("newest", "yyyy-MM-dd HH:mm:ss").alias("newest"),
        "span_days",
    )


# --------------------------------------------------------------------------
# O6 + S8 — latest snapshot per table (current state).
# --------------------------------------------------------------------------
@query(
    "meta_latest_snapshot",
    f"""
    WITH {ORACLE_SNAPSHOTS_CTE}
    SELECT table_name, snapshot_id, operation,
           coalesce(CAST(added_records AS VARCHAR), '0') AS records_added
    FROM snapshots
    QUALIFY row_number() OVER (PARTITION BY table_name ORDER BY committed_at DESC, snapshot_id DESC) = 1
    """,
)
def meta_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = snap.latest_snapshot(snapshots_from_orders(spark, sf_dir))
    return latest.select(
        "table_name",
        "snapshot_id",
        snap.infer_operation().alias("operation"),
        snap.records_added().alias("records_added"),
    )


# --------------------------------------------------------------------------
# A3-A8 + A12 — the full health suite as one aggregation pass.
# --------------------------------------------------------------------------
_HEALTH_ORACLE = f"""
WITH {ORACLE_SNAPSHOTS_CTE},
base AS (
  SELECT table_name,
         count(*) AS n_snapshots,
         CAST(sum(CASE WHEN committed_at > TIMESTAMP '{AS_OF_META}' - INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS snapshots_last_hour,
         CAST(sum(CASE WHEN committed_at > TIMESTAMP '{AS_OF_META}' - INTERVAL 1 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS snapshots_last_day,
         CAST(sum(CASE WHEN committed_at > TIMESTAMP '{AS_OF_META}' - INTERVAL 7 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS snapshots_last_week,
         max(committed_at) AS latest_ts
  FROM snapshots GROUP BY table_name
),
latest AS (
  SELECT table_name,
         coalesce(added_data_files, 0) AS total_files,
         CAST(coalesce(total_size_bytes, 0) AS DOUBLE) AS latest_size_bytes
  FROM snapshots
  QUALIFY row_number() OVER (PARTITION BY table_name ORDER BY committed_at DESC, snapshot_id DESC) = 1
),
comp AS (
  SELECT table_name, min(committed_at) AS first_comp, max(committed_at) AS last_comp, count(*) AS comp_n
  FROM snapshots
  WHERE contains(operation, 'rewrite') OR contains(operation, 'compact')
  GROUP BY table_name
),
sized AS (
  SELECT table_name, committed_at, snapshot_id,
         CAST(coalesce(total_size_bytes, 0) AS DOUBLE) / 1073741824.0 AS gb
  FROM snapshots WHERE total_size_bytes IS NOT NULL
),
sized_first AS (
  SELECT table_name, committed_at AS ts, gb FROM sized
  QUALIFY row_number() OVER (PARTITION BY table_name ORDER BY committed_at, snapshot_id) = 1
),
sized_last AS (
  SELECT table_name, committed_at AS ts, gb FROM sized
  QUALIFY row_number() OVER (PARTITION BY table_name ORDER BY committed_at DESC, snapshot_id DESC) = 1
),
sized_n AS (SELECT table_name, count(*) AS sized_count FROM sized GROUP BY table_name),
ops AS (
  SELECT table_name, count(*) AS total_ops,
         sum(CASE WHEN contains(lower(operation), 'delete') THEN 1 ELSE 0 END) AS delete_ops,
         sum(CASE WHEN NOT contains(lower(operation), 'delete')
                   AND (contains(lower(operation), 'update') OR contains(lower(operation), 'overwrite'))
                  THEN 1 ELSE 0 END) AS update_ops
  FROM snapshots WHERE has_summary GROUP BY table_name
),
joined AS (
  SELECT b.*, l.total_files, l.latest_size_bytes,
         c.first_comp, c.last_comp, coalesce(c.comp_n, 0) AS comp_n,
         sf.gb AS first_gb, sf.ts AS first_sized_ts,
         sl.gb AS last_gb,  sl.ts AS last_sized_ts,
         coalesce(sn.sized_count, 0) AS sized_count,
         coalesce(o.total_ops, 0) AS total_ops,
         coalesce(o.delete_ops, 0) AS delete_ops,
         coalesce(o.update_ops, 0) AS update_ops
  FROM base b
  LEFT JOIN latest l USING (table_name)
  LEFT JOIN comp c USING (table_name)
  LEFT JOIN sized_first sf USING (table_name)
  LEFT JOIN sized_last sl USING (table_name)
  LEFT JOIN sized_n sn USING (table_name)
  LEFT JOIN ops o USING (table_name)
),
enriched AS (
  SELECT *,
    CASE WHEN total_files > 0 THEN latest_size_bytes / total_files / 1048576.0 ELSE 0.0 END AS avg_mb,
    CAST(floor((epoch_ms(TIMESTAMP '{AS_OF_META}') - epoch_ms(last_comp)) / 3600000.0) AS DOUBLE) AS hours_since_comp,
    CASE WHEN comp_n > 1
         THEN CAST(floor((epoch_ms(last_comp) - epoch_ms(first_comp)) / 86400000.0) AS DOUBLE) / (comp_n - 1)
         ELSE 0.0 END AS avg_comp_freq,
    CASE WHEN sized_count > 1
          AND floor((epoch_ms(last_sized_ts) - epoch_ms(first_sized_ts)) / 86400000.0) > 0
         THEN (last_gb - first_gb) / CAST(floor((epoch_ms(last_sized_ts) - epoch_ms(first_sized_ts)) / 86400000.0) AS DOUBLE)
         ELSE 0.0 END AS growth_rate
  FROM joined
),
dist AS (
  SELECT *,
    CASE WHEN avg_mb < 16.0 THEN CAST(floor(total_files * 0.7) AS BIGINT)
         WHEN avg_mb < 64.0 THEN CAST(floor(total_files * 0.2) AS BIGINT)
         ELSE 0 END AS tiny_files,
    CASE WHEN avg_mb < 16.0 THEN CAST(floor(total_files * 0.3) AS BIGINT)
         WHEN avg_mb < 64.0 THEN CAST(floor(total_files * 0.6) AS BIGINT)
         ELSE 0 END AS small_files,
    CASE WHEN avg_mb < 16.0 THEN 0
         WHEN avg_mb < 64.0 THEN CAST(floor(total_files * 0.2) AS BIGINT)
         WHEN avg_mb <= 512.0 THEN total_files
         ELSE CAST(floor(total_files * 0.7) AS BIGINT) END AS optimal_files,
    CASE WHEN avg_mb > 512.0 THEN CAST(floor(total_files * 0.3) AS BIGINT) ELSE 0 END AS large_files
  FROM enriched
),
ratio AS (
  SELECT *,
    CASE WHEN total_files > 0 THEN CAST(tiny_files + small_files AS DOUBLE) / total_files ELSE 0.0 END AS small_ratio,
    hours_since_comp / 24.0 AS days_since_comp
  FROM dist
)
SELECT table_name, n_snapshots, snapshots_last_hour, snapshots_last_day, snapshots_last_week,
       CASE WHEN snapshots_last_week > 0 THEN snapshots_last_week / 168.0 ELSE 0.0 END AS avg_snapshots_per_hour,
       greatest(snapshots_last_hour, CAST(floor(snapshots_last_day / 24.0) AS BIGINT)) AS peak_snapshots_per_hour,
       CAST(comp_n AS BIGINT) AS compactions_last_week,
       hours_since_comp AS time_since_last_compaction_hours,
       days_since_comp AS days_since_last_compaction,
       avg_comp_freq AS avg_compaction_frequency_days,
       CAST(total_files AS BIGINT) AS total_files,
       tiny_files + small_files AS small_files_count,
       avg_mb AS avg_file_size_mb,
       tiny_files, small_files, optimal_files AS optimal_files_n, large_files,
       small_ratio AS small_file_ratio,
       coalesce(last_gb, 0.0) AS total_size_gb,
       growth_rate AS storage_growth_rate_gb_per_day,
       CASE WHEN total_ops > 0 THEN CAST(delete_ops AS DOUBLE) / total_ops ELSE 0.0 END AS delete_ratio,
       CASE WHEN total_ops > 0 THEN CAST(update_ops AS DOUBLE) / total_ops ELSE 0.0 END AS update_ratio,
       CAST(floor((epoch_ms(TIMESTAMP '{AS_OF_META}') - epoch_ms(latest_ts)) / 3600000.0) AS DOUBLE) AS data_freshness_hours,
       least(greatest(
         100.0
         + CASE WHEN small_ratio > 0.5 THEN -30.0 WHEN small_ratio > 0.3 THEN -15.0 ELSE 0.0 END
         + CASE WHEN snapshots_last_hour > 20 THEN -20.0 WHEN snapshots_last_hour > 10 THEN -10.0 ELSE 0.0 END
         + CASE WHEN days_since_comp IS NULL THEN -10.0
                WHEN days_since_comp > 14.0 THEN -25.0
                WHEN days_since_comp > 7.0 THEN -12.0 ELSE 0.0 END
         + CASE WHEN growth_rate > 500.0 THEN -15.0 WHEN growth_rate > 100.0 THEN -8.0 ELSE 0.0 END
       , 0.0), 100.0) AS health_score,
       CASE WHEN least(greatest(
         100.0
         + CASE WHEN small_ratio > 0.5 THEN -30.0 WHEN small_ratio > 0.3 THEN -15.0 ELSE 0.0 END
         + CASE WHEN snapshots_last_hour > 20 THEN -20.0 WHEN snapshots_last_hour > 10 THEN -10.0 ELSE 0.0 END
         + CASE WHEN days_since_comp IS NULL THEN -10.0
                WHEN days_since_comp > 14.0 THEN -25.0
                WHEN days_since_comp > 7.0 THEN -12.0 ELSE 0.0 END
         + CASE WHEN growth_rate > 500.0 THEN -15.0 WHEN growth_rate > 100.0 THEN -8.0 ELSE 0.0 END
       , 0.0), 100.0) >= 90 THEN 'Excellent'
            WHEN least(greatest(
         100.0
         + CASE WHEN small_ratio > 0.5 THEN -30.0 WHEN small_ratio > 0.3 THEN -15.0 ELSE 0.0 END
         + CASE WHEN snapshots_last_hour > 20 THEN -20.0 WHEN snapshots_last_hour > 10 THEN -10.0 ELSE 0.0 END
         + CASE WHEN days_since_comp IS NULL THEN -10.0
                WHEN days_since_comp > 14.0 THEN -25.0
                WHEN days_since_comp > 7.0 THEN -12.0 ELSE 0.0 END
         + CASE WHEN growth_rate > 500.0 THEN -15.0 WHEN growth_rate > 100.0 THEN -8.0 ELSE 0.0 END
       , 0.0), 100.0) >= 75 THEN 'Good'
            ELSE 'Fair-or-below' END AS health_band
FROM ratio
"""


@query("meta_health", _HEALTH_ORACLE)
def meta_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = health_metrics(snapshots_from_orders(spark, sf_dir), AS_OF_META)
    band = health_band()
    return m.select(
        "table_name",
        "n_snapshots",
        "snapshots_last_hour",
        "snapshots_last_day",
        "snapshots_last_week",
        "avg_snapshots_per_hour",
        F.col("peak_snapshots_per_hour").cast("bigint").alias("peak_snapshots_per_hour"),
        "compactions_last_week",
        "time_since_last_compaction_hours",
        F.col("days_since_last_compaction").alias("days_since_last_compaction"),
        "avg_compaction_frequency_days",
        "total_files",
        "small_files_count",
        "avg_file_size_mb",
        "tiny_files",
        "small_files",
        F.col("optimal_files").alias("optimal_files_n"),
        "large_files",
        "small_file_ratio",
        "total_size_gb",
        "storage_growth_rate_gb_per_day",
        "delete_ratio",
        "update_ratio",
        "data_freshness_hours",
        "health_score",
        F.when(band == "Excellent", "Excellent")
        .when(band == "Good", "Good")
        .otherwise("Fair-or-below")
        .alias("health_band"),
    )
