"""S7 properties surface, A7 exact file histogram, A12 exact trends."""

from __future__ import annotations

import pytest

from hielo_spark.analytics.trends import metric_trends
from hielo_spark.metadata.files import file_health_exact, file_size_histogram
from hielo_spark.metadata.fixtures import synthetic_snapshots
from hielo_spark.metadata.properties import (
    properties_rows,
    show_tblproperties_sql,
    table_properties,
)

MB = 1024 * 1024


def test_table_properties_map(spark):
    props = {r["table_name"]: r["properties"] for r in table_properties(synthetic_snapshots(spark)).collect()}
    assert props["hot_t"]["commit.total-snapshots"] == "25"
    assert props["hot_t"]["current-schema-id"] == "0"
    assert props["hot_t"]["format-version"] == "2"
    # steady_t's latest snapshot (the rewrite, id 250) carries schema 1
    assert props["steady_t"]["current-schema-id"] == "1"
    # junk_t's latest has schema 0; the null-schema row coalesces safely
    assert props["junk_t"]["current-schema-id"] == "0"


def test_properties_rows_shape(spark):
    rows = properties_rows(table_properties(synthetic_snapshots(spark))).collect()
    per_table: dict[str, int] = {}
    for r in rows:
        per_table[r["table_name"]] = per_table.get(r["table_name"], 0) + 1
    assert set(per_table.values()) == {5}  # five keys for every table


def test_show_tblproperties_sql():
    assert show_tblproperties_sql("ns.tbl") == "SHOW TBLPROPERTIES ns.tbl"
    with pytest.raises(ValueError):
        show_tblproperties_sql("ns.tbl; DROP TABLE x")


def _files(spark):
    rows = [
        ("t", "f1", 1 * MB, 10),       # tiny
        ("t", "f2", 15 * MB, 10),      # tiny (edge: < 16)
        ("t", "f3", 16 * MB, 10),      # small (edge: >= 16)
        ("t", "f4", 64 * MB, 10),      # optimal (edge: >= 64)
        ("t", "f5", 512 * MB, 10),     # optimal (512 inclusive per reference)
        ("t", "f6", 513 * MB, 10),     # large
        ("u", "g1", 100 * MB, 10),     # optimal only
    ]
    return spark.createDataFrame(
        rows, "table_name string, file_path string, file_size_in_bytes long, record_count long"
    )


def test_file_size_histogram_buckets(spark):
    h = {
        (r["table_name"], r["bucket"]): (r["n_files"], r["pct_files"])
        for r in file_size_histogram(_files(spark)).collect()
    }
    assert h[("t", "tiny(<16MB)")] == (2, 33.33)
    assert h[("t", "small(16-64MB)")] == (1, 16.67)
    assert h[("t", "optimal(64-512MB)")] == (2, 33.33)
    assert h[("t", "large(>512MB)")] == (1, 16.67)
    assert h[("u", "optimal(64-512MB)")] == (1, 100.0)


def test_file_health_exact(spark):
    m = {r["table_name"]: r.asDict() for r in file_health_exact(_files(spark)).collect()}
    t = m["t"]
    assert t["total_files"] == 6
    assert (t["tiny_files"], t["small_files"], t["optimal_files"], t["large_files"]) == (2, 1, 2, 1)
    assert t["small_files_count"] == 3
    assert t["small_file_ratio"] == 0.5
    assert m["u"]["small_file_ratio"] == 0.0


def test_metric_trends_golden(spark):
    got = {
        (r["table_name"], r["metric"]): r["direction"]
        for r in metric_trends(synthetic_snapshots(spark)).collect()
    }
    # hot_t: constant file counts/sizes/intervals but growing total size
    assert got[("hot_t", "file_count")] == "Stable"
    assert got[("hot_t", "avg_file_size_mb")] == "Stable"
    assert got[("hot_t", "commit_interval_secs")] == "Stable"
    assert got[("hot_t", "storage_size_gb")] == "Degrading"
    # growth_t: 600 GB/day growth
    assert got[("growth_t", "storage_size_gb")] == "Degrading"
    # steady_t: the last-10 window ends on the rewrite (fewer, larger files)
    assert got[("steady_t", "avg_file_size_mb")] == "Improving"
    # single_t: one snapshot — everything Stable (too few observations)
    assert all(d == "Stable" for (t, _), d in got.items() if t == "single_t")
