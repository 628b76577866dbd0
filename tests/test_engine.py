"""Engine facade: dashboard assembly (the §3.2 render-path composition)."""

from __future__ import annotations

from hielo_spark.engine import Engine
from hielo_spark.metadata.fixtures import AS_OF, synthetic_snapshots


def test_health_dashboard_composition(spark):
    eng = Engine(spark)
    snaps = synthetic_snapshots(spark)
    report = eng.health_dashboard(snaps, AS_OF, "hot_t")
    assert report["health_score"] == 40.0
    assert report["band"] == "Poor"
    assert report["category_scores"]["status"] == "Critical"
    cats = {a["category"] for a in report["alerts"]}
    assert {"small_files", "high_snapshot_frequency"} <= cats
    actions = {r["action_type"] for r in report["recommendations"]}
    assert {"compaction", "optimization", "retention_policy"} == actions


def test_health_dashboard_empty_table(spark):
    eng = Engine(spark)
    report = eng.health_dashboard(synthetic_snapshots(spark), AS_OF, "no_such_table")
    assert report == {"table_name": "no_such_table", "empty": True}


def test_engine_register_catalog_returns_conf(spark):
    from hielo_spark.catalog.profiles import CatalogProfile

    eng = Engine(spark)
    conf = eng.register_catalog(CatalogProfile("c", "rest", {"uri": "https://x"}))
    assert conf["spark.sql.catalog.c.uri"] == "https://x"
