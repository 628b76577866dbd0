"""Profile store (S3/S9) + browse operators (F2/F9/O3) unit tests,
mirroring the reference's config tests (config.rs:143-185)."""

from __future__ import annotations

import pytest

from hielo_spark.catalog.profiles import MASK, CatalogProfile, ProfileStore


def _store(tmp_path):
    return ProfileStore(tmp_path / "config.json")


def test_add_and_duplicate_rejection(tmp_path):
    s = _store(tmp_path)
    s.add(CatalogProfile("prod", "rest", {"uri": "https://catalog/api"}))
    assert not s.is_name_unique("prod")
    with pytest.raises(ValueError):
        s.add(CatalogProfile("prod", "glue", {}))
    # persisted round-trip
    s2 = _store(tmp_path)
    assert s2.get("prod").config["uri"] == "https://catalog/api"


def test_update_and_delete(tmp_path):
    s = _store(tmp_path)
    s.add(CatalogProfile("c", "rest", {"uri": "u1"}))
    s.update(CatalogProfile("c", "rest", {"uri": "u2"}))
    assert s.get("c").config["uri"] == "u2"
    s.delete("c")
    with pytest.raises(KeyError):
        s.get("c")
    with pytest.raises(KeyError):
        s.delete("c")


def test_sanitize_masks_tokens_only():
    # config.rs:167-185: auth_token masked, uri untouched
    p = CatalogProfile("c", "rest", {"uri": "https://x", "auth_token": "s3cr3t"})
    sanitized = p.sanitized()["config"]
    assert sanitized["auth_token"] == MASK
    assert sanitized["uri"] == "https://x"


def test_spark_conf_emission():
    rest = CatalogProfile("r", "rest", {"uri": "https://x", "warehouse": "s3://wh", "auth_token": "t"})
    conf = rest.spark_conf()
    assert conf["spark.sql.catalog.r"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.r.type"] == "rest"
    assert conf["spark.sql.catalog.r.token"] == "t"
    glue = CatalogProfile("g", "glue", {"warehouse": "s3://wh"})
    gconf = glue.spark_conf()
    assert gconf["spark.sql.catalog.g.catalog-impl"].endswith("GlueCatalog")
    assert gconf["spark.sql.catalog.g.client.region"] == "us-east-1"  # default
    with pytest.raises(ValueError):
        CatalogProfile("x", "hive", {}).spark_conf()


def test_live_catalog_tree(spark, sf_dir):
    from hielo_spark.catalog.browse import live_catalog_tree, search
    from hielo_spark.io import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS browse_db")
    load_table(spark, sf_dir, "region").write.mode("overwrite").saveAsTable("browse_db.region_t")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable("browse_db.nation_t")
    try:
        tree = live_catalog_tree(spark)
        rows = {r["full_name"] for r in tree.filter("namespace = 'browse_db'").collect()}
        assert {"browse_db.region_t", "browse_db.nation_t"} <= rows
        types = {r["table_type"] for r in tree.filter("namespace = 'browse_db'").collect()}
        assert "temporary" not in types
        hits = search(tree.filter("namespace = 'browse_db'"), "REGION", limit=10).collect()
        assert len(hits) == 1 and hits[0]["table_name"] == "region_t"
    finally:
        spark.sql("DROP TABLE IF EXISTS browse_db.region_t")
        spark.sql("DROP TABLE IF EXISTS browse_db.nation_t")
        spark.sql("DROP DATABASE IF EXISTS browse_db")
