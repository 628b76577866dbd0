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


def test_attach_warehouse_sql_over_committed_tables(spark, tmp_path):
    """attach_warehouse turns a Hadoop-catalog dir into spark.sql-able
    views through our own read plane, MOR deletes included."""
    from hielo_spark.catalog.warehouse import attach_warehouse
    from hielo_spark.metadata import commit as C

    wh = str(tmp_path / "wh")
    C.append(spark, wh + "/ns1/orders_t",
             spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    C.append(spark, wh + "/ns1/items_t",
             spark.createDataFrame([(7, 1)], ["item", "order_id"]),
             snapshot_id=201, timestamp_ms=1700000000000)
    C.delete_equality(spark, wh + "/ns1/orders_t",
                      spark.createDataFrame([(2,)], ["id"]),
                      snapshot_id=102, timestamp_ms=1700100000000)

    views = attach_warehouse(spark, wh, prefix="t")
    assert views == ["t_ns1_items_t", "t_ns1_orders_t"]
    # SQL over both views, MOR delete applied, join works
    got = spark.sql(
        "SELECT o.id, o.v, i.item FROM t_ns1_orders_t o "
        "JOIN t_ns1_items_t i ON o.id = i.order_id"
    ).collect()
    assert [(r.id, r.v, r.item) for r in got] == [(1, "a", 7)]
    assert spark.sql("SELECT count(*) AS n FROM t_ns1_orders_t").collect()[0].n == 1
