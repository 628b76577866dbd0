"""Bucketed co-located join: writing both fact tables bucketed on the
join key lets the join run with NO exchange on either side — the storage-
partitioned-join pattern SCALE.md prescribes for repeated fact⋈fact joins
at 100 TB (pay the shuffle once at write time, never at read time)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hielo_spark.io import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, no_broadcast):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b"))
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # both sides read pre-bucketed
        assert "SortMergeJoin" in plan
        # and the result is the same as the shuffled join over raw parquet
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_aggregation_avoids_exchange(spark, sf_dir, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS lineitem_b2")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable("lineitem_b2"))
    try:
        agg = spark.table("lineitem_b2").groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # grouping key = bucket key
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_b2")
