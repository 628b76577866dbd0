"""Sketch accuracy pins: the 100 TB replacements for exact distinct-count
and exact quantiles are mergeable one-shuffle sketches
(approx_count_distinct = HLL++, approx_percentile = t-digest-style).
The oracle surface stays exact (events_user_cardinality,
lineitem_quantiles); these tests pin how far the sketch form may drift so
swapping it in at scale is a measured trade, not a hope."""

from __future__ import annotations

import pyspark.sql.functions as F

from hielo_spark.io import load_table


def test_hll_cardinality_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(3, 0.06 * r.exact), r


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = li.select(
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias("approx"),
    ).first()
    for e, a in zip(r.exact, r.approx):
        assert abs(a - e) <= 0.01 * e, (e, a)
