"""Scalar function layer (C1-C8 helpers)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hielo_spark import functions as FN


def test_format_bytes(spark):
    df = spark.createDataFrame(
        [(512,), (2048,), (5 * 1024**2,), (3 * 1024**3,), (2 * 1024**4,), (1010 * 1024**3,)],
        ["n"],
    )
    got = [r[0] for r in df.select(FN.format_bytes("n")).collect()]
    # last case: 4-digit GiB must render plain %.1f with no locale separators
    assert got == ["512 B", "2.0 KiB", "5.0 MiB", "3.0 GiB", "2.0 TiB", "1010.0 GiB"]


def test_epoch_ms_display(spark):
    df = spark.createDataFrame([(1717243200000,)], ["ms"])  # 2024-06-01 12:00:00 UTC
    assert df.select(FN.epoch_ms_to_display("ms")).first()[0] == "2024-06-01 12:00:00 UTC"


def test_truncate_display(spark):
    df = spark.createDataFrame([("x" * 60,), ("short",)], ["s"])
    got = [r[0] for r in df.select(FN.truncate_display("s", 10)).collect()]
    assert got[0] == "x" * 9 + "…" and got[1] == "short"


def test_parse_long_or_zero(spark):
    df = spark.createDataFrame([("42",), ("junk",), (None,)], ["s"])
    assert [r[0] for r in df.select(FN.parse_long_or_zero("s")).collect()] == [42, 0, 0]
