"""Loader + writer round-trips."""

from __future__ import annotations

import pytest

from hielo_spark.io import TABLES, load_table, write_table


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        assert df.count() > 0


def test_events_ts_is_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")


def test_partitioned_write_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_table(docs, out, partition_by=["lang"], max_records_per_file=100)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: a lang filter must prune to one partition dir
    one = back.filter("lang = 'en'")
    assert one.count() == docs.filter("lang = 'en'").count()
    import os
    assert any(d.startswith("lang=") for d in os.listdir(out))
