"""add_files — registering existing parquet as an append snapshot with
footer-only stats (no data rewrite, no data scan): the metadata-only
onboarding path for pre-existing landing zones. Parity target:
Iceberg's ``add_files`` procedure (spark procedures docs)."""

from __future__ import annotations

import glob
import os

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.manifests import read_data_at_snapshot


@pytest.fixture()
def registered(spark):
    from hielo_spark.sources import register

    register(spark)
    return spark


def _stage_parquet(spark, path, df):
    df.write.parquet(path)
    return sorted(glob.glob(os.path.join(path, "**", "part-*.parquet"),
                            recursive=True))


@pytest.mark.slow
def test_add_files_fresh_table_reads_and_prunes(registered, spark,
                                                tmp_path):
    spark_ = registered
    stage = str(tmp_path / "stage")
    files = _stage_parquet(
        spark_, stage,
        spark_.range(0, 1000).selectExpr(
            "id", "cast(id % 7 as double) as x",
            "concat('s', id) as s").repartition(4),
    )
    t = str(tmp_path / "t")
    snap = C.add_files(spark_, t, files, snapshot_id=101,
                       timestamp_ms=1700000000000)
    assert snap["summary"]["added-data-files"] == str(len(files))
    # no copy: the table's data are the staged files themselves
    assert not glob.glob(os.path.join(t, "data", "**", "*.parquet"),
                         recursive=True)
    jvm = read_data_at_snapshot(spark_, C.current_metadata_path(t))
    assert jvm.count() == 1000
    ds = spark_.read.format("hielo_iceberg").load(t)
    assert sorted(r.id for r in ds.collect()) == list(range(1000))
    # footer bounds landed → file-level skipping engages: a no-match
    # predicate returns an empty frame without raising
    got = read_data_at_snapshot(
        spark_, C.current_metadata_path(t), skip_filter=("id", ">", 10**9)
    )
    assert got.count() == 0


def test_add_files_duplicate_and_schema_checks(registered, spark,
                                               tmp_path):
    spark_ = registered
    stage = str(tmp_path / "stage")
    files = _stage_parquet(
        spark_, stage, spark_.range(0, 10).selectExpr("id"))
    t = str(tmp_path / "t")
    C.add_files(spark_, t, files, snapshot_id=101,
                timestamp_ms=1700000000000)
    with pytest.raises(ValueError, match="already registered"):
        C.add_files(spark_, t, files, snapshot_id=102,
                    timestamp_ms=1700100000000)
    # a second batch with a missing table column is loud
    bad = _stage_parquet(
        spark_, str(tmp_path / "bad"),
        spark_.range(0, 5).selectExpr("id as other"))
    with pytest.raises(ValueError, match="lack table columns"):
        C.add_files(spark_, t, bad, snapshot_id=103,
                    timestamp_ms=1700200000000)


def test_add_files_onto_appended_table(registered, spark, tmp_path):
    """Mixing written and registered files in one table: both planes
    see the union, incremental attribution works."""
    spark_ = registered
    t = str(tmp_path / "t")
    C.append(spark_, t, spark_.range(0, 50).selectExpr("id"),
             snapshot_id=101, timestamp_ms=1700000000000)
    files = _stage_parquet(
        spark_, str(tmp_path / "stage"),
        spark_.range(50, 80).selectExpr("id"))
    C.add_files(spark_, t, files, snapshot_id=102,
                timestamp_ms=1700100000000)
    ds = spark_.read.format("hielo_iceberg").load(t)
    assert sorted(r.id for r in ds.collect()) == list(range(80))
    from hielo_spark.metadata.manifests import read_incremental

    inc = read_incremental(spark_, C.current_metadata_path(t), 101)
    assert sorted(r.id for r in inc.collect()) == list(range(50, 80))


@pytest.mark.slow
def test_add_files_hive_partitioned_import(registered, spark, tmp_path):
    """A hive col=value layout imports with identity partition values
    parsed from the path — partition_filter then prunes files from
    metadata alone, without the partition column in the data files."""
    spark_ = registered
    stage = str(tmp_path / "stage")
    df = spark_.range(0, 100).selectExpr(
        "id", "cast(id % 4 as string) as bucket_col")
    df.write.partitionBy("bucket_col").parquet(stage)
    files = sorted(glob.glob(
        os.path.join(stage, "**", "part-*.parquet"), recursive=True))
    t = str(tmp_path / "t")
    C.add_files(spark_, t, files, snapshot_id=101,
                timestamp_ms=1700000000000)
    got = read_data_at_snapshot(
        spark_, C.current_metadata_path(t),
        partition_filter={"bucket_col": "2"},
    )
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(100) if i % 4 == 2]


def test_add_files_nan_footer_bounds_masked(registered, spark,
                                            tmp_path):
    """Footer float stats may carry NaN (old writers) — registered
    bounds must stay NaN-free so =/>/>= predicates never wrongly prune
    (the r11 NaN-bounds rule applies to imported files too)."""
    import pandas as pd

    spark_ = registered
    stage = str(tmp_path / "stage")
    pdf = pd.DataFrame({
        "id": range(2001),
        "x": [float("nan") if i == 1000 else float(i)
              for i in range(2001)],
    })
    df = spark_.createDataFrame(pdf).coalesce(1)
    files = _stage_parquet(spark_, stage, df)
    t = str(tmp_path / "t")
    C.add_files(spark_, t, files, snapshot_id=101,
                timestamp_ms=1700000000000)
    from hielo_spark.metadata.manifests import live_data_file_dicts

    doc_path = C.current_metadata_path(t)
    import json

    doc = json.load(open(doc_path))
    cur = next(s for s in doc["snapshots"]
               if s["snapshot-id"] == doc["current-snapshot-id"])
    from hielo_spark.metadata.manifests import _resolve

    live = live_data_file_dicts(
        _resolve(os.path.join(t, "metadata", "x"),
                 cur["manifest-list"].removeprefix("file:")))
    ub = next(iter(live.values()))["ub"]
    if ub and "x" in ub:
        assert ub["x"].lower() != "nan"
    got = read_data_at_snapshot(
        spark_, doc_path, skip_filter=("x", "=", 1999.0))
    assert got.filter("x = 1999.0").count() == 1
    got = read_data_at_snapshot(
        spark_, doc_path, skip_filter=("x", ">", 1500.0))
    assert got.filter("x > 1500.0").count() >= 500


def test_add_files_ns_timestamp_parquet(registered, spark, sf_dir):
    """The driver's events.parquet carries TIMESTAMP(NANOS) — an
    import must register and read it with exact µs-truncated values on
    both planes (the same dual-encoding contract io.load_table pins)."""
    import tempfile

    spark_ = registered
    t = os.path.join(tempfile.mkdtemp(), "t")
    src = os.path.join(sf_dir, "events.parquet")
    C.add_files(spark_, t, [src], snapshot_id=101,
                timestamp_ms=1700000000000)
    from hielo_spark.io import load_table

    ds = {r.event_id: str(r.ts) for r in
          spark_.read.format("hielo_iceberg").load(t)
          .select("event_id", "ts").collect()}
    want = {r.event_id: str(r.ts) for r in
            load_table(spark_, sf_dir, "events")
            .select("event_id", "ts").collect()}
    assert ds == want
    jvm = read_data_at_snapshot(spark_, C.current_metadata_path(t))
    assert jvm.count() == len(want)


# ---------------------------------------------------------------------------
# Property: footer-derived stats are always ENCLOSING — for any value
# population (nulls, NaN/±inf floats, unicode strings, extreme ints,
# dates), the registered lower bound ≤ every non-NaN value ≤ upper
# bound, null counts are exact, and NaN never leaks into a bound
# (pure pyarrow, no Spark — guards _footer_file_stats against parquet
# writer stat quirks directly).
# ---------------------------------------------------------------------------
import datetime as _dt
import math as _math

from hypothesis import given, settings
from hypothesis import strategies as st

_POPS = {
    "double": st.one_of(
        st.none(), st.just(float("nan")), st.just(float("inf")),
        st.just(float("-inf")),
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    "bigint": st.one_of(
        st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    "string": st.one_of(st.none(), st.text(max_size=24)),
    "date": st.one_of(st.none(), st.dates(min_value=_dt.date(1, 1, 1),
                                          max_value=_dt.date(9999, 1, 1))),
}
_ARROW_T = {"double": "float64", "bigint": "int64", "string": "string",
            "date": "date32[day]"}


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_footer_stats_enclose_property(tmp_path_factory, data):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hielo_spark.metadata.commit import _footer_file_stats

    ty = data.draw(st.sampled_from(list(_POPS)))
    values = data.draw(st.lists(_POPS[ty], min_size=1, max_size=12))
    p = str(tmp_path_factory.mktemp("fs") / "x.parquet")
    pq.write_table(
        pa.table({"c": pa.array(values, type=_ARROW_T[ty])}),
        p, row_group_size=3,  # several row groups per file
    )
    records, lo, hi, nn = _footer_file_stats(
        pq.ParquetFile(p).metadata, {"c": ty}, ["c"])
    assert records == len(values)
    n_null = sum(1 for v in values if v is None)
    assert int((nn or {}).get("c", 0)) == n_null
    present = [v for v in values if v is not None]
    comparable = [v for v in present
                  if not (ty == "double" and _math.isnan(v))]
    if lo and "c" in lo:
        assert lo["c"].lower() != "nan"
        v_lo = (float(lo["c"]) if ty == "double"
                else int(lo["c"]) if ty == "bigint"
                else _dt.date.fromisoformat(lo["c"]) if ty == "date"
                else lo["c"])
        if comparable:
            if ty == "string":
                # writer stats may be truncated: lower bound must be a
                # PREFIX-order lower bound, not necessarily an exact value
                assert all(v_lo <= v for v in comparable)
            else:
                assert v_lo <= min(comparable)
    if hi and "c" in hi:
        assert hi["c"].lower() != "nan"
        v_hi = (float(hi["c"]) if ty == "double"
                else int(hi["c"]) if ty == "bigint"
                else _dt.date.fromisoformat(hi["c"]) if ty == "date"
                else hi["c"])
        if comparable:
            if ty == "string":
                assert all(v <= v_hi for v in comparable)
            else:
                assert v_hi >= max(comparable)


def test_add_files_mixed_type_and_parent_dir_guards(registered, spark,
                                                    tmp_path):
    """(a) A shared column whose TYPE flips between files raises (a
    silent flip would poison that column's bounds); (b) '=' segments in
    PARENT directories above the files' common root are never inferred
    as partitions."""
    spark_ = registered
    root = str(tmp_path / "user=bob" / "stage")  # '=' above common root
    f1 = _stage_parquet(spark_, root + "/a",
                        spark_.range(0, 5).selectExpr("id"))
    t = str(tmp_path / "t")
    C.add_files(spark_, t, f1, snapshot_id=101,
                timestamp_ms=1700000000000)
    import json

    doc = json.load(open(C.current_metadata_path(t)))
    fields = {f["name"] for s in doc["schemas"] for f in s["fields"]}
    assert "user" not in fields  # parent-dir '=' not a partition
    f2 = _stage_parquet(
        spark_, root + "/b",
        spark_.range(5, 9).selectExpr("cast(id as double) as id")
        .coalesce(1))
    f3 = _stage_parquet(
        spark_, root + "/c",
        spark_.range(9, 12).selectExpr("id").coalesce(1))
    with pytest.raises(ValueError, match="mixed-type"):
        C.add_files(spark_, str(tmp_path / "t2"), f2 + f3,
                    snapshot_id=102, timestamp_ms=1700100000000)


def test_add_files_single_partition_and_per_file_checks(registered,
                                                        spark, tmp_path):
    """Review fixes (r12): (a) importing files that all live in ONE
    hive partition resolves the value from the common root itself;
    (b) a later file missing a data column raises per the documented
    per-file contract; (c) a statless parquet file imports with NO
    bounds (conservative — never a non-enclosing bound)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark_ = registered
    # (a) partitioned table, then a single-partition incremental import
    stage = str(tmp_path / "stage")
    df = spark_.range(0, 40).selectExpr(
        "id", "cast(id % 2 as string) as day")
    df.write.partitionBy("day").parquet(stage)
    t = str(tmp_path / "t")
    C.add_files(spark_, t, sorted(glob.glob(
        os.path.join(stage, "**", "part-*.parquet"), recursive=True)),
        snapshot_id=101, timestamp_ms=1700000000000)
    one = str(tmp_path / "one")
    spark_.range(100, 105).selectExpr("id", "'1' as day") \
        .coalesce(1).write.parquet(one)
    # relocate under a day=1 dir so ALL new files share that partition
    part_dir = str(tmp_path / "inc" / "day=1")
    os.makedirs(part_dir)
    newf = []
    for i, p in enumerate(sorted(glob.glob(one + "/part-*.parquet"))):
        q = os.path.join(part_dir, f"f{i}.parquet")
        pq.write_table(pq.read_table(p, columns=["id"]), q)
        newf.append(q)
    C.add_files(spark_, t, newf, snapshot_id=102,
                timestamp_ms=1700100000000)
    got = read_data_at_snapshot(
        spark_, C.current_metadata_path(t),
        partition_filter={"day": "1"})
    assert sorted(r.id for r in got.collect()) == \
        [i for i in range(40) if i % 2 == 1] + [100, 101, 102, 103, 104]
    # (b) per-file missing column
    t2 = str(tmp_path / "t2")
    f_ok = _stage_parquet(spark_, str(tmp_path / "ok"),
                          spark_.range(0, 3).selectExpr("id", "'a' as v")
                          .coalesce(1))
    bad = str(tmp_path / "badf" / "x.parquet")
    os.makedirs(os.path.dirname(bad))
    pq.write_table(pa.table({"id": [9, 10]}), bad)
    with pytest.raises(ValueError, match="lacks table columns"):
        C.add_files(spark_, t2, f_ok + [bad], snapshot_id=101,
                    timestamp_ms=1700000000000)
    # (c) statless file: no bounds recorded, reads stay exact
    t3 = str(tmp_path / "t3")
    ns = str(tmp_path / "nostats" / "x.parquet")
    os.makedirs(os.path.dirname(ns))
    pq.write_table(pa.table({"id": list(range(50))}), ns,
                   write_statistics=False)
    C.add_files(spark_, t3, [ns], snapshot_id=101,
                timestamp_ms=1700000000000)
    got = read_data_at_snapshot(
        spark_, C.current_metadata_path(t3), skip_filter=("id", "=", 49))
    assert got.filter("id = 49").count() == 1


def test_footer_stats_int_exact_above_2_53(tmp_path):
    """Integer bounds aggregate with int comparison — floats equate
    2^53 and 2^53+1 and could keep a lower bound ABOVE the minimum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hielo_spark.metadata.commit import _footer_file_stats

    lo_small = 9007199254740992   # 2^53
    lo_big = 9007199254740993     # 2^53 + 1 (== 2^53 as float)
    p = str(tmp_path / "x.parquet")
    pq.write_table(
        pa.table({"id": pa.array([lo_big, lo_big, lo_small, lo_big],
                                 type="int64")}),
        p, row_group_size=2,
    )
    _, lo, hi, _ = _footer_file_stats(
        pq.ParquetFile(p).metadata, {"id": "bigint"}, ["id"])
    assert int(lo["id"]) == lo_small
    assert int(hi["id"]) == lo_big
