"""Lineage-preserving UPDATE (Iceberg v3 row lineage): update_where
carries each matched row's _row_id through the re-append as
MATERIALIZED columns (first_row_id=null entries, the compaction
pattern), stamps _last_updated_sequence_number with the update's
sequence, does NOT advance the next-row-id watermark, and
read_changelog(compute_updates=True) renders the commit as
UPDATE_BEFORE/UPDATE_AFTER pairs on the same _row_id.

Reference parity note: the reference app (a metadata viewer) has no
DML plane; these semantics follow the Iceberg v3 spec's row-lineage
rules (spec.py pins the field ids)."""

from __future__ import annotations

import json

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata import upgrade_format_version
from hielo_spark.metadata.manifests import (
    read_changelog,
    read_data_at_snapshot,
)


def _lineage(spark, t):
    df = read_data_at_snapshot(
        spark, C.current_metadata_path(t), row_lineage=True
    )
    return {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in df.collect()
    }


def _mk_v3(spark, t, n=10):
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    upgrade_format_version(t, 3)
    # post-upgrade append so every row owns a real _row_id
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(n, 2 * n)], ["id", "v"]),
        snapshot_id=102, timestamp_ms=1700100000000)


@pytest.mark.slow
def test_update_preserves_row_ids_and_bumps_lus(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(0, "seed")], ["id", "v"]),
        snapshot_id=100, timestamp_ms=1699000000000)
    upgrade_format_version(t, 3)
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 11)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    before = _lineage(spark, t)
    doc0 = json.load(open(C.current_metadata_path(t)))
    wm0 = doc0["next-row-id"]

    res = C.update_where(spark, t, "id % 3 = 1", {"v": "concat('u', id)"},
                         snapshot_id=102, timestamp_ms=1700100000000)
    assert res is not None
    after = _lineage(spark, t)
    upd_seq = next(
        s for s in json.load(open(C.current_metadata_path(t)))["snapshots"]
        if s["snapshot-id"] == 102
    )["sequence-number"]

    assert set(after) == set(before)  # no rows gained or lost
    for k in after:
        if 1 <= k <= 10 and k % 3 == 1:
            # updated rows: SAME _row_id, lus = the update's sequence
            assert after[k][0] == before[k][0], k
            assert after[k][1] == upd_seq, k
        else:
            assert after[k] == before[k], k
    # the seed row (pre-upgrade) keeps its null id — nothing assigned
    # retroactively, matching the compaction posture
    assert after[0][0] is None

    # values actually updated
    got = {r.id: r.v for r in read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()}
    assert got[4] == "u4" and got[5] == "v5"


@pytest.mark.slow
def test_update_does_not_advance_next_row_id(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_v3(spark, t)
    doc0 = json.load(open(C.current_metadata_path(t)))
    wm0 = doc0["next-row-id"]
    C.update_where(spark, t, "id < 5", {"v": "'x'"},
                   snapshot_id=103, timestamp_ms=1700200000000)
    doc1 = json.load(open(C.current_metadata_path(t)))
    assert doc1["next-row-id"] == wm0  # no ids assigned by an UPDATE
    snap = next(s for s in doc1["snapshots"] if s["snapshot-id"] == 103)
    assert snap["first-row-id"] == wm0
    # a later append assigns fresh ids from the UNBURNED watermark,
    # disjoint from every preserved id
    C.append(spark, t, spark.createDataFrame(
        [(100, "new")], ["id", "v"]),
        snapshot_id=104, timestamp_ms=1700300000000)
    lin = _lineage(spark, t)
    assert lin[100][0] == wm0
    ids = [rid for rid, _ in lin.values() if rid is not None]
    assert len(ids) == len(set(ids))  # no collisions


@pytest.mark.slow
def test_repeated_update_keeps_preserving_ids(spark, tmp_path):
    """Second UPDATE reads the FIRST's materialized lineage columns
    (coalesce order: explicit column before first_row_id+pos) — ids
    survive any number of updates."""
    t = str(tmp_path / "t")
    _mk_v3(spark, t, n=6)
    orig = _lineage(spark, t)
    C.update_where(spark, t, "id >= 0", {"v": "concat('a', id)"},
                   snapshot_id=103, timestamp_ms=1700200000000)
    C.update_where(spark, t, "id >= 0", {"v": "concat('b', id)"},
                   snapshot_id=104, timestamp_ms=1700300000000)
    after = _lineage(spark, t)
    assert {k: v[0] for k, v in after.items()} == {
        k: v[0] for k, v in orig.items()
    }
    vals = {r.id: r.v for r in read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()}
    assert vals == {i: f"b{i}" for i in range(12)}


def test_update_set_on_lineage_column_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_v3(spark, t, n=3)
    with pytest.raises(ValueError, match="unknown columns"):
        C.update_where(spark, t, "id = 1", {"_row_id": "99"},
                       snapshot_id=103, timestamp_ms=1700200000000)


@pytest.mark.slow
def test_changelog_compute_updates_pairs_on_row_id(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(0, "seed")], ["id", "v"]),
        snapshot_id=100, timestamp_ms=1699000000000)
    upgrade_format_version(t, 3)
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 7)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    pre = _lineage(spark, t)
    C.update_where(spark, t, "id IN (2, 4)", {"v": "concat('u', id)"},
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.delete_where(spark, t, "id = 6",
                   snapshot_id=103, timestamp_ms=1700200000000)

    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True,
    )
    rows = cl.collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append(r)

    ub = {r.id: r for r in by_type.get("UPDATE_BEFORE", [])}
    ua = {r.id: r for r in by_type.get("UPDATE_AFTER", [])}
    assert set(ub) == set(ua) == {2, 4}
    for k in (2, 4):
        # the pairing contract: SAME _row_id across before/after,
        # values show the change
        assert ub[k]._row_id == ua[k]._row_id == pre[k][0]
        assert ub[k].v == f"v{k}" and ua[k].v == f"u{k}"
        assert ub[k]._commit_snapshot_id == 102
        assert ua[k]._commit_snapshot_id == 102
    # the DELETE snapshot renders a plain DELETE (no matching insert)
    dels = by_type.get("DELETE", [])
    assert [r.id for r in dels] == [6]
    assert not by_type.get("INSERT")


def test_changelog_compute_updates_requires_v3_lineage(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(3),
             snapshot_id=100, timestamp_ms=1699000000000)
    with pytest.raises(ValueError, match="compute_updates"):
        read_changelog(
            spark, C.current_metadata_path(t), compute_updates=True
        )


def test_changelog_compute_updates_append_fast_path(spark, tmp_path):
    """Append snapshots keep the no-shuffle fast path under
    compute_updates — inserts carry synthesized lineage columns so the
    union's shape matches the diffed snapshots."""
    t = str(tmp_path / "t")
    _mk_v3(spark, t, n=3)
    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True,
    )
    rows = cl.collect()
    assert {r._change_type for r in rows} == {"INSERT"}
    got = {r.id: r._row_id for r in rows}
    assert got == {3: 0, 4: 1, 5: 2}


@pytest.mark.slow
def test_datasource_lineage_read_sees_preserved_ids(spark, tmp_path):
    """The registered DataSource's lineage read agrees with the JVM
    plane after a lineage-preserving UPDATE (materialized columns win
    over inheritance on both planes)."""
    from hielo_spark import sources

    t = str(tmp_path / "t")
    _mk_v3(spark, t, n=4)
    before = _lineage(spark, t)
    C.update_where(spark, t, "id BETWEEN 2 AND 5", {"v": "'z'"},
                   snapshot_id=103, timestamp_ms=1700200000000)
    sources.register(spark)
    ds = (
        spark.read.format("hielo_iceberg")
        .option("row-lineage", "true")
        .load(t)
    )
    got = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in ds.collect()
    }
    jvm = _lineage(spark, t)
    assert got == jvm
    for k in (2, 3, 4, 5):
        assert got[k][0] == before[k][0]


@pytest.mark.slow
def test_changelog_net_changes_collapses_range(spark, tmp_path):
    """net_changes: one diff for the whole range — insert-then-update
    nets to one INSERT of the final state, update-then-delete nets to
    one DELETE of the original, N updates net to ONE before/after pair
    (composes with compute_updates)."""
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(0, "seed")], ["id", "v"]),
        snapshot_id=100, timestamp_ms=1699000000000)
    upgrade_format_version(t, 3)
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 5)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    pre = _lineage(spark, t)
    # range: insert 9, update 1 twice, update 9 once, delete 2
    C.append(spark, t, spark.createDataFrame(
        [(9, "new")], ["id", "v"]),
        snapshot_id=102, timestamp_ms=1700100000000)
    C.update_where(spark, t, "id = 1", {"v": "'a'"},
                   snapshot_id=103, timestamp_ms=1700200000000)
    C.update_where(spark, t, "id = 1", {"v": "'b'"},
                   snapshot_id=104, timestamp_ms=1700300000000)
    C.update_where(spark, t, "id = 9", {"v": "'n2'"},
                   snapshot_id=105, timestamp_ms=1700400000000)
    C.delete_where(spark, t, "id = 2",
                   snapshot_id=106, timestamp_ms=1700500000000)

    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True, net_changes=True,
    ).collect()
    by_type: dict[str, list] = {}
    for r in cl:
        by_type.setdefault(r._change_type, []).append(r)
    # id=1 updated twice → exactly ONE pair, original → final
    ub = {r.id: r for r in by_type.get("UPDATE_BEFORE", [])}
    ua = {r.id: r for r in by_type.get("UPDATE_AFTER", [])}
    assert set(ub) == set(ua) == {1}
    assert ub[1].v == "v1" and ua[1].v == "b"
    assert ub[1]._row_id == ua[1]._row_id == pre[1][0]
    # id=9 inserted then updated inside the range → ONE INSERT of 'n2'
    ins = {r.id: r.v for r in by_type.get("INSERT", [])}
    assert ins == {9: "n2"}
    # id=2 deleted → one DELETE of the original state
    assert [(r.id, r.v) for r in by_type.get("DELETE", [])] == [(2, "v2")]
    # net attribution: ordinal 0, snapshot = range head
    assert {r._change_ordinal for r in cl} == {0}
    assert {r._commit_snapshot_id for r in cl} == {106}


def test_changelog_net_changes_without_updates(spark, tmp_path):
    """net_changes works on a plain v2 table too (no compute_updates):
    delete+insert rendering of the net diff."""
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    C.delete_where(spark, t, "id = 0",
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t, spark.createDataFrame(
        [(8, "v8")], ["id", "v"]),
        snapshot_id=103, timestamp_ms=1700200000000)
    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, net_changes=True,
    ).collect()
    got = sorted((r._change_type, r.id) for r in cl)
    assert got == [("DELETE", 0), ("INSERT", 8)]


def test_changelog_compute_updates_identifier_columns(spark, tmp_path):
    """Iceberg's changelog procedure pairs by IDENTIFIER columns when
    given — works on a plain v2 table (no row lineage): an UPDATE
    renders as UPDATE_BEFORE/UPDATE_AFTER on the identifier key."""
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    C.update_where(spark, t, "id IN (1, 3)", {"v": "concat('u', id)"},
                   snapshot_id=102, timestamp_ms=1700100000000)
    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True,
        identifier_columns=["id"],
    ).collect()
    by_type: dict[str, list] = {}
    for r in cl:
        by_type.setdefault(r._change_type, []).append(r)
    ub = {r.id: r.v for r in by_type.get("UPDATE_BEFORE", [])}
    ua = {r.id: r.v for r in by_type.get("UPDATE_AFTER", [])}
    assert ub == {1: "v1", 3: "v3"}
    assert ua == {1: "u1", 3: "u3"}
    assert not by_type.get("DELETE") and not by_type.get("INSERT")
    # missing identifier column raises loudly
    with pytest.raises(ValueError, match="identifier columns"):
        read_changelog(
            spark, C.current_metadata_path(t),
            from_snapshot_id=101, compute_updates=True,
            identifier_columns=["nope"],
        ).collect()


def test_changelog_compute_updates_schema_identifier_fields(spark,
                                                            tmp_path):
    """The schema's recorded identifier-field-ids (the spec's row
    identifier) resolve as the default pairing key — no explicit
    argument, no lineage required."""
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        if s.get("schema-id") == doc.get("current-schema-id", 0):
            s["identifier-field-ids"] = [1]  # field 1 = id
    json.dump(doc, open(mpath, "w"))
    C.update_where(spark, t, "id = 2", {"v": "'z'"},
                   snapshot_id=102, timestamp_ms=1700100000000)
    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True,
    ).collect()
    types = sorted((r._change_type, r.id, r.v) for r in cl)
    assert types == [("UPDATE_AFTER", 2, "z"), ("UPDATE_BEFORE", 2, "v2")]


def test_changelog_compute_updates_v2_without_key_raises(spark,
                                                         tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(3),
             snapshot_id=101, timestamp_ms=1700000000000)
    with pytest.raises(ValueError, match="pairing key"):
        read_changelog(
            spark, C.current_metadata_path(t), compute_updates=True
        )


def test_set_identifier_fields_commit(spark, tmp_path):
    """set_identifier_fields records the spec identifier as a new
    schema entry; compute_updates then defaults to it; float columns
    and unknown names refuse; empty clears."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(4)],
        StructType([
            StructField("id", LongType()),
            StructField("v", StringType()),
            StructField("score", DoubleType()),
        ])),
        snapshot_id=101, timestamp_ms=1700000000000)
    sid = C.set_identifier_fields(t, ["id"])
    doc = json.load(open(C.current_metadata_path(t)))
    assert doc["current-schema-id"] == sid
    blk = next(s for s in doc["schemas"] if s["schema-id"] == sid)
    assert blk["identifier-field-ids"] == [1]
    with pytest.raises(ValueError, match="float/double"):
        C.set_identifier_fields(t, ["score"])
    with pytest.raises(ValueError, match="not in schema"):
        C.set_identifier_fields(t, ["nope"])

    C.update_where(spark, t, "id = 2", {"v": "'z'"},
                   snapshot_id=102, timestamp_ms=1700100000000)
    cl = read_changelog(
        spark, C.current_metadata_path(t),
        from_snapshot_id=101, compute_updates=True,
    ).collect()
    assert sorted((r._change_type, r.id) for r in cl) == [
        ("UPDATE_AFTER", 2), ("UPDATE_BEFORE", 2)]
    # clearing: compute_updates then needs an explicit key again (v2)
    C.set_identifier_fields(t, [])
    with pytest.raises(ValueError, match="pairing key"):
        read_changelog(
            spark, C.current_metadata_path(t),
            from_snapshot_id=101, compute_updates=True,
        )
