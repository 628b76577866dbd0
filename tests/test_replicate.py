"""Incremental CDC replication (ops/replicate.py): bootstrap, per-
snapshot changelog apply via merge_into, exactly-once watermark in the
destination's properties, idempotent re-apply, and agreement between
the two tables after appends, deletes, and merges on the source."""

from __future__ import annotations

import json

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.manifests import read_data_at_snapshot
from hielo_spark.ops.replicate import replicate_changes


def _rows(spark, t):
    return sorted(
        (r.id, r.v)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)
        ).collect()
    )


@pytest.mark.slow
def test_replicate_bootstrap_then_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)

    r1 = replicate_changes(spark, src, dst, keys=["id"])
    assert r1["bootstrapped"] and r1["watermark"] == 101
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]

    # caught up → no-op, no new dst snapshot
    n_before = len(json.load(open(C.current_metadata_path(dst)))["snapshots"])
    r2 = replicate_changes(spark, src, dst, keys=["id"])
    assert r2["applied"] == [] and r2["watermark"] == 101
    assert len(
        json.load(open(C.current_metadata_path(dst)))["snapshots"]
    ) == n_before

    # source advances: an append, a delete, and a merge (update+insert)
    C.append(spark, src, spark.createDataFrame([(3, "c")], ["id", "v"]),
             snapshot_id=102, timestamp_ms=1700100000000)
    C.delete_where(spark, src, "id = 1",
                   snapshot_id=103, timestamp_ms=1700200000000)
    C.merge_into(
        spark, src,
        spark.createDataFrame([(2, "B"), (4, "d")], ["id", "v"]),
        on=["id"], snapshot_id=104, timestamp_ms=1700300000000,
    )
    r3 = replicate_changes(spark, src, dst, keys=["id"])
    assert r3["applied"] == [102, 103, 104]
    assert _rows(spark, dst) == _rows(spark, src) == [
        (2, "B"), (3, "c"), (4, "d")]

    # idempotent: nothing more to do, contents stable
    r4 = replicate_changes(spark, src, dst, keys=["id"])
    assert r4["applied"] == []
    assert _rows(spark, dst) == _rows(spark, src)


@pytest.mark.slow
def test_replicate_resumes_by_watermark_slice(spark, tmp_path):
    """max_snapshots bounds one call; the watermark sits at the last
    APPLIED snapshot so the next call resumes exactly there."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])
    for i in range(3):
        C.append(
            spark, src,
            spark.createDataFrame([(10 + i, f"x{i}")], ["id", "v"]),
            snapshot_id=102 + i, timestamp_ms=1700100000000 + i,
        )
    r = replicate_changes(spark, src, dst, keys=["id"], max_snapshots=2)
    assert r["applied"] == [102, 103] and r["watermark"] == 103
    r2 = replicate_changes(spark, src, dst, keys=["id"])
    assert r2["applied"] == [104]
    assert _rows(spark, dst) == _rows(spark, src)


@pytest.mark.slow
def test_replicate_compaction_advances_watermark_without_commits(
    spark, tmp_path
):
    """A replace (compaction) snapshot changes no rows — the changelog
    emits nothing for it, and replication advances the watermark with a
    properties-only commit instead of stalling on it forever."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])
    C.delete_where(spark, src, "id = 1",
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.rewrite_data_files(spark, src, snapshot_id=103,
                         timestamp_ms=1700200000000)
    r = replicate_changes(spark, src, dst, keys=["id"])
    assert r["applied"] == [102, 103] and r["watermark"] == 103
    assert _rows(spark, dst) == _rows(spark, src) == [(2, "b")]
    # and the marker really is in dst's properties
    props = json.load(open(C.current_metadata_path(dst)))["properties"]
    assert any(k.startswith("hielo.replicate.") and v == "103"
               for k, v in props.items())


@pytest.mark.slow
def test_replicate_from_v3_dv_source(spark, tmp_path):
    """A format-version-3 source whose deletes are DELETION VECTORS
    replicates the same way — the changelog's multiset diff reads
    through the DV-aware MOR plane, so the destination converges."""
    from hielo_spark.metadata import upgrade_format_version

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame(
                 [(i, f"v{i}") for i in range(8)], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    upgrade_format_version(src, 3)
    replicate_changes(spark, src, dst, keys=["id"])

    C.delete_where(spark, src, "id IN (1, 3)",
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.merge_into(
        spark, src,
        spark.createDataFrame([(2, "B"), (9, "n")], ["id", "v"]),
        on=["id"], snapshot_id=103, timestamp_ms=1700200000000,
    )
    r = replicate_changes(spark, src, dst, keys=["id"])
    assert r["applied"] == [102, 103]
    assert _rows(spark, dst) == _rows(spark, src)


def test_replicate_requires_keys_and_source(spark, tmp_path):
    with pytest.raises(ValueError, match="key columns"):
        replicate_changes(spark, str(tmp_path / "a"),
                          str(tmp_path / "b"), keys=[])
    with pytest.raises(ValueError, match="no table metadata"):
        replicate_changes(spark, str(tmp_path / "missing"),
                          str(tmp_path / "b"), keys=["id"])


@pytest.mark.slow
def test_replicate_delete_plus_insert_is_one_atomic_commit(spark, tmp_path):
    """A source snapshot carrying BOTH deletes and inserts (an
    overwrite/merge) must map to exactly ONE destination snapshot —
    readers never observe a deletes-applied/inserts-missing
    intermediate state."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                   ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])
    # ONE source snapshot whose changelog has pure deletes (id=1) AND
    # inserts (id=4): when_matched=delete + when_not_matched=insert
    C.merge_into(spark, src,
                 spark.createDataFrame([(1, "a"), (4, "d")], ["id", "v"]),
                 on=["id"], when_matched="delete",
                 when_not_matched="insert",
                 snapshot_id=102, timestamp_ms=1700100000000)
    n_before = len(
        json.load(open(C.current_metadata_path(dst)))["snapshots"])
    r = replicate_changes(spark, src, dst, keys=["id"])
    assert r["applied"] == [102] and r["watermark"] == 102
    snaps = json.load(open(C.current_metadata_path(dst)))["snapshots"]
    # exactly ONE destination snapshot for the delete+insert source
    # snapshot (previously: a delete commit then an upsert commit)
    assert len(snaps) == n_before + 1
    assert _rows(spark, dst) == [(2, "b"), (3, "c"), (4, "d")]
    # and that single snapshot carries both the delete and the append
    applied = snaps[-1]["summary"]
    assert int(applied.get("deleted-records", 0)) >= 1
    assert int(applied.get("added-records", 0)) >= 1


def test_replicate_lineage_expired_raises_descriptive(spark, tmp_path):
    """If source snapshot expiry removed the lineage between the
    watermark and current, replication must fail with a clear
    re-bootstrap message, not a KeyError."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src, spark.createDataFrame([(1, "a")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])
    C.append(spark, src, spark.createDataFrame([(2, "b")], ["id", "v"]),
             snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, src, spark.createDataFrame([(3, "c")], ["id", "v"]),
             snapshot_id=103, timestamp_ms=1700200000000)
    # surgically expire 101 and 102 from the metadata (what
    # expire_snapshots would do given a tight retention)
    mpath = C.current_metadata_path(src)
    doc = json.load(open(mpath))
    doc["snapshots"] = [s for s in doc["snapshots"]
                        if s["snapshot-id"] == 103]
    json.dump(doc, open(mpath, "w"))
    with pytest.raises(ValueError, match="re-bootstrap"):
        replicate_changes(spark, src, dst, keys=["id"])


@pytest.mark.slow
def test_replicate_follows_source_schema_evolution(spark, tmp_path):
    """Source does add-column AND rename mid-stream: the destination
    follows via one update_schema (field-id diff between the watermark
    snapshot's schema and the current one) before post-evolution
    snapshots apply — and pre-existing destination rows read null for
    the added column, matching the source's own evolution semantics."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])

    # evolve the source: add a column, rename v → label
    C.update_schema(src, add=[("score", "int")], rename={"v": "label"},
                    timestamp_ms=1700050000000)
    C.append(spark, src,
             spark.createDataFrame(
                 [(3, "c", 30)], "id bigint, label string, score int"),
             snapshot_id=102, timestamp_ms=1700100000000)
    C.merge_into(
        spark, src,
        spark.createDataFrame(
            [(1, "A", 10)], "id bigint, label string, score int"),
        on=["id"], snapshot_id=103, timestamp_ms=1700200000000,
    )
    r = replicate_changes(spark, src, dst, keys=["id"])
    assert r["applied"] == [102, 103]

    def full(t):
        df = read_data_at_snapshot(spark, C.current_metadata_path(t))
        return sorted(
            (r.id, r.label, r.score) for r in df.collect()
        )

    assert full(dst) == full(src) == [
        (1, "A", 10), (2, "b", None), (3, "c", 30)]
    # the destination's CURRENT schema followed (rename kept, add kept)
    dst_doc = json.load(open(C.current_metadata_path(dst)))
    cur = next(s for s in dst_doc["schemas"]
               if s["schema-id"] == dst_doc["current-schema-id"])
    assert [f["name"] for f in cur["fields"]] == ["id", "label", "score"]


def test_replicate_refuses_dropped_key_column(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame([(1, "a")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id", "v"])
    C.update_schema(src, drop=["v"], timestamp_ms=1700050000000)
    C.append(spark, src, spark.createDataFrame([(2,)], ["id"]),
             snapshot_id=102, timestamp_ms=1700100000000)
    with pytest.raises(ValueError, match="key column"):
        replicate_changes(spark, src, dst, keys=["id", "v"])


def test_replicate_follows_source_drop_and_widen(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    C.append(spark, src,
             spark.createDataFrame(
                 [(1, "a", 5)],
                 "id int, v string, n int"),
             snapshot_id=101, timestamp_ms=1700000000000)
    replicate_changes(spark, src, dst, keys=["id"])
    C.update_schema(src, drop=["v"], widen={"n": "bigint"},
                    timestamp_ms=1700050000000)
    C.append(spark, src,
             spark.createDataFrame([(2, 6_000_000_000)],
                                   "id int, n bigint"),
             snapshot_id=102, timestamp_ms=1700100000000)
    r = replicate_changes(spark, src, dst, keys=["id"])
    assert r["applied"] == [102]

    def full(t):
        df = read_data_at_snapshot(spark, C.current_metadata_path(t))
        return sorted((r.id, r.n) for r in df.collect())

    assert full(dst) == full(src) == [(1, 5), (2, 6_000_000_000)]
    dst_doc = json.load(open(C.current_metadata_path(dst)))
    cur = next(s for s in dst_doc["schemas"]
               if s["schema-id"] == dst_doc["current-schema-id"])
    assert {f["name"]: f["type"] for f in cur["fields"]} == {
        "id": "int", "n": "long"}
