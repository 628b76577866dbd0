"""Puffin statistics files (metadata/puffin.py): container geometry
pinned against the published Puffin spec (PFA1 magics, footer payload
size, flags), KMV sketch accuracy/merge laws, and the write_statistics
commit — metadata.json ``statistics`` entries, the DataSource
``statistics`` surface, and expiry semantics."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.puffin import (
    MAGIC,
    KmvSketch,
    read_puffin,
    write_puffin,
    write_statistics,
)


@pytest.fixture()
def registered(spark):
    from hielo_spark.sources import register

    register(spark)
    return spark


def test_puffin_container_geometry(tmp_path):
    """Spec pins that don't trust read/write to share bugs: magic at
    offset 0 and at both ends of the footer, blob payload at the
    recorded offset, footer payload size field, zero flags."""
    p = str(tmp_path / "s.puffin")
    payload = b"\x01\x02\x03\x04\x05"
    size, footer, metas = write_puffin(
        p,
        [{"type": "hielo-kmv-theta-v1", "fields": [1], "snapshot-id": 7,
          "sequence-number": 3, "payload": payload,
          "properties": {"ndv": "5"}}],
        {"created-by": "hielo_spark"},
    )
    assert (metas[0]["offset"], metas[0]["length"]) == (4, 5)
    raw = open(p, "rb").read()
    assert len(raw) == size
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    assert raw[4:9] == payload  # first blob right after the head magic
    (plen,) = struct.unpack_from("<i", raw, len(raw) - 12)
    meta = json.loads(raw[len(raw) - 12 - plen:len(raw) - 12])
    assert raw[len(raw) - 16 - plen:len(raw) - 12 - plen] == MAGIC
    assert raw[-8:-4] == b"\x00\x00\x00\x00"  # flags: uncompressed
    assert footer == 16 + plen
    b = meta["blobs"][0]
    assert (b["offset"], b["length"]) == (4, 5)
    assert b["snapshot-id"] == 7 and b["sequence-number"] == 3
    assert b["fields"] == [1] and b["properties"]["ndv"] == "5"
    # reader inverts
    blobs, props = read_puffin(p)
    assert blobs[0]["payload"] == payload
    assert props == {"created-by": "hielo_spark"}


def test_kmv_sketch_exact_small_and_accurate_large():
    s = KmvSketch()
    s.update([f"v{i}" for i in range(500)])
    s.update([f"v{i}" for i in range(500)])  # duplicates don't count
    assert s.estimate() == 500  # exact below k
    big = KmvSketch().update([f"x{i}" for i in range(50_000)])
    assert abs(big.estimate() - 50_000) / 50_000 < 0.10
    # serialize round trip preserves the estimate exactly
    assert KmvSketch.deserialize(big.serialize()).estimate() == big.estimate()


def test_kmv_merge_equals_union():
    a = KmvSketch().update([f"a{i}" for i in range(30_000)])
    b = KmvSketch().update([f"a{i}" for i in range(15_000, 45_000)])
    u = a.merge(b)
    both = KmvSketch().update(
        [f"a{i}" for i in range(45_000)]
    )
    # merge of partials IS the sketch of the union (same k smallest)
    assert (u.hashes == both.hashes).all()
    assert abs(u.estimate() - 45_000) / 45_000 < 0.10


def test_write_statistics_commit_and_surfaces(spark, tmp_path, registered):
    t = str(tmp_path / "t")
    df = spark.range(0, 5000).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "CAST(id % 37 AS INT) AS small",
        "concat('u', CAST(id % 1000 AS STRING)) AS user",
    )
    C.append(spark, t, df, snapshot_id=101, timestamp_ms=1700000000000)
    entry = write_statistics(spark, t)
    assert entry["snapshot-id"] == 101

    from hielo_spark.metadata import ndv_of

    ndv = ndv_of(t)
    assert ndv["small"] == 37          # exact below k
    assert ndv["user"] == 1000
    assert abs(ndv["id"] - 5000) / 5000 < 0.10

    # metadata.json carries the spec-shaped statistics entry
    doc = json.load(open(C.current_metadata_path(t)))
    st = doc["statistics"]
    assert len(st) == 1 and st[0]["statistics-path"].endswith(".puffin")
    assert st[0]["file-size-in-bytes"] > 0
    assert {b["type"] for b in st[0]["blob-metadata"]} == {
        "hielo-kmv-theta-v1"
    }

    # the statistics DataSource surface exposes one row per blob
    rows = (spark.read.format("hielo_iceberg")
            .option("surface", "statistics").load(t).collect())
    assert len(rows) == 3
    assert all(r.snapshot_id == 101 for r in rows)
    assert sorted(r.ndv for r in rows)[0] == 37

    # re-running replaces (no duplicate entry for the same snapshot)
    write_statistics(spark, t)
    doc2 = json.load(open(C.current_metadata_path(t)))
    assert len(doc2["statistics"]) == 1

    # MOR-correct: stats after a delete reflect live rows only
    C.delete_where(spark, t, "small = 0",
                   snapshot_id=102, timestamp_ms=1700100000000)
    write_statistics(spark, t, columns=["small"])
    assert ndv_of(t)["small"] == 36
    doc3 = json.load(open(C.current_metadata_path(t)))
    assert {e["snapshot-id"] for e in doc3["statistics"]} == {101, 102}


def test_statistics_drop_with_expired_snapshots(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 10),
             snapshot_id=101, timestamp_ms=1700000000000)
    write_statistics(spark, t)
    C.append(spark, t, spark.range(10, 20),
             snapshot_id=102, timestamp_ms=1700100000000)
    write_statistics(spark, t)
    doc0 = json.load(open(C.current_metadata_path(t)))
    paths = {e["snapshot-id"]: e["statistics-path"]
             for e in doc0["statistics"]}
    expired = C.expire_snapshots(t, older_than_ms=1700050000000,
                                 retain_last=1)
    assert expired == [101]
    doc = json.load(open(C.current_metadata_path(t)))
    assert [e["snapshot-id"] for e in doc["statistics"]] == [102]
    # the expired snapshot's Puffin sidecar is reclaimed (it lives under
    # metadata/ where the data-dir orphan sweep never looks); the kept
    # snapshot's file survives
    import os

    assert not os.path.exists(paths[101])
    assert os.path.exists(paths[102])


def test_ndv_canonical_across_null_promoting_partitions(spark, tmp_path):
    """Integer NDV must be partition-independent. The Arrow→pandas hop
    promotes an int64 partition containing any NULL to float64, so the
    same value used to hash as '2.0' in one partition and '2' in
    another (NDV inflation), and distinct ids above 2^53 collapsed to
    one float (NDV deflation). Values are canonicalized to their Spark
    string rendering BEFORE the Python hop, so both appends' partitions
    agree."""
    from hielo_spark.metadata import ndv_of

    t = str(tmp_path / "t")
    big = 2 ** 60
    # append 1: no nulls, two >2^53 ids that are distinct ints but the
    # SAME float64 — old code counted them once
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, big), (4, big + 1)], "id int, v long"
    )
    # append 2: a null alongside a repeat of v=2 — old code promoted
    # this partition to float and hashed '2.0', counting 2 twice
    b = spark.createDataFrame([(5, None), (6, 2)], "id int, v long")
    C.append(spark, t, a, snapshot_id=101, timestamp_ms=1700000000000)
    C.append(spark, t, b, snapshot_id=102, timestamp_ms=1700100000000)
    write_statistics(spark, t, columns=["v"])
    assert ndv_of(t)["v"] == 4  # exactly {1, 2, 2^60, 2^60+1}


def test_write_statistics_rejects_bad_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 3),
             snapshot_id=101, timestamp_ms=1700000000000)
    with pytest.raises(ValueError, match="not primitive/in schema"):
        write_statistics(spark, t, columns=["nope"])


def test_puffin_rejects_non_puffin(tmp_path):
    p = str(tmp_path / "junk")
    open(p, "wb").write(b"not a puffin at all")
    with pytest.raises(ValueError, match="magic"):
        read_puffin(p)
