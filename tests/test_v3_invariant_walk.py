"""Randomized v3 invariant walk: a seeded sequence of appends, DV
deletes, DV merges, compactions, DV rewrites, expiry and orphan sweeps
against a pure-Python dict model. Invariants checked along the way:

* both read planes equal the model exactly;
* at most one live DV per referenced data file;
* row lineage: ids of UNTOUCHED keys never change (deletes, merges of
  other keys, compaction, DV rewrites, expiry — none may move them);
* expiry + orphan sweep never delete a live file (reads stay green).

The v3 twin of the round-7 schema-evolution walk — single seeded
pytest case so failures replay deterministically."""

from __future__ import annotations

import pytest

import random

from hielo_spark.metadata import commit as C
from hielo_spark.metadata import upgrade_format_version
from hielo_spark.metadata.manifests import read_data_at_snapshot


@pytest.mark.slow
def test_v3_randomized_invariant_walk(spark, tmp_path):
    from hielo_spark.ops.analysis import remove_orphan_files
    from hielo_spark.sources import register

    register(spark)
    rng = random.Random(7)
    t = str(tmp_path / "t")
    ts = [1700000000000]
    sid = [100]

    def next_ids():
        ts[0] += 100000
        sid[0] += 1
        return sid[0], ts[0]

    def mk_df(pairs):
        return spark.createDataFrame(list(pairs), "id long, v string")

    # model: id -> value
    model = {i: f"v{i}" for i in range(40)}
    next_key = [40]
    s, m = next_ids()
    C.append(spark, t, mk_df(model.items()), snapshot_id=s, timestamp_ms=m)
    assert upgrade_format_version(t, 3) == 3

    def table_rows():
        return {
            r.id: r.v
            for r in read_data_at_snapshot(
                spark, C.current_metadata_path(t)
            ).collect()
        }

    def ds_rows():
        return {
            r.id: r.v
            for r in spark.read.format("hielo_iceberg").load(t).collect()
        }

    def lineage():
        df = read_data_at_snapshot(
            spark, C.current_metadata_path(t), row_lineage=True
        )
        return {r.id: r._row_id for r in df.collect()}

    def live_dv_refs():
        import json
        import os

        from hielo_spark.metadata.manifests import _resolve

        doc = json.load(open(C.current_metadata_path(t)))
        cur = next(x for x in doc["snapshots"]
                   if x["snapshot-id"] == doc["current-snapshot-id"])
        mlist = _resolve(os.path.join(t, "metadata", "x"),
                         cur["manifest-list"].removeprefix("file:"))
        return [d["dv"]["referenced"]
                for d in C._live_dv_entries(mlist, 3)]

    prev_lineage = lineage()
    ops_run = []
    for step in range(18):
        op = rng.choice(
            ["append", "delete", "merge", "compact", "rewrite_dvs",
             "expire_sweep"]
        )
        ops_run.append(op)
        touched: set[int] = set()
        if op == "append":
            new = {next_key[0] + i: f"a{step}_{i}"
                   for i in range(rng.randint(1, 6))}
            next_key[0] += len(new)
            s, m = next_ids()
            C.append(spark, t, mk_df(new.items()),
                     snapshot_id=s, timestamp_ms=m)
            model.update(new)
            touched = set(new)
        elif op == "delete":
            keys = rng.sample(sorted(model), k=min(4, len(model)))
            cond = f"id IN ({', '.join(str(k) for k in keys)})"
            s, m = next_ids()
            C.delete_where(spark, t, cond, snapshot_id=s, timestamp_ms=m)
            for k in keys:
                model.pop(k, None)
            touched = set(keys)
        elif op == "merge":
            ups = {k: f"u{step}_{k}"
                   for k in rng.sample(sorted(model),
                                       k=min(3, len(model)))}
            news = {next_key[0] + i: f"n{step}_{i}"
                    for i in range(rng.randint(0, 3))}
            next_key[0] += len(news)
            src = {**ups, **news}
            if not src:
                continue
            s, m = next_ids()
            C.merge_into(spark, t, mk_df(src.items()), on=["id"],
                         snapshot_id=s, timestamp_ms=m)
            model.update(src)
            touched = set(src)
        elif op == "compact":
            s, m = next_ids()
            C.rewrite_data_files(spark, t, snapshot_id=s, timestamp_ms=m)
        elif op == "rewrite_dvs":
            s, m = next_ids()
            C.rewrite_deletion_vectors(spark, t, snapshot_id=s,
                                       timestamp_ms=m)
        elif op == "expire_sweep":
            # expire everything but the head, then sweep — must never
            # touch a LIVE file (parquet or puffin)
            C.expire_snapshots(t, older_than_ms=ts[0] + 1, retain_last=1)
            import os

            remove_orphan_files(
                spark, os.path.join(t, "data"), C.current_metadata_path(t)
            )

        # invariants after every mutating step
        got = table_rows()
        assert got == model, f"step {step} ({op}): table != model"
        refs = live_dv_refs()
        assert len(refs) == len(set(refs)), f"step {step}: dup DV per file"
        lin = lineage()
        assert set(lin) == set(model)
        for k, rid in prev_lineage.items():
            if k in model and k not in touched and rid is not None:
                assert lin[k] == rid, (
                    f"step {step} ({op}): untouched id {k} moved "
                    f"{rid} -> {lin[k]}"
                )
        prev_lineage = lin
        if step % 6 == 5:  # cross-plane spot checks (DataSource reads)
            assert ds_rows() == model, f"step {step}: DataSource != model"

    assert ds_rows() == model  # final cross-plane agreement
    # the walk must have exercised a delete/merge and a maintenance op
    assert {"delete", "merge"} & set(ops_run)
    assert {"compact", "rewrite_dvs", "expire_sweep"} & set(ops_run)
