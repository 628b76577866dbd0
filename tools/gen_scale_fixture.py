"""Deterministic scale-up fixture generator (measurement only).

Replicates /root/testdata/sf0.1 k times with per-copy key offsets so the
bench can be run at sf >= 1 (`SPARK_GRAFT_SF_DIR=/root/scaledata/sf1`)
and expose real parallelism instead of the per-job scheduling floor that
dominates at sf0.1. The driver's own bench fixture is untouched; this is
an additional recorded measurement per OPTIMIZATION_r14.md.

Design notes (why replication is linear, not quadratic):

* Fact/dim keys are offset per copy (orderkey, custkey, partkey,
  suppkey, user_id, doc_id, vec_id, event_id), so join fan-outs scale
  exactly linearly and per-key densities (orders per customer, events
  per user) match sf0.1. region/nation keep their fixed cardinality,
  as in TPC-H.
* documents: a per-copy tag token is interleaved every 2 words, so with
  3-gram shingles EVERY shingle contains the tag -> cross-copy shingle
  sets are disjoint -> minhash/jaccard pair volume scales linearly
  (naive replication would grow duplicate clusters k-fold and pair
  counts k^2-fold). Within-copy similarity structure is preserved
  (both members of a near-dup pair receive the same positional
  insertions).
* embeddings: each copy applies its own orthogonal transform
  (deterministic dimension permutation + sign flips). Within-copy
  pairwise cosines are preserved EXACTLY; cross-copy cosines are
  ~random (near 0 at this dim) -> emb_neardup pair volume scales
  linearly.
* Timestamps, dates, amounts, and categorical columns are copied
  verbatim, so every filter keeps its sf0.1 selectivity.

Usage: python tools/gen_scale_fixture.py [k] [outdir]
Defaults: k=10 (sf1), outdir=/root/scaledata/sf1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key column -> offset stride (> max value in sf0.1, round for readability)
KEY_STRIDES = {
    "orders": {"o_orderkey": 1 << 24, "o_custkey": 1 << 20},
    "lineitem": {"l_orderkey": 1 << 24, "l_partkey": 1 << 20, "l_suppkey": 1 << 16},
    "customer": {"c_custkey": 1 << 20},
    "part": {"p_partkey": 1 << 20},
    "supplier": {"s_suppkey": 1 << 16},
    "events": {"event_id": 1 << 24, "user_id": 1 << 20},
    "documents": {"doc_id": 1 << 20},
    "embeddings": {"vec_id": 1 << 20},
}
FIXED = ["region", "nation"]


def offset_copy(tbl: pa.Table, strides: dict[str, int], copy: int) -> pa.Table:
    for col, stride in strides.items():
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(copy * stride, type=tbl.schema.field(col).type))
        tbl = tbl.set_column(idx, col, shifted)
    return tbl


def tag_documents(tbl: pa.Table, copy: int) -> pa.Table:
    """Interleave the copy tag every 2 words: every 3-gram shingle
    contains it, so shingle sets are disjoint across copies."""
    if copy == 0:
        return tbl
    tag = f"xcopy{copy}x"
    texts = tbl.column("text").to_pylist()
    out = []
    for t in texts:
        if t is None:
            out.append(t)
            continue
        w = t.split(" ")
        parts = []
        for i in range(0, len(w), 2):
            parts.extend(w[i : i + 2])
            parts.append(tag)
        out.append(" ".join(parts))
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(idx, "text", pa.array(out, type=pa.string()))
    if "n_chars" in tbl.schema.names:
        nidx = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            nidx, "n_chars", pa.array([len(t) if t is not None else None for t in out], type=pa.int64())
        )
    return tbl


def rotate_embeddings(tbl: pa.Table, copy: int) -> pa.Table:
    """Per-copy orthogonal transform: permute dims + flip signs.
    Preserves norms and within-copy cosines exactly."""
    if copy == 0:
        return tbl
    col = tbl.column("embedding").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = col.offsets.to_numpy()
    dim = offsets[1] - offsets[0]
    assert np.all(np.diff(offsets) == dim), "ragged embedding column"
    rng = np.random.default_rng(1000 + copy)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    m = flat.reshape(-1, dim)
    m = m[:, perm] * signs
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(m.ravel(), type=pa.float32())
    )
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, "embedding", arr.cast(tbl.schema.field("embedding").type))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/scaledata/sf1"
    os.makedirs(out, exist_ok=True)
    for name in FIXED:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{out}/{name}.parquet")
        print(f"{name}: copied")
    for name, strides in KEY_STRIDES.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        copies = []
        for c in range(k):
            t = offset_copy(src, strides, c)
            if name == "documents":
                t = tag_documents(t, c)
            elif name == "embeddings":
                t = rotate_embeddings(t, c)
            copies.append(t)
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{name}.parquet", row_group_size=1 << 20)
        print(f"{name}: {src.num_rows} x {k} = {big.num_rows} rows")


if __name__ == "__main__":
    main()
