"""Deterministic sampling / shard packing / train shuffle / contamination
operator semantics on controlled inputs (the oracle sweep covers the
fixture-table queries; these pin the operator contracts directly)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hielo_spark.operators import contamination, sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])


def test_hash_sample_is_deterministic_and_close(ids):
    a = sorted(r.doc_id for r in sampling.hash_sample(ids, "doc_id", 0.2).collect())
    b = sorted(
        r.doc_id
        for r in sampling.hash_sample(ids.repartition(7), "doc_id", 0.2).collect()
    )
    assert a == b  # repartitioning cannot change a hash-gated sample
    assert 0.15 < len(a) / 2000 < 0.25


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(
        df, "doc_id", "lang", {"en": 0.1}, default=0.5
    ).groupBy("lang").count().collect()
    rates = {r.lang: r["count"] / 2000 for r in out}
    assert 0.05 < rates["en"] < 0.16
    assert 0.42 < rates["fr"] < 0.58


def test_pack_shards_matches_sequential_walk(spark):
    rows = [(i, "a" if i < 10 else "b", (i * 37) % 90 + 10) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    got = {
        (r.grp, r.doc_id): r.shard_id
        for r in sampling.pack_shards(
            df, "doc_id", F.col("w"), budget=100, partition_col="grp"
        ).collect()
    }
    for grp in ("a", "b"):
        prefix = 0
        for doc_id, g, w in sorted(r for r in rows if r[1] == grp):
            assert got[(grp, doc_id)] == prefix // 100
            prefix += w
    # shard ids are nondecreasing along the walk by construction above


def test_train_shuffle_is_a_permutation(ids):
    out = sampling.train_shuffle(ids.limit(500), "doc_id").collect()
    positions = sorted(r.shuffle_pos for r in out)
    assert positions == list(range(1, 501))
    # and not the identity order (the hash actually shuffles)
    by_pos = [r.doc_id for r in sorted(out, key=lambda r: r.shuffle_pos)]
    assert by_pos != sorted(by_pos)


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([(1, "one two three")], ["doc_id", "text"])
    row = df.select(contamination.shingles("text", 8).alias("sh")).first()
    assert row.sh == []


def test_contamination_pairs_planted_overlap(spark):
    gram = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    train = spark.createDataFrame(
        [
            (1, f"{gram} one two {gram} four five six seven"),  # shares with bench
            (2, "totally unrelated words that never appear in the benchmark set x y z"),
            (3, "short doc"),  # < 8 words → excluded
        ],
        ["doc_id", "text"],
    )
    # bench repeats train doc 1's opening 10 words → 3 shared rolling
    # 8-gram shingles (the gram itself + the two windows into "one two")
    bench = spark.createDataFrame([(100, f"{gram} one two")], ["doc_id", "text"])
    out = contamination.contamination_pairs(
        train, bench, "doc_id", "text", n=8, min_shared=2
    ).collect()
    assert {(r.train_id, r.bench_id) for r in out} == {(1, 100)}
    row = out[0]
    assert row.n_shared == 3
    assert 0 < row.contamination <= 1


def test_contamination_no_false_pairs_below_threshold(spark):
    # doc 2 shares zero 8-grams with the benchmark → no row at all
    train = spark.createDataFrame(
        [(2, "totally unrelated words that never appear in the benchmark set x y z")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "intro alpha beta gamma delta epsilon zeta eta theta outro")],
        ["doc_id", "text"],
    )
    assert (
        contamination.contamination_pairs(
            train, bench, "doc_id", "text", n=8, min_shared=2
        ).count()
        == 0
    )


def test_mixture_rebalance_hits_target_mixture(spark):
    from hielo_spark.operators.sampling import mixture_rebalance

    # 2000 'a' / 500 'b' / 100 'x' rows; rebalance to a 60/40 a-b mixture.
    rows = [(i, "a") for i in range(2000)] + [
        (i, "b") for i in range(2000, 2500)
    ] + [(i, "x") for i in range(2500, 2600)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = mixture_rebalance(df, "doc_id", "lang", {"a": 0.6, "b": 0.4})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert "x" not in counts  # strata outside the target mixture are dropped
    # n_out = min(2000/0.6, 500/0.4) = 1250 → targets a:750, b:500(all).
    assert counts["b"] == 500  # keep-fraction 1.0 stratum is kept exactly
    total = sum(counts.values())
    assert counts["a"] / total == pytest.approx(0.6, abs=0.03)
    # deterministic: same result on re-evaluation after a repartition
    again = mixture_rebalance(
        df.repartition(7), "doc_id", "lang", {"a": 0.6, "b": 0.4}
    )
    assert again.count() == total
