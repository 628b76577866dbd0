"""As-of join / range join edge semantics on controlled inputs."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from hielo_spark.operators.relational import asof_join, range_join_buckets


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "p1"),
            (1, ts("2024-01-01 12:00:00"), "p2"),
            (2, ts("2024-01-01 09:00:00"), "p3"),  # before any right row
        ],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 10.0),
            (1, ts("2024-01-01 10:00:00"), 20.0),  # simultaneous with p1
            (1, ts("2024-01-01 11:00:00"), 30.0),
            (2, ts("2024-01-01 10:00:00"), 40.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = {
        r["tag"]: r.asDict()
        for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    assert out["p1"]["value_right"] == 20.0  # ties: right row AT the instant wins
    assert out["p2"]["value_right"] == 30.0  # latest at-or-before
    assert out["p3"]["value_right"] is None  # nothing before → null


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), "p")], ["user_id", "ts", "tag"])
    right = spark.createDataFrame([(1, ts("2024-01-01 08:00:00"), 5.0)], ["user_id", "ts", "value"])
    no_tol = asof_join(left, right, "user_id", "ts", "ts", ["value"]).first()
    assert no_tol["value_right"] == 5.0
    with_tol = asof_join(
        left, right, "user_id", "ts", "ts", ["value"], tolerance_ms=3600_000
    ).first()
    assert with_tol["value_right"] is None  # 2h old > 1h tolerance


def test_range_join_bounds(spark):
    left = spark.createDataFrame([(1, 100, ts("2024-01-01 10:00:00"))], ["user_id", "lid", "lts"])
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "at0"),      # delta 0 → in
            (1, ts("2024-01-01 10:05:00"), "in5"),      # in window
            (1, ts("2024-01-01 10:10:00"), "at10"),     # inclusive upper
            (1, ts("2024-01-01 10:10:00.001"), "out"),  # just past
            (1, ts("2024-01-01 09:59:59"), "before"),   # negative delta
            (2, ts("2024-01-01 10:01:00"), "otheruser"),
        ],
        ["user_id", "rts", "tag"],
    )
    got = {
        r["tag"]
        for r in range_join_buckets(
            left, right, "user_id", "lts", "rts", lower_ms=0, upper_ms=600000
        ).collect()
    }
    assert got == {"at0", "in5", "at10"}


def test_range_join_bucket_size_invariance(spark):
    # different bucket sizes must give identical results (candidates differ,
    # residual filter fixes them)
    left = spark.createDataFrame(
        [(1, i, ts("2024-01-01 10:00:00") + dt.timedelta(minutes=i)) for i in range(10)],
        ["user_id", "lid", "lts"],
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00") + dt.timedelta(seconds=90 * i), float(i)) for i in range(20)],
        ["user_id", "rts", "value"],
    )
    def pairs(bucket_ms):
        return sorted(
            (r["lid"], r["value"])
            for r in range_join_buckets(
                left, right, "user_id", "lts", "rts", 0, 300000, bucket_ms=bucket_ms
            ).collect()
        )
    assert pairs(300000) == pairs(60000) == pairs(7000)


def test_interval_union_hand_computed(spark):
    """Overlap, abutment (start == prev end merges), gap, and the
    contained-interval case where the running max matters (a long
    interval swallows a later short one whose own end is not the max)."""
    from hielo_spark.operators.relational import interval_union

    rows = [
        # key a: [1,5] [4,8] → island [1,8]; [8,9] abuts (start==end) →
        # still island [1,9]; [20,25] [21,22] contained; [30,31] gap
        ("a", 1, 5), ("a", 4, 8), ("a", 8, 9),
        ("a", 20, 25), ("a", 21, 22), ("a", 30, 31),
        # key b: single interval
        ("b", 2, 3),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = {
        (r.k, r.island_start, r.island_end): r.n_intervals
        for r in interval_union(df, ["k"], "s", "e").collect()
    }
    assert out == {
        ("a", 1, 9): 3,
        ("a", 20, 25): 2,
        ("a", 30, 31): 1,
        ("b", 2, 3): 1,
    }


def test_interval_union_contained_then_extending(spark):
    """Running-max (not lag) semantics: after a long interval, a
    contained one must NOT end the island early for the next."""
    from hielo_spark.operators.relational import interval_union

    rows = [("u", 0, 100), ("u", 10, 20), ("u", 50, 150), ("u", 200, 210)]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = sorted(
        (r.island_start, r.island_end, r.n_intervals)
        for r in interval_union(df, ["k"], "s", "e").collect()
    )
    assert out == [(0, 150, 3), (200, 210, 1)]


def test_asof_carries_whole_right_row_including_nulls(spark):
    """The latest right row wins AS A ROW: its null columns must ride
    along, not be backfilled from an older right row (and with a
    tolerance, out-of-tolerance older values must not leak in)."""
    from hielo_spark.operators.relational import asof_join, asof_join_cogroup

    left = spark.createDataFrame([("k", "2024-01-01 00:00:03")], ["k", "lt"]) \
        .selectExpr("k", "CAST(lt AS TIMESTAMP) AS lt")
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:01", 5, 6),
         ("k", "2024-01-01 00:00:02", 7, None)],
        "k string, rt string, a int, b int",
    ).selectExpr("k", "CAST(rt AS TIMESTAMP) AS rt", "a", "b")

    for impl in (asof_join, asof_join_cogroup):
        r = impl(left, right, on="k", left_time="lt", right_time="rt",
                 right_cols=["a", "b"]).collect()[0]
        assert (r.a_right, r.b_right) == (7, None), impl.__name__
        # tolerance excludes the t=1 row entirely — no leak of b=6
        r2 = impl(left, right, on="k", left_time="lt", right_time="rt",
                  right_cols=["a", "b"], tolerance_ms=1500).collect()[0]
        assert (r2.a_right, r2.b_right) == (7, None), impl.__name__
