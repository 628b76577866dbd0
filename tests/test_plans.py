"""Physical-plan shape assertions: the scale properties SCALE.md claims
must hold in the actual plans — filters pushed to scans, dimensions
broadcast, top-k lowered, and never a cartesian product in the oracle
surface (except deliberate scalar-subquery broadcasts)."""

from __future__ import annotations

import pytest

from hielo_spark.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_pushdown_and_pruning(spark, sf_dir):
    p = formatted(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: only the 7 needed columns reach the scan
    assert "l_orderkey" not in p.split("ReadSchema:")[1].splitlines()[0]


def test_joins_broadcast_dimensions(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_revenue_by_nation", "q7_nation_volume",
                 "supplier_semi_join_nations"):
        p = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in p, name


def test_topk_lowered(spark, sf_dir):
    for name in ("topk_orders", "q3_shipping_priority", "q10_returned_customers"):
        p = plan_of(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in p, name


def test_anti_and_semi_joins(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "supplier_semi_join_nations")
    assert "LeftAnti" in plan_of(spark, sf_dir, "customers_without_recent_orders")


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "q5_revenue_by_nation",
     "doc_neardup_jaccard", "emb_neardup_cosine", "events_asof_join",
     "events_range_join", "doc_neardup_minhash"],
)
def test_no_cartesian_product(spark, sf_dir, name):
    # the only allowed product is a broadcast of a 1-row/scalar subquery
    # (BroadcastNestedLoopJoin with a tiny build side); a CartesianProduct
    # node means a real pair explosion
    assert "CartesianProduct" not in plan_of(spark, sf_dir, name), name


def test_all_pairs_queries_never_broadcast_the_corpus(spark, sf_dir):
    # doc_neardup_jaccard runs the salted (block, salt) sort-merge
    # self-join; emb_neardup_cosine defaults to the triangle-blocked Gram
    # cells (no join at all — one hash shuffle into applyInPandas). With
    # auto-broadcast disabled neither plan may contain a broadcast join —
    # that could only come from an explicit hint on the unbounded corpus
    # frame, the exact OOM-at-scale shape these forms replaced.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "doc_neardup_jaccard")
        assert "BroadcastHashJoin" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "SortMergeJoin" in p
        p = plan_of(spark, sf_dir, "emb_neardup_cosine")
        assert "BroadcastHashJoin" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Join" not in p  # pair space never exists as a plan node
        assert "FlatMapGroupsInPandas" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_plan_has_watermark(spark, sf_dir):
    from hielo_spark.streaming.events import hourly_counts, read_events_stream

    plan = hourly_counts(read_events_stream(spark, sf_dir))._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_plan_audit_api(spark, sf_dir):
    from hielo_spark.plans import audit

    a = audit(QUERIES["q5_revenue_by_nation"](spark, sf_dir))
    assert a.pushed_filters  # region/orders filters reached the scans
    assert a.broadcast_hash_joins >= 2
    assert a.cartesian_products == 0
    b = audit(QUERIES["topk_orders"](spark, sf_dir))
    assert b.take_ordered and b.joins == 0
    c = audit(QUERIES["doc_neardup_minhash"](spark, sf_dir))
    assert c.has_python_stage  # the Arrow kernel is a deliberate stage


def test_contamination_plan_shape(spark, sf_dir):
    """Postings join must be hash-based (broadcast bench side), shingle
    projection must stay OUT of higher-order lambdas (codegen check:
    the plan carries slice/concat_ws, not transform/lambda)."""
    p = plan_of(spark, sf_dir, "doc_contamination")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "lambdafunction" not in p.lower()


def test_topk_agg_avoids_window_sort(spark, sf_dir):
    """The aggregation-based grouped top-k must plan as an aggregate pair,
    never a Window over the full table."""
    p = plan_of(spark, sf_dir, "topk_per_group_agg")
    assert "Window" not in p
    assert "ObjectHashAggregate" in p or "SortAggregate" in p


def test_sampling_filters_stay_narrow(spark, sf_dir):
    """Hash-gated sampling is a pure filter: no Exchange in the plan
    before the final project (scan → filter → project only)."""
    p = plan_of(spark, sf_dir, "doc_sample_stratified")
    assert "Exchange" not in p
    assert "Scan parquet" in p or "BatchScan" in p


def test_pivot_is_single_aggregation(spark, sf_dir):
    # explicit pivot values → no extra distinct-scan job; the whole pivot is
    # one partial+final HashAggregate pair over a single scan
    p = plan_of(spark, sf_dir, "events_type_pivot")
    assert "Exchange" in p
    assert p.count("Scan ") == 1
    assert "CartesianProduct" not in p


def test_top_ngrams_lowers_to_take_ordered(spark, sf_dir):
    # vocabulary top-k must not globally sort the n-gram space
    p = plan_of(spark, sf_dir, "doc_top_ngrams")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_sliding_windows_no_self_join(spark, sf_dir):
    # the 2-windows-per-event expansion is a per-row generator feeding one
    # aggregation — not a join against a window table
    p = plan_of(spark, sf_dir, "events_sliding_windows")
    assert "Join" not in p
    assert p.count("Scan ") == 1


def test_mixture_rebalance_broadcasts_thresholds(spark, sf_dir):
    # the per-stratum threshold table re-enters as a broadcast join side;
    # the base-table side must NOT be broadcast (it's the unbounded probe).
    p = plan_of(spark, sf_dir, "doc_mixture_rebalance")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_repetition_metric_join_adds_no_exchange(spark, sf_dir):
    # tok-metrics ⋈ bigram-metrics on (id, grp): exactly the 4 hash
    # exchanges of the two explode→(id,grp,term)→(id,grp) agg chains; the
    # join itself adds none (at fixture scale the aggregated build side is
    # small enough that AQE broadcasts it; at scale both sides are already
    # hash-partitioned on the join keys → exchange-free SMJ).
    from hielo_spark.io import load_table
    from hielo_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents")
    m = T.repetition_stats(d)
    p = m._jdf.queryExecution().executedPlan().toString()
    assert "Join" in p
    assert p.count("Exchange hashpartitioning") <= 4
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_pii_scan_stays_narrow(spark, sf_dir):
    # regexp counting + redaction delta is a scan→project→partial-agg
    # pipeline: exactly one exchange (the per-lang final aggregate).
    p = plan_of(spark, sf_dir, "doc_pii_scan")
    assert p.count("Exchange") == 1
    assert "Join" not in p


def test_doc_chunks_is_shuffle_free_until_final_agg(spark, sf_dir):
    # tokenize→sequence→posexplode→slice is a single map stage; the only
    # exchanges belong to the final per-source aggregate (count_distinct
    # expands to a two-round agg).
    p = plan_of(spark, sf_dir, "doc_chunks")
    assert "Join" not in p
    assert p.count("Exchange") <= 2
    assert p.count("Scan ") == 1


def test_doc_lm_surprisal_joins_on_term_no_cartesian(spark, sf_dir):
    # token stream ⋈ LM on term; the corpus-total 1-row frame enters as a
    # broadcast (BNLJ on a single row, not a real cartesian).
    p = plan_of(spark, sf_dir, "doc_lm_surprisal")
    assert "CartesianProduct" not in p


def test_q4_exists_decorrelates_to_semi_join(spark, sf_dir):
    # correlated EXISTS must become an equi-keyed LEFT SEMI with the range
    # predicate as a join residual — never a nested-loop probe
    p = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q17_broadcasts_part_list_only(spark, sf_dir):
    # the brand-filtered part list is the only broadcast; the per-part avg
    # frame joins lineitem on partkey (shuffle), not via broadcast of an
    # unbounded side
    p = plan_of(spark, sf_dir, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q18_topk_lowered_and_no_cartesian(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q18_large_orders")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_funnel_single_shuffle(spark, sf_dir):
    # three chained window minima + the per-user agg all share the user_id
    # partitioning: exactly one Exchange below the final single-row agg's
    p = plan_of(spark, sf_dir, "events_funnel")
    # allow the final 1-row agg exchange; the event-scale data moves once
    n_exchanges = p.count("Exchange hashpartitioning(user_id")
    assert n_exchanges == 1, p


def test_retention_cohort_copartitioned(spark, sf_dir):
    p = plan_of(spark, sf_dir, "orders_retention_cohort")
    assert "CartesianProduct" not in p


def test_time_to_convert_single_user_shuffle(spark, sf_dir):
    # reuses the funnel per-user reduction: event-scale data moves on
    # user_id exactly once; the percentile agg on top is a 3-key shuffle
    p = plan_of(spark, sf_dir, "events_time_to_convert")
    assert p.count("Exchange hashpartitioning(user_id") == 1, p
    assert "Join" not in p


def test_q8_broadcasts_every_dimension_chain(spark, sf_dir):
    # region→nation→customer, part, supplier→nation all broadcast; the only
    # shuffle joins are between the two facts
    p = plan_of(spark, sf_dir, "q8_market_share")
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p


def test_q19_disjunction_stays_hash_join(spark, sf_dir):
    # the OR-of-conjuncts must ride the partkey equi-join as a filter,
    # never degrade the join to a nested loop over pairs
    p = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q21_double_correlation_one_stats_pass(spark, sf_dir):
    # EXISTS + NOT EXISTS decorrelate to window collect_sets over ONE
    # l_orderkey shuffle — single lineitem scan, no self-join, no
    # nested-loop probes, no cartesian
    p = plan_of(spark, sf_dir, "q21_sole_late_supplier")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange hashpartitioning(l_orderkey") == 1, p


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q22_idle_customers")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


@pytest.mark.parametrize(
    "name",
    sorted(n for n in QUERIES if n.startswith("q"))
    + ["first_order_per_customer", "filter_orders_multi",
       "supplier_semi_join_nations", "customers_without_recent_orders",
       "nation_set_ops", "topk_orders"],
)
def test_no_forced_broadcast_of_scaling_tables(spark, sf_dir, name):
    # The 100 TB broadcast policy (VERDICT r3 lead item): explicit
    # broadcast() hints are allowed only on fixed-cardinality frames
    # (region = 5 rows, nation = 25 rows) or ≤1-row scalar aggregates.
    # Customer/part/supplier/orders/lineitem grow with scale factor — a
    # forced broadcast of any of them is fast at sf0.1 and a guaranteed
    # driver OOM / 8 GB-cap failure at the north star. With auto-broadcast
    # disabled, every BroadcastExchange left in the plan is hint-driven,
    # so any non-scalar subtree scanning a scaling table is a policy bug.
    from hielo_spark.plans import forced_broadcast_violations

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES[name](spark, sf_dir)
        bad = forced_broadcast_violations(df)
        assert not bad, f"{name}: {bad[0]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_recall_no_cartesian_no_corpus_broadcast(spark, sf_dir):
    # truth side is the salted (block, salt) SMJ; candidate side is the
    # band-bucket equi-join; the lang decoration joins by id. None of
    # these may degenerate to a cartesian, and with auto-broadcast off
    # nothing in the plan may broadcast an unbounded corpus frame.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "doc_minhash_recall")
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" not in p
        assert "BroadcastNestedLoopJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_corpus_ops_shuffle_on_hash_keys_no_cartesian(spark, sf_dir):
    """The corpus-level cleanups (dup-ngram coverage, boilerplate
    removal) must join occurrences to the corpus-frequency side by key —
    hash/merge joins only, no CartesianProduct, and no forced broadcast
    of a frame that scales with the corpus (AQE may still size-gate a
    broadcast at test scale; the assertion is on the *logical* hint)."""
    for name in ("doc_dup_ngram_coverage", "doc_boilerplate_lines"):
        df = QUERIES[name](spark, sf_dir)
        p = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        # no broadcast HINT in the optimized logical plan (physical
        # BroadcastHashJoin chosen by AQE's size estimate is fine)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical, name


def test_r4_tpch_family_plan_shapes(spark, sf_dir):
    """The six session-2 decorrelation shapes: no pair explosion
    anywhere; q2 keeps its window-form correlated MIN (no join-back
    double-plan), q13 its left-outer histogram join, q20 its semi-join
    chain; every one joins by key (hash/merge), never CartesianProduct."""
    expect = {
        "q2_min_cost_supplier": ("Window", "TakeOrderedAndProject"),
        "q9_profit_by_nation_year": ("BroadcastHashJoin",),
        "q11_important_part_value": ("BroadcastHashJoin",),
        "q13_order_count_distribution": ("LeftOuter",),
        "q15_top_supplier": ("BroadcastHashJoin",),
        "q20_heavy_part_shippers": ("LeftSemi",),
    }
    for name, feats in expect.items():
        p = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        for f in feats:
            assert f in p, (name, f)


def test_salted_agg_two_phase_shape(spark, sf_dir):
    """events_hot_account_stats (r5): the hot key must be spread by the
    salt BEFORE any per-key exchange — the plan carries two aggregation
    levels with the phase-1 exchange keyed on (account_id, _salt), so no
    single task ever receives the whole hot key."""
    p = plan_of(spark, sf_dir, "events_hot_account_stats")
    assert "_salt" in p, "salt column missing from the physical plan"
    import re

    # an Exchange hashpartitioning that includes both the key and salt
    assert re.search(r"hashpartitioning\([^)]*account_id[^)]*_salt", p) or re.search(
        r"hashpartitioning\([^)]*_salt[^)]*account_id", p
    ), "phase-1 exchange is not keyed on (account_id, _salt)"
    # and a later per-key-only exchange for the merge phase
    assert re.search(r"hashpartitioning\(account_id[^_]", p), (
        "phase-2 per-key exchange missing"
    )


def test_advised_join_flips_plan_on_written_statistics(spark, tmp_path):
    """r9: the NDV/summary statistics plane EXECUTES its advice
    (ops/autopilot.advised_join): with Spark's own auto-broadcast off,
    a dimension-sized table joins as BroadcastHashJoin purely because
    the snapshot summary said so; a skew-flagged table (written NDV
    stats: few hot keys) joins salted — key AND _salt in the join keys
    — while the same join without statistics stays a plain shuffle
    join. The plan flips on nothing but the written statistics."""
    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata.puffin import write_statistics
    from hielo_spark.ops.autopilot import advised_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(0, 10_000).selectExpr("id % 5 AS k", "id AS v")

        dim = str(tmp_path / "dim")
        C.append(spark, dim,
                 spark.range(0, 5).selectExpr("id AS k", "id * 10 AS w"),
                 snapshot_id=101, timestamp_ms=1700000000000)
        j1 = advised_join(spark, big, dim, "k")
        p1 = j1._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p1  # summary-bytes advice, not Spark's estimate
        assert j1.count() == 10_000

        # same data, statistics withheld + broadcast threshold shrunk:
        # conservative advice → plain shuffle join, no salt, no broadcast
        j0 = advised_join(spark, big, dim, "k", broadcast_max_bytes=1)
        p0 = j0._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p0
        assert "_salt" not in p0
        assert j0.count() == 10_000

        # write NDV statistics → the same call now sees 2000 rows/key
        # over ndv(k)=5 and flips to the salted shape
        write_statistics(spark, dim)
        # (stats describe the TABLE side; skew advice keys off the
        # table's totals — make its shape hot: rewrite with 50k rows,
        # 5 keys)
        hot = str(tmp_path / "hot")
        C.append(spark, hot,
                 spark.range(0, 50_000).selectExpr("id % 5 AS k",
                                                   "id AS w"),
                 snapshot_id=101, timestamp_ms=1700000000000)
        write_statistics(spark, hot)
        j2 = advised_join(spark, big.limit(100), hot, "k",
                          broadcast_max_bytes=1,
                          skew_rows_per_key=1_000, salt_buckets=4)
        p2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p2
        assert "_salt" in p2              # NDV stats flipped the plan
        assert j2.count() == 100 * 10_000  # 100 probe rows x 10k/key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
