"""Generic relational operators over the TPC-H-ish fixtures (SURVEY §2
[data] rows: F1-F2, F4, F7, J4, A1-A3, A13-A14, O1-O7, C1-C8).

The reference applies these shapes to in-memory metadata vectors; here they
are full Spark plans over tables, which is what the DuckDB oracle checks.
Each query notes the SURVEY row(s) it covers and the scale rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from ..io import load_table, synth_partsupp

# The DuckDB twin of io.synth_partsupp — IDENTICAL integer arithmetic
# (0-based TPC-H supplier-assignment rule + seeded hashes), so the five
# faithful partsupp shapes (q2/q9/q11/q16/q20) oracle-check bit-for-bit
# over the same parquet inputs. `//` is DuckDB integer division, `div`
# on the Spark side.
PARTSUPP_CTE = """
  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
         CAST((p_partkey + gen.i * (sc.n // 4 + p_partkey // sc.n)) % sc.n
              AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 31 + gen.i * 17) % 9999 + 1 AS BIGINT) AS ps_availqty,
         CAST((p_partkey * 7919 + gen.i * 104729) % 19900 + 100 AS DOUBLE)
              / 100.0 AS ps_supplycost,
         CAST((p_partkey * 7919 + gen.i * 104729) % 19900 + 100
              AS BIGINT) AS ps_supplycost_cents
  FROM part
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM supplier) sc
  CROSS JOIN (VALUES (0), (1), (2), (3)) gen(i)
"""

QUERIES = {}
ORACLE = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# A14/A13 — grouped aggregates (the TPC-H Q1 shape). Flagship query.
# Scale: partial+final agg on 3-value × 2-value grouping keys — map-side
# combine shrinks 100 TB of lineitem to a handful of rows before the shuffle.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE)                                    AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE)                               AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)            AS sum_disc_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
           CAST(round(avg(l_quantity), 6) AS DOUBLE)                                    AS avg_qty,
           CAST(round(avg(l_extendedprice), 6) AS DOUBLE)                               AS avg_price,
           CAST(round(avg(l_discount), 6) AS DOUBLE)                                    AS avg_disc,
           count(*)                                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J4 + O3 — 3-way join + top-k (TPC-H Q3 shape).
# Scale: customer grows with SF, so it is NOT force-broadcast — at bench
# scale AQE converts the join to broadcast from runtime size, while at
# 100 TB the same plan degrades gracefully to a shuffle join instead of
# hitting the 8 GB broadcast cap. lineitem⋈orders shuffles on orderkey;
# top-k lowers to TakeOrderedAndProject (no global sort).
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # Join order (r13, guide §2.3): orders meets its BUILDING-segment
    # customer side before the fact⋈fact orderkey join — the orderkey
    # exchange then carries ~1/5 of orders, and the joined lineitem frame
    # is never re-shuffled on custkey (see q5/q7 for the same rewrite;
    # row-identical, verified exceptAll-both-ways at sf0.01/sf0.1).
    ord2 = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(ord2, li.l_orderkey == ord2.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# J4 — star join through region→nation→customer→orders→lineitem (Q5 shape).
# Scale: region/nation are FIXED cardinality (5/25 rows) → broadcast hints;
# customer grows with SF, so the cust⋈nation result carries no hint — AQE
# broadcasts it at bench scale and falls back to a shuffle join at 100 TB.
# The only guaranteed big shuffle is lineitem⋈orders on orderkey.
# --------------------------------------------------------------------------
@query(
    "q5_revenue_by_nation",
    """
    SELECT n_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(broadcast(nation.join(broadcast(region), nation.n_regionkey == region.r_regionkey)),
                  cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
    )
    # Join order (r13, guide §2.3): orders meets its dimension side BEFORE
    # the fact⋈fact orderkey join, so the orderkey exchange carries only
    # ASIA-customer orders (~1/5) and — the real lever at scale — the
    # lineitem-sized joined frame is never re-shuffled on custkey
    # afterwards (at bench scale AQE broadcasts dims either way; at 100 TB
    # dims is customer-sized and the old shape paid a full wide-row
    # shuffle of joined lineitem rows). Row-identical (inner joins
    # commute; verified exceptAll-both-ways at sf0.01/sf0.1).
    ord2 = orders.join(dims, orders.o_custkey == dims.c_custkey).select("o_orderkey", "n_name")
    return (
        li.join(ord2, li.l_orderkey == ord2.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# F1/F7 — multi-predicate filter (isin + between + date range), typed
# projection. Mirrors the snapshot filter shape on a data table.
# Scale: all predicates push to the parquet scan (PushedFilters).
# --------------------------------------------------------------------------
@query(
    "filter_orders_multi",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS total,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE o_orderstatus IN ('O','F')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
    """,
)
def filter_orders_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(100000, 200000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 23:59:59").cast("timestamp"))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("total"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


# --------------------------------------------------------------------------
# F2/C1 — case-insensitive substring search (the global-search operator,
# main.rs:653-667) + A13 count surface.
# --------------------------------------------------------------------------
@query(
    "search_parts",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE contains(lower(p_name), 'red') OR contains(lower(p_brand), '#1')
    """,
)
def search_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.lower(F.col("p_name")).contains("red") | F.lower(F.col("p_brand")).contains("#1")
    ).select("p_partkey", "p_name", "p_brand")


# --------------------------------------------------------------------------
# F4 — partition rows into two groups by predicate (catalog_ui.rs:1255-1264
# splits iceberg vs non-iceberg); generalized to a labeled group-by.
# --------------------------------------------------------------------------
@query(
    "part_two_groups",
    """
    SELECT CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
           count(*) AS n,
           CAST(round(avg(p_retailprice), 6) AS DOUBLE) AS avg_price
    FROM part GROUP BY 1
    """,
)
def part_two_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.withColumn("size_class", F.when(F.col("p_size") >= 25, "large").otherwise("small"))
        .groupBy("size_class")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


# --------------------------------------------------------------------------
# A1 — group-by count (operation distribution shape) on events.
# --------------------------------------------------------------------------
@query(
    "events_by_type",
    "SELECT event_type, count(*) AS n, CAST(round(sum(value), 2) AS DOUBLE) AS total_value FROM events GROUP BY event_type",
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


# --------------------------------------------------------------------------
# A2 — min/max + whole-day span (components.rs:1295-1305 arithmetic).
# --------------------------------------------------------------------------
@query(
    "events_minmax_span",
    """
    SELECT strftime(min(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS oldest,
           strftime(max(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS newest,
           CAST(floor((epoch_ms(max(ts)::TIMESTAMP) - epoch_ms(min(ts)::TIMESTAMP)) / 86400000.0) AS BIGINT) AS span_days
    FROM events
    """,
)
def events_minmax_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("oldest"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("newest"),
        F.floor((F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))) / F.lit(86400000.0)).alias("span_days"),
    )


# --------------------------------------------------------------------------
# A3/A4 — time-windowed counts relative to an anchor (analytics.rs:128-151
# with Utc::now() replaced by max(ts), per the determinism rule).
# Scale: one pass; the anchor is a scalar subquery (broadcast).
# --------------------------------------------------------------------------
@query(
    "events_recent_windows",
    """
    WITH anchor AS (SELECT max(ts)::TIMESTAMP AS as_of FROM events)
    SELECT user_id,
           CAST(sum(CASE WHEN ts::TIMESTAMP > as_of - INTERVAL 1 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS last_day,
           CAST(sum(CASE WHEN ts::TIMESTAMP > as_of - INTERVAL 7 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS last_week,
           count(*) AS total
    FROM events, anchor
    GROUP BY user_id
    """,
)
def events_recent_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("as_of"))
    return (
        ev.join(broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("ts") > F.col("as_of") - F.expr("INTERVAL 1 DAY")).cast("int")).cast("bigint").alias("last_day"),
            F.sum((F.col("ts") > F.col("as_of") - F.expr("INTERVAL 7 DAYS")).cast("int")).cast("bigint").alias("last_week"),
            F.count("*").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# C2 — date bucketing + formatting (epoch-ms → display strings, data.rs:151).
# --------------------------------------------------------------------------
@query(
    "orders_by_month",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


# --------------------------------------------------------------------------
# O3 — top-k (lowers to TakeOrderedAndProject: no global sort at scale).
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    """
    SELECT o_orderkey, CAST(round(o_totalprice,2) AS DOUBLE) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# --------------------------------------------------------------------------
# §2.7 window functions — ranking per group (top-3 customers per segment).
# --------------------------------------------------------------------------
@query(
    "top3_customers_per_segment",
    """
    SELECT c_mktsegment, c_custkey, CAST(round(c_acctbal,2) AS DOUBLE) AS acctbal, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def top3_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), F.col("rn").cast("bigint").alias("rn"))
    )


# --------------------------------------------------------------------------
# §2.7 window functions — lag: inter-event gap seconds per user.
# Scale: single shuffle on user_id; dense event streams stay partitioned.
# --------------------------------------------------------------------------
@query(
    "events_user_gaps",
    """
    SELECT user_id,
           count(*) AS n_events,
           CAST(round(avg(gap_ms), 6) AS DOUBLE) AS avg_gap_ms,
           CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
    FROM (
      SELECT user_id,
             epoch_ms(ts::TIMESTAMP) - epoch_ms(lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
      FROM events
    ) WHERE gap_ms IS NOT NULL
    GROUP BY user_id
    """,
)
def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_ms", gap)
        .filter(F.col("gap_ms").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("gap_ms"), 6).alias("avg_gap_ms"),
            F.max("gap_ms").cast("bigint").alias("max_gap_ms"),
        )
    )


# --------------------------------------------------------------------------
# O4 — union-distinct across two sources (HashSet-union shape,
# components.rs:533-542).
# --------------------------------------------------------------------------
@query(
    "nations_union",
    """
    SELECT n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      UNION
      SELECT s_nationkey AS n_nationkey FROM supplier
    )
    """,
)
def nations_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------------------------
# O7 — except / intersect set ops.
# --------------------------------------------------------------------------
@query(
    "nation_set_ops",
    """
    SELECT 'only_customers' AS side, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS side, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    """,
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    only_c = c.subtract(s).select(F.lit("only_customers").alias("side"), "n_nationkey")
    both = c.intersect(s).select(F.lit("both").alias("side"), "n_nationkey")
    return only_c.unionByName(both)


# --------------------------------------------------------------------------
# O5 — dedup by key with deterministic keep-first semantics (tab dedup,
# main.rs:125-149; dropDuplicates is nondeterministic, so the canonical
# engine form is row_number()=1 over an explicit order).
# --------------------------------------------------------------------------
@query(
    "first_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # keep-first as an aggregate: min(o_orderdate) is the window's rn=1
    # orderdate, and min_by over the decimal-encoded (orderdate, orderkey)
    # ordering — exact and strictly monotone, orderkeys unique — picks that
    # row's orderkey. All-primitive aggregation buffers, so this lowers to
    # partial/final HashAggregate (a min(struct(...)) carries a struct
    # buffer and silently falls back to SortAggregate — a per-partition
    # sort of the fact table); map-side combining ships one row per
    # (customer, partition) instead of every order.
    # .cast("timestamp") first: the parquet column arrives TIMESTAMP_NTZ
    # under Spark 4's inferTimestampNTZ (unix_micros rejects NTZ). The cast
    # is a no-op on LTZ and strictly monotone on NTZ under the UTC session
    # TZ that configure() pins (session.py warns loudly if the host forbade
    # it), so the ordering is unchanged.
    ord_key = F.unix_micros(
        F.col("o_orderdate").cast("timestamp")
    ).cast("decimal(38,0)") * F.expr(
        "CAST(100000000000000000000 AS DECIMAL(21,0))"  # 10^20
    ) + F.col("o_orderkey").cast("decimal(38,0)")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", ord_key).alias("first_orderkey"),
            F.min("o_orderdate").alias("first_dt"),
        )
        .select(
            "o_custkey",
            "first_orderkey",
            F.date_format("first_dt", "yyyy-MM-dd").alias("first_orderdate"),
        )
    )


# --------------------------------------------------------------------------
# C7 — JSON access (events.props) + C4 parse-with-default.
# --------------------------------------------------------------------------
@query(
    "events_json_props",
    """
    SELECT coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
           count(*) AS n,
           CAST(round(avg(value), 6) AS DOUBLE) AS avg_value
    FROM events GROUP BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").try_cast("bigint"), F.lit(0))
    return ev.groupBy(k.alias("k")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


# --------------------------------------------------------------------------
# C8 — CASE banding ladder (health-band shape) over account balances.
# --------------------------------------------------------------------------
@query(
    "acctbal_bands",
    """
    SELECT CASE WHEN c_acctbal >= 9000 THEN 'excellent'
                WHEN c_acctbal >= 7500 THEN 'good'
                WHEN c_acctbal >= 6000 THEN 'fair'
                WHEN c_acctbal >= 4000 THEN 'poor'
                ELSE 'critical' END AS band,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def acctbal_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") >= 9000, "excellent")
        .when(F.col("c_acctbal") >= 7500, "good")
        .when(F.col("c_acctbal") >= 6000, "fair")
        .when(F.col("c_acctbal") >= 4000, "poor")
        .otherwise("critical")
    )
    return c.groupBy(band.alias("band")).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# §2.7 — tumbling time-window aggregation (batch window(); reproduces the
# reference's A3 time-bucketing on the events fixture).
# --------------------------------------------------------------------------
@query(
    "events_hourly_windows",
    """
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# J4 — left outer + semi/anti joins (tree-filter semantics F3 are semi-joins).
# --------------------------------------------------------------------------
@query(
    "supplier_semi_join_nations",
    """
    SELECT n.n_name, count(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY n.n_name
    """,
)
def supplier_semi_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        s.join(li.select("l_suppkey"), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


# --------------------------------------------------------------------------
# §2.7 — gap-based sessionization (batch form; the streaming twin lives in
# streaming/sessions.py and is parity-tested against this).
# --------------------------------------------------------------------------
@query(
    "events_sessionization",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS tst, value,
             CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
                   OR epoch_ms(ts::TIMESTAMP) - epoch_ms(lag(ts::TIMESTAMP) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY tst, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(min(tst), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(tst), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessions import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    return sessionize_batch(ev)


# --------------------------------------------------------------------------
# As-of join (backward): for each purchase, the user's most recent click at
# or before it. Spark lacks the operator; ours is union-tag + window
# carry-forward (operators/relational.py) — one shuffle on the key.
# DuckDB has native ASOF JOIN → a real independent oracle.
# --------------------------------------------------------------------------
@query(
    "events_asof_join",
    """
    SELECT p.user_id,
           strftime(p.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
           strftime(c.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           CAST(round(c.value, 2) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts", right_cols=["ts", "value"]
    )
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.round("value_right", 2).alias("click_value"),
    )


# --------------------------------------------------------------------------
# Range (interval) join: clicks within 10 minutes after each error, same
# user. Bucketed equi-join + residual filter — never a nested-loop
# inequality join (operators/relational.py).
# --------------------------------------------------------------------------
@query(
    "events_range_join",
    """
    SELECT e.event_id AS error_id, count(*) AS n_clicks,
           CAST(round(sum(c.value), 2) AS DOUBLE) AS click_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND epoch_ms(c.ts::TIMESTAMP) - epoch_ms(e.ts::TIMESTAMP) BETWEEN 0 AND 600000
    GROUP BY e.event_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import range_join_buckets

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = range_join_buckets(
        errors, clicks, on="user_id", left_time="e_ts", right_time="c_ts",
        lower_ms=0, upper_ms=600000,
    )
    return joined.groupBy("error_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("c_value"), 2).alias("click_value_sum"),
    )


# --------------------------------------------------------------------------
# A14 — ROLLUP subtotal hierarchy.
# --------------------------------------------------------------------------
@query(
    "orders_rollup",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------------
# A14/C3 — continuous quantiles (exact percentile, not approx) + spread
# statistics per group.
# --------------------------------------------------------------------------
@query(
    "lineitem_quantiles",
    """
    SELECT l_returnflag,
           CAST(round(quantile_cont(l_quantity, 0.25), 6) AS DOUBLE) AS q25,
           CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS q50,
           CAST(round(quantile_cont(l_quantity, 0.75), 6) AS DOUBLE) AS q75,
           CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS sd_qty,
           CAST(round(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pct, 1), 6).alias("q25"),
        F.round(F.element_at(pct, 2), 6).alias("q50"),
        F.round(F.element_at(pct, 3), 6).alias("q75"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# C1 — string-distance search (levenshtein; both engines implement the
# classic Wagner-Fischer definition).
# --------------------------------------------------------------------------
@query(
    "parts_fuzzy_match",
    """
    SELECT levenshtein(p_name, 'red widget') AS dist, count(*) AS n
    FROM part
    WHERE levenshtein(p_name, 'red widget') <= 5
    GROUP BY 1
    """,
)
def parts_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return p.select(dist.alias("dist")).filter(F.col("dist") <= 5).groupBy("dist").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# J4/A14 — bilateral volume (TPC-H Q7 shape): supplier nation × customer
# nation per year. Only the fixed 25-row nation frame is broadcast-hinted;
# the nation-filtered supplier/customer sides scale with SF and are left
# to AQE (broadcast at bench scale, shuffle join at 100 TB). One
# fact⋈fact shuffle on orderkey.
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nations = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    # Join order (r13, guide §2.3): orders meets its nation-filtered
    # customer side BEFORE the fact⋈fact orderkey join, so the orderkey
    # exchange carries two-nation orders (~2/25) instead of every order,
    # and the joined lineitem frame is never re-shuffled on custkey
    # afterwards. Locally neutral (AQE broadcasts cust either way); at
    # scale it removes the wide-row custkey shuffle of joined lineitem
    # rows. Row-identical (verified exceptAll-both-ways at sf0.01/sf0.1).
    ord2 = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(ord2, li.l_orderkey == ord2.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# J4 + O3 — returned-item revenue ranking (TPC-H Q10 shape).
# --------------------------------------------------------------------------
@query(
    "q10_returned_customers",
    """
    SELECT c_custkey, c_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           CAST(round(max(c_acctbal), 2) AS DOUBLE) AS acctbal
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# J4 — anti join: customers with no orders in a window (NOT EXISTS).
# --------------------------------------------------------------------------
@query(
    "customers_without_recent_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# A14/C5 — conditional shares (TPC-H Q12 shape): priority mix per status.
# --------------------------------------------------------------------------
@query(
    "orders_priority_mix",
    """
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           CAST(round(avg(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN o_totalprice END), 6) AS DOUBLE) AS avg_high_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def orders_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy("o_orderstatus").agg(
        F.sum(high.cast("int")).cast("bigint").alias("high_line_count"),
        F.sum((~high).cast("int")).cast("bigint").alias("low_line_count"),
        F.round(F.avg(F.when(high, F.col("o_totalprice"))), 6).alias("avg_high_price"),
    )


# --------------------------------------------------------------------------
# A14 — CUBE over two dimensions (all grouping-set combinations).
# --------------------------------------------------------------------------
@query(
    "lineitem_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# C6/A14 — ordered list aggregation (deterministic: sorted before concat;
# Spark's collect_list order is otherwise partition-dependent).
# --------------------------------------------------------------------------
@query(
    "nations_per_region",
    """
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           count(*) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


# --------------------------------------------------------------------------
# §2.7 windows + C3 — per-user z-score anomaly detection: events whose
# value deviates > 2.5σ from that user's mean. Single shuffle on user_id;
# stats and scoring in one window pass.
# --------------------------------------------------------------------------
@query(
    "events_value_anomalies",
    """
    SELECT user_id, event_id,
           CAST(round(value, 2) AS DOUBLE) AS value,
           CAST(round((value - u_avg) / u_sd, 4) AS DOUBLE) AS zscore
    FROM (
      SELECT user_id, event_id, value,
             avg(value) OVER (PARTITION BY user_id) AS u_avg,
             stddev_samp(value) OVER (PARTITION BY user_id) AS u_sd
      FROM events
    )
    WHERE u_sd > 0 AND abs((value - u_avg) / u_sd) > 2.5
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    stats = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("u_avg"),
        F.stddev_samp("value").over(w).alias("u_sd"),
    )
    z = (F.col("value") - F.col("u_avg")) / F.col("u_sd")
    return (
        stats.filter((F.col("u_sd") > 0) & (F.abs(z) > 2.5))
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


# --------------------------------------------------------------------------
# C7 — structured JSON parsing with an explicit schema (from_json), the
# typed counterpart of get_json_object: parse once, read many fields.
# --------------------------------------------------------------------------
@query(
    "events_json_struct",
    """
    SELECT coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k,
           count(*) AS n,
           CAST(min(event_id) AS BIGINT) AS first_event
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType(), True)])
    parsed = ev.withColumn("props_s", F.from_json("props", schema))
    return (
        parsed.groupBy(F.coalesce(F.col("props_s.k"), F.lit(-1)).alias("k"))
        .agg(F.count("*").alias("n"), F.min("event_id").cast("bigint").alias("first_event"))
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# O3/A14 — grouped top-k via AGGREGATION instead of a window: per group,
# sort_array(collect_list(struct)) + slice keeps only k rows after one
# hash-aggregate exchange — no second sort stage, and the plan is a
# partial/final aggregate pair rather than a full window sort. Same
# result set as the window-rank variant (top3_customers_per_segment).
# --------------------------------------------------------------------------
@query(
    "topk_per_group_agg",
    """
    SELECT c_mktsegment, c_custkey, CAST(round(c_acctbal,2) AS DOUBLE) AS acctbal, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def topk_per_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # struct sorts lexicographically: acctbal DESC, then -custkey DESC
    # (= custkey ASC) matches the oracle's deterministic tiebreak
    item = F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("neg_key"))
    top = c.groupBy("c_mktsegment").agg(
        F.slice(F.sort_array(F.collect_list(item), asc=False), 1, 3).alias("top")
    )
    return top.select(
        "c_mktsegment", F.posexplode("top").alias("pos", "item")
    ).select(
        "c_mktsegment",
        (-F.col("item.neg_key")).cast("bigint").alias("c_custkey"),
        F.round("item.c_acctbal", 2).alias("acctbal"),
        (F.col("pos") + 1).cast("bigint").alias("rn"),
    )


# --------------------------------------------------------------------------
# As-of join, cogroup physical form: same semantics and the same DuckDB
# ASOF-JOIN oracle as events_asof_join, executed as
# cogroup().applyInPandas + pd.merge_asof (operators/relational.py) —
# externally proves the Arrow cogroup path agrees with the window path.
# --------------------------------------------------------------------------
@query(
    "events_asof_cogroup",
    """
    SELECT p.user_id,
           strftime(p.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
           strftime(c.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           CAST(round(c.value, 2) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import asof_join_cogroup

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_cogroup(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts", right_cols=["ts", "value"]
    )
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.round("value_right", 2).alias("click_value"),
    )


# --------------------------------------------------------------------------
# A14 — pivot (crosstab): long → wide with a fixed column-value list.
# Reference surface: the operation-distribution panel renders one column per
# operation kind (components.rs operation chips); pivot is the relational
# form. Scale: groupBy(day).pivot(type, [explicit list]) is a single
# partial+final aggregation — the explicit value list keeps the plan static
# (no extra distinct-scan job) and the output width bounded.
# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "events_type_pivot",
    """
    SELECT strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY 1
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return wide.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# A3/§2.7 — sliding (hopping) event-time windows: size 2h, slide 1h. Each
# event lands in exactly two windows; Spark's window() generator expresses
# it declaratively (the streaming twin is the same expression under
# readStream). Scale: the window struct is derived per-row before the
# partial agg — no self-join, one shuffle on (window, nothing else).
# --------------------------------------------------------------------------
@query(
    "events_sliding_windows",
    """
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([date_trunc('hour', ts::TIMESTAMP),
                     date_trunc('hour', ts::TIMESTAMP) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events
    ) GROUP BY ws
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# A13/A14 — distinct cardinality per group. Exact count_distinct is the
# oracle-checkable form (expands to a two-phase aggregate); at 100 TB the
# drop-in replacement is approx_count_distinct — a single-shuffle mergeable
# HLL sketch whose accuracy is pinned by tests/test_sketches.py.
# --------------------------------------------------------------------------
@query(
    "events_user_cardinality",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def events_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Stream-stream interval join, batch-executed twin: clicks attributed to
# same-user views within 30 min, bucketed by attribution delay. The exact
# transform (streaming/joins.py attribution_pairs, watermarks included —
# no-ops on a static frame) also runs as a watermarked stream-stream join;
# the pytest parity test pins stream ≡ batch, this oracle pins batch.
# --------------------------------------------------------------------------
@query(
    "events_attribution_join",
    """
    WITH pairs AS (
      SELECT v.user_id,
             epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS delay_us
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    )
    SELECT CAST(delay_us // 300000000 AS BIGINT) AS delay_bucket_5m,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(avg(delay_us / 1000000.0), 6) AS DOUBLE) AS avg_delay_s
    FROM pairs GROUP BY 1
    """,
)
def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import attribution_pairs

    ev = load_table(spark, sf_dir, "events")
    pairs = attribution_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )
    return pairs.groupBy(
        (F.col("delay_us") / F.lit(300_000_000)).cast("bigint").alias("delay_bucket_5m")
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.round(F.avg(F.col("delay_us") / 1e6), 6).alias("avg_delay_s"),
    )


# --------------------------------------------------------------------------
# §2.7-W distribution windows: ntile quartiles + percent_rank/cume_dist
# extremes per priority class (deterministic tie-break on o_orderkey).
# --------------------------------------------------------------------------
@query(
    "orders_price_quartiles",
    """
    WITH t AS (
      SELECT o_orderpriority,
             o_totalprice,
             ntile(4) OVER w AS tile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderpriority, tile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price,
           CAST(round(max(pr), 6) AS DOUBLE) AS max_percent_rank,
           CAST(round(max(cd), 6) AS DOUBLE) AS max_cume_dist
    FROM t GROUP BY 1, 2
    """,
)
def orders_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    t = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return t.groupBy("o_orderpriority", "tile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.max("pr"), 6).alias("max_percent_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )


# --------------------------------------------------------------------------
# Write-layout: z-order tiling over (l_partkey, l_suppkey) — counts per
# coarse Morton tile (top 6 interleaved bits). The oracle reproduces the
# exact bit interleave, so the layout key itself is hash-checked.
# --------------------------------------------------------------------------
_ZBITS = 16
_ZTOP = (1 << _ZBITS) - 1
_Z_TERMS = " + ".join(
    f"(((p{axis} >> {i}) & 1) << {2 * i + k})"
    for i in range(_ZBITS)
    for k, axis in ((0, "x"), (1, "y"))
)

@query(
    "lineitem_zorder_tiles",
    f"""
    WITH s AS (
      SELECT min(l_partkey)::DOUBLE AS xmin, max(l_partkey)::DOUBLE AS xmax,
             min(l_suppkey)::DOUBLE AS ymin, max(l_suppkey)::DOUBLE AS ymax
      FROM lineitem
    ),
    n AS (
      SELECT least(greatest(CAST(floor((l_partkey - xmin) / (xmax - xmin) * {_ZTOP}) AS BIGINT), 0), {_ZTOP}) AS px,
             least(greatest(CAST(floor((l_suppkey - ymin) / (ymax - ymin) * {_ZTOP}) AS BIGINT), 0), {_ZTOP}) AS py
      FROM lineitem, s
    ),
    z AS (SELECT {_Z_TERMS} AS zkey FROM n)
    SELECT CAST(zkey >> 26 AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(zkey) AS BIGINT) AS min_zkey,
           CAST(max(zkey) AS BIGINT) AS max_zkey
    FROM z GROUP BY 1
    """,
)
def lineitem_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import with_zorder_key

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    keyed = with_zorder_key(li, ["l_partkey", "l_suppkey"], bits=_ZBITS)
    return keyed.groupBy(
        F.shiftright("zkey", 26).cast("bigint").alias("tile")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("zkey").cast("bigint").alias("min_zkey"),
        F.max("zkey").cast("bigint").alias("max_zkey"),
    )


# --------------------------------------------------------------------------
# J4 decorrelation — correlated EXISTS (TPC-H Q4 shape): orders with at
# least one late-shipped lineitem, counted per priority. The reference has
# no subquery machinery (its joins are in-memory nested loops,
# components.rs:1590-1598); in Spark the EXISTS decorrelates to a LEFT SEMI
# join with an equi key (orderkey) plus a correlated range residual
# (l_shipdate > o_orderdate + 80 days).
# Scale: semi join shuffles on orderkey only; the date-window filter on
# orders pushes to the parquet scan, so the probe side is pruned before the
# shuffle. No cartesian, no broadcast of an unbounded side.
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 80 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


# --------------------------------------------------------------------------
# J4 decorrelation — correlated scalar-aggregate subquery (TPC-H Q17
# shape): revenue from small-quantity lineitems, "small" defined relative
# to the per-part average quantity. Decorrelates to: per-part avg frame →
# equi join back on partkey → residual filter.
# Scale: the brand-filtered part list scales with SF, so it is NOT
# force-broadcast — AQE converts the join to broadcast from runtime size
# at bench scale and shuffles at 100 TB. The avg frame is keyed by
# partkey and joins the (already brand-pruned) lineitem side on the same
# key — one shuffle, reused by AQE for both the agg and the join. Never
# materializes the per-part avgs on the driver.
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(round(sum(l_extendedprice) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    bparts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(bparts, li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    limits = li_b.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li_b.join(limits, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# J4 decorrelation — grouped HAVING / IN subquery (TPC-H Q18 shape): large
# orders by total quantity, joined back to customer detail. The IN over a
# grouped-HAVING subquery decorrelates to an aggregate frame joined on the
# group key; Spark expresses it directly as agg → filter → join.
# Scale: the "big orders" frame is tiny after the HAVING filter but is NOT
# force-broadcast — its size is data-dependent (AQE converts to broadcast
# at runtime when it is small). Customer also scales with SF, so it too
# carries no hint for the same reason. Top-k lowers to
# TakeOrderedAndProject.
# --------------------------------------------------------------------------
@query(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS totalprice,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("_sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


def _funnel_user_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, t0, t1, t2): first view, first click after it, first
    purchase after that — the shared per-user reduction behind the funnel
    and time-to-convert queries. One shuffle on user_id; three chained
    window minima over the same partitioning plan without re-exchange."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn("t0", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .withColumn(
            "t1",
            F.min(
                F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t0")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t1")), F.col("ts")
                )
            ).over(w),
        )
    )
    return staged.groupBy("user_id").agg(
        F.max("t0").alias("t0"), F.max("t1").alias("t1"), F.max("t2").alias("t2")
    )


# --------------------------------------------------------------------------
# §2.7-W — funnel analysis over events: ordered view → click → purchase
# conversion per user (each step's timestamp must follow the previous
# step's), with per-step user counts and mean hours since first view.
# Spark shape: ONE shuffle on user_id, then three chained window minima
# over the same partitioning (Catalyst plans them without re-exchange);
# the per-user reduction and the final stack are narrow.
# Scale: state per user is three timestamps — no event list is ever
# collected; 100 TB of events reduces at the first window stage.
# --------------------------------------------------------------------------
@query(
    "events_funnel",
    """
    WITH u AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, u.t0, min(e.ts) AS t1
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > u.t0
      GROUP BY e.user_id, u.t0
    ),
    p AS (
      SELECT e.user_id, c.t0, min(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id, c.t0
    )
    SELECT 'view' AS step, CAST(count(t0) AS BIGINT) AS users,
           CAST(0.0 AS DOUBLE) AS avg_hours_since_view
    FROM u WHERE t0 IS NOT NULL
    UNION ALL
    SELECT 'click', CAST(count(*) AS BIGINT),
           CAST(round(avg((epoch_ms(t1::TIMESTAMP) - epoch_ms(t0::TIMESTAMP)) / 3600000.0), 4) AS DOUBLE)
    FROM c
    UNION ALL
    SELECT 'purchase', CAST(count(*) AS BIGINT),
           CAST(round(avg((epoch_ms(t2::TIMESTAMP) - epoch_ms(t0::TIMESTAMP)) / 3600000.0), 4) AS DOUBLE)
    FROM p
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = _funnel_user_times(spark, sf_dir)
    hours = lambda a, b: (F.unix_millis(F.col(a)) - F.unix_millis(F.col(b))) / F.lit(3600000.0)  # noqa: E731
    totals = per_user.agg(
        F.count("t0").alias("view_users"),
        F.count("t1").alias("click_users"),
        F.count("t2").alias("purchase_users"),
        F.round(F.avg(F.when(F.col("t1").isNotNull(), hours("t1", "t0"))), 4).alias("click_hours"),
        F.round(F.avg(F.when(F.col("t2").isNotNull(), hours("t2", "t0"))), 4).alias("purchase_hours"),
    )
    return totals.selectExpr(
        """stack(3,
             'view', view_users, CAST(0.0 AS DOUBLE),
             'click', click_users, click_hours,
             'purchase', purchase_users, purchase_hours
           ) AS (step, users, avg_hours_since_view)"""
    )


# --------------------------------------------------------------------------
# §2.7-W — funnel time-to-convert distribution: per-transition percentiles
# of the step deltas (view→click, click→purchase, view→purchase). Reuses
# the funnel's single-shuffle per-user reduction; the stack + percentile
# agg on top are narrow + one tiny 3-key aggregation. Deltas are whole
# milliseconds (bigint) so both engines interpolate over identical inputs;
# hours rounding happens once at the end.
# --------------------------------------------------------------------------
@query(
    "events_time_to_convert",
    """
    WITH u AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > u.t0
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id
    ),
    pu AS (
      SELECT u.user_id, u.t0, c.t1, p.t2
      FROM u LEFT JOIN c ON u.user_id = c.user_id
             LEFT JOIN p ON u.user_id = p.user_id
      WHERE u.t0 IS NOT NULL
    ),
    d AS (
      SELECT 'view_to_click' AS transition,
             epoch_ms(t1::TIMESTAMP) - epoch_ms(t0::TIMESTAMP) AS delta_ms
      FROM pu WHERE t1 IS NOT NULL
      UNION ALL
      SELECT 'click_to_purchase',
             epoch_ms(t2::TIMESTAMP) - epoch_ms(t1::TIMESTAMP)
      FROM pu WHERE t2 IS NOT NULL
      UNION ALL
      SELECT 'view_to_purchase',
             epoch_ms(t2::TIMESTAMP) - epoch_ms(t0::TIMESTAMP)
      FROM pu WHERE t2 IS NOT NULL
    )
    SELECT transition, CAST(count(*) AS BIGINT) AS users,
           CAST(round(quantile_cont(delta_ms, 0.25) / 3600000.0, 4) AS DOUBLE) AS p25_hours,
           CAST(round(quantile_cont(delta_ms, 0.5) / 3600000.0, 4) AS DOUBLE) AS p50_hours,
           CAST(round(quantile_cont(delta_ms, 0.75) / 3600000.0, 4) AS DOUBLE) AS p75_hours,
           CAST(round(quantile_cont(delta_ms, 0.9) / 3600000.0, 4) AS DOUBLE) AS p90_hours
    FROM d GROUP BY transition
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = _funnel_user_times(spark, sf_dir)
    stacked = per_user.selectExpr(
        """stack(3,
             'view_to_click',
             CASE WHEN t1 IS NOT NULL THEN unix_millis(t1) - unix_millis(t0) END,
             'click_to_purchase',
             CASE WHEN t2 IS NOT NULL THEN unix_millis(t2) - unix_millis(t1) END,
             'view_to_purchase',
             CASE WHEN t2 IS NOT NULL THEN unix_millis(t2) - unix_millis(t0) END
           ) AS (transition, delta_ms)"""
    ).filter(F.col("delta_ms").isNotNull())
    pct = F.percentile(
        "delta_ms", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9))
    )
    hours = lambda i: F.round(F.element_at(pct, i) / F.lit(3600000.0), 4)  # noqa: E731
    return stacked.groupBy("transition").agg(
        F.count("*").cast("bigint").alias("users"),
        hours(1).alias("p25_hours"),
        hours(2).alias("p50_hours"),
        hours(3).alias("p75_hours"),
        hours(4).alias("p90_hours"),
    )


# --------------------------------------------------------------------------
# A14 — cohort retention over orders: customers grouped by first-order
# month (cohort), distinct active customers per months-since-cohort offset.
# Scale: both the first-order frame and the activity frame shuffle on
# custkey — co-partitioned join, then one agg keyed by (cohort, offset)
# whose cardinality is months², independent of row count. countDistinct
# is a two-phase partial-distinct aggregate, no driver state.
# --------------------------------------------------------------------------
@query(
    "orders_retention_cohort",
    """
    WITH m AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS mth FROM orders
    ),
    f AS (SELECT o_custkey, min(mth) AS cm FROM m GROUP BY o_custkey)
    SELECT strftime(cm, '%Y-%m') AS cohort,
           CAST(date_diff('month', cm, mth) AS BIGINT) AS offset_months,
           CAST(count(DISTINCT m.o_custkey) AS BIGINT) AS active_customers
    FROM m JOIN f ON m.o_custkey = f.o_custkey
    WHERE date_diff('month', cm, mth) <= 6
    GROUP BY cm, date_diff('month', cm, mth)
    """,
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("mth")
    )
    f = m.groupBy("o_custkey").agg(F.min("mth").alias("cm"))
    offset = F.months_between(F.col("mth"), F.col("cm")).cast("bigint")
    return (
        m.join(f, "o_custkey")
        .withColumn("offset_months", offset)
        .filter(F.col("offset_months") <= 6)
        .groupBy(
            F.date_format("cm", "yyyy-MM").alias("cohort"),
            "offset_months",
        )
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("active_customers"))
    )


# ==========================================================================
# TPC-H-family completeness (round 3): the classic query shapes a reference
# user runs daily, adapted where the fixture lacks a column (no partsupp /
# l_commitdate / l_shipmode / p_container / c_phone — the adapted forms
# keep each query's defining PLAN shape). All oracle-checked in the local
# harness; head-50 keeps one representative per family (see __init__).
# ==========================================================================


# --------------------------------------------------------------------------
# A14 — single-pass filtered aggregate (TPC-H Q6). The simplest query in
# the family and the purest pushdown test: every predicate must reach the
# parquet scan; the agg is one partial+final pair over zero groups.
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(round(sum(l_extendedprice * l_discount), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# J4/A14 — national market share (TPC-H Q8 shape, sans partsupp): 7-table
# join. Only the fixed region/nation frames carry broadcast hints; the
# SF-scaling chains (customer-filtered-by-region, PROMO parts,
# supplier⋈nation) are hint-free — AQE broadcasts them at bench scale and
# shuffle-joins at 100 TB. The only guaranteed shuffle is lineitem⋈orders.
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                      / sum(volume), 6) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nat = load_table(spark, sf_dir, "nation")
    eur_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            broadcast(
                nat.join(
                    broadcast(
                        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(eur_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# J4/A14 — late lines by priority (TPC-H Q12 shape; lateness is
# ship-vs-order date since the fixture has no commit/receipt dates).
# Conditional aggregation over one fact⋈fact shuffle.
# --------------------------------------------------------------------------
@query(
    "q12_late_by_priority",
    """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           count(*) AS total_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q12_late_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate").cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 60)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("late_lines"),
            F.count("*").alias("total_lines"),
        )
    )


# --------------------------------------------------------------------------
# J4/A14 — promo revenue share (TPC-H Q14): part scales with SF → no
# broadcast hint (AQE decides from runtime size); one conditional-ratio
# aggregate over the month-filtered lineitem scan.
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    """
    SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS DOUBLE) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            6,
        ).alias("promo_pct"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# A14/O3 — supplier variety per brand/type/size (the FAITHFUL TPC-H Q16,
# r5: partsupp is the part↔supplier bridge, with the NOT IN supplier
# exclusion — negative-balance suppliers stand in for the spec's
# complaint filter since the fixture has no s_comment). The NOT IN
# decorrelates to a LEFT ANTI join (safe: s_suppkey is never null).
# Two-phase distinct aggregate + top-k with full unique tiebreak
# (brand, type, size is the group key). partsupp/part shuffle on
# partkey; the excluded-supplier frame is tiny but derived, not hinted.
# --------------------------------------------------------------------------
@query(
    "q16_supplier_variety",
    f"""
    WITH partsupp AS ({PARTSUPP_CTE})
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = synth_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(bad_supp, F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


# --------------------------------------------------------------------------
# J4 — disjunctive multi-attribute predicate (TPC-H Q19 shape, fixture
# columns): three (brand, size-range, quantity-range) conjunct groups
# OR-ed across the join. The join stays a hash equi-join on partkey with
# the disjunction as a post-join filter — never a nested-loop.
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 25)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 15 AND 35)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 45)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & q.between(5, 25))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & q.between(15, 35))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & q.between(25, 45))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# J4 — sole late supplier (TPC-H Q21 shape; lateness is ship-vs-order +90d
# since the fixture has no receipt/commit dates). The classic double
# correlation — EXISTS (another supplier on the order) AND NOT EXISTS
# (another LATE supplier) — decorrelates to per-order distinct-supplier
# counts: n_supp > 1 covers the EXISTS, n_late_suppliers == 1 covers the
# NOT EXISTS (the outer row's supplier is itself late, so it is the one).
# Spark shape: the counts are WINDOW collect_sets over the l_orderkey
# partitioning — one scan, one shuffle (the groupBy+join-back form plans
# the base subtree twice: Catalyst has no CSE across a self-join). State
# per order is its supplier set — bounded by suppliers-per-order, not
# lines. The oracle keeps the aggregate+join formulation (results equal).
# --------------------------------------------------------------------------
@query(
    "q21_sole_late_supplier",
    """
    WITH base AS (
      SELECT l_orderkey, l_suppkey, o_orderdate,
             (CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    stats AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM base GROUP BY l_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM base JOIN stats USING (l_orderkey)
              JOIN supplier ON s_suppkey = l_suppkey
    WHERE late AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 90)
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    staged = base.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        staged.filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# J4 — idle wealthy customers (TPC-H Q22 shape; the country code is
# c_nationkey % 5 since the fixture has no c_phone, and the NOT EXISTS is
# windowed to "no orders since 1999" — the fixture's every customer has
# SOME order, and a 0-row result would be vacuous evidence).
# Scalar-subquery threshold (1-row broadcast) + NOT EXISTS decorrelated
# to a left-anti join on custkey + grouped aggregate.
# --------------------------------------------------------------------------
@query(
    "q22_idle_customers",
    """
    WITH threshold AS (
      SELECT avg(c_acctbal) AS thr FROM customer
      WHERE c_acctbal > 0 AND c_nationkey % 5 IN (0, 1, 2)
    )
    SELECT CAST(c_nationkey % 5 AS BIGINT) AS cgroup,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS totacctbal
    FROM customer, threshold
    WHERE c_nationkey % 5 IN (0, 1, 2) AND c_acctbal > thr
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey % 5
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 5).isin(0, 1, 2)
    )
    thr = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("thr"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey"))
    )
    return (
        cust.join(broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("bigint").alias("cgroup"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# A14 — quantile sketch accuracy (strict superset of lineitem_quantiles,
# which defers to this): the exact per-flag quartiles/stddev/corr are
# DuckDB-verified, and the KLL/GK-style approx_percentile sketch — the
# form you'd actually run at 100 TB, one pass, bounded memory — rides
# along as a pinned max-abs-error bound. Rank error ≤ n/accuracy, so at
# accuracy 10k the p50 of integer quantities must land within 1 unit.
# --------------------------------------------------------------------------
@query(
    "lineitem_sketch_quantiles",
    """
    SELECT l_returnflag,
           CAST(round(quantile_cont(l_quantity, 0.25), 6) AS DOUBLE) AS q25,
           CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS q50,
           CAST(round(quantile_cont(l_quantity, 0.75), 6) AS DOUBLE) AS q75,
           CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS sd_qty,
           CAST(round(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
           TRUE AS sketch_p50_within_1
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    approx_p50 = F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000))
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pct, 1), 6).alias("q25"),
        F.round(F.element_at(pct, 2), 6).alias("q50"),
        F.round(F.element_at(pct, 3), 6).alias("q75"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        (F.abs(approx_p50 - F.element_at(pct, 2)) <= 1.0).alias("sketch_p50_within_1"),
    )


# --------------------------------------------------------------------------
# A13 — cardinality sketch accuracy: exact distinct users per event type
# (DuckDB-verified) with the HLL++ estimate's relative error pinned ≤ 3×
# its configured rsd (0.05). At 100 TB the HLL is the runnable form —
# fixed sketch bytes per group vs an exact distinct's second shuffle.
# --------------------------------------------------------------------------
@query(
    "events_cardinality_sketch",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           count(*) AS n_events,
           TRUE AS hll_within_3rsd
    FROM events GROUP BY event_type
    """,
)
def events_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id").cast("bigint")
    approx = F.approx_count_distinct("user_id", rsd=0.05)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        F.count("*").alias("n_events"),
        (
            F.abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")
            <= 0.15
        ).alias("hll_within_3rsd"),
    )

# --------------------------------------------------------------------------
# J4 — min-cost supplier per part (the FAITHFUL TPC-H Q2, r5: the 3-way
# correlated MIN over partsupp within a region — hielo query surface
# parity via the synthesized deterministic partsupp, io.synth_partsupp /
# PARTSUPP_CTE). The correlated subquery decorrelates to a window MIN
# over the region-scoped partsupp⋈supplier frame: one pass, no repeated
# subtree (Catalyst has no CSE across self-joins — measured 2× at sf0.1
# on the join-back form). All rows achieving the min survive, as in the
# spec query; the ORDER BY carries a full unique tiebreak so LIMIT is
# deterministic. Scale: partsupp (4|part| rows, SF-scaling) and supplier
# are NOT force-broadcast; nation/region (25/5 rows) are; the window
# shuffles once on ps_partkey.
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    f"""
    WITH partsupp AS ({PARTSUPP_CTE}),
    eu_offers AS (
      SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
                    JOIN nation   ON n_nationkey = s_nationkey
                    JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT ps_partkey AS b_partkey, min(ps_supplycost) AS min_cost
      FROM eu_offers GROUP BY ps_partkey
    )
    SELECT CAST(round(s_acctbal, 2) AS DOUBLE) AS acctbal,
           s_name, n_name,
           CAST(p_partkey AS BIGINT) AS partkey,
           p_name AS part_name,
           ps_supplycost AS supply_cost
    FROM eu_offers
      JOIN best ON ps_partkey = b_partkey AND ps_supplycost = min_cost
      JOIN part ON p_partkey = ps_partkey
    WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    ORDER BY acctbal DESC, n_name, s_name, partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_offers = (
        ps.join(supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # cost equality on doubles is safe: the window min IS one of the
    # values it compares against (same bits)
    w = Window.partitionBy("ps_partkey")
    winners = eu_offers.withColumn(
        "min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("min_cost"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    return (
        winners.join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").cast("bigint").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(F.col("acctbal").desc(), "n_name", "s_name", "partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# J4 — profit by supplier-nation and order-year (the FAITHFUL TPC-H Q9,
# r5: revenue MINUS ps_supplycost*l_quantity through the synthesized
# partsupp, joined on BOTH (l_partkey, l_suppkey)). Six-way join: the
# four SF-scaling sides (partsupp, supplier, part, orders) are NOT
# force-broadcast — AQE size-gates them at bench scale; at 100 TB each
# degrades to a shuffle join on its key. nation (25 rows) is the only
# hinted side. Group-by is 25×7 cells — partial agg collapses everything
# before the final shuffle. Cross-engine determinism: revenue sums as
# exact DECIMAL(18,2), cost as exact BIGINT cents, and the profit is
# rounded while STILL an exact decimal — rounding the double flipped a
# half-cent boundary between engines at sf0.001 (Spark rounds the
# shortest decimal repr, DuckDB the raw binary).
# --------------------------------------------------------------------------
@query(
    "q9_profit_by_nation_year",
    f"""
    WITH partsupp AS ({PARTSUPP_CTE})
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(round(
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) * 100
             - sum(ps_supplycost_cents * CAST(l_quantity AS BIGINT)),
             0) AS BIGINT) AS DOUBLE) / 100.0 AS profit
    FROM lineitem JOIN partsupp ON ps_partkey = l_partkey
                                AND ps_suppkey = l_suppkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation   ON n_nationkey = s_nationkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    ps = synth_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost_cents"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    cost_cents = F.sum(
        F.col("ps_supplycost_cents") * F.col("l_quantity").cast("bigint")
    )
    return (
        li.join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            # exact path: decimal revenue × 100 minus integer cost cents,
            # rounded while STILL exact, then one deterministic double
            # division — round(double, 2) differs between engines at
            # half-cent boundaries (Spark rounds the shortest decimal
            # repr, DuckDB the raw binary), observed at sf0.001
            (
                F.round(revenue * 100 - cost_cents, 0)
                .cast("bigint")
                .cast("double")
                / F.lit(100.0)
            ).alias("profit")
        )
    )


# --------------------------------------------------------------------------
# A14 + J4 — important stock value (the FAITHFUL TPC-H Q11, r5: stock
# value is ps_supplycost × ps_availqty over the synthesized partsupp,
# scoped to one region's suppliers; the fixture's 0-based nations are
# synthetic names so the region scope keeps sf0.01 rows). HAVING against
# a scalar subquery over the SAME scoped frame — the threshold is a
# 1-row aggregate (broadcast exact and safe at any SF); per-part sums
# shuffle once on partkey. Cross-engine determinism: value accumulates
# as exact BIGINT cents (double accumulation order flips borderline
# HAVING comparisons); the >0.1%-of-total threshold compares integers.
# --------------------------------------------------------------------------
@query(
    "q11_important_part_value",
    f"""
    WITH partsupp AS ({PARTSUPP_CTE}),
    scoped AS (
      SELECT ps_partkey,
             ps_supplycost_cents * ps_availqty AS v_cents
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
                    JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_regionkey = 2
    )
    SELECT CAST(ps_partkey AS BIGINT) AS partkey,
           CAST(CAST(sum(v_cents) AS DOUBLE) / 100.0 AS DOUBLE) AS part_value
    FROM scoped
    GROUP BY ps_partkey
    HAVING sum(v_cents) * 1000 > (SELECT sum(v_cents) FROM scoped)
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    scoped = (
        ps.join(supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v_cents"),
        )
    )
    thr = scoped.agg(F.sum("v_cents").alias("thr_cents"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v_cents").alias("sum_cents"))
        .join(broadcast(thr))
        .filter(F.col("sum_cents") * 1000 > F.col("thr_cents"))
        .select(
            F.col("ps_partkey").cast("bigint").alias("partkey"),
            (F.col("sum_cents").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# J4 + A14 — customer order-count distribution (TPC-H Q13: LEFT join with
# a join-condition filter, then a histogram of per-customer counts).
# Scale: the left outer join shuffles on custkey; count(o_orderkey) not
# count(*) so no-order customers land in bucket 0. The second groupBy is
# over ≤ a few hundred distinct counts — trivially small.
# --------------------------------------------------------------------------
@query(
    "q13_order_count_distribution",
    """
    WITH counts AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    counts = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count("*").cast("bigint").alias("custdist")
    )


# --------------------------------------------------------------------------
# A14 + J4 — top supplier by quarterly revenue (TPC-H Q15: aggregate view
# + scalar MAX subquery + equality back-join). Revenue is rounded to 2 dp
# on BOTH the rows and the max so the equality survives partial-agg
# ordering noise. Scale: revenue is one groupBy on suppkey; the max is a
# 1-row broadcast; supplier is NOT force-broadcast.
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("suppkey"),
            "s_name",
            "total_revenue",
        )
    )


# --------------------------------------------------------------------------
# J4 — excess-stock shippers of a part family (the FAITHFUL TPC-H Q20,
# r5: the nested IN chain over partsupp — part-name filter → per
# (part, supplier) shipped quantity in a year → the CORRELATED
# ps_availqty > ½·sum(l_quantity) comparison → supplier semi-join →
# nation scope). The correlated scalar decorrelates to an INNER join of
# partsupp against the (partkey, suppkey)-grouped shipped frame — pairs
# with no shipments drop out exactly as the NULL comparison drops them
# in the spec's form. Scale: shipped shuffles lineitem once on the pair
# key; partsupp joins on the same key (no broadcast of SF-scaling
# sides); supplier semi-join; nation (25 rows) is the only hinted side.
# Cross-engine determinism: quantities are integral doubles, the ½·qty
# threshold halves an exact small sum — no accumulation-order risk.
# --------------------------------------------------------------------------
@query(
    "q20_heavy_part_shippers",
    f"""
    WITH partsupp AS ({PARTSUPP_CTE}),
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE p_name LIKE 'red%'
        AND ps_availqty > 0.5 * qty
    )
    SELECT s_name, CAST(round(s_acctbal, 2) AS DOUBLE) AS acctbal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 3
      AND s_suppkey IN (SELECT ps_suppkey FROM excess)
    ORDER BY s_name
    """,
)
def q20_heavy_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    ps = synth_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_availqty"
    )
    excess = (
        ps.join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 3)
        .select("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# X4+/X6 — hot-key aggregation through the SALTED two-phase shape (r5,
# VERDICT item 6: exercise operators/skew.py in an oracle-checked
# query). The fixture's events are near-uniform per user, so the query
# derives a deterministic skewed key: every user_id % 3 == 0 collapses
# into one hot account (-1) holding ~a third of all events — the
# one-task-stall shape at 100 TB. salted_agg spreads the hot key over
# 16 salt buckets in phase 1 and merges per key in phase 2; the result
# is EXACTLY groupBy(key).agg(...) (proven by the DuckDB oracle, which
# computes the plain single-phase form). Cross-engine determinism: the
# value sum accumulates as per-row DECIMAL(18,6) casts — exact under
# any partial/salt grouping order.
# --------------------------------------------------------------------------
@query(
    "events_hot_account_stats",
    """
    WITH keyed AS (
      SELECT CASE WHEN user_id % 3 = 0 THEN -1 ELSE user_id END AS account_id,
             value
      FROM events
    )
    SELECT CAST(account_id AS BIGINT) AS account_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM keyed
    GROUP BY account_id
    """,
)
def events_hot_account_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 3 == 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("account_id"),
        F.col("value").cast("decimal(18,6)").alias("value_dec"),
    )
    out = salted_agg(
        ev,
        ["account_id"],
        aggs={
            "_n": F.count(F.lit(1)),
            "_s": F.sum("value_dec"),
        },
        merges={
            "n_events": F.sum("_n").cast("bigint"),
            "total_value": F.sum("_s").cast("double"),
        },
        salt_buckets=16,
    )
    return out.select("account_id", "n_events", "total_value")
