"""Analytical catalog queries — joins, aggregates, windows, set ops.

TPC-H-style headline queries (the bench.py workload) plus the
extension operator surface (window top-k, rollup, set ops, as-of and
range joins, JSON extraction).  Cross-engine float determinism comes
from the DECIMAL-exact-sum convention in operators/aggregates.py:
money columns carry exactly 2 decimals in the testdata, so
DECIMAL(12,2) casts are lossless and sums become order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.operators import aggregates as agg
from amazon_books_review_spark.operators import joins, windows
from amazon_books_review_spark.sources.io import load_table, load_tables

D = "decimal(12,2)"  # lossless for the 2-decimal testdata money columns


# ---------------------------------------------------------------------------
# TPC-H Q1 shape — pricing summary (scan + filter + wide agg)
# ---------------------------------------------------------------------------


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast(D)
    disc = F.col("l_discount").cast(D)
    tax = F.col("l_tax").cast(D)
    one = F.lit(1).cast(D)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            agg.exact_sum("l_quantity").alias("sum_qty"),
            agg.exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(ext * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ext * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            agg.exact_avg("l_quantity").alias("avg_qty"),
            agg.exact_avg("l_extendedprice").alias("avg_price"),
            agg.exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority top-k (3-way join + agg + window)
# ---------------------------------------------------------------------------


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30")
    )
    revenue = (F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D)))

    joined = joins.equi_join(
        joins.equi_join(
            li,
            orders,
            F.col("l_orderkey") == F.col("o_orderkey"),
        ),
        F.broadcast(cust),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    per_order = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(revenue).cast("double").alias("revenue")
    )
    return windows.top_k_per_key(
        per_order.withColumn("_g", F.lit(1)),
        ["_g"],
        [F.col("revenue").desc(), F.col("l_orderkey").asc()],
        10,
    ).select(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderpriority",
        "revenue",
        F.col("rank").cast("long").alias("rank"),
    )


TPCH_Q3_ORACLE = """
WITH per_order AS (
    SELECT l_orderkey,
           o_orderdate,
           o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
), ranked AS (
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority,
           revenue,
           row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rank
    FROM per_order
)
SELECT * FROM ranked WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — regional revenue (5-way join, dims broadcast)
# ---------------------------------------------------------------------------


def tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D)))

    # Fact tables join each other; every dimension is broadcast — the
    # lineitem side shuffles exactly once (for the orders join under
    # SMJ at scale; AQE turns it into broadcast when orders is small).
    df = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
    )
    return df.groupBy("r_name", "n_name").agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


TPCH_Q5_ORACLE = """
SELECT r_name,
       n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — pure filter + scalar aggregate (pushdown showcase)
# ---------------------------------------------------------------------------


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate here reaches the parquet scan as a pushed
    filter (range forms only); the aggregate is a single scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(D) * F.col("l_discount").cast(D)
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


TPCH_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
           AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — HAVING over an aggregated subquery + re-join
# ---------------------------------------------------------------------------


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds a threshold
    (HAVING), re-joined to order/customer attributes.  The HAVING
    subquery reduces before the join — never join-then-filter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(agg.exact_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


TPCH_Q18_ORACLE = """
WITH big AS (
    SELECT l_orderkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
)
SELECT c_name,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Window top-k per key (extension §2.5)
# ---------------------------------------------------------------------------


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return windows.top_k_per_key(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("rank").cast("long").alias("rank"),
    )


TOP_ORDERS_ORACLE = """
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
    FROM orders
)
SELECT * FROM ranked WHERE rank <= 3
"""


def window_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/distribution/frame window matrix in one pass:
    rank, dense_rank, ntile, percent_rank, cume_dist and a running
    decimal-exact sum — all over ONE window partitioning (one shuffle;
    Spark evaluates all six functions in a single Window operator)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wf)
        .cast("double")
        .alias("running_total"),
    )


WINDOW_SHOWCASE_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       o_totalprice,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


# ---------------------------------------------------------------------------
# Set operations (extension §2.7)
# ---------------------------------------------------------------------------


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_custkey")
    y98 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    ).select("o_custkey")
    both = y96.intersect(y98).withColumn("set_op", F.lit("both"))
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep a
    # key that occurs more often on the left than the right.
    only96 = y96.subtract(y98).withColumn("set_op", F.lit("only_1996"))
    either = y96.union(y98).distinct().withColumn("set_op", F.lit("either"))
    return both.unionByName(only96).unionByName(either)


SET_OPS_ORACLE = """
WITH y96 AS (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
), y98 AS (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
)
SELECT o_custkey, 'both' AS set_op FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y98)
UNION ALL
SELECT o_custkey, 'only_1996' AS set_op FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y98)
UNION ALL
SELECT o_custkey, 'either' AS set_op FROM (SELECT o_custkey FROM y96 UNION SELECT o_custkey FROM y98)
"""


# ---------------------------------------------------------------------------
# ROLLUP subtotals (extension §2.4)
# ---------------------------------------------------------------------------


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return agg.rollup_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            agg.exact_sum("o_totalprice").alias("total_price"),
        ],
    )


ORDERS_ROLLUP_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Exact distinct aggregation (extension §2.4)
# ---------------------------------------------------------------------------


def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return agg.distinct_count(li, ["l_returnflag"], "l_suppkey", "n_suppliers")


DISTINCT_SUPPLIERS_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# JSON extraction (events.props)
# ---------------------------------------------------------------------------


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
        )
    )


JSON_EXTRACT_ORACLE = """
WITH src AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT k % 10 AS k_mod, count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum
FROM src
GROUP BY k % 10
"""


# ---------------------------------------------------------------------------
# As-of join (extension — composition of built-in ops, no UDF)
# ---------------------------------------------------------------------------


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the user's latest order placed at-or-before the
    event time.  The right side is pre-deduped to one row per
    (custkey, orderdate) — max orderkey — making the as-of pick
    deterministic on both engines."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = joins.asof_join(
        events,
        orders,
        by="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_orderdate"],
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey_asof").alias("last_orderkey"),
        F.date_format("o_orderdate_asof", "yyyy-MM-dd").alias("last_orderdate"),
    )


ASOF_JOIN_ORACLE = """
WITH dedup_orders AS (
    SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
    FROM orders
    GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id,
       e.user_id,
       d.o_orderkey AS last_orderkey,
       strftime(d.o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events e
ASOF JOIN dedup_orders d
  ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
"""


# ---------------------------------------------------------------------------
# Range join (bucketed rewrite)
# ---------------------------------------------------------------------------


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed point-in-interval join: event values into 40-wide
    region bands.  The bucketed rewrite turns the O(n*m) range
    condition into a hash equi-join on coarse buckets + residual
    filter — the only shape that survives 100 TB."""
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    region = load_table(spark, sf_dir, "region").select(
        "r_name",
        (F.col("r_regionkey").cast("double") * 40).alias("lo"),
        ((F.col("r_regionkey").cast("double") + 1) * 40).alias("hi"),
    )
    out = joins.range_join(
        events, region, "value", "lo", "hi", bucket_width=16
    )
    return out.select("event_id", "r_name", "value")


RANGE_JOIN_ORACLE = """
SELECT e.event_id,
       r.r_name,
       e.value
FROM events e
JOIN (
    SELECT r_name,
           CAST(r_regionkey AS DOUBLE) * 40 AS lo,
           (CAST(r_regionkey AS DOUBLE) + 1) * 40 AS hi
    FROM region
) r ON r.lo <= e.value AND e.value < r.hi
"""


# ---------------------------------------------------------------------------
# Global top-k (sort + limit => TakeOrdered, no full sort)
# ---------------------------------------------------------------------------


def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return windows.global_top_k(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        20,
    )


GLOBAL_TOP_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — conditional aggregation ratio (promo revenue share)
# ---------------------------------------------------------------------------


def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts in one window: conditional
    sum over a join — sum(CASE)/sum in a single aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(D)))
            .cast("double")
            / F.sum(rev).cast("double")
            * 100,
            6,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


TPCH_Q14_ORACLE = """
SELECT round(
           CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           * 100, 6) AS promo_share_pct,
       count(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — EXISTS semi-join inside a date window
# ---------------------------------------------------------------------------


def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter having at least one late-shipped line
    (EXISTS -> left_semi): the semi-join sends only the join key of
    the subquery side across the wire."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    # "late" proxy on this schema (no l_commitdate): shipped > 60 days
    # after the order date — a compound semi-join condition.
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — aggregate of an aggregate (customer order histogram)
# ---------------------------------------------------------------------------


def tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count: left join -> per-key
    count -> count-of-counts.  Two cascaded aggregations; the second
    input is already tiny (|distinct counts| rows per partition after
    partial agg)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


TPCH_Q13_ORACLE = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Outer / semi / anti joins (the join-type matrix beyond J1)
# ---------------------------------------------------------------------------


def outer_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER customers->orders: per-customer order counts with
    zero-order customers retained (count over the right key, so
    unmatched rows count 0, not 1)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        joins.equi_join(
            cust, orders, F.col("c_custkey") == F.col("o_custkey"), how="left"
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


OUTER_JOIN_ORACLE = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti as EXISTS / NOT EXISTS: customers with
    1998 orders vs without, tagged and unioned."""
    cust = load_table(spark, sf_dir, "customer")
    orders98 = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    cond = F.col("c_custkey") == F.col("o_custkey")
    with_o = joins.semi_join(cust, orders98, cond).select(
        "c_custkey", F.lit("active_1998").alias("cohort")
    )
    without = joins.anti_join(cust, orders98, cond).select(
        "c_custkey", F.lit("inactive_1998").alias("cohort")
    )
    return with_o.unionByName(without)


SEMI_ANTI_ORACLE = """
WITH o98 AS (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
)
SELECT c_custkey, 'active_1998' AS cohort FROM customer
WHERE EXISTS (SELECT 1 FROM o98 WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'inactive_1998' AS cohort FROM customer
WHERE NOT EXISTS (SELECT 1 FROM o98 WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# GROUPING SETS + CUBE (completing the multi-grouping matrix)
# ---------------------------------------------------------------------------


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (the DataFrame
    API exposes only rollup/cube): per (status), per (priority), and
    grand total — with grouping_id to disambiguate NULL group keys."""
    load_tables(spark, sf_dir, ("orders",), register_views=True)
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return agg.cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            agg.exact_sum("o_totalprice").alias("total_price"),
        ],
    )


CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# from_json — typed struct extraction (beyond get_json_object)
# ---------------------------------------------------------------------------


def json_struct_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props into a typed struct ONCE, then use fields — at
    scale this beats N get_json_object calls (one parse vs N)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "props_struct", F.from_json(F.col("props"), "k BIGINT")
    )
    return parsed.select(
        "event_id",
        F.col("props_struct.k").alias("k"),
        (F.col("props_struct.k").isNotNull()).alias("parsed_ok"),
    )


JSON_STRUCT_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS parsed_ok
FROM events
"""


# ---------------------------------------------------------------------------
# Approximate distinct — audited (estimate + exact recount + verdict)
# ---------------------------------------------------------------------------

#: approx_count_distinct is requested at rsd=0.02; the audit verdict
#: allows 3x the requested relative error (HLL++ rsd is a standard
#: deviation, not a bound — 3 sigma keeps the verdict deterministic
#: for any correct implementation while still catching a broken one).
APPROX_DISTINCT_TOL = 0.06


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate AUDITED against an exact recount.

    Round-6 verdict #4: the raw estimate can never hash-match a DuckDB
    oracle (sketches differ across engines), which left this as the one
    ``no_oracle`` catalog entry.  Rebuilt in the ``hll_distinct_audit``
    shape: hashed columns are the exact count and a tolerance verdict
    — both engine-independent — while the estimate still exercises the
    single-pass mergeable-sketch path that replaces COUNT(DISTINCT)'s
    per-value shuffle at 100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    est = F.col("est").cast("double")
    ok = (
        F.abs(est - F.col("exact_users"))
        <= F.lit(APPROX_DISTINCT_TOL) * F.col("exact_users")
    ).alias("est_within_tol")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("est"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select("event_type", "exact_users", ok)
    )


APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS est_within_tol
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Statistical moments from exact decimal sums (order-independent)
# ---------------------------------------------------------------------------


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample-stddev / correlation per return flag, computed
    from DECIMAL-exact power sums so the result is independent of both
    partitioning and engine (built-in stddev/corr stream doubles in
    arbitrary order -> nondeterministic low bits; the closed-form over
    exact sums is bit-stable AND still one aggregation pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(q * p).cast("double").alias("sqp"),
    )
    n = F.col("n").cast("double")
    var_q = (n * F.col("sqq") - F.col("sq") * F.col("sq")) / (n * (n - 1))
    var_p = (n * F.col("spp") - F.col("sp") * F.col("sp")) / (n * (n - 1))
    corr = (n * F.col("sqp") - F.col("sq") * F.col("sp")) / (
        F.sqrt(n * F.col("sqq") - F.col("sq") * F.col("sq"))
        * F.sqrt(n * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return sums.select(
        "l_returnflag",
        "n",
        F.round(F.col("sq") / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_q), 6).alias("std_qty"),
        F.round(F.col("sp") / n, 4).alias("mean_price"),
        F.round(F.sqrt(var_p), 4).alias("std_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


STATS_MOMENTS_ORACLE = """
WITH sums AS (
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       round(sq / n, 6) AS mean_qty,
       round(sqrt((n * sqq - sq * sq) / (n * (n - 1.0))), 6) AS std_qty,
       round(sp / n, 4) AS mean_price,
       round(sqrt((n * spp - sp * sp) / (n * (n - 1.0))), 4) AS std_price,
       round((n * sqp - sq * sp)
             / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6) AS corr_qty_price
FROM sums
"""


# ---------------------------------------------------------------------------
# Percentiles: exact (oracle) — approx_percentile is the scale path
# ---------------------------------------------------------------------------


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of event value per type (Spark
    ``percentile`` == DuckDB ``quantile_cont`` definition).  The 100 TB
    path is ``approx_percentile`` (GK sketch, single pass, mergeable) —
    audited against its rank-error contract in
    ``scale_ops_queries.quantile_sketch_audit``."""
    events = load_table(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return events.groupBy("event_type").agg(
        F.round(pct.getItem(0), 4).alias("p25"),
        F.round(pct.getItem(1), 4).alias("p50"),
        F.round(pct.getItem(2), 4).alias("p75"),
    )


VALUE_PERCENTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q7 / Q8 / Q10 shapes (round 2 — correlated-subquery
# decorrelation and multi-dimension join breadth)
# ---------------------------------------------------------------------------


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery + 4-dim join chain.

    The testdata has no ``partsupp`` table; the part<->supplier link
    is lineitem's (l_partkey, l_suppkey) with supply cost := min
    l_extendedprice observed for the pair.  Same plan shape as the
    original: the correlated ``cost = (SELECT min(...) WHERE same
    part)`` subquery is decorrelated the way Catalyst would — min per
    part over the region-filtered pairs, equality back-join.

    Scale notes: the part filter lands BEFORE the min-per-part
    aggregate (legal because the subquery is correlated only on
    partkey, so dropping other parts can't change each part's min) —
    the big pair table reduces first, and min_cost is then small
    enough to broadcast for the back-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    parts = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_type")
    eu = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # Both selective dims join BELOW the pair aggregate: the broadcast
    # part filter prunes ~all of lineitem before the (part, supp)
    # groupBy ever shuffles (legal — the correlated min is per part,
    # so dropping other parts/suppliers can't change it).
    filtered = li.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    ps_eu = filtered.groupBy(
        "l_partkey", "p_type", "l_suppkey", "s_acctbal", "s_name", "n_name"
    ).agg(F.min("l_extendedprice").alias("supplycost"))
    min_cost = ps_eu.groupBy("l_partkey").agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        ps_eu.join(F.broadcast(min_cost), "l_partkey")
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "p_type", "supplycost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


TPCH_Q2_ORACLE = """
WITH ps AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           min(l_extendedprice) AS supplycost
    FROM lineitem GROUP BY 1, 2
), eu AS (
    SELECT s_suppkey, s_acctbal, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supplycost
FROM part
JOIN ps ON p_partkey = ps.partkey
JOIN eu ON eu.s_suppkey = ps.suppkey
WHERE p_size = 15 AND p_type = 'LARGE'
  AND supplycost = (SELECT min(ps2.supplycost)
                    FROM ps ps2 JOIN eu e2 ON e2.s_suppkey = ps2.suppkey
                    WHERE ps2.partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.

    Scale notes: both nation filters are pushed INTO the supplier and
    customer dimensions before the fact joins (a semi-reduction — the
    lineitem x orders join output only carries rows that can survive
    the pair predicate), and the asymmetric pair condition is applied
    post-join.  Dimensions broadcast; lineitem shuffles once for the
    orders join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    the_two = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp2 = supp.join(
        F.broadcast(the_two.select(F.col("n_nationkey").alias("_sk"),
                                   F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_sk"),
    ).select("s_suppkey", "supp_nation")
    cust2 = cust.join(
        F.broadcast(the_two.select(F.col("n_nationkey").alias("_ck"),
                                   F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("_ck"),
    ).select("c_custkey", "cust_nation")

    revenue = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    df = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust2), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return df.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(F.sum(revenue).cast("double").alias("revenue"))


TPCH_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share of PROMO-part revenue
    sold into AMERICA, by order year — conditional-sum ratio over a
    7-table join.

    Scale notes: the two selective dimension filters (p_type, r_name)
    reduce their dimensions BEFORE broadcast, so the fact side
    inner-joins against already-filtered build sides; the ratio is a
    single grouped pass (two conditional sums, no second join).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    promo_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    america_cust = (
        cust.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_nk"),
    ).select("s_suppkey", "supp_nation")

    volume = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    df = (
        li.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(america_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(
        F.lit(0).cast(D)
    )
    return (
        df.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
    )


TPCH_Q8_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS mkt_share,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter.

    Scale notes: both fact filters (return flag, order-date quarter)
    are range/equality forms that reach the scans as pushed filters;
    customer and nation broadcast; the top-k is a global sort of an
    already-small aggregate (one row per customer with returns in the
    quarter).  Ordering ties broken by c_custkey => deterministic
    LIMIT in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    revenue = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    df = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        df.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


TPCH_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is under
    20% of their part's average — a correlated AVG subquery
    decorrelated into avg-per-part + back-join.

    Scale notes: the selective part filter (brand+type, broadcast)
    lands BEFORE the per-part average, so the aggregate runs over the
    filtered fact subset only (legal: the subquery correlates on
    partkey alone).  Decimal-exact sums keep the scalar output
    order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    parts = part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    filtered = li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = filtered.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(D)) / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        filtered.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(D)).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


TPCH_Q17_ORACLE = """
WITH parts AS (
    SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
), filtered AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN parts ON l_partkey = p_partkey
), avg_qty AS (
    SELECT l_partkey,
           sum(CAST(l_quantity AS DECIMAL(12,2))) / count(*) AS avg_qty
    FROM filtered GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6)
           AS avg_yearly,
       count(*) AS n_rows
FROM filtered f JOIN avg_qty a ON f.l_partkey = a.l_partkey
WHERE f.l_quantity < 0.2 * a.avg_qty
"""


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose predicate is an OR of
    brand/size/quantity conjunctions.  Catalyst splits the common
    equi-key (partkey) out of the disjunction, so this stays a hash
    join with a post-join filter — never a nested loop."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    case1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    case2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    )
    case3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    return j.filter(case1 | case2 | case3).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


TPCH_Q19_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + anti-join.  Rich
    customers (balance above the positive-balance average) with no
    RECENT orders ("no orders ever" is empty on this data), grouped
    by nation.

    Scale notes: the scalar average joins in as a broadcast 1-row
    aggregate (never collect()); the anti-join's right side reduces
    to the filtered orders' custkeys before shuffling.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(D)) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast(D) > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(D)).cast("double").alias("total_bal"),
        )
    )


TPCH_Q22_ORACLE = """
WITH avg_bal AS (
    SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) / count(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0
)
SELECT n_name,
       count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(12,2)) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and
    order year.  Like Q2, the absent ``partsupp`` supply cost is
    derived from lineitem (min observed price per (part, supplier)),
    which keeps the signature plan: derived-aggregate re-join on a
    two-column key + fact join + broadcast dims + two-level grouping.

    Scale notes: the selective part filter broadcasts FIRST, so both
    the cost aggregate and the re-join run over the reduced fact
    subset; decimal-exact arithmetic keeps the profit sums
    order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    red_parts = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    li_red = li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
    costs = li_red.groupBy(
        F.col("l_partkey").alias("c_partkey"), F.col("l_suppkey").alias("c_suppkey")
    ).agg(F.min("l_extendedprice").alias("supplycost"))
    profit = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
        - F.col("supplycost").cast(D) * F.col("l_quantity").cast(D)
    )
    return (
        li_red.join(
            costs,
            (F.col("l_partkey") == F.col("c_partkey"))
            & (F.col("l_suppkey") == F.col("c_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


TPCH_Q9_ORACLE = """
WITH red AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
), li_red AS (
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount
    FROM lineitem JOIN red ON l_partkey = p_partkey
), costs AS (
    SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey,
           min(l_extendedprice) AS supplycost
    FROM li_red GROUP BY 1, 2
)
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                - CAST(supplycost AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))
            AS DOUBLE) AS profit
FROM li_red
JOIN costs   ON l_partkey = c_partkey AND l_suppkey = c_suppkey
JOIN orders  ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation  ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# The remaining TPC-H shapes (Q11/Q12/Q15/Q16/Q20/Q21), adapted.
#
# The driver testdata carries no partsupp table, no commit/receipt
# dates and no ship modes, so the six queries that need them are
# re-posed over the available columns with the SAME plan shapes —
# global-scalar threshold (q11), conditional priority counts (q12),
# max-equality view join (q15), distinct-count with exclusion
# anti-join (q16), 50%-of-group semi-join (q20), and the
# exists/not-exists double correlation (q21).  The shape, not the
# constants, is what exercises the engine.
# ---------------------------------------------------------------------------


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a GLOBAL scalar threshold.
    Parts whose lineitem revenue exceeds 0.1% of total revenue.

    Scale notes: the global total is a 1-row broadcast aggregate
    cross-joined in (never collect()); both aggregations share one
    shuffle of the fact table grouped by partkey — the scalar derives
    from re-aggregating the per-part sums, not a second fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(revenue).alias("value_dec"))
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("total_dec") * 0.001)
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
    )


TPCH_Q11_ORACLE = """
WITH per_part AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
               AS value_dec
    FROM lineitem GROUP BY l_partkey
), total AS (
    SELECT sum(value_dec) AS total_dec FROM per_part
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per_part, total
WHERE value_dec > total_dec * 0.001
"""


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional priority counts.
    Lines shipped >90 days after their order date during 1998,
    grouped by return flag, split into high- and low-priority counts
    (the original splits by ship mode; the conditional-sum shape is
    identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01"))
            & (F.col("l_shipdate") < F.lit("1999-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


TPCH_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + equality against its MAX.
    Supplier(s) with the highest lineitem revenue over one quarter.

    Scale notes: the max is a 1-row broadcast aggregate over the
    (already reduced) per-supplier view; the equality test runs on
    the DECIMAL sums — comparing doubles would make 'the max' depend
    on reduction order.  Supplier dim joins broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    )
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("total_dec"))
    )
    top = rev.agg(F.max("total_dec").alias("max_dec"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


TPCH_Q15_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
               AS total_dec
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_dec = (SELECT max(total_dec) FROM rev)
"""


def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    combo, with an exclusion ANTI-join (the original excludes
    complaint suppliers; negative account balance stands in).
    Part attribute filters mirror the original's brand/type/size cut.

    Scale notes: the (partkey, suppkey) pairs dedupe BEFORE the dim
    join; the excluded-supplier list reduces to keys and anti-joins
    broadcast; count(DISTINCT) runs after the pair set is already
    distinct, so it's a plain count over one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30)
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
GROUP BY p_brand, p_type, p_size
"""


def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a threshold derived from a grouped sum gates
    a SEMI-join chain into the supplier dim.  Suppliers who shipped
    more than half of some part's total 1997 volume (the original
    gates availqty against half the part's yearly demand).

    Scale notes: one shuffle groups (part, supplier); the per-part
    totals re-aggregate from that result (no second fact scan); the
    surviving suppkeys semi-join into the (broadcast) supplier dim.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    y97 = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    per_ps = y97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(D)).alias("supp_qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > F.col("part_qty") * 0.5)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


TPCH_Q20_ORACLE = """
WITH per_ps AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
), per_part AS (
    SELECT l_partkey, sum(supp_qty) AS part_qty FROM per_ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
    WHERE supp_qty > part_qty * 0.5
)
"""


def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the exists / not-exists DOUBLE correlation.
    On finished ('F') multi-supplier orders, suppliers whose line
    shipped late (>90 days after the order date) while EVERY other
    supplier on the order shipped on time — EXISTS(another supplier)
    AND NOT EXISTS(another LATE supplier), both decorrelated into
    semi/anti joins on (orderkey, other-suppkey != suppkey).

    Scale notes: both correlations reduce to distinct
    (orderkey, suppkey) pair sets BEFORE joining — the semi/anti
    probes carry two longs per row, never lineitem payloads.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = li.join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
    late = (
        lines.filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = lines.select(
        F.col("l_orderkey").alias("p_orderkey"),
        F.col("l_suppkey").alias("p_suppkey"),
    ).distinct()
    with_others = late.join(
        all_pairs,
        (F.col("l_orderkey") == F.col("p_orderkey"))
        & (F.col("l_suppkey") != F.col("p_suppkey")),
        "left_semi",
    )
    late_pairs = late.select(
        F.col("l_orderkey").alias("q_orderkey"),
        F.col("l_suppkey").alias("q_suppkey"),
    )
    sole = with_others.join(
        late_pairs,
        (F.col("l_orderkey") == F.col("q_orderkey"))
        & (F.col("l_suppkey") != F.col("q_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


TPCH_Q21_ORACLE = """
WITH finished AS (
    SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
), lines AS (
    SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
    FROM lineitem JOIN finished ON l_orderkey = o_orderkey
), late AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lines
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
), all_pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lines
)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM all_pairs p
              WHERE p.l_orderkey = l1.l_orderkey
                AND p.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


ANALYTICS_QUERIES = [
    ("tpch_q1_pricing_summary", tpch_q1_pricing_summary, TPCH_Q1_ORACLE,
     "TPC-H Q1 shape: scan + filter + wide aggregation"),
    ("tpch_q3_shipping_priority", tpch_q3_shipping_priority, TPCH_Q3_ORACLE,
     "TPC-H Q3 shape: 3-way join + agg + global top-k window"),
    ("tpch_q5_regional_revenue", tpch_q5_regional_revenue, TPCH_Q5_ORACLE,
     "TPC-H Q5 shape: 5-way join, dims broadcast"),
    ("tpch_q6_forecast_revenue", tpch_q6_forecast_revenue, TPCH_Q6_ORACLE,
     "TPC-H Q6 shape: all-pushed filters + scalar aggregate"),
    ("tpch_q18_large_orders", tpch_q18_large_orders, TPCH_Q18_ORACLE,
     "TPC-H Q18 shape: HAVING subquery reduced before re-join"),
    ("tpch_q13_order_histogram", tpch_q13_order_histogram, TPCH_Q13_ORACLE,
     "TPC-H Q13 shape: aggregate of an aggregate (count-of-counts)"),
    ("tpch_q2_min_cost_supplier", tpch_q2_min_cost_supplier, TPCH_Q2_ORACLE,
     "TPC-H Q2 shape: correlated MIN subquery decorrelated + 4-dim chain"),
    ("tpch_q7_nation_volume", tpch_q7_nation_volume, TPCH_Q7_ORACLE,
     "TPC-H Q7 shape: bidirectional nation-pair volume, dims pre-filtered"),
    ("tpch_q8_market_share", tpch_q8_market_share, TPCH_Q8_ORACLE,
     "TPC-H Q8 shape: conditional-sum market-share ratio over 7 tables"),
    ("tpch_q10_returned_items", tpch_q10_returned_items, TPCH_Q10_ORACLE,
     "TPC-H Q10 shape: returns revenue top-20 with deterministic ties"),
    ("tpch_q17_small_quantity_revenue", tpch_q17_small_quantity_revenue,
     TPCH_Q17_ORACLE,
     "TPC-H Q17 shape: correlated AVG subquery decorrelated per part"),
    ("tpch_q19_disjunctive_revenue", tpch_q19_disjunctive_revenue,
     TPCH_Q19_ORACLE,
     "TPC-H Q19 shape: OR-of-conjunctions join predicate, still hash join"),
    ("tpch_q22_dormant_customers", tpch_q22_dormant_customers, TPCH_Q22_ORACLE,
     "TPC-H Q22 shape: scalar AVG subquery + anti-join on recent orders"),
    ("tpch_q9_product_profit", tpch_q9_product_profit, TPCH_Q9_ORACLE,
     "TPC-H Q9 shape: derived supply cost re-join + profit rollup"),
    ("tpch_q14_promo_share", tpch_q14_promo_share, TPCH_Q14_ORACLE,
     "TPC-H Q14 shape: conditional-aggregation revenue share"),
    ("tpch_q4_priority_check", tpch_q4_priority_check, TPCH_Q4_ORACLE,
     "TPC-H Q4 shape: EXISTS semi-join with compound time condition"),
    ("tpch_q11_important_stock", tpch_q11_important_stock, TPCH_Q11_ORACLE,
     "TPC-H Q11 shape: per-group value vs broadcast global-scalar threshold"),
    ("tpch_q12_priority_shipping", tpch_q12_priority_shipping, TPCH_Q12_ORACLE,
     "TPC-H Q12 shape: fact-fact join + conditional priority counts"),
    ("tpch_q15_top_supplier", tpch_q15_top_supplier, TPCH_Q15_ORACLE,
     "TPC-H Q15 shape: revenue view + decimal-exact MAX equality"),
    ("tpch_q16_supplier_part_counts", tpch_q16_supplier_part_counts,
     TPCH_Q16_ORACLE,
     "TPC-H Q16 shape: count-distinct per attrs with exclusion anti-join"),
    ("tpch_q20_dominant_suppliers", tpch_q20_dominant_suppliers,
     TPCH_Q20_ORACLE,
     "TPC-H Q20 shape: grouped-sum threshold gating a semi-join chain"),
    ("tpch_q21_sole_late_supplier", tpch_q21_sole_late_supplier,
     TPCH_Q21_ORACLE,
     "TPC-H Q21 shape: exists/not-exists double correlation as semi+anti"),
    ("top_orders_per_customer", top_orders_per_customer, TOP_ORDERS_ORACLE,
     "window top-k per key (row_number)"),
    ("window_functions_showcase", window_functions_showcase, WINDOW_SHOWCASE_ORACLE,
     "rank/dense_rank/ntile/percent_rank/cume_dist/running-sum in one window"),
    ("customer_set_ops", customer_set_ops, SET_OPS_ORACLE,
     "INTERSECT / EXCEPT / UNION"),
    ("orders_rollup", orders_rollup, ORDERS_ROLLUP_ORACLE,
     "GROUP BY ROLLUP subtotals"),
    ("distinct_suppliers_per_flag", distinct_suppliers_per_flag, DISTINCT_SUPPLIERS_ORACLE,
     "exact COUNT(DISTINCT) per group"),
    ("json_extract_props", json_extract_props, JSON_EXTRACT_ORACLE,
     "JSON field extraction + agg"),
    ("asof_join_events_orders", asof_join_events_orders, ASOF_JOIN_ORACLE,
     "as-of join via union+window composition"),
    ("range_join_value_bands", range_join_value_bands, RANGE_JOIN_ORACLE,
     "bucketed range join rewrite"),
    ("global_top_orders", global_top_orders, GLOBAL_TOP_ORACLE,
     "global top-k via TakeOrdered"),
    ("approx_distinct_users", approx_distinct_users, APPROX_DISTINCT_ORACLE,
     "HLL++ approximate distinct audited against exact recount (hash-checked)"),
    ("stats_moments", stats_moments, STATS_MOMENTS_ORACLE,
     "mean/stddev/corr from exact decimal power sums (order-independent)"),
    ("value_percentiles", value_percentiles, VALUE_PERCENTILES_ORACLE,
     "exact interpolated quartiles per group"),
    ("outer_join_audit", outer_join_audit, OUTER_JOIN_ORACLE,
     "LEFT OUTER join with zero-match retention"),
    ("semi_anti_customers", semi_anti_customers, SEMI_ANTI_ORACLE,
     "left_semi / left_anti as EXISTS / NOT EXISTS"),
    ("grouping_sets_revenue", grouping_sets_revenue, GROUPING_SETS_ORACLE,
     "explicit GROUPING SETS with grouping_id"),
    ("cube_order_stats", cube_order_stats, CUBE_ORACLE,
     "GROUP BY CUBE over two keys"),
    ("json_struct_extract", json_struct_extract, JSON_STRUCT_ORACLE,
     "from_json typed struct extraction (parse once, use fields)"),
]
