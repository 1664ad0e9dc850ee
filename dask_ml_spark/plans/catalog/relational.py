"""Relational / TPC-H-shape / event-log catalog queries.

Split out of the single-file plans/queries.py in round 13 (maintainability:
251+ builders in one 12k-line module); composed by catalog/__init__.py.
Conventions (canonical fixed-point aggregation, oracle alignment) are
documented in catalog/_shared.py.
"""
from __future__ import annotations
from pyspark.sql import functions as F
from ._shared import LINEITEM_FEATS, _dsum, _t  # noqa: F401

def _davg(col):
    """Order-independent mean: exact fixed-point sum / non-null count.
    SQL twin: CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000 / count(e)."""
    if isinstance(col, str):
        col = F.col(col)
    return _dsum(col) / F.count(col)


# =====================================================================
# relational / flagship
# =====================================================================

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary — one hash aggregate over
    lineitem; the canonical 'is the engine reading and aggregating at
    scale' query."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("sum_charge"),
            _davg("l_quantity").alias("avg_qty"),
            _davg("l_extendedprice").alias("avg_price"),
            _davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       (CAST(sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_qty,
       (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_base_price,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_disc_price,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_charge,
       (CAST(sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(l_quantity) AS avg_qty,
       (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(l_extendedprice) AS avg_price,
       (CAST(sum(CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_nations(spark, sf_dir):
    """Join pipeline: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region —
    dimension tables broadcast (nation/region tiny, customer small);
    the only shuffle is the final groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TOP_REVENUE_NATIONS = """
SELECT r_name, n_name,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_revenue_forecast(spark, sf_dir):
    """TPC-H Q6-shaped revenue forecast: a pure filter + global
    aggregate over the fact table.  Every predicate is sargable and
    reaches the parquet scan (PushedFilters), and only 4 of the 11
    lineitem columns are read (ReadSchema pruning)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_REVENUE_FORECAST = """
SELECT (CAST(sum(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped shipping priority: filtered fact ⋈ filtered
    orders ⋈ broadcast customer, grouped per order, deterministic
    top-10 (revenue DESC, orderkey ASC tie-break so the LIMIT set is
    stable across engines)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.where(F.col("l_shipdate") > F.lit("1998-06-01"))
        .join(o.where(F.col("o_orderdate") < F.lit("1998-06-01")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_order_priority_returns(spark, sf_dir):
    """TPC-H Q4-shaped priority count with an EXISTS semi-join: orders
    that had at least one returned line, counted per priority.  The
    distinct-orderkey side stays a LEFT SEMI join (no row
    multiplication, no fact-side shuffle of payload columns)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_ORDER_PRIORITY_RETURNS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_customer_returns_topk(spark, sf_dir):
    """TPC-H Q10-shaped: revenue lost to returns per customer,
    deterministic top-20.  Customer/nation broadcast; the only wide
    shuffle is the per-customer aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_returned_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_CUSTOMER_RETURNS_TOPK = """
SELECT c_custkey, c_name, n_name,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_event_props_json(spark, sf_dir):
    """Semi-structured extraction: parse the events.props JSON column
    with a declared schema (from_json stays in the JVM — no UDF) and
    aggregate the extracted field per event type."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("props_k", F.from_json(F.col("props"), "k BIGINT")["k"])
    # round the average: double summation order differs between engines,
    # and the driver hash is bit-exact
    return parsed.groupBy("event_type").agg(
        F.round(F.avg("props_k"), 6).alias("avg_k"),
        F.sum("props_k").alias("sum_k"),
        F.count("props_k").alias("n_with_k"),
    )


SQL_EVENT_PROPS_JSON = """
SELECT event_type,
       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k
FROM events
GROUP BY event_type
"""


def q_event_value_moving_avg(spark, sf_dir):
    """Window-frame analytics: 5-row trailing moving average and
    running max of event value per user, ordered by time.  One hash
    exchange on user_id feeds both frame specs (shared Window sort)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.avg("value").over(w.rowsBetween(-4, 0)).alias("moving_avg_5"),
        F.max("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_max"),
        F.row_number().over(w).alias("event_seq"),
    )


SQL_EVENT_VALUE_MOVING_AVG = """
SELECT event_id, user_id,
       avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS moving_avg_5,
       max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_seq
FROM events
"""


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped: revenue where the supplying and ordering nation
    coincide, per nation of one region. Fact-side joins shuffle on
    l_orderkey / o_custkey; supplier, nation, region are broadcast so
    the equi-nation predicate (c_nationkey = s_nationkey) is applied
    map-side with zero extra exchanges."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o.where(F.col("o_orderdate") < F.lit("1997-01-01")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
             F.count("*").alias("n_items"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14-shaped: share of promo-part revenue per ship month.
    Single fact⋈broadcast(part) join; the conditional aggregate folds
    into one scan (no second pass for the numerator)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            (100.0 * _dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
             / _dsum(rev)).alias("promo_pct"),
            _dsum(rev).alias("revenue"),
        )
    )


SQL_PROMO_REVENUE = """
SELECT date_trunc('month', l_shipdate) AS ship_month,
       100.0 * (CAST(sum(CAST(floor((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000)
             / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS promo_pct,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def q_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped: customers with orders above a quantity
    threshold. The HAVING filter runs on the first (fact-only) rollup so
    only qualifying orderkeys reach the joins — at 100 TB the semi-join
    reduction is the difference between joining 1e11 and ~1e6 rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(_dsum("l_quantity").alias("total_qty"))
           .where(F.col("total_qty") > 150))
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate"), F.col("o_totalprice"), F.col("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (SELECT l_orderkey,
             (CAST(sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING (CAST(sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) > 150) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q_nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7-shaped: bilateral trade volume between two nations by
    ship year. supplier/customer nation lookups are broadcast; the
    symmetric nation-pair predicate is applied map-side so only
    qualifying rows reach the final (tiny) group-by exchange."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
             F.count("*").alias("n_items"))
    )


SQL_NATION_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q_market_share(spark, sf_dir):
    """TPC-H Q8-shaped: a nation's share of a region's import revenue
    by order year. Customer→nation→region restricts the market
    map-side (all dimension joins broadcast); the share is a
    conditional-sum ratio inside ONE aggregate — no second pass, no
    self-join. At 100 TB only the lineitem-orders join shuffles, and
    AQE picks SMJ for it automatically."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cn = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
          .where(F.col("r_name") == "ASIA")
          .select("c_custkey"))
    sn = (s.join(F.broadcast(
        n.select(F.col("n_nationkey").alias("sn_key"),
                 F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            _dsum(F.when(F.col("supp_nation") == "NATION_3", vol)
                  .otherwise(F.lit(0.0))) / _dsum(vol), 6).alias("mkt_share"))
    )


SQL_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       round((CAST(sum(CAST(floor((CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000)
             / (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def q_product_profit(spark, sf_dir):
    """TPC-H Q9-shaped: profit by supplier nation and order year, with
    p_retailprice·l_quantity standing in for ps_supplycost·l_quantity
    (this schema ships no partsupp). part and the
    supplier→nation lookup broadcast; one shuffle joins lineitem to
    orders, one tiny exchange for the (nation, year) rollup."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    sn = (s.join(F.broadcast(
        n.select(F.col("n_nationkey").alias("sn_key"),
                 F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation"))
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p.select("p_partkey", "p_retailprice")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(_dsum(profit), 4).alias("sum_profit"),
             F.count("*").alias("n_items"))
    )


SQL_PRODUCT_PROFIT = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000), 4) AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13-shaped: distribution of orders-per-customer including
    zero-order customers (LEFT join + double aggregate). The first
    aggregate shrinks the fact side to one row per customer before the
    distribution rollup — two exchanges total, both post-reduction."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


def q_daily_active_users(spark, sf_dir):
    """Exact distinct users per day — the distinct aggregate compiles
    to a two-phase partial-distinct (dedup map-side before the
    exchange). At 100 TB swap count_distinct for
    approx_count_distinct(rsd) and the plan loses the second shuffle —
    noted here because the oracle requires the exact form."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
            .agg(F.count_distinct("user_id").alias("dau"),
                 F.count("*").alias("n_events")))


SQL_DAILY_ACTIVE_USERS = """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


def q_event_funnel(spark, sf_dir):
    """First-occurrence funnel signup → view → purchase: one
    conditional-min aggregate per user (a single groupBy pass, no
    self-joins — the naive 3-way self-join shape shuffles the events
    table three times; this shuffles once)."""
    ev = _t(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("purchase").alias("t_purchase"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.sum(((F.col("t_view") > F.col("t_signup"))).cast("long")).alias("n_signup_then_view"),
        F.sum(((F.col("t_view") > F.col("t_signup"))
               & (F.col("t_purchase") > F.col("t_view"))).cast("long")).alias("n_full_funnel"))


SQL_EVENT_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(t_signup) AS n_signup,
       CAST(sum(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_view,
       CAST(sum(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM per_user
"""


def q_weekly_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted
    in each later week. Two aggregates + one join, all keyed on
    user_id — the first groupBy shrinks events to one row per user
    before the join, and the distinct-week projection dedups map-side."""
    ev = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    fw = (ev.groupBy("user_id")
          .agg(F.min(week).alias("cohort_week")))
    act = ev.select("user_id", week.alias("week")).distinct()
    return (act.join(fw, "user_id")
            .groupBy("cohort_week",
                     (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
                     .cast("long").alias("week_offset"))
            .agg(F.count_distinct("user_id").alias("n_users")))


SQL_WEEKLY_RETENTION = """
WITH fw AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM act JOIN fw USING (user_id)
GROUP BY 1, 2
"""


def q_lineitem_correlations(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem measures — all
    pairs in ONE aggregate pass (corr is an algebraic aggregate:
    partial (n, Σx, Σy, Σxy, Σx², Σy²) per pair combine map-side)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = LINEITEM_FEATS
    aggs = [F.corr(ci, cols[j]).alias(f"corr_{i}_{j}")
            for i, ci in enumerate(cols) for j in range(i + 1, len(cols))]
    return li.agg(*aggs)


def _sql_lineitem_correlations() -> str:
    cols = LINEITEM_FEATS
    parts = [f"corr({ci}, {cols[j]}) AS corr_{i}_{j}"
             for i, ci in enumerate(cols) for j in range(i + 1, len(cols))]
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


def q_part_size_histogram(spark, sf_dir):
    """Histogram via width_bucket — the aggregation-side building block
    for numeric profiling; one scan, one small group-by."""
    p = _t(spark, sf_dir, "part")
    return (p.groupBy(F.width_bucket(F.col("p_size"), F.lit(1.0), F.lit(51.0), 10)
                      .alias("bucket"))
            .agg(F.count("*").alias("n"),
                 F.min("p_size").alias("min_size"),
                 F.max("p_size").alias("max_size")))


SQL_PART_SIZE_HISTOGRAM = """
-- width_bucket(p_size, 1.0, 51.0, 10) spelled out (DuckDB lacks it):
-- bucket width (51-1)/10 = 5, values below/above the range clamp to 0/11
SELECT CASE WHEN p_size < 1.0 THEN 0
            WHEN p_size >= 51.0 THEN 11
            ELSE CAST(floor((p_size - 1.0) / 5.0) AS BIGINT) + 1 END AS bucket,
       count(*) AS n, min(p_size) AS min_size, max(p_size) AS max_size
FROM part GROUP BY 1
"""


def q_supplier_balance_quartiles(spark, sf_dir):
    """ntile quartiles over account balance (suppkey tie-break keeps
    the assignment engine-deterministic), then per-quartile stats."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (s.withColumn("quartile", F.ntile(4).over(w))
            .groupBy("quartile")
            .agg(F.count("*").alias("n"),
                 F.min("s_acctbal").alias("lo"),
                 F.max("s_acctbal").alias("hi"),
                 _davg("s_acctbal").alias("mean_bal")))


SQL_SUPPLIER_BALANCE_QUARTILES = """
SELECT quartile, count(*) AS n, min(s_acctbal) AS lo, max(s_acctbal) AS hi,
       (CAST(sum(CAST(floor((s_acctbal) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(s_acctbal) AS mean_bal
FROM (SELECT s_acctbal,
             ntile(4) OVER (ORDER BY s_acctbal ASC, s_suppkey ASC) AS quartile
      FROM supplier)
GROUP BY quartile
"""


def q_salted_join_revenue(spark, sf_dir):
    """The explicit skew lever, correctness-proven: utils.salted_join
    salts ONLY the listed hot keys (their left rows spread over 16
    sub-keys, only the MATCHING right rows replicated per salt) and
    unions the unsalted remainder — the r8-verdict fix for the naive
    form that replicated the whole right side n_salt times for every
    key. Here the 3 heaviest order keys play the hot list; the oracle
    is the UNSALTED SQL join, so this query asserts the skew machinery
    (split + salted branch + cold branch + union) changes the plan,
    never the answer."""
    from dask_ml_spark.utils import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_extendedprice"), F.col("l_discount"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hot = [r[0] for r in
           (li.groupBy("o_orderkey").count()
            .orderBy(F.desc("count"), "o_orderkey").limit(3).collect())]
    joined = salted_join(li, o, on="o_orderkey", n_salt=16, hot_keys=hot)
    # _dsum (exact decimal accumulation) is load-bearing here: the
    # two-branch salted plan (hot ∪ cold) re-associates partial sums vs
    # the oracle's flat join, which flipped the driver hash in r9 when
    # this was a raw double sum.
    return (joined.groupBy("o_orderpriority")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
                 F.count("*").alias("n_items")))


SQL_SALTED_JOIN_REVENUE = """
SELECT o_orderpriority,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_sales_cube(spark, sf_dir):
    """CUBE rollup over (returnflag, linestatus) with grouping_id —
    all four aggregation levels in ONE pass (Spark expands the
    grouping sets map-side; a naive 4-query union would scan the fact
    table four times)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
                 F.count("*").alias("n"),
                 F.grouping_id().alias("gid")))


SQL_SALES_CUBE = """
SELECT l_returnflag, l_linestatus,
       (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_lang_source_pivot(spark, sf_dir):
    """Pivot: documents per (source, language) as a wide matrix —
    groupBy().pivot() with an explicit value list compiles to ONE
    conditional aggregate over one scan, never a per-language job."""
    docs = _t(spark, sf_dir, "documents")
    langs = ["en", "de", "es", "fr", "zh"]
    return (docs.groupBy("source")
            .pivot("lang", langs)
            .agg(F.count(F.lit(1)))
            .na.fill(0, langs))


SQL_LANG_SOURCE_PIVOT = """
SELECT source,
       count(*) FILTER (lang = 'en') AS en,
       count(*) FILTER (lang = 'de') AS de,
       count(*) FILTER (lang = 'es') AS es,
       count(*) FILTER (lang = 'fr') AS fr,
       count(*) FILTER (lang = 'zh') AS zh
FROM documents
GROUP BY source
"""


# =====================================================================
# events / streaming-shaped
# =====================================================================

def q_windowed_event_features(spark, sf_dir):
    """Tumbling-hour per-user aggregates — the batch rendering of the
    streaming windowed-features operator."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            _dsum("value").alias("sum_value"),
            _davg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
        )
    )


SQL_WINDOWED_EVENT_FEATURES = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       user_id,
       count(*) AS n_events,
       (CAST(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_value,
       (CAST(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(value) AS avg_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


def q_event_type_rollup(spark, sf_dir):
    """Top-k-style grouped counts on the event stream table."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _davg("value").alias("avg_value"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("p95_value"),
    )


SQL_EVENT_TYPE_ROLLUP = """
SELECT event_type, count(*) AS n,
       (CAST(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(value) AS avg_value,
       quantile_cont(value, 0.95) AS p95_value
FROM events
GROUP BY event_type
"""


def q_event_sessionization(spark, sf_dir):
    """Sessionize the event stream: a session break is a >30 min gap per
    user (lag window, ts truncated to seconds), session id = running sum
    of breaks. Batch rendering of the streaming sessionization op."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast to TIMESTAMP (LTZ) before the epoch-seconds cast: NTZ → long is
    # a DATATYPE_MISMATCH under Spark 4.1+, and the extra cast is a no-op
    # on already-LTZ inputs
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    sess = (
        ev.withColumn("new_sess", F.coalesce(gap > 1800, F.lit(True)).cast("long"))
        .withColumn(
            "session_no",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        _dsum("value").alias("sum_value"),
    )


SQL_EVENT_SESSIONIZATION = """
WITH g AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT user_id, ts, value,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM g
)
SELECT user_id, session_no, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       (CAST(sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_value
FROM s GROUP BY 1, 2
"""


def q_view_click_attribution(spark, sf_dir):
    """Batch rendering of the watermarked stream-stream interval join
    (streaming/joins.py::stream_interval_join): every click joins the
    same user's views from the preceding 30 minutes. On batch this is
    ONE equi hash join on user_id with the time range as a
    post-condition; on a stream the same function bounds join state by
    watermark + horizon (parity asserted in
    tests/test_streaming_joins.py). Gaps are exact integer
    microseconds, so the oracle hash-matches."""
    from dask_ml_spark.streaming.joins import stream_interval_join

    ev = _t(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    out = stream_interval_join(views, clicks, horizon="30 minutes")
    gap_us = (F.unix_micros(F.col("r_ts").cast("timestamp"))
              - F.unix_micros(F.col("l_ts").cast("timestamp")))
    return out.select("l_event_id", "r_event_id", gap_us.alias("gap_us"))


SQL_VIEW_CLICK_ATTRIBUTION = """
SELECT v.event_id AS l_event_id, c.event_id AS r_event_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events v JOIN events c ON v.user_id = c.user_id
WHERE v.event_type = 'view' AND c.event_type = 'click'
  AND v.ts <= c.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
"""


# =====================================================================
# TPC-H tail shapes (Q2 / Q12 / Q15 / Q16 / Q20 analogs)
# =====================================================================
# This schema ships no partsupp table, so lineitem's observed
# (l_partkey, l_suppkey) pairs stand in for the part-supplier relation
# and min(l_extendedprice / l_quantity) per pair stands in for
# ps_supplycost. The distinctive PLAN of each classic query is kept.


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped: for each small STANDARD part, the supplier(s)
    offering the minimum unit price, ranked by account balance.
    The correlated-min subquery becomes ONE exchange on the pair key:
    groupBy(l_partkey, l_suppkey) builds supply costs, and the
    per-part minimum is a window over that already-aggregated frame
    (partition size <= #suppliers, so no hot-group hazard). supplier
    and part are broadcast dimensions; nothing else shuffles at 100 TB.
    Unit prices are exact IEEE divisions, so the min-equality filter
    is engine-deterministic; ties keep every minimal supplier."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    small = (p.where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
             .select("p_partkey", "p_brand", "p_size"))
    cost = (li.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_partkey", "l_suppkey", "p_brand", "p_size")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("supply_cost")))
    w = Window.partitionBy("l_partkey")
    best = (cost.withColumn("min_cost", F.min("supply_cost").over(w))
            .where(F.col("supply_cost") == F.col("min_cost")))
    sn = (s.join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                      F.col("n_name").alias("s_nation"))),
                 F.col("s_nationkey") == F.col("sn_key"))
          .select("s_suppkey", "s_name", "s_acctbal", "s_nation"))
    return (best.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_acctbal"), F.col("s_name"), F.col("s_nation"),
                    F.col("l_partkey").alias("p_partkey"),
                    F.col("p_brand"), F.col("p_size"),
                    F.round("supply_cost", 6).alias("supply_cost"))
            .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
            .limit(100))


SQL_MIN_COST_SUPPLIER = """
WITH cost AS (
    SELECT l_partkey, l_suppkey, p_brand, p_size,
           min(l_extendedprice / l_quantity) AS supply_cost
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
    GROUP BY 1, 2, 3, 4
), best AS (
    SELECT *, min(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
    FROM cost
)
SELECT s_acctbal, s_name, n_name AS s_nation,
       l_partkey AS p_partkey, p_brand, p_size,
       round(supply_cost, 6) AS supply_cost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


def q_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12-shaped: shipments that left more than 60 days after
    the order date, counted by return flag and split into
    high/low order priority with conditional sums. ONE shuffle join
    (lineitem x orders on orderkey, AQE picks SMJ) feeding a 3-row
    hash aggregate; the priority split is a CASE inside the agg, not
    a second pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
    )


SQL_LATE_SHIPMENT_PRIORITY = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15-shaped: the supplier(s) with the maximum revenue over
    one quarter. The classic view + scalar-max subquery becomes one
    per-supplier aggregate and a 1-row broadcast of the max joined
    back as a filter — no recomputation of the view, no global sort.
    Revenue is rounded to cents BEFORE the max comparison so the
    selected rows are stable across engines' summation orders."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                    & (F.col("l_shipdate") < F.lit("1996-04-01")))
           .groupBy("l_suppkey")
           # floor-form cents rounding, NOT round(): _dsum outputs sit
           # exactly on the 1e-4 grid, so ~1% of revenues end in .xx50
           # where Spark's HALF_UP and DuckDB's binary round disagree
           # (review-caught); floor of a bit-identical double is
           # mode-free
           .agg((F.floor(_dsum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))) * 100
                         + F.lit(0.5)) / 100)
                .alias("total_revenue")))
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (rev.join(F.broadcast(top),
                     F.col("total_revenue") == F.col("max_revenue"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
            .orderBy("s_suppkey"))


SQL_TOP_SUPPLIER_REVENUE = """
WITH rev AS (
    SELECT l_suppkey,
           floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) * 100 + 0.5) / 100 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16-shaped: how many distinct suppliers can ship each
    (brand, type, size) bucket, excluding one brand, one type, and a
    supplier blocklist. The NOT IN subquery is a broadcast LEFT ANTI
    join (the blocklist is tiny); the part-supplier relation is the
    distinct (l_partkey, l_suppkey) pairs — ONE exchange, and the
    count(distinct) reuses the pair aggregate rather than re-shuffling
    raw lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    dim = (p.where((F.col("p_brand") != "Brand#11")
                   & (F.col("p_type") != "PROMO")
                   & F.col("p_size").isin(1, 5, 9, 15, 25, 35, 45, 49))
           .select("p_partkey", "p_brand", "p_type", "p_size"))
    blocklist = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (pairs
            .join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(blocklist),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


SQL_PART_SUPPLIER_VARIETY = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 15, 25, 35, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped: suppliers who shipped more than 30% of a
    small part's 1997 volume, restricted to one nation. The nested
    EXISTS chain becomes: pair-level quantity aggregate -> per-part
    total as a window over the aggregated frame (partition <=
    #suppliers) -> threshold filter -> LEFT SEMI join into supplier.
    l_quantity is integral-valued so the sums are FP-exact and the
    30% threshold is engine-deterministic. Only the pair aggregate
    shuffles big data; part and nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    from pyspark.sql import Window

    small = p.where(F.col("p_name").startswith("small")).select("p_partkey")
    pair_qty = (li.where((F.col("l_shipdate") >= F.lit("1997-01-01"))
                         & (F.col("l_shipdate") < F.lit("1998-01-01")))
                .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
                .groupBy("l_partkey", "l_suppkey")
                .agg(F.sum("l_quantity").alias("pair_qty")))
    w = Window.partitionBy("l_partkey")
    dominant = (pair_qty
                .withColumn("part_qty", F.sum("pair_qty").over(w))
                .where(F.col("pair_qty") > 0.3 * F.col("part_qty"))
                .select("l_suppkey").distinct())
    nat = n.where(F.col("n_name") == "NATION_2").select("n_nationkey")
    return (s.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
            .orderBy("s_suppkey"))


SQL_DOMINANT_PART_SUPPLIERS = """
WITH pair_qty AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND p_name LIKE 'small%'
    GROUP BY 1, 2
), dominant AS (
    SELECT DISTINCT l_suppkey
    FROM (SELECT *, sum(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
          FROM pair_qty)
    WHERE pair_qty > 0.3 * part_qty
)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_suppkey
"""


def q_time_fill_events(spark, sf_dir):
    """Per-user 6-hour grid over the event stream with linear
    interpolation of the missing buckets (operators/timeseries.py
    time_fill), reduced to per-user grid stats. The interpolation
    expression evaluates in the same operation order on both engines,
    so sums agree to FP rounding."""
    from dask_ml_spark.operators.timeseries import time_fill

    ev = _t(spark, sf_dir, "events")
    out = time_fill(ev, "ts", "value", key_cols=["user_id"], step=21600)
    return (out.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum(F.col("observed").cast("long")).alias("n_observed"),
                 (F.floor(F.sum("value") * 1e6 + F.lit(0.5)) / 1e6)
                 .alias("sum_value"))
            .select(F.col("user_id").cast("long").alias("user_id"),
                    "n_buckets", "n_observed", "sum_value"))


SQL_TIME_FILL_EVENTS = """
WITH obs AS (
    SELECT user_id, (floor(epoch(ts) / 21600) * 21600)::BIGINT AS b,
           avg(value) AS v
    FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(b) AS mn, max(b) AS mx FROM obs GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(mn, mx, 21600)) AS b
         FROM span),
f AS (
    SELECT user_id, b, v,
           last_value(v IGNORE NULLS) OVER w AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER w AS pb,
           first_value(v IGNORE NULLS) OVER w2 AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER w2 AS nb
    FROM (SELECT g.user_id, g.b, o.v
          FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id
                                     AND g.b = o.b)
    WINDOW w AS (PARTITION BY user_id ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, count(*)::BIGINT AS n_buckets,
       sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_observed,
       floor(sum(coalesce(v, pv + (nv - pv) * (b - pb) / (nb - pb)))
             * 1e6 + 0.5) / 1e6 AS sum_value
FROM f GROUP BY user_id
"""


def q_part_attribute_stats(spark, sf_dir):
    """Wide-to-long reshaping (dask.dataframe.melt analog — Spark's
    native ``unpivot``, zero-shuffle narrow explode) then per-(brand,
    attribute) stats; the oracle renders the same melt as UNION ALL."""
    p = _t(spark, sf_dir, "part")
    long = (p.select("p_brand",
                     F.col("p_size").cast("double").alias("size"),
                     F.col("p_retailprice").cast("double")
                     .alias("retailprice"))
            .unpivot("p_brand", ["size", "retailprice"], "attr", "val"))
    return (long.groupBy("p_brand", "attr")
            .agg(F.round(_davg("val"), 6).alias("avg_val"),
                 F.count("*").alias("n")))


SQL_PART_ATTRIBUTE_STATS = """
WITH long AS (
    SELECT p_brand, 'size' AS attr, p_size::DOUBLE AS val FROM part
    UNION ALL
    SELECT p_brand, 'retailprice', p_retailprice::DOUBLE FROM part
)
SELECT p_brand, attr,
       round((CAST(sum(CAST(floor((val) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / count(val), 6) AS avg_val,
       count(*)::BIGINT AS n
FROM long GROUP BY p_brand, attr
"""


def q_idle_customers(spark, sf_dir):
    """TPC-H Q22-shaped: customers with above-average (positive)
    account balance and NO orders after a cutoff, per market segment.
    Plan shape: the scalar average is a 1-row broadcast (no driver
    round-trip), and the "no orders" predicate is a LEFT ANTI join —
    the fact table never materializes matches, only prunes."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        _davg("c_acctbal").alias("__avg_bal"))
    rich = (c.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("__avg_bal")))
    recent = o.where(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (idle.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"),
                 _dsum("c_acctbal").alias("total_balance")))


SQL_IDLE_CUSTOMERS = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       (CAST(sum(CAST(floor((c_acctbal) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS total_balance
FROM customer c
WHERE c_acctbal > (SELECT (CAST(sum(CAST(floor((c_acctbal) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000)
                          / count(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY c_mktsegment
"""


def q_sole_supplier_orders(spark, sf_dir):
    """TPC-H Q21-shaped: suppliers who were the SOLE supplier on
    orders of >= 2 line items, ranked by the revenue of those orders.
    Plan shape: the per-order profile aggregate and the LEFT SEMI join
    back to lineitem both hash on l_orderkey, so AQE reuses one
    exchange for both; the final per-supplier rollup is the only other
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("__ns"),
                      F.count("*").alias("__ni"))
                 .where((F.col("__ns") == 1) & (F.col("__ni") >= 2))
                 .select("l_orderkey"))
    from pyspark.sql import Window

    sole = li.join(per_order, "l_orderkey", "left_semi")
    out = (sole.groupBy("l_suppkey")
           .agg(F.countDistinct("l_orderkey").alias("n_orders"),
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("revenue")))
    w = Window.orderBy(F.desc("revenue"), F.asc("l_suppkey"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
            .select("l_suppkey", "n_orders", F.col("rank").cast("long").alias("rank")))


SQL_SOLE_SUPPLIER_ORDERS = """
WITH sole_orders AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING count(DISTINCT l_suppkey) = 1 AND count(*) >= 2
), per_supplier AS (
    SELECT l_suppkey,
           count(DISTINCT l_orderkey) AS n_orders,
           (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT l_orderkey FROM sole_orders)
    GROUP BY l_suppkey
)
SELECT l_suppkey, n_orders, rank FROM (
    SELECT l_suppkey, n_orders,
           row_number() OVER (ORDER BY revenue DESC, l_suppkey ASC) AS rank
    FROM per_supplier
) WHERE rank <= 10
"""


def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped: revenue from orders below 20% of the part's
    average quantity, for one brand. Plan shape: the per-part average
    is a groupBy(l_partkey) aggregate joined BACK to lineitem on the
    same key — AQE reuses one l_partkey exchange for both sides — and
    the brand filter rides a broadcast part dimension."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    thresh = (li.groupBy("l_partkey")
              .agg((F.lit(0.2) * F.avg("l_quantity")).alias("__qbar")))
    return (
        li.join(F.broadcast(p.where(F.col("p_brand") == "Brand#12")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("__qbar"))
        .agg((_dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
             F.count("*").alias("n_lines"))
    )


SQL_SMALL_QUANTITY_REVENUE = """
SELECT (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def q_bracketed_discount_revenue(spark, sf_dir):
    """TPC-H Q19-shaped: revenue under DISJUNCTIVE brand/size/quantity
    brackets — the OR-of-ANDs predicate family Catalyst must keep
    pushable. The part side broadcasts; the lineitem quantity bounds
    (the union of the brackets) are pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    pred = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (j.where(pred)
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


SQL_BRACKETED_DISCOUNT_REVENUE = """
SELECT (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_important_parts(spark, sf_dir):
    """TPC-H Q11-shaped (adapted — no partsupp table in the synthetic
    schema): parts whose revenue exceeds a FRACTION of total revenue,
    rolled up per brand. Plan shape: one groupBy(l_partkey) aggregate,
    a 1-row global total broadcast against it (scalar HAVING), and a
    broadcast part-dimension join for the brand rollup."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # part_rev is decimal-exact with <=13 significant digits, so the
    # double round-trips losslessly and the re-sums below stay exact
    rev = _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(rev.alias("part_rev"))
    total = per_part.agg(_dsum("part_rev").alias("__total"))
    important = (per_part.crossJoin(F.broadcast(total))
                 .where(F.col("part_rev") > 0.00075 * F.col("__total")))
    return (important
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_parts"),
                 _dsum("part_rev").alias("brand_rev")))


SQL_IMPORTANT_PARTS = """
WITH pr AS (
    SELECT l_partkey,
           (CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS part_rev
    FROM lineitem GROUP BY 1
)
SELECT p.p_brand, count(*) AS n_parts,
       (CAST(sum(CAST(floor((pr.part_rev) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS brand_rev
FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
WHERE pr.part_rev > 0.00075 * (SELECT (CAST(sum(CAST(floor((part_rev) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) FROM pr)
GROUP BY p.p_brand
"""


def q_asof_purchase_attribution(spark, sf_dir):
    """As-of join (operators/joins.py::asof_join — union + one window,
    NO join node, one shuffle on user_id): every purchase attributed
    to the user's most recent prior view. The oracle is DuckDB's
    native ASOF LEFT JOIN; gaps are compared in exact integer
    microseconds."""
    from dask_ml_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    j = asof_join(purchases, views, on="ts", by="user_id",
                  right_cols=["value"], suffix="_view")
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.count("ts_view").alias("n_attributed"),
                 F.sum(F.unix_micros("ts") - F.unix_micros("ts_view"))
                 .alias("gap_micros"),
                 _dsum("value_view").alias("attributed_value")))


SQL_ASOF_PURCHASE_ATTRIBUTION = """
WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
SELECT p.user_id,
       count(*) AS n_purchases,
       count(v.ts) AS n_attributed,
       CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS gap_micros,
       (CAST(sum(CAST(floor((v.value) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS attributed_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
GROUP BY p.user_id
"""


def q_interval_session_clicks(spark, sf_dir):
    """Bucketed range join (operators/joins.py::interval_join): clicks
    landing inside any [signup, signup + 1h] window of the same user.
    The bucketing turns the BETWEEN predicate into an equi hash join;
    the oracle runs the plain BETWEEN join."""
    from dask_ml_spark.operators.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    signups = (ev.where(F.col("event_type") == "signup")
               .select("user_id", F.col("ts").alias("s_ts"),
                       (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e_ts"),
                       F.col("event_id").alias("session_id")))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id"))
    j = interval_join(clicks, signups, point_col="ts", start_col="s_ts",
                      end_col="e_ts", by="user_id", bucket_width=3600.0)
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_pairs"),
                 F.countDistinct("event_id").alias("n_clicks"),
                 F.countDistinct("session_id").alias("n_sessions")))


SQL_INTERVAL_SESSION_CLICKS = """
WITH s AS (SELECT user_id, ts AS s_ts, ts + INTERVAL 1 HOUR AS e_ts,
                  event_id AS session_id
           FROM events WHERE event_type = 'signup'),
c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
SELECT c.user_id, count(*) AS n_pairs,
       count(DISTINCT c.event_id) AS n_clicks,
       count(DISTINCT s.session_id) AS n_sessions
FROM c JOIN s ON c.user_id = s.user_id AND c.ts BETWEEN s.s_ts AND s.e_ts
GROUP BY c.user_id
"""


def q_part_brand_stats(spark, sf_dir):
    """Grouped stats over the part dimension table (covers the
    part/supplier side of the schema)."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.avg("p_retailprice").alias("avg_price"),
        F.stddev_samp("p_retailprice").alias("std_price"),
        F.countDistinct("p_type").alias("n_types"),
    )


SQL_PART_BRAND_STATS = """
SELECT p_brand, count(*) AS n_parts, avg(p_retailprice) AS avg_price,
       stddev_samp(p_retailprice) AS std_price,
       count(DISTINCT p_type) AS n_types
FROM part
GROUP BY p_brand
"""



def q_forecast_metrics(spark, sf_dir):
    """Forecast-accuracy metrics (functions/metrics.py::smape_expr +
    the MASE construction): score the lag-7 seasonal-naive forecast of
    daily order revenue with sMAPE (scale-free, zero-crossing-safe)
    and MASE (error relative to the lag-1 naive — MASE < 1 beats it;
    Hyndman & Koehler 2006). Daily revenue uses the canonical
    fixed-point _dsum; forecast and naive denominators pair by INTEGER
    day equi-joins (the acf convention, no keyless window). One
    groupBy + two small self-joins + one aggregate, fully lazy."""
    from dask_ml_spark.functions.metrics import smape_expr

    o = _t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.datediff(F.col("o_orderdate"),
                                  F.lit("1992-01-01")).alias("__d"))
             .agg(_dsum("o_totalprice").alias("__rev")))
    fc = daily.select((F.col("__d") + 7).alias("__d"),
                      F.col("__rev").alias("__fc"))
    lag1 = daily.select((F.col("__d") + 1).alias("__d"),
                        F.col("__rev").alias("__prev"))
    scored = daily.join(fc, "__d")
    naive = daily.join(lag1, "__d").agg(
        F.avg(F.abs(F.col("__rev") - F.col("__prev"))).alias("den"),
        F.count(F.lit(1)).alias("n_naive"))
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_scored"),
        smape_expr(F.col("__rev"), F.col("__fc")).alias("smape"),
        F.avg(F.abs(F.col("__fc") - F.col("__rev"))).alias("num"))
    out = agg.crossJoin(F.broadcast(naive))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        "n_scored", "n_naive",
        r6(F.col("smape")).alias("smape"),
        r6(F.col("num") / F.col("den")).alias("mase"))


SQL_FORECAST_METRICS = """
WITH daily AS (
    SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS d,
           CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS rev
    FROM orders GROUP BY 1
), scored AS (
    SELECT a.rev AS y, f.rev AS fc
    FROM daily a JOIN daily f ON a.d = f.d + 7
), naive AS (
    SELECT avg(abs(a.rev - p.rev)) AS den, count(*)::BIGINT AS n_naive
    FROM daily a JOIN daily p ON a.d = p.d + 1
), agg AS (
    SELECT count(*)::BIGINT AS n_scored,
           avg(CASE WHEN abs(y) + abs(fc) > 0.0
                    THEN 2.0 * abs(fc - y) / (abs(y) + abs(fc))
                    ELSE 0.0 END) AS smape,
           avg(abs(fc - y)) AS num
    FROM scored
)
SELECT n_scored, n_naive,
       floor(smape * 1e6 + 0.5) / 1e6 AS smape,
       floor(num / den * 1e6 + 0.5) / 1e6 AS mase
FROM agg CROSS JOIN naive
"""


def catalog_queries():
    """This family's queries() entries (order preserved by __init__)."""
    return {
        "pricing_summary": q_pricing_summary,
        "top_revenue_nations": q_top_revenue_nations,
        "revenue_forecast": q_revenue_forecast,
        "forecast_metrics": q_forecast_metrics,
        "shipping_priority": q_shipping_priority,
        "order_priority_returns": q_order_priority_returns,
        "customer_returns_topk": q_customer_returns_topk,
        "event_props_json": q_event_props_json,
        "event_value_moving_avg": q_event_value_moving_avg,
        "local_supplier_volume": q_local_supplier_volume,
        "promo_revenue": q_promo_revenue,
        "large_orders": q_large_orders,
        "nation_volume_shipping": q_nation_volume_shipping,
        "customer_order_distribution": q_customer_order_distribution,
        "market_share": q_market_share,
        "product_profit": q_product_profit,
        "sales_cube": q_sales_cube,
        "daily_active_users": q_daily_active_users,
        "salted_join_revenue": q_salted_join_revenue,
        "part_size_histogram": q_part_size_histogram,
        "lineitem_correlations": q_lineitem_correlations,
        "weekly_retention": q_weekly_retention,
        "supplier_balance_quartiles": q_supplier_balance_quartiles,
        "event_funnel": q_event_funnel,
        "lang_source_pivot": q_lang_source_pivot,
        "idle_customers": q_idle_customers,
        "asof_purchase_attribution": q_asof_purchase_attribution,
        "small_quantity_revenue": q_small_quantity_revenue,
        "bracketed_discount_revenue": q_bracketed_discount_revenue,
        "important_parts": q_important_parts,
        "interval_session_clicks": q_interval_session_clicks,
        "sole_supplier_orders": q_sole_supplier_orders,
        "part_attribute_stats": q_part_attribute_stats,
        "view_click_attribution": q_view_click_attribution,
        "min_cost_supplier": q_min_cost_supplier,
        "late_shipment_priority": q_late_shipment_priority,
        "top_supplier_revenue": q_top_supplier_revenue,
        "part_supplier_variety": q_part_supplier_variety,
        "dominant_part_suppliers": q_dominant_part_suppliers,
        "windowed_event_features": q_windowed_event_features,
        "event_type_rollup": q_event_type_rollup,
        "event_sessionization": q_event_sessionization,
        "part_brand_stats": q_part_brand_stats,
        "time_fill_events": q_time_fill_events,
    }


def catalog_oracles():
    """This family's oracle_sql() entries — built lazily at call time,
    exactly as the original build_catalog did."""
    return {
        "pricing_summary": SQL_PRICING_SUMMARY,
        "top_revenue_nations": SQL_TOP_REVENUE_NATIONS,
        "revenue_forecast": SQL_REVENUE_FORECAST,
        "forecast_metrics": SQL_FORECAST_METRICS,
        "shipping_priority": SQL_SHIPPING_PRIORITY,
        "order_priority_returns": SQL_ORDER_PRIORITY_RETURNS,
        "customer_returns_topk": SQL_CUSTOMER_RETURNS_TOPK,
        "event_props_json": SQL_EVENT_PROPS_JSON,
        "event_value_moving_avg": SQL_EVENT_VALUE_MOVING_AVG,
        "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
        "promo_revenue": SQL_PROMO_REVENUE,
        "large_orders": SQL_LARGE_ORDERS,
        "nation_volume_shipping": SQL_NATION_VOLUME_SHIPPING,
        "market_share": SQL_MARKET_SHARE,
        "product_profit": SQL_PRODUCT_PROFIT,
        "customer_order_distribution": SQL_CUSTOMER_ORDER_DISTRIBUTION,
        "sales_cube": SQL_SALES_CUBE,
        "daily_active_users": SQL_DAILY_ACTIVE_USERS,
        "salted_join_revenue": SQL_SALTED_JOIN_REVENUE,
        "part_size_histogram": SQL_PART_SIZE_HISTOGRAM,
        "lineitem_correlations": _sql_lineitem_correlations(),
        "weekly_retention": SQL_WEEKLY_RETENTION,
        "supplier_balance_quartiles": SQL_SUPPLIER_BALANCE_QUARTILES,
        "event_funnel": SQL_EVENT_FUNNEL,
        "lang_source_pivot": SQL_LANG_SOURCE_PIVOT,
        "idle_customers": SQL_IDLE_CUSTOMERS,
        "asof_purchase_attribution": SQL_ASOF_PURCHASE_ATTRIBUTION,
        "small_quantity_revenue": SQL_SMALL_QUANTITY_REVENUE,
        "bracketed_discount_revenue": SQL_BRACKETED_DISCOUNT_REVENUE,
        "important_parts": SQL_IMPORTANT_PARTS,
        "interval_session_clicks": SQL_INTERVAL_SESSION_CLICKS,
        "sole_supplier_orders": SQL_SOLE_SUPPLIER_ORDERS,
        "part_attribute_stats": SQL_PART_ATTRIBUTE_STATS,
        "view_click_attribution": SQL_VIEW_CLICK_ATTRIBUTION,
        "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
        "late_shipment_priority": SQL_LATE_SHIPMENT_PRIORITY,
        "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
        "part_supplier_variety": SQL_PART_SUPPLIER_VARIETY,
        "dominant_part_suppliers": SQL_DOMINANT_PART_SUPPLIERS,
        "windowed_event_features": SQL_WINDOWED_EVENT_FEATURES,
        "event_type_rollup": SQL_EVENT_TYPE_ROLLUP,
        "event_sessionization": SQL_EVENT_SESSIONIZATION,
        "part_brand_stats": SQL_PART_BRAND_STATS,
        "time_fill_events": SQL_TIME_FILL_EVENTS,
    }
