"""The engine's query catalog: every entry pairs a Spark DataFrame
plan (exercising the package operators) with an ANSI-SQL oracle that
DuckDB can run on the same parquet tables.

This is the correctness surface for SURVEY.md §2 plus the
beyond-reference datapipe operators. Column names AND types are
aligned between the Spark plan and the oracle (the driver hash
compares after sorting columns by name).

CANONICAL DOUBLE AGGREGATION (r10 convention, grep: _dsum/_davg):
every OUTPUT column that sums or averages a double measure at
revenue/price scale accumulates in exact int64 FIXED-POINT (1e-4
units) in BOTH engines, then converts to double once:

    Spark:  _dsum(e) = sum(floor(e*10000 + 0.5)::long)::double / 1e4
            _davg(e) = _dsum(e) / count(e)
    SQL:    CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                 AS DOUBLE) / 10000
            ... / count(e)

Integer addition is exact and associative, so NO plan-shape change
(salting, AQE re-plan, partial-agg reorder, join strategy swap) can
move the output bits — unlike raw double sums, whose partial-sum
association order drifts ~n*eps*Σ (≈1e-3 on 1e9-scale revenues at
sf0.1, straddling the driver's 1e-6 rounding grid; this flipped
salted_join_revenue red in round 9). floor on a bit-identical double
needs no cross-engine rounding-mode agreement (a DECIMAL(18,4) cast
hits exact .xxxx50 midpoints where Spark's HALF_UP and DuckDB
disagree — measured on sum_charge), and the int64 sum benchmarked as
fast as a raw double sum where decimal aggregation was 3-4x slower.
Exactness bound: |Σ| < 2^63 fixed-point units ≈ 9.2e14 currency units
— headroom through ~SF 1000; a true 100 TB GLOBAL rollup should widen
to sum(CAST(e AS DECIMAL(18,4))) (same bit-stability, slower, 1e34
headroom). Ratios of big sums (r², market share, correlations)
self-normalize (relative drift ~1e-11) and stay raw doubles.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_ml_spark.datapipe import dedup as DD
from dask_ml_spark.datapipe import text_stats as TS

LINEITEM_FEATS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
TOKEN_RE_SQL = "[a-z0-9_]{2,}"
def _dsum(col):
    """Order-independent sum of a double measure: exact int64
    fixed-point (1e-4 unit) accumulation — immune to any plan-shape
    change, no cross-engine rounding-mode dependence (floor of a
    bit-identical double), and benchmarked as fast as a raw double sum
    (DECIMAL aggregation was 3-4x slower). Exact while |Σ| < 2^63
    units ≈ 9.2e14 currency units (see module docstring).
    SQL twin: CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000."""
    if isinstance(col, str):
        col = F.col(col)
    return (F.sum(F.floor(col * 10000 + F.lit(0.5)).cast("long"))
            .cast("double") / F.lit(10000))


def _davg(col):
    """Order-independent mean: exact fixed-point sum / non-null count.
    SQL twin: CAST(sum(CAST(floor(e * 10000 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000 / count(e)."""
    if isinstance(col, str):
        col = F.col(col)
    return _dsum(col) / F.count(col)


def _dsum_wide(col):
    """_dsum for LARGE-magnitude summands (squared errors ~1e8-1e10 per
    row): the int64 fixed-point sum would cross 2^63 around sf1
    (silently wrapping in Spark, erroring in DuckDB — review-caught),
    so accumulate in DECIMAL(27,4) instead (1e23-unit headroom).
    floor-to-grid FIRST keeps the decimal cast tie-free: the floored
    double sits within half an ulp of an exact 1e-4-grid value, far
    from any .xxxx50 midpoint where the engines' cast rounding modes
    disagree. SQL twin:
    CAST(sum(CAST(floor(e * 10000 + 0.5) / 10000
                  AS DECIMAL(27,4))) AS DOUBLE)."""
    if isinstance(col, str):
        col = F.col(col)
    return (F.sum((F.floor(col * 10000 + F.lit(0.5)) / 10000)
                  .cast("decimal(27,4)")).cast("double"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dask_ml_spark.sources.io import load_table

    return load_table(spark, sf_dir, name)


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


def q_hash_split_train_stats(spark, sf_dir):
    """Deterministic content-addressed train/test split: the bucket is
    a pure arithmetic function of the row key (portable across engines
    and partitionings — unlike rand(seed)), so the oracle verifies the
    exact split CONTENT, not just its size."""
    from dask_ml_spark.plans.model_selection import hash_split

    li = _t(spark, sf_dir, "lineitem")
    train, test = hash_split(li, ["l_orderkey", "l_linenumber"], test_size=0.25)
    t1 = train.agg(F.count("*").alias("n"), _dsum("l_extendedprice").alias("sum_price"),
                   F.lit("train").alias("side"))
    t2 = test.agg(F.count("*").alias("n"), _dsum("l_extendedprice").alias("sum_price"),
                  F.lit("test").alias("side"))
    return t1.unionAll(t2)


SQL_HASH_SPLIT_TRAIN_STATS = """
WITH b AS (
    SELECT l_extendedprice,
           ((((0 + l_orderkey) % 2147483648) * 2654435761 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761 % 2147483648 % 10000 AS bucket
    FROM lineitem
)
SELECT count(*) AS n,
       (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_price,
       'train' AS side
FROM b WHERE bucket < 7500
UNION ALL
SELECT count(*) AS n,
       (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_price,
       'test' AS side
FROM b WHERE bucket >= 7500
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


# =====================================================================
# preprocessing operators (SURVEY §2.3)
# =====================================================================

def q_standard_scaler_fit(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = StandardScaler().fit(li, LINEITEM_FEATS)
    row = {}
    for i, c in enumerate(LINEITEM_FEATS):
        row[f"mean_{c}"] = float(sc.mean_[i])
        # extendedprice variance is ~5e8: cross-engine co-moment drift
        # sits near the rounded gate's grid, so snap it to 2 decimals on
        # both sides (same canonicalization as gaussian_nb_fit's
        # var_price); the O(1)-magnitude variances stay raw
        v = float(sc.var_[i])
        row[f"var_{c}"] = round(v, 2) if c == "l_extendedprice" else v
    return spark.createDataFrame([row]).select(*sorted(row))


SQL_STANDARD_SCALER_FIT = "SELECT " + ", ".join(
    f"avg({c}) AS mean_{c}, "
    + (f"round(var_pop({c}), 2) AS var_{c}" if c == "l_extendedprice"
       else f"var_pop({c}) AS var_{c}")
    for c in LINEITEM_FEATS
) + " FROM lineitem"


def q_standard_scaler_transform(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = StandardScaler().fit(li, ["l_quantity", "l_extendedprice"])
    return sc.transform(li).select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("scaled_quantity"),
        F.col("l_extendedprice").alias("scaled_price"),
    )


SQL_STANDARD_SCALER_TRANSFORM = """
SELECT l_orderkey, l_linenumber,
       (l_quantity - avg(l_quantity) OVER ()) / stddev_pop(l_quantity) OVER () AS scaled_quantity,
       (l_extendedprice - avg(l_extendedprice) OVER ()) / stddev_pop(l_extendedprice) OVER () AS scaled_price
FROM lineitem
"""


def q_minmax_scaler_fit(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import MinMaxScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = MinMaxScaler().fit(li, LINEITEM_FEATS)
    row = {}
    for i, c in enumerate(LINEITEM_FEATS):
        row[f"min_{c}"] = float(sc.data_min_[i])
        row[f"max_{c}"] = float(sc.data_max_[i])
    return spark.createDataFrame([row]).select(*sorted(row))


SQL_MINMAX_SCALER_FIT = "SELECT " + ", ".join(
    f"min({c})::DOUBLE AS min_{c}, max({c})::DOUBLE AS max_{c}" for c in LINEITEM_FEATS
) + " FROM lineitem"


def q_robust_scaler_fit(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import RobustScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = RobustScaler().fit(li, ["l_quantity", "l_extendedprice"])
    return spark.createDataFrame([{
        "center_l_quantity": float(sc.center_[0]),
        "iqr_l_quantity": float(sc.scale_[0]),
        "center_l_extendedprice": float(sc.center_[1]),
        "iqr_l_extendedprice": float(sc.scale_[1]),
    }]).select("center_l_quantity", "iqr_l_quantity", "center_l_extendedprice", "iqr_l_extendedprice")


SQL_ROBUST_SCALER_FIT = """
SELECT quantile_cont(l_quantity, 0.5) AS center_l_quantity,
       quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25) AS iqr_l_quantity,
       quantile_cont(l_extendedprice, 0.5) AS center_l_extendedprice,
       quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25) AS iqr_l_extendedprice
FROM lineitem
"""


def q_simple_imputer_fit(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import SimpleImputer

    li = _t(spark, sf_dir, "lineitem")
    mean_imp = SimpleImputer(strategy="mean").fit(li, ["l_quantity", "l_discount"])
    # exact=True: the DuckDB oracle is quantile_cont; the API default is
    # percentile_approx (matches reference approximate-quantile semantics)
    med_imp = SimpleImputer(strategy="median", exact=True).fit(li, ["l_quantity"])
    return spark.createDataFrame([{
        "mean_l_quantity": float(mean_imp.statistics_["l_quantity"]),
        "mean_l_discount": float(mean_imp.statistics_["l_discount"]),
        "median_l_quantity": float(med_imp.statistics_["l_quantity"]),
    }]).select("mean_l_quantity", "mean_l_discount", "median_l_quantity")


SQL_SIMPLE_IMPUTER_FIT = """
SELECT avg(l_quantity) AS mean_l_quantity,
       avg(l_discount) AS mean_l_discount,
       quantile_cont(l_quantity, 0.5) AS median_l_quantity
FROM lineitem
"""


# =====================================================================
# encoders (SURVEY §2.3)
# =====================================================================

def q_label_encoder_fit(spark, sf_dir):
    from dask_ml_spark.operators.encoders import LabelEncoder

    o = _t(spark, sf_dir, "orders")
    le = LabelEncoder().fit(o, "o_orderpriority")
    return spark.createDataFrame(
        [(v, i) for i, v in enumerate(le.classes_.tolist())], ["label", "code"]
    ).select(F.col("label"), F.col("code").cast("int").alias("code"))


SQL_LABEL_ENCODER_FIT = """
SELECT o_orderpriority AS label,
       CAST(row_number() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS code
FROM (SELECT DISTINCT o_orderpriority FROM orders)
"""


def q_label_encoder_transform(spark, sf_dir):
    from dask_ml_spark.operators.encoders import LabelEncoder

    o = _t(spark, sf_dir, "orders")
    le = LabelEncoder().fit(o, "o_orderpriority")
    return le.transform(o, "priority_code").select("o_orderkey", "o_orderpriority", "priority_code")


SQL_LABEL_ENCODER_TRANSFORM = """
SELECT o_orderkey, o_orderpriority,
       CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS priority_code
FROM orders
"""


def q_ordinal_encoder(spark, sf_dir):
    from dask_ml_spark.operators.encoders import OrdinalEncoder

    o = _t(spark, sf_dir, "orders")
    oe = OrdinalEncoder().fit(o, ["o_orderstatus", "o_orderpriority"])
    return oe.transform(o).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_code"),
        F.col("o_orderpriority").alias("priority_code"),
    )


SQL_ORDINAL_ENCODER = """
SELECT o_orderkey,
       CAST(dense_rank() OVER (ORDER BY o_orderstatus) - 1 AS INTEGER) AS status_code,
       CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS priority_code
FROM orders
"""


def q_dummy_encoder(spark, sf_dir):
    from dask_ml_spark.operators.encoders import DummyEncoder

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    de = DummyEncoder().fit(o, ["o_orderstatus"])
    out = de.transform(o)
    return out.select(
        "o_orderkey",
        *[F.col(c).cast("int").alias(c) for c in de.transformed_columns_],
    )


def sql_dummy_encoder(categories) -> str:
    cases = ", ".join(
        f"CASE WHEN o_orderstatus = '{v}' THEN 1 ELSE 0 END AS o_orderstatus_{v}"
        for v in categories
    )
    return f"SELECT o_orderkey, {cases} FROM orders"


def q_polynomial_features(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import PolynomialFeatures

    li = _t(spark, sf_dir, "lineitem")
    pf = PolynomialFeatures(degree=2, include_bias=False).fit(li, ["l_quantity", "l_discount"])
    out = pf.transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity^2").alias("q2"),
        F.col("l_quantity l_discount").alias("qd"),
        F.col("l_discount^2").alias("d2"),
    )


SQL_POLYNOMIAL_FEATURES = """
SELECT l_orderkey, l_linenumber,
       l_quantity * l_quantity AS q2,
       l_quantity * l_discount AS qd,
       l_discount * l_discount AS d2
FROM lineitem
"""


PAIRWISE_CENTERS = [[10.0, 30000.0], [40.0, 70000.0]]


def q_pairwise_distance_to_centers(spark, sf_dir):
    """Arrow-batched pandas-UDF pairwise distances vs a broadcast Y —
    checked against pure-SQL sqrt expressions (validates the UDF
    path's numerics, not just JVM expressions)."""
    from dask_ml_spark.operators.pairwise import pairwise_distances

    li = _t(spark, sf_dir, "lineitem")
    out = pairwise_distances(li, ["l_quantity", "l_extendedprice"], PAIRWISE_CENTERS)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.element_at("distances", 1).alias("dist_0"),
        F.element_at("distances", 2).alias("dist_1"),
    )


SQL_PAIRWISE_DISTANCE_TO_CENTERS = f"""
SELECT l_orderkey, l_linenumber,
       sqrt(pow(l_quantity - {PAIRWISE_CENTERS[0][0]}, 2) + pow(l_extendedprice - {PAIRWISE_CENTERS[0][1]}, 2)) AS dist_0,
       sqrt(pow(l_quantity - {PAIRWISE_CENTERS[1][0]}, 2) + pow(l_extendedprice - {PAIRWISE_CENTERS[1][1]}, 2)) AS dist_1
FROM lineitem
"""


def q_minmax_scaler_transform(spark, sf_dir):
    from dask_ml_spark.operators.preprocessing import MinMaxScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = MinMaxScaler().fit(li, ["l_quantity"])
    return sc.transform(li).select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("scaled_quantity")
    )


SQL_MINMAX_SCALER_TRANSFORM = """
SELECT l_orderkey, l_linenumber,
       (l_quantity - min(l_quantity) OVER ()) / (max(l_quantity) OVER () - min(l_quantity) OVER ()) AS scaled_quantity
FROM lineitem
"""


# =====================================================================
# grouped statistics / models (SURVEY §2.3/2.4)
# =====================================================================

def q_gaussian_nb_fit(spark, sf_dir):
    from dask_ml_spark.operators.naive_bayes import GaussianNB

    li = _t(spark, sf_dir, "lineitem")
    nb = GaussianNB(var_smoothing=0.0).fit(
        li, ["l_quantity", "l_extendedprice", "l_discount"], label_col="l_returnflag"
    )
    rows = []
    for ci, cls in enumerate(nb.classes_.tolist()):
        rows.append({
            "l_returnflag": cls,
            "n": int(nb.class_count_[ci]),
            "mean_quantity": float(nb.theta_[ci][0]),
            "mean_price": float(nb.theta_[ci][1]),
            "mean_discount": float(nb.theta_[ci][2]),
            "var_quantity": float(nb.var_[ci][0]),
            # extendedprice variance is ~4e8: cross-engine drift (~2e-7
            # abs) sits within 4x of the rounded gate's 1e-6 granularity,
            # so snap it to 2 decimals on both sides
            "var_price": round(float(nb.var_[ci][1]), 2),
            "var_discount": float(nb.var_[ci][2]),
        })
    return spark.createDataFrame(rows).select(
        "l_returnflag", F.col("n").cast("long").alias("n"),
        "mean_quantity", "mean_price", "mean_discount",
        "var_quantity", "var_price", "var_discount",
    )


SQL_GAUSSIAN_NB_FIT = """
SELECT l_returnflag,
       count(*) AS n,
       avg(l_quantity) AS mean_quantity,
       avg(l_extendedprice) AS mean_price,
       avg(l_discount) AS mean_discount,
       var_pop(l_quantity) AS var_quantity,
       round(var_pop(l_extendedprice), 2) AS var_price,
       var_pop(l_discount) AS var_discount
FROM lineitem
GROUP BY l_returnflag
"""


def q_simple_ols_fit(spark, sf_dir):
    """Closed-form simple linear regression (quantity ~ extendedprice)
    via regr_* aggregates — the GLM family's SQL-checkable member."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.regr_slope(F.col("l_quantity"), F.col("l_extendedprice")).alias("slope"),
        F.regr_intercept(F.col("l_quantity"), F.col("l_extendedprice")).alias("intercept"),
        F.regr_r2(F.col("l_quantity"), F.col("l_extendedprice")).alias("r2"),
    )


SQL_SIMPLE_OLS_FIT = """
SELECT regr_slope(l_quantity, l_extendedprice) AS slope,
       regr_intercept(l_quantity, l_extendedprice) AS intercept,
       regr_r2(l_quantity, l_extendedprice) AS r2
FROM lineitem
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


def q_ols_newton_fit(spark, sf_dir):
    """Distributed Newton solver (operators/solvers.py) on a 2-feature
    OLS. For the gaussian family Newton solves the normal equations
    exactly in one step, so DuckDB's Cramer-rule solution of the same
    system is a tight oracle — this checks the distributed
    gradient/Hessian aggregation end-to-end, not just SQL parity."""
    from dask_ml_spark.linear_model import LinearRegression

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        F.col("l_tax").cast("double").alias("x2"),
        F.col("l_discount").cast("double").alias("label"),
    )
    m = LinearRegression(penalty="none", solver="newton", max_iter=2).fit(
        li, ["x1", "x2"])
    return spark.createDataFrame(
        [(float(m.coef_[0]), float(m.coef_[1]), float(m.intercept_))],
        "coef_x1 double, coef_x2 double, intercept double")


SQL_OLS_NEWTON_FIT = """
WITH d AS (
  SELECT l_quantity/50.0 AS x1, l_tax AS x2, l_discount AS y FROM lineitem
), s AS (
  SELECT count(*)::DOUBLE AS n,
         sum(x1*x1) AS a11, sum(x1*x2) AS a12, sum(x1) AS a13,
         sum(x2*x2) AS a22, sum(x2) AS a23,
         sum(x1*y) AS b1, sum(x2*y) AS b2, sum(y) AS b3
  FROM d
), m AS (
  SELECT *,
    a11*(a22*n - a23*a23) - a12*(a12*n - a23*a13) + a13*(a12*a23 - a22*a13) AS det
  FROM s
)
SELECT
  (b1*(a22*n - a23*a23) - a12*(b2*n - a23*b3) + a13*(b2*a23 - a22*b3)) / det AS coef_x1,
  (a11*(b2*n - a23*b3) - b1*(a12*n - a23*a13) + a13*(a12*b3 - b2*a13)) / det AS coef_x2,
  (a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13)) / det AS intercept
FROM m
"""


def q_logistic_newton_fit(spark, sf_dir):
    """Distributed Newton-IRLS logistic fit on a SATURATED model (one
    binary feature): the MLE has the closed form beta0 = logit(P(y|x=0)),
    beta1 = logit(P(y|x=1)) - beta0, so plain SQL group means are an
    exact oracle for the iterative distributed solver."""
    from dask_ml_spark.linear_model import LogisticRegression

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") > 0.05).cast("double").alias("x"),
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
    )
    m = LogisticRegression(penalty="none", solver="newton",
                           max_iter=25, tol=1e-14).fit(li, ["x"])
    return spark.createDataFrame(
        [(float(m.coef_[0]), float(m.intercept_))], "coef_x double, intercept double")


SQL_LOGISTIC_NEWTON_FIT = """
WITH g AS (
  SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS x,
         avg(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS p
  FROM lineitem GROUP BY 1
)
SELECT (SELECT ln(p/(1-p)) FROM g WHERE x = 1) - (SELECT ln(p/(1-p)) FROM g WHERE x = 0) AS coef_x,
       (SELECT ln(p/(1-p)) FROM g WHERE x = 0) AS intercept
"""


def q_poisson_newton_fit(spark, sf_dir):
    """Distributed Newton-IRLS Poisson fit, saturated single-binary-
    feature model: MLE closed form beta0 = ln(mean(y|x=0)), beta1 =
    ln(mean(y|x=1)) - beta0 — SQL group means oracle the solver."""
    from dask_ml_spark.linear_model import PoissonRegression

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("x"),
        F.col("l_quantity").cast("double").alias("label"),
    )
    m = PoissonRegression(solver="newton", max_iter=25, tol=1e-14,
                          C=float("inf")).fit(li, ["x"])
    return spark.createDataFrame(
        [(float(m.coef_[0]), float(m.intercept_))], "coef_x double, intercept double")


SQL_POISSON_NEWTON_FIT = """
WITH g AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS x,
         avg(l_quantity) AS m
  FROM lineitem GROUP BY 1
)
SELECT (SELECT ln(m) FROM g WHERE x = 1) - (SELECT ln(m) FROM g WHERE x = 0) AS coef_x,
       (SELECT ln(m) FROM g WHERE x = 0) AS intercept
"""


def q_repetition_scores(spark, sf_dir):
    """Gopher-style repetition quality signals (datapipe/text_stats.py
    ::repetition_scores): duplicate-line fraction + top-bigram
    fraction per document."""
    from dask_ml_spark.datapipe.text_stats import repetition_scores

    docs = _t(spark, sf_dir, "documents")
    out = repetition_scores(docs)
    # Fractions rounded to 6 digits and counts cast to BIGINT on BOTH
    # engines: the driver's value-hash is bit-exact, and round-1 showed
    # unrounded floats / DuckDB HUGEINT sums are canonicalization hazards.
    return out.select(
        "doc_id", F.col("n_lines").cast("long").alias("n_lines"),
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"))


# Oracle avoids list_distinct/list_filter (semantics drifted across
# DuckDB releases) — plain unnest + WHERE + count(DISTINCT) instead.
SQL_REPETITION_SCORES = f"""
WITH lc AS (
  SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS n_distinct_lines
  FROM (SELECT doc_id, trim(l) AS line
        FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents))
  WHERE length(line) > 0
  GROUP BY doc_id
), base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
  FROM documents
), bi AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks)-1),
                                  i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bigrams
  FROM base
), counts AS (
  SELECT doc_id,
         coalesce(max(c), 0) AS top_bigram_count,
         coalesce(sum(c), 0) AS n_bigrams
  FROM (SELECT doc_id, bigram, count(*) AS c
        FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM bi)
        GROUP BY doc_id, bigram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(lc.n_lines, 0) AS BIGINT) AS n_lines,
       round(coalesce((lc.n_lines - lc.n_distinct_lines)
                      / greatest(lc.n_lines, 1)::DOUBLE, 0.0), 6) AS dup_line_frac,
       CAST(coalesce(counts.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(counts.top_bigram_count, 0)
             / greatest(coalesce(counts.n_bigrams, 0), 1)::DOUBLE, 6) AS top_bigram_frac
FROM documents d
LEFT JOIN lc ON d.doc_id = lc.doc_id
LEFT JOIN counts ON d.doc_id = counts.doc_id
"""


BM25_QUERY_TERMS = ["the", "data", "model", "and"]


def q_bm25_scores(spark, sf_dir):
    """BM25 lexical retrieval (datapipe/text_stats.py::bm25_scores)
    over the documents table for a fixed query-term bag."""
    from dask_ml_spark.datapipe.text_stats import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return bm25_scores(docs, BM25_QUERY_TERMS).select(
        "doc_id", "bm25",
        F.col("n_matched_terms").cast("long").alias("n_matched_terms"))


def _sql_bm25_scores() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_QUERY_TERMS)))
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl, toks FROM d
), s AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
  WHERE term IN ({terms})
  GROUP BY 1, 2, 3
), dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
)
SELECT doc_id,
       sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * tf * (1.2 + 1.0)
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS bm25,
       count(*) AS n_matched_terms
FROM tf JOIN dfq USING (term) CROSS JOIN s
GROUP BY doc_id
"""


SQL_BM25_SCORES = _sql_bm25_scores()


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS (datapipe/dedup.py::duplicate_clusters):
    connected components by min-label propagation over the minhash-LSH
    pair list — the actionable form of dedup (one representative per
    group). Oracle: DuckDB recursive CTE computing min-reachable-id
    over the same (oracle-checked) pair SQL."""
    from dask_ml_spark.datapipe import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, n_hashes=8, bands=4)
    cl = DD.duplicate_clusters(pairs)
    return (cl.groupBy("cluster")
            .agg(F.count("*").alias("n_members"),
                 F.sum("node").alias("member_checksum")))


def _sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE pairs AS ({sql_minhash_lsh_pairs(8, 4)}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.node
)
SELECT cluster, count(*) AS n_members,
       CAST(sum(node) AS BIGINT) AS member_checksum
FROM (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
GROUP BY cluster
"""


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing (datapipe/packing.py::redact_pii): emails /
    phone-runs / IPv4 replaced by [TYPE] tokens, per-type counts for
    audit. Patterns are lookaround-free so the SAME regex runs on
    Spark (Java) and DuckDB (RE2)."""
    from dask_ml_spark.datapipe.packing import redact_pii

    docs = _t(spark, sf_dir, "documents")
    out = redact_pii(docs)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.md5("redacted_text").alias("redacted_md5"))


def _sql_pii_redaction() -> str:
    from dask_ml_spark.datapipe.packing import PII_PATTERNS

    em, ph, ip = PII_PATTERNS["email"], PII_PATTERNS["phone"], PII_PATTERNS["ipv4"]
    return f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{em}')) AS n_email,
         regexp_replace(text, '{em}', '[EMAIL]', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '{ph}')) AS n_phone,
         regexp_replace(t1, '{ph}', '[PHONE]', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_email, n_phone,
       len(regexp_extract_all(t2, '{ip}')) AS n_ipv4,
       md5(regexp_replace(t2, '{ip}', '[IPV4]', 'g')) AS redacted_md5
FROM s2
"""


def q_token_shards(spark, sf_dir):
    """Token-budget shard packing (datapipe/packing.py::
    pack_token_shards): distributed prefix sum over the doc-id-ordered
    token stream, shard = floor(start_offset / 512). Oracle = the same
    running sum as a SQL window."""
    from dask_ml_spark.datapipe.packing import pack_token_shards

    docs = _t(spark, sf_dir, "documents")
    out = pack_token_shards(docs, budget=512)
    return out.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      "shard")


SQL_TOKEN_SHARDS = f"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{{TOKEN_RE}}')) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM c
)
SELECT doc_id, n_tokens, CAST(floor(start_offset / 512) AS BIGINT) AS shard
FROM o
""".replace("{TOKEN_RE}", TOKEN_RE_SQL)


def q_sequence_packing(spark, sf_dir):
    """Fixed-length training-sequence chunking
    (datapipe/packing.py::pack_sequences): each document's global
    token span is cut at 256-token sequence boundaries; one row per
    (doc, overlapped sequence) with the local token slice. Exact
    arithmetic over the distributed prefix sum — fully oracled."""
    from dask_ml_spark.datapipe.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=256).select(
        "doc_id", "seq_id", "tok_start", "tok_end")


SQL_SEQUENCE_PACKING = f"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{{TOKEN_RE}}'))::BIGINT AS n
  FROM documents
), o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
  FROM c
), chunks AS (
  SELECT doc_id, n, s,
         unnest(generate_series(s // 256, (s + n - 1) // 256)) AS seq_id
  FROM o WHERE n > 0
)
SELECT doc_id, seq_id,
       greatest(0, seq_id * 256 - s) AS tok_start,
       least(n, (seq_id + 1) * 256 - s) AS tok_end
FROM chunks
""".replace("{TOKEN_RE}", TOKEN_RE_SQL)


BM25_TOPK_QUERIES = {
    "q_common": ["the", "and", "of"],
    "q_data": ["data", "model", "training"],
}


def q_bm25_topk(spark, sf_dir):
    """Batch BM25 retrieval (datapipe/text_stats.py::bm25_topk): top-10
    documents for each query bag, all query bags sharing one corpus
    pass."""
    from dask_ml_spark.datapipe.text_stats import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    out = bm25_topk(docs, BM25_TOPK_QUERIES, k=10)
    return out.select("query_id", "doc_id", "bm25",
                      F.col("rank").cast("long").alias("rank"))


def _sql_bm25_topk() -> str:
    all_terms = sorted({t for ts in BM25_TOPK_QUERIES.values() for t in ts})
    terms = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(f"('{qid}', '{t}')"
                      for qid, ts in sorted(BM25_TOPK_QUERIES.items())
                      for t in sorted(set(ts)))
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl, toks FROM d
), s AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
  WHERE term IN ({terms})
  GROUP BY 1, 2, 3
), dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
), q(query_id, term) AS (VALUES {qvals}),
scored AS (
  SELECT query_id, doc_id,
         sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * (1.2 + 1.0)
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS bm25
  FROM tf JOIN dfq USING (term) JOIN q USING (term) CROSS JOIN s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


def q_incremental_pca_fit(spark, sf_dir):
    """IncrementalPCA (reference incremental_pca.py:36-427) fed three
    disjoint batches. Moment accumulation is exact, so the learned mean
    is SQL's avg() and the eigenvalue SUM is the covariance trace
    (= Σ var_samp) — an oracle over the batch-sequential path without
    needing SQL to eigendecompose."""
    from dask_ml_spark.operators.decomposition import IncrementalPCA

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ipca = IncrementalPCA()
    for b in range(3):
        ipca.partial_fit(li.where(F.col("l_linenumber") % 3 == b), cols)
    # Canonicalization: batch-merged moments differ from the single-pass
    # oracle at ~1e-14 relative, and column MEANS (sum/60000) can land
    # exactly on decimal rounding ties (e.g. avg(l_discount) =
    # 2995.11/60000 = 0.0499185), so we emit mean_*n (the column sums,
    # true values are multiples of 0.01 — rounding to 2 decimals snaps
    # both engines to the same double, never near a tie) and the
    # variance trace rounded to 1e-2 abs ≈ 1e-11 rel.
    n = float(ipca.n_samples_seen_)
    row = ([round(float(v) * n, 2) for v in ipca.mean_]
           + [round(float(ipca.explained_variance_.sum()), 2), n])
    return spark.createDataFrame(
        [tuple(row)],
        ", ".join(f"sum_{c} double" for c in cols) + ", total_var double, n double")


SQL_INCREMENTAL_PCA_FIT = """
SELECT round(avg(l_quantity) * count(*), 2) AS sum_l_quantity,
       round(avg(l_extendedprice) * count(*), 2) AS sum_l_extendedprice,
       round(avg(l_discount) * count(*), 2) AS sum_l_discount,
       round(avg(l_tax) * count(*), 2) AS sum_l_tax,
       round(var_samp(l_quantity) + var_samp(l_extendedprice)
         + var_samp(l_discount) + var_samp(l_tax), 2) AS total_var,
       count(*)::DOUBLE AS n
FROM lineitem
"""


def q_pca_covariance(spark, sf_dir):
    """The distributed half of PCA.fit — the covariance matrix (the
    driver-side eigh consumes exactly these numbers)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = LINEITEM_FEATS
    aggs = []
    for i, ci in enumerate(cols):
        for j in range(i, len(cols)):
            c = F.covar_samp(F.col(ci), F.col(cols[j]))
            # cov_1_1 (extendedprice variance) is ~5e8 — snap to 2
            # decimals on both sides (standard_scaler_fit precedent);
            # every other entry is <=1e5 and safe raw
            if i == 1 and j == 1:
                c = F.round(c, 2)
            aggs.append(c.alias(f"cov_{i}_{j}"))
    return li.agg(*aggs)


def _sql_pca_covariance() -> str:
    cols = LINEITEM_FEATS
    parts = []
    for i, ci in enumerate(cols):
        for j in range(i, len(cols)):
            e = f"covar_samp({ci}, {cols[j]})"
            if i == 1 and j == 1:
                e = f"round({e}, 2)"
            parts.append(f"{e} AS cov_{i}_{j}")
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


SQL_PCA_COVARIANCE = _sql_pca_covariance()


# =====================================================================
# metrics (SURVEY §2.5)
# =====================================================================

def q_classification_metrics(spark, sf_dir):
    """accuracy / log_loss on a deterministic rule-based 'prediction'
    (label = returnflag=='R', score = discount-based)."""
    from dask_ml_spark.functions.metrics import accuracy_expr, log_loss_expr

    li = _t(spark, sf_dir, "lineitem")
    y = (F.col("l_returnflag") == "R").cast("double")
    p = F.least(F.greatest(F.col("l_discount") * 8, F.lit(0.01)), F.lit(0.99))
    pred = (p > 0.4).cast("double")
    return li.agg(
        accuracy_expr(y, pred).alias("accuracy"),
        log_loss_expr(y, p).alias("log_loss"),
        F.count("*").alias("n"),
    )


SQL_CLASSIFICATION_METRICS = """
SELECT avg(CASE WHEN (CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) =
                     (CASE WHEN least(greatest(l_discount * 8, 0.01), 0.99) > 0.4 THEN 1.0 ELSE 0.0 END)
           THEN 1.0 ELSE 0.0 END) AS accuracy,
       avg(-( (CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) * ln(least(greatest(l_discount * 8, 0.01), 0.99))
            + (1 - (CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)) * ln(1 - least(greatest(l_discount * 8, 0.01), 0.99)))) AS log_loss,
       count(*) AS n
FROM lineitem
"""


def q_regression_metrics(spark, sf_dir):
    from dask_ml_spark.functions.metrics import mae_expr, mape_expr, mse_expr, msle_expr

    li = _t(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice")
    pred = F.col("l_quantity") * 2000.0
    # mse is an ~2.5e8-scale mean whose raw-double accumulation drifts
    # past the hash grid under plan-shape changes — catalog rendering
    # uses the decimal-exact form of the same formula (mse_expr, the
    # production path, stays pytest-pinned); mae/mape/msle/r2 are O(1e4)
    # or self-normalizing and stay on the library exprs.
    return li.agg(
        (_dsum_wide(F.pow(pred - y, 2)) / F.count("*")).alias("mse"),
        mae_expr(y, pred).alias("mae"),
        mape_expr(y, pred).alias("mape"),
        msle_expr(y, pred).alias("msle"),
        (F.lit(1.0) - F.sum(F.pow(y - pred, 2)) / (F.sum(F.pow(y, 2)) - F.pow(F.sum(y), 2) / F.count("*"))).alias("r2"),
    )


SQL_REGRESSION_METRICS = """
SELECT CAST(sum(CAST(floor(pow(l_quantity * 2000.0 - l_extendedprice, 2) * 10000 + 0.5) / 10000 AS DECIMAL(27,4))) AS DOUBLE)
           / count(*) AS mse,
       avg(abs(l_quantity * 2000.0 - l_extendedprice)) AS mae,
       avg(abs(l_quantity * 2000.0 - l_extendedprice) / greatest(abs(l_extendedprice), 1e-15)) AS mape,
       avg(pow(ln(1 + l_quantity * 2000.0) - ln(1 + l_extendedprice), 2)) AS msle,
       1.0 - sum(pow(l_extendedprice - l_quantity * 2000.0, 2))
           / (sum(pow(l_extendedprice, 2)) - pow(sum(l_extendedprice), 2) / count(*)) AS r2
FROM lineitem
"""


# =====================================================================
# text vectorization (SURVEY §2.3 text family)
# =====================================================================

def q_token_document_frequency(spark, sf_dir):
    """CountVectorizer's fit pass: document frequency per token with
    min_df=5 (the vocabulary-discovery aggregation)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(DD.tokens_expr(F.col("text")))
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= 5)
    )


SQL_TOKEN_DOCUMENT_FREQUENCY = f"""
SELECT token, count(*) AS df FROM (
    SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS token
    FROM documents
) GROUP BY token HAVING count(*) >= 5
"""


def q_tfidf(spark, sf_dir):
    """TF-IDF (smooth idf, no norm) over the long/triplet encoding,
    keyed by (doc_id, token)."""
    docs = _t(spark, sf_dir, "documents")
    toks = DD.tokens_expr(F.col("text"))
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = dfreq.select(
        "token", (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf")
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .select("doc_id", "token", (F.col("tf") * F.col("idf")).alias("tfidf"))
    )


SQL_TFIDF = f"""
WITH tf AS (
    SELECT doc_id, token, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
        FROM documents
    ) GROUP BY doc_id, token
), n AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT token, ln((SELECT n_docs FROM n) + 1.0) - ln(count(*) + 1.0) + 1.0 AS idf
    FROM tf GROUP BY token
)
SELECT tf.doc_id, tf.token, tf.tf * idf.idf AS tfidf
FROM tf JOIN idf ON tf.token = idf.token
"""


# =====================================================================
# dedup datapipe
# =====================================================================

def q_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_dedup(docs).select("doc_id", "content_hash", F.col("dup_count").cast("long").alias("dup_count"))


SQL_EXACT_DEDUP = f"""
SELECT min(doc_id) AS doc_id, content_hash, count(*) AS dup_count FROM (
    SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), ' ')) AS content_hash
    FROM documents
) GROUP BY content_hash
"""


def _sql_shingles(n: int = 3) -> str:
    """DuckDB expression producing the distinct word-n-gram list."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(toks) - {n - 2}, 1)), i -> {gram}))"
    )


def q_minhash_signatures(spark, sf_dir, n_hashes: int = 8):
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_signatures(docs, n_hashes=n_hashes)


def sql_minhash_signatures(n_hashes: int = 8) -> str:
    a, b = DD.minhash_coeffs(n_hashes, seed=42)
    p = DD.MERSENNE_P
    mins = ", ".join(
        f"min((h * {a[i]} + {b[i]}) % {p}) AS m{i}" for i in range(n_hashes)
    )
    return f"""
WITH toks_t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
), sh AS (
    SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM toks_t
), hashed AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS h FROM sh
)
SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, n_hashes=8, bands=4).select(
        "id_a", "id_b", F.col("n_shared_bands").cast("long").alias("n_shared_bands")
    )


def sql_minhash_lsh_pairs(n_hashes: int = 8, bands: int = 4) -> str:
    sig_sql = sql_minhash_signatures(n_hashes)
    r = n_hashes // bands
    band_selects = []
    for bi in range(bands):
        cols = " || '_' || ".join(f"CAST(m{bi * r + j} AS VARCHAR)" for j in range(r))
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, {cols} AS band_key FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""
WITH sig AS ({sig_sql}), banded AS ({banded})
SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_shared_bands
FROM banded l JOIN banded r
  ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
GROUP BY l.doc_id, r.doc_id
"""


def q_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash(docs, n_bits=16)


def sql_simhash(n_bits: int = 16) -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h // {2**bb}) % 2 = 1 THEN 1 ELSE -1 END) AS b{bb}"
        for bb in range(n_bits)
    )
    fp = " + ".join(f"(CASE WHEN b{bb} > 0 THEN {2**bb} ELSE 0 END)" for bb in range(n_bits))
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token FROM documents
), hashed AS (
    SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM tok
), bits AS (
    SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, shingle_n=3, min_shared=3)


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH toks_t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
), sh AS (
    SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM toks_t
), sizes AS (
    SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
), shared AS (
    SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
    FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
    GROUP BY l.doc_id, r.doc_id
    HAVING count(*) >= 3
)
SELECT id_a, id_b,
       shared / (sa.set_size + sb.set_size - shared) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
"""


# =====================================================================
# embeddings / similarity search
# =====================================================================

def q_ann_bruteforce_topk(spark, sf_dir):
    from dask_ml_spark.datapipe.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=10)
    return out.select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))


SQL_ANN_BRUTEFORCE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
scored AS (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(e.embedding, q.qvec) AS score
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id != q.query_id
), ranked AS (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
"""


EMB_DIM = 64
NEAR_DUP_BANDS = 2
NEAR_DUP_BITS = 5


def q_embedding_near_dup(spark, sf_dir):
    """Banded-LSH near-dup pairs (the scale path — no N² join,
    candidates = ≥1 band collision); the oracle reproduces the same
    per-band buckets from the same plane literals."""
    emb = _t(spark, sf_dir, "embeddings")
    # auto_scale=False: the oracle replays these exact plane literals;
    # the production geometry-scaling path is benched separately
    # (embedding_near_dup_scaled) and invariant-tested
    out = DD.embedding_near_dup_pairs(
        emb, threshold=0.9, exact=False, n_bands=NEAR_DUP_BANDS,
        bits_per_band=NEAR_DUP_BITS, seed=42, dim=EMB_DIM,
        auto_scale=False,
    )
    return out.select("id_a", "id_b", "cosine")


def q_embedding_near_dup_scaled(spark, sf_dir):
    """The N-adaptive geometry (auto_scale=True): bits ≈ log2(N)+4
    keeps spurious candidate pairs LINEAR in N (fixed bits measured
    100× candidates for 10× rows at sf1), with bands re-derived for
    ≥95% recall at the threshold. Oracled since r6: the adaptive
    formula RESOLVES to 23 bands x 13 bits at the oracle SF (N=500 —
    the same fixed-point convention q_semantic_dedup uses for its
    adaptive n_cent), and the SQL replays those exact plane literals
    plus the banded join and aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    out = DD.embedding_near_dup_pairs(
        emb, threshold=0.9, exact=False, seed=42, dim=EMB_DIM)
    return (out.groupBy()
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.avg("cosine"), 4).alias("avg_cosine")))


def sql_embedding_near_dup() -> str:
    # same matrix as the Spark side: plane b*bits+j is bit j of band b
    planes = DD.lsh_plane_matrix(NEAR_DUP_BANDS * NEAR_DUP_BITS, EMB_DIM, seed=42)
    band_cols = []
    for b in range(NEAR_DUP_BANDS):
        terms = []
        for j in range(NEAR_DUP_BITS):
            plane = planes[b * NEAR_DUP_BITS + j]
            lit = "[" + ", ".join(f"{v!r}" for v in plane.tolist()) + "]"
            terms.append(f"(CASE WHEN list_dot_product(embedding, {lit}) > 0 THEN {2**j} ELSE 0 END)")
        band_cols.append(" + ".join(terms) + f" AS bucket_{b}")
    buckets = ", ".join(band_cols)
    collide = " OR ".join(
        f"l.bucket_{b} = r.bucket_{b}" for b in range(NEAR_DUP_BANDS)
    )
    return f"""
WITH coded AS (
    SELECT vec_id, embedding, {buckets} FROM embeddings
)
SELECT l.vec_id AS id_a, r.vec_id AS id_b,
       list_cosine_similarity(l.embedding, r.embedding) AS cosine
FROM coded l JOIN coded r ON ({collide}) AND l.vec_id < r.vec_id
WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.9
"""


def sql_embedding_near_dup_scaled() -> str:
    """Oracle for the adaptive-geometry near-dup at the oracle SF:
    auto_scale resolves to 23 bands x 13 bits for N=500 (derived by
    the same formula embedding_near_dup_pairs runs — needed =
    ceil(log2(500)+4) = 13 bits, bands = ceil(ln20 / p_bit^13) = 23 at
    threshold 0.9). The plane matrix is the shared lsh_plane_matrix
    draw, so the literals match the Spark side bit-for-bit."""
    # MUST match the operator's runtime derivation at N=500 — pinned
    # by tests/test_datapipe.py::test_lsh_geometry_derivation
    bands, bits = DD.derive_lsh_geometry(500, 0.9, 12, 12)
    planes = DD.lsh_plane_matrix(bands * bits, EMB_DIM, seed=42)
    band_cols = []
    for b in range(bands):
        terms = []
        for j in range(bits):
            plane = planes[b * bits + j]
            lit = "[" + ", ".join(f"{v!r}" for v in plane.tolist()) + "]"
            terms.append(f"(CASE WHEN list_dot_product(embedding, {lit}) > 0 THEN {2**j} ELSE 0 END)")
        band_cols.append(" + ".join(terms) + f" AS bucket_{b}")
    buckets = ", ".join(band_cols)
    collide = " OR ".join(
        f"l.bucket_{b} = r.bucket_{b}" for b in range(bands))
    return f"""
WITH coded AS (
    SELECT vec_id, embedding, {buckets} FROM embeddings
),
pairs AS (
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           list_cosine_similarity(l.embedding, r.embedding) AS cosine
    FROM coded l JOIN coded r ON ({collide}) AND l.vec_id < r.vec_id
    WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.9
)
SELECT count(*)::BIGINT AS n_pairs, round(avg(cosine), 4) AS avg_cosine
FROM pairs
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas 2023) per-cluster dup summary with a PINNED
    quantizer (centroids = embeddings of vec_id 0..7) and id-order
    greedy ranking — both deterministic, so cluster assignment, the
    within-cluster pair join, and the drop rule are all replayed
    exactly by the DuckDB oracle. The learned-quantizer path
    (centroids=None) stays the production default and is
    invariant-tested in tests/test_datapipe.py."""
    emb = _t(spark, sf_dir, "embeddings")
    # k ~ sqrt(N)/3 (paper rule, floored at 8): the quantizer size must
    # GROW with the corpus — total pair volume is N²/(2k), so the sqrt
    # rule yields N^1.5 pair work (measured 6.7x for 10x rows at sf1;
    # semantic_dedup_pairs' target_pairs_per_item knob is the linear
    # alternative). Resolves to exactly the 8 centroids the oracle pins
    # at sf0.01 (N=500) and to 23 at sf0.1, where 8 clusters over 5k
    # vectors would already quadruple the pair join
    n_cent = max(8, int(emb.count() ** 0.5 / 3))
    cent = (emb.where(F.col("vec_id") < n_cent).orderBy("vec_id")
            .select("embedding").collect())
    # the synthetic embeddings have no true near-dups (max within-
    # cluster cosine ≈ 0.49 at sf0.01), so the production threshold
    # (0.9) would verify an empty result; 0.44 sits in a 0.012-wide
    # gap of the cosine distribution — 8 real pairs, no float-boundary
    # sensitivity between Spark and DuckDB
    pairs = DD.semantic_dedup_pairs(
        emb, centroids=[list(r[0]) for r in cent], threshold=0.44, order="id",
    )
    return (
        pairs.groupBy(F.col("cluster").cast("long").alias("cluster"))
        .agg(F.count("*").alias("n_pairs"),
             F.countDistinct("id_b").alias("n_dropped"))
    )


SQL_SEMANTIC_DEDUP = """
WITH cent AS (
    SELECT vec_id AS c, embedding AS cvec FROM embeddings WHERE vec_id < 8
), assign AS (
    SELECT e.vec_id, e.embedding,
           (SELECT c FROM cent
            ORDER BY list_distance(e.embedding, cent.cvec) ASC, c ASC
            LIMIT 1) AS cluster
    FROM embeddings e
), pairs AS (
    SELECT l.cluster, l.vec_id AS id_a, r.vec_id AS id_b
    FROM assign l JOIN assign r
      ON l.cluster = r.cluster AND l.vec_id < r.vec_id
    WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.44
)
SELECT cluster, count(*) AS n_pairs, count(DISTINCT id_b) AS n_dropped
FROM pairs GROUP BY cluster
"""


SEMDEDUP_TPP = 8  # target candidate pairs charged per item (linear mode)


def q_semantic_dedup_linear(spark, sf_dir):
    """SemDeDup's PRODUCTION-scale geometry (r8 `target_pairs_per_item`
    + LSH-code quantizer, dedup.py): k ~ N/(2t+1) buckets from a
    ceil(log2 k)-bit random-hyperplane code, so BOTH the quantizer
    (N·log k sign projections) and the pair volume (~N·t candidates)
    are linear in N — unlike q_semantic_dedup's paper-rule k ~ sqrt(N),
    which is N^1.5 pair work and benches 4.5x for 10x rows. Oracled by
    the adaptive-geometry fixed-point convention: at the oracle SF
    (N=500) the sizing resolves to the default 64-cluster floor = 6
    bits, and the SQL replays those exact plane literals, the banded
    code, the id-ranked within-bucket join, and the aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = DD.semantic_dedup_pairs(
        emb, threshold=0.44, order="id",
        target_pairs_per_item=SEMDEDUP_TPP, seed=42)
    return (
        pairs.groupBy(F.col("cluster").cast("long").alias("cluster"))
        .agg(F.count("*").alias("n_pairs"),
             F.countDistinct("id_b").alias("n_dropped"))
    )


def sql_semantic_dedup_linear() -> str:
    """Replay the LSH-code quantizer at the oracle SF's resolved
    geometry: n_clusters = max(64, ceil(500/(2·8+1))) = 64 → 6 planes,
    bucket = Σ 2^j·[dot(v, plane_j) > 0] (bit j = plane j, the
    single-band convention of CosineLSHIndex), then the same
    id-ordered within-bucket pair join q_semantic_dedup uses."""
    import math as _math

    n = 500  # embeddings rows at the oracle SF (sf0.01)
    n_clusters = max(64, _math.ceil(n / (2 * SEMDEDUP_TPP + 1)))
    bits = max(1, _math.ceil(_math.log2(max(n_clusters, 2))))
    planes = DD.lsh_plane_matrix(bits, EMB_DIM, seed=42)
    terms = []
    for j in range(bits):
        lit = "[" + ", ".join(f"{v!r}" for v in planes[j].tolist()) + "]"
        terms.append(f"(CASE WHEN list_dot_product(embedding, {lit}) > 0"
                     f" THEN {2 ** j} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""
WITH coded AS (
    SELECT vec_id, embedding, {bucket} AS cluster FROM embeddings
), pairs AS (
    SELECT l.cluster, l.vec_id AS id_a, r.vec_id AS id_b
    FROM coded l JOIN coded r
      ON l.cluster = r.cluster AND l.vec_id < r.vec_id
    WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.44
)
SELECT cluster::BIGINT AS cluster, count(*) AS n_pairs,
       count(DISTINCT id_b) AS n_dropped
FROM pairs GROUP BY cluster
"""


def q_quantized_embeddings(spark, sf_dir):
    """Int8 scalar quantization (datapipe/similarity.py::
    quantize_embeddings) — integer code stats per vector. The
    quantization math uses explicitly-ordered double casts, so DuckDB
    replays it bit-exactly and the integer codes match exactly."""
    from dask_ml_spark.datapipe.similarity import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id",
        F.aggregate(F.col("code"), F.lit(0).cast("long"),
                    lambda a, c: a + c.cast("long") + 128).alias("code_sum"),
        F.array_min("code").cast("long").alias("code_min"),
        F.array_max("code").cast("long").alias("code_max"),
    )


SQL_QUANTIZED_EMBEDDINGS = """
WITH q AS (
    SELECT vec_id, embedding,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
           greatest((CAST(list_aggregate(embedding, 'max') AS DOUBLE)
                     - CAST(list_aggregate(embedding, 'min') AS DOUBLE)) / 255.0,
                    1e-12) AS vstep
    FROM embeddings
), c AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round((CAST(x AS DOUBLE) - vmin) / vstep) AS BIGINT) - 128) AS code
    FROM q
)
SELECT vec_id,
       CAST(list_sum(list_transform(code, cc -> cc + 128)) AS BIGINT) AS code_sum,
       CAST(list_aggregate(code, 'min') AS BIGINT) AS code_min,
       CAST(list_aggregate(code, 'max') AS BIGINT) AS code_max
FROM c
"""


def q_paragraph_dedup(spark, sf_dir):
    """Sub-document exact dedup: a paragraph survives iff it is the
    global first occurrence of its content hash; documents are
    reassembled from surviving paragraphs in order. The synthetic docs
    have no newlines, so the query chunks on a common word — the
    operator is generic over `sep` and the oracle replays the same
    split."""
    docs = _t(spark, sf_dir, "documents")
    out = DD.paragraph_dedup(docs, sep=" the ")
    return out.select("doc_id", "text", "n_paragraphs", "n_kept")


SQL_PARAGRAPH_DEDUP = """
WITH paras AS (
    SELECT doc_id,
           generate_subscripts(parts, 1) - 1 AS idx,
           unnest(parts) AS para
    FROM (SELECT doc_id, string_split(text, ' the ') AS parts FROM documents)
),
flt AS (
    SELECT *, md5(para) AS h FROM paras WHERE length(trim(para)) >= 1
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1 AS keep
    FROM flt
)
SELECT doc_id,
       COALESCE(string_agg(para, ' the ' ORDER BY idx) FILTER (WHERE keep), '') AS text,
       count(*) AS n_paragraphs,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM ranked
GROUP BY doc_id
"""


def q_embedding_centroids(spark, sf_dir):
    """Per-label mean embedding — the grouped vector aggregation used
    by both IVF training and class-centroid models. Arrays are averaged
    element-wise JVM-side (posexplode + groupBy)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("mean_v"), F.count("*").cast("long").alias("n"))
    )


SQL_EMBEDDING_CENTROIDS = """
SELECT label, pos - 1 AS pos, avg(v) AS mean_v, count(*) AS n
FROM (
    SELECT label, unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
)
GROUP BY label, pos - 1
"""


# =====================================================================
# text analysis datapipe
# =====================================================================

def q_language_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = TS.language_scores(docs)
    return out.select("doc_id", "score_en", "score_de", "score_fr", "score_es", "lang_pred")


def _sql_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TS.STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')), [{words}]))"
        f" / greatest(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))), 1)"
    )


def sql_language_id() -> str:
    langs = sorted(TS.STOPWORDS)
    scores = ", ".join(f"{_sql_lang_score(l)} AS score_{l}" for l in langs)
    # argmax with ties → lexicographically-first language
    conds = []
    for lang in langs:
        cmp = " AND ".join(
            f"score_{lang} {'>' if other < lang else '>='} score_{other}"
            for other in langs if other != lang
        )
        conds.append(f"WHEN {cmp} THEN '{lang}'")
    case = "CASE " + " ".join(conds) + f" ELSE '{langs[0]}' END"
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM documents)
SELECT doc_id, score_en, score_de, score_fr, score_es, {case} AS lang_pred FROM scored
"""


def q_cohens_kappa_lang(spark, sf_dir):
    """Cohen's κ (functions/metrics.py::cohens_kappa — the
    chance-corrected agreement audit): does the stopword-ratio
    language guesser agree with the gold lang labels beyond chance?
    Raw accuracy flatters any pair that over-predicts the majority
    class; κ corrects by the marginal chance agreement. ONE
    contingency aggregate + exact-integer driver assembly; the oracle
    replays the lang_pred argmax CASE and the same integer
    arithmetic."""
    from dask_ml_spark.datapipe import text_stats as TS
    from dask_ml_spark.functions.metrics import cohens_kappa

    docs = _t(spark, sf_dir, "documents")
    pred = TS.language_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id")
    out = cohens_kappa(pred, "lang", "lang_pred")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "k_classes",
                      r6(F.col("po")).alias("po"),
                      r6(F.col("pe")).alias("pe"),
                      r6(F.col("kappa")).alias("kappa"))


def _sql_cohens_kappa_lang() -> str:
    from dask_ml_spark.datapipe import text_stats as TS

    langs = sorted(TS.STOPWORDS)
    scores = ", ".join(f"{_sql_lang_score(lg)} AS score_{lg}"
                       for lg in langs)
    conds = []
    for lang in langs:
        cmp = " AND ".join(
            f"score_{lang} {'>' if other < lang else '>='} score_{other}"
            for other in langs if other != lang)
        conds.append(f"WHEN {cmp} THEN '{lang}'")
    case = "CASE " + " ".join(conds) + f" ELSE '{langs[0]}' END"
    return f"""
WITH scored AS (
    SELECT lang, {scores} FROM documents WHERE lang IS NOT NULL
), pred AS (
    SELECT lang AS a, {case} AS b FROM scored
), c AS (
    SELECT a, b, count(*)::HUGEINT AS n FROM pred GROUP BY a, b
), s AS (
    SELECT sum(n) AS n,
           sum(CASE WHEN a = b THEN n ELSE 0::HUGEINT END) AS diag
    FROM c
), m AS (
    SELECT cls, coalesce(ra, 0::HUGEINT) AS ra,
           coalesce(cb, 0::HUGEINT) AS cb
    FROM (SELECT a AS cls FROM c UNION SELECT b FROM c)
    LEFT JOIN (SELECT a, sum(n) AS ra FROM c GROUP BY a) t1
           ON t1.a = cls
    LEFT JOIN (SELECT b, sum(n) AS cb FROM c GROUP BY b) t2
           ON t2.b = cls
), pe AS (
    SELECT sum(ra * cb) AS pe_num, count(*)::BIGINT AS kc FROM m
), k AS (
    SELECT s.n, pe.kc,
           diag::DOUBLE / s.n::DOUBLE AS po,
           pe_num::DOUBLE / (s.n::DOUBLE * s.n::DOUBLE) AS pe
    FROM s, pe
)
SELECT n::BIGINT AS n, kc AS k_classes,
       floor(po * 1e6 + 0.5) / 1e6 AS po,
       floor(pe * 1e6 + 0.5) / 1e6 AS pe,
       floor((po - pe) / (1.0 - pe) * 1e6 + 0.5) / 1e6 AS kappa
FROM k
"""


def q_mcnemar_quality_screens(spark, sf_dir):
    """McNemar's paired-binary test (functions/metrics.py::
    mcnemar_test — 'is screen A stricter than screen B on the SAME
    documents?', which an unpaired proportion test gets wrong): a
    char-length screen vs a token-count screen over the same corpus;
    only the discordant documents carry signal. Exact dof-1 tail via
    2·Φ̄(√χ²) — no Wilson–Hilferty, oracle-identical."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.functions.metrics import mcnemar_test

    docs = _t(spark, sf_dir, "documents")
    screens = docs.select(
        (F.length("text") >= 300).alias("pass_chars"),
        (F.size(tokens_expr(F.col("text"))) >= 55).alias("pass_tokens"))
    out = mcnemar_test(screens, "pass_chars", "pass_tokens")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "b_discordant", "c_discordant",
                      r6(F.col("chi2")).alias("chi2"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_mcnemar_quality_screens() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("sqrt(chi2)")
    return f"""
WITH s AS (
    SELECT length(text) >= 300 AS a,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) >= 55
               AS b
    FROM documents
), agg AS (
    SELECT count(*)::BIGINT AS n,
           sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS bd,
           sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS cd
    FROM s
), st AS (
    SELECT n, bd, cd,
           CASE WHEN bd + cd = 0 THEN 0.0
                ELSE (greatest(abs(bd - cd) - 1, 0)
                      * greatest(abs(bd - cd) - 1, 0))::DOUBLE
                     / (bd + cd)::DOUBLE END AS chi2
    FROM agg
)
SELECT n, bd AS b_discordant, cd AS c_discordant,
       floor(chi2 * 1e6 + 0.5) / 1e6 AS chi2,
       floor((CASE WHEN bd + cd = 0 THEN 1.0
                   ELSE least(1.0, 2.0 * {sf}) END) * 1e6 + 0.5) / 1e6
           AS p_value
FROM st
"""


def q_cochrans_q_screens(spark, sf_dir):
    """Cochran's Q (functions/metrics.py::cochrans_q — the binary
    Friedman): do three quality screens pass at the same rate over
    the same documents, accounting for the per-document pairing? ONE
    aggregate of exact integer sums (k column totals + Σrowsum +
    Σrowsum²); χ²₂ tail replayed by the oracle's even-dof closed
    form."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.functions.metrics import cochrans_q

    docs = _t(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    screens = docs.select(
        (F.length("text") >= 300).alias("s_chars"),
        (F.size(toks) >= 55).alias("s_tokens"),
        (F.size(F.array_distinct(toks)) >= 45).alias("s_distinct"))
    out = cochrans_q(screens, ["s_chars", "s_tokens", "s_distinct"])
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "n", r6(F.col("q_stat")).alias("q_stat"),
                      "dof", r6(F.col("p_value")).alias("p_value"))


def _sql_cochrans_q_screens() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    p = _chi2_sf_sql("q", 2)
    return f"""
WITH s AS (
    SELECT CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS x0,
           CASE WHEN len(regexp_extract_all(lower(text),
                                            '{TOKEN_RE_SQL}')) >= 55
                THEN 1 ELSE 0 END AS x1,
           CASE WHEN len(list_distinct(regexp_extract_all(lower(text),
                                            '{TOKEN_RE_SQL}'))) >= 45
                THEN 1 ELSE 0 END AS x2
    FROM documents
), agg AS (
    SELECT count(*)::BIGINT AS n,
           sum(x0)::HUGEINT AS t0, sum(x1)::HUGEINT AS t1,
           sum(x2)::HUGEINT AS t2,
           sum(x0 + x1 + x2)::HUGEINT AS sr,
           sum((x0 + x1 + x2) * (x0 + x1 + x2))::HUGEINT AS sr2
    FROM s
), q AS (
    SELECT n,
           (2 * ((3 * t0 - sr) * (3 * t0 - sr)
                 + (3 * t1 - sr) * (3 * t1 - sr)
                 + (3 * t2 - sr) * (3 * t2 - sr)))::DOUBLE
           / (3.0 * (3 * sr - sr2)::DOUBLE) AS q
    FROM agg
)
SELECT 3::BIGINT AS k, n, floor(q * 1e6 + 0.5) / 1e6 AS q_stat,
       2::BIGINT AS dof,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM q
"""


def q_mcc_return_rule(spark, sf_dir):
    """Matthews correlation coefficient (functions/metrics.py::
    matthews_corrcoef — the imbalance-honest single-number eval, the
    Pearson φ of the 2×2 table): how well does a naive
    discount-threshold rule predict returns? One aggregate of four
    conditional counts, exact bignum products."""
    from dask_ml_spark.functions.metrics import matthews_corrcoef

    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_discount") >= 0.05).cast("double").alias("prediction"))
    mcc = matthews_corrcoef(labeled)
    r6v = math.floor(mcc * 1e6 + 0.5) / 1e6
    return spark.createDataFrame([(float(r6v),)], "mcc double")


def _sql_mcc_return_rule() -> str:
    return """
WITH s AS (
    SELECT (l_returnflag = 'R') AS y, (l_discount >= 0.05) AS p
    FROM lineitem
), agg AS (
    SELECT sum(CASE WHEN y AND p THEN 1 ELSE 0 END)::HUGEINT AS tp,
           sum(CASE WHEN NOT y AND p THEN 1 ELSE 0 END)::HUGEINT AS fp,
           sum(CASE WHEN y AND NOT p THEN 1 ELSE 0 END)::HUGEINT AS fn,
           sum(CASE WHEN NOT y AND NOT p THEN 1 ELSE 0 END)::HUGEINT
               AS tn
    FROM s
)
SELECT floor((tp * tn - fp * fn)::DOUBLE
             / sqrt(((tp + fp) * (tp + fn) * (tn + fp)
                     * (tn + fn))::DOUBLE) * 1e6 + 0.5) / 1e6 AS mcc
FROM agg
"""


def q_ece_event_probability(spark, sf_dir):
    """Expected / maximum calibration error (functions/metrics.py::
    expected_calibration_error — the reliability-diagram scalar the
    calibration_curve points summarize): a synthetic probability
    (clamped value/100) scored against the purchase indicator — the
    gate a quality-classifier's probabilities must pass before its
    thresholds mean anything. ONE ≤n_bins aggregate; driver assembly
    in bin order replayed by the oracle."""
    from dask_ml_spark.functions.metrics import expected_calibration_error

    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        F.least(F.lit(0.99), F.greatest(
            F.lit(0.01), F.col("value").cast("double") / 100.0))
        .alias("probability"))
    out = expected_calibration_error(scored, n_bins=10)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "n_bins", r6(F.col("ece")).alias("ece"),
                      r6(F.col("mce")).alias("mce"))


def _sql_ece_event_probability() -> str:
    return """
WITH s AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
           least(0.99, greatest(0.01, value::DOUBLE / 100.0)) AS p
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
), b AS (
    SELECT CAST(least(9, floor(p * 10)) AS INTEGER) AS bin,
           count(*)::BIGINT AS nb, sum(p) AS sp,
           sum(y)::BIGINT AS pos
    FROM s GROUP BY 1
), n AS (
    SELECT sum(nb) AS n FROM b
), terms AS (
    SELECT bin, nb, abs(pos::DOUBLE / nb::DOUBLE - sp / nb::DOUBLE)
               AS gap
    FROM b
)
SELECT (SELECT n FROM n)::BIGINT AS n, 10::BIGINT AS n_bins,
       floor(sum((nb::DOUBLE / (SELECT n FROM n)::DOUBLE) * gap)
             * 1e6 + 0.5) / 1e6 AS ece,
       floor(max(gap) * 1e6 + 0.5) / 1e6 AS mce
FROM terms
"""


def q_quality_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = TS.quality_scores(docs)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        "distinct_ratio", "punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio",
    )


def sql_quality_scores() -> str:
    en = ", ".join(f"'{w}'" for w in TS.STOPWORDS["en"])
    toks = f"regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')"
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       len({toks}) AS n_tokens,
       len(list_distinct({toks})) AS n_distinct_tokens,
       len(list_distinct({toks})) / greatest(len({toks}), 1)::DOUBLE AS distinct_ratio,
       length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) / greatest(length(text), 1)::DOUBLE AS punct_ratio,
       length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1)::DOUBLE AS digit_ratio,
       length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1)::DOUBLE AS upper_ratio,
       len(list_intersect(list_distinct({toks}), [{en}])) / greatest(len({toks}), 1)::DOUBLE AS stopword_ratio
FROM documents
"""


def q_document_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return TS.document_fingerprint(docs).select(
        "doc_id", "fingerprint", F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens")
    )


SQL_DOCUMENT_FINGERPRINT = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))), ' ')) AS fingerprint,
       len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS n_distinct_tokens
FROM documents
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


# =====================================================================
# quantile transformer / one-hot / count-vectorizer / kernels /
# sessionization (widening pass)
# =====================================================================

def q_quantile_transformer_fit(spark, sf_dir):
    """The distributed fit pass of QuantileTransformer (reference
    data.py:303-418): an 11-point exact-percentile grid per column,
    computed in ONE aggregate pass over both measures."""
    from dask_ml_spark.operators.preprocessing import QuantileTransformer

    li = _t(spark, sf_dir, "lineitem")
    qt = QuantileTransformer(n_quantiles=11, approximate=False).fit(
        li, ["l_quantity", "l_extendedprice"]
    )
    # round 4: linear interpolation between 0.01-grid values at one-decimal
    # rank fractions yields exact multiples of 1e-3, so the 1e-4 grid is
    # tie-free while the engines' interpolation arithmetic differs ~1e-11
    rows = [
        {"idx": i,
         "q_quantity": round(float(qt.quantiles_[i, 0]), 4),
         "q_price": round(float(qt.quantiles_[i, 1]), 4)}
        for i in range(qt.quantiles_.shape[0])
    ]
    return spark.createDataFrame(rows)


SQL_QUANTILE_TRANSFORMER_FIT = """
WITH g AS (
    SELECT quantile_cont(l_quantity,      [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS qq,
           quantile_cont(l_extendedprice, [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS qp
    FROM lineitem
)
SELECT CAST(i - 1 AS BIGINT) AS idx,
       round(qq[i], 4) AS q_quantity, round(qp[i], 4) AS q_price
FROM g, generate_series(1, 11) AS t(i)
"""


# GK at accuracy=2e6 is in its exact regime at sf<=0.1 (rank error
# n/(2*accuracy) < 1): percentile_approx deterministically returns the
# order statistic at rank ceil(p * n) computed in DOUBLE arithmetic —
# including the FP noise the np.linspace grid carries (linspace's
# 0.30000000000000004 * 60000 lands just above 18000, so Spark picks
# rank 18001 where a clean 0.3 would pick 18000). The oracle replays
# the SAME double products (string-cast literals are correctly-rounded
# to the identical doubles), so both engines select identical ranks.
SQL_QUANTILE_TRANSFORMER_FIT_APPROX = """
WITH probs AS (
    SELECT * FROM (VALUES
        (0, '0.0'::DOUBLE), (1, '0.1'::DOUBLE), (2, '0.2'::DOUBLE),
        (3, '0.30000000000000004'::DOUBLE), (4, '0.4'::DOUBLE),
        (5, '0.5'::DOUBLE), (6, '0.6000000000000001'::DOUBLE),
        (7, '0.7000000000000001'::DOUBLE), (8, '0.8'::DOUBLE),
        (9, '0.9'::DOUBLE), (10, '1.0'::DOUBLE)) t(i, pr)
),
n AS (SELECT count(*)::DOUBLE AS cnt FROM lineitem),
ranks AS (
    SELECT i, GREATEST(1, CEIL(pr * cnt))::BIGINT AS rk FROM probs, n
),
sq AS (SELECT row_number() OVER (ORDER BY l_quantity) AS r,
              l_quantity AS v FROM lineitem),
sp AS (SELECT row_number() OVER (ORDER BY l_extendedprice) AS r,
              l_extendedprice AS v FROM lineitem)
SELECT ranks.i::BIGINT AS idx, sq.v::DOUBLE AS q_quantity,
       sp.v::DOUBLE AS q_price
FROM ranks JOIN sq ON sq.r = ranks.rk JOIN sp ON sp.r = ranks.rk
"""


def q_quantile_transformer_fit_approx(spark, sf_dir):
    """The scale path of the QuantileTransformer fit: percentile_approx
    (Greenwald-Khanna sketch — bounded memory per aggregate regardless
    of row count, mergeable map-side). This is the default
    (approximate=True) and the bench headline; the exact-percentile
    variant above buffers every value in the aggregation buffer and
    does not survive 100 TB columns. accuracy=250k (the measured
    no-compression exactness floor at the oracle SF) makes the approx
    path DuckDB-oracled (was rows-only); the library default stays
    accuracy=10000 — the deliberate oracle-vs-production split
    winsorized_prices also makes."""
    from dask_ml_spark.operators.preprocessing import QuantileTransformer

    li = _t(spark, sf_dir, "lineitem")
    qt = QuantileTransformer(n_quantiles=11, accuracy=250_000).fit(
        li, ["l_quantity", "l_extendedprice"]
    )
    rows = [
        {"idx": i,
         "q_quantity": float(qt.quantiles_[i, 0]),
         "q_price": float(qt.quantiles_[i, 1])}
        for i in range(qt.quantiles_.shape[0])
    ]
    return spark.createDataFrame(rows)


def q_one_hot_encoder(spark, sf_dir):
    """OneHotEncoder dense path (reference _encoders.py:17-307) on two
    low-cardinality columns, expanded to one 0/1 column per category —
    pure JVM column expressions, no shuffle."""
    from dask_ml_spark.operators.encoders import OneHotEncoder

    li = _t(spark, sf_dir, "lineitem")
    enc = OneHotEncoder(sparse_output=False).fit(li, ["l_returnflag", "l_linestatus"])
    out = enc.transform(li, output_col="oh")
    names = []
    for c in enc.columns_:
        names += [f"oh_{c[2:]}_{v}" for v in enc.categories_[c].tolist()]
    sel = [F.col("l_orderkey"), F.col("l_linenumber")]
    sel += [F.element_at("oh", i + 1).alias(n) for i, n in enumerate(names)]
    return out.select(*sel)


SQL_ONE_HOT_ENCODER = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'A' THEN 1.0 ELSE 0.0 END AS oh_returnflag_A,
       CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS oh_returnflag_N,
       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS oh_returnflag_R,
       CASE WHEN l_linestatus = 'F' THEN 1.0 ELSE 0.0 END AS oh_linestatus_F,
       CASE WHEN l_linestatus = 'O' THEN 1.0 ELSE 0.0 END AS oh_linestatus_O
FROM lineitem
"""


def q_count_vectorizer_long(spark, sf_dir):
    """CountVectorizer two-pass flow (reference text.py:170-230):
    vocabulary discovery with min_df/max_features, then the long/triplet
    transform (doc_id, token_id, count) via broadcast-vocabulary join."""
    from dask_ml_spark.operators.text import CountVectorizer

    docs = _t(spark, sf_dir, "documents")
    cv = CountVectorizer(input_col="text", token_pattern="[a-z0-9_]{2,}",
                         min_df=5, max_features=500).fit(docs)
    return cv.transform_long(docs, "doc_id")


SQL_COUNT_VECTORIZER_LONG = f"""
WITH docfreq AS (
    SELECT token, count(*) AS df FROM (
        SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS token
        FROM documents
    ) GROUP BY token HAVING count(*) >= 5
), vocab AS (
    SELECT token, CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
    FROM (SELECT token FROM docfreq ORDER BY df DESC, token LIMIT 500)
), tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents
)
SELECT tok.doc_id, vocab.token_id, count(*) AS "count"
FROM tok JOIN vocab USING (token)
GROUP BY 1, 2
"""


def q_rbf_kernel_to_centers(spark, sf_dir):
    """Gram-matrix block against a small broadcast Y (reference
    pairwise.py:136-226 rbf_kernel) — the Arrow-batched kernel path."""
    import numpy as np

    from dask_ml_spark.operators.pairwise import rbf_kernel

    li = _t(spark, sf_dir, "lineitem")
    Y = np.array([[10.0, 0.02], [40.0, 0.06]])
    out = rbf_kernel(li, ["l_quantity", "l_discount"], Y, gamma=0.01, output_col="k")
    return out.select(
        "l_orderkey", "l_linenumber",
        F.element_at("k", 1).alias("k0"),
        F.element_at("k", 2).alias("k1"),
    )


SQL_RBF_KERNEL_TO_CENTERS = """
SELECT l_orderkey, l_linenumber,
       exp(-0.01 * (pow(l_quantity - 10.0, 2) + pow(l_discount - 0.02, 2))) AS k0,
       exp(-0.01 * (pow(l_quantity - 40.0, 2) + pow(l_discount - 0.06, 2))) AS k1
FROM lineitem
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


def q_multimodal_decode(spark, sf_dir):
    """Multimodal decode plumbing (datapipe/multimodal.py): binary blob
    column → mapInPandas stub decode → pooled features. The oracle
    checks the deterministic side (byte counts, feature arity); pixel
    values are the seeded stub, covered by tests."""
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text, decode_image_features

    docs = _t(spark, sf_dir, "documents")
    blobs = attach_binary_from_text(docs)
    feats = decode_image_features(blobs, resize=(8, 8))
    return feats.select(
        "doc_id", "n_bytes", F.size("features").cast("long").alias("n_features")
    )


SQL_MULTIMODAL_DECODE = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes, CAST(64 AS BIGINT) AS n_features
FROM documents
"""


def q_image_dhash_bands(spark, sf_dir):
    """Perceptual image hashing (datapipe/image_dedup.py): dHash of
    every blob as four 16-bit band integers — pure JVM expressions
    under stub=True (md5-tile thumbnail), so the oracle replays the
    ENTIRE hash bit-for-bit in SQL (gray sums, gradient bits, band
    packing). The real-decode path shares the integer math and is
    pinned in tests against BMP fixtures."""
    from dask_ml_spark.datapipe.image_dedup import image_hashes
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text

    docs = _t(spark, sf_dir, "documents")
    h = image_hashes(attach_binary_from_text(docs))
    return h.select("doc_id", *[F.col(f"h{i}").cast("long").alias(f"h{i}")
                                for i in range(4)])


def q_image_near_dup_pairs(spark, sf_dir):
    """Near-duplicate image pairs via banded Hamming LSH
    (image_dedup.image_near_dup): 64-bit dHash in 4 bands, pigeonhole
    guarantees EXHAUSTIVE recall at max_hamming=3 — which is exactly
    what the oracle checks: DuckDB computes the brute-force all-pairs
    Hamming set (fine at oracle SF; the Spark side never does
    all-pairs) and the banded join must equal it."""
    from dask_ml_spark.datapipe.image_dedup import image_near_dup
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text

    docs = _t(spark, sf_dir, "documents")
    return image_near_dup(attach_binary_from_text(docs), max_hamming=3)


def _sql_dhash_bands() -> str:
    """doc_id, h0..h3 — the md5-tile dHash replayed in DuckDB lists."""
    byte = ("('0x' || substr(md5(text), ((%s) %% 16) * 2 + 1, 2))::BIGINT")
    gray = ("list_transform(range(0, 72), i -> "
            f"{byte % '3*i'} + {byte % '3*i+1'} + {byte % '3*i+2'})")
    bands = ", ".join(
        "list_sum(list_transform(range(0, 16), j -> CASE WHEN "
        f"gr[((16*{b}+j) // 8) * 9 + ((16*{b}+j) % 8) + 1] > "
        f"gr[((16*{b}+j) // 8) * 9 + ((16*{b}+j) % 8) + 2] "
        f"THEN (1::BIGINT << (15 - j)) ELSE 0 END))::BIGINT AS h{b}"
        for b in range(4))
    return (f"WITH g AS (SELECT doc_id, {gray} AS gr FROM documents)\n"
            f"SELECT doc_id, {bands} FROM g")


def q_cooccurrence_topk(spark, sf_dir):
    """Distributed co-occurrence counting (datapipe/embed_train.py —
    the count stage of the PPMI embedding trainer): symmetric
    window-2 pairs over the top-100 vocabulary, top-50 by
    (count desc, w1, w2). The window pairs are built inside the token
    array with HOFs (no positional self-join); the oracle replays the
    identical pair construction with lateral unnest."""
    from dask_ml_spark.datapipe.embed_train import cooccurrence_counts

    docs = _t(spark, sf_dir, "documents")
    cooc = cooccurrence_counts(docs, window=2, vocab_size=100)
    return (cooc.orderBy(F.desc("n"), F.asc("w1"), F.asc("w2")).limit(50))


def q_ppmi_topk(spark, sf_dir):
    """PPMI stage of the embedding trainer: the same deterministic
    top-50 pair SELECTION as cooccurrence_topk (integer-count ordering
    — immune to float rounding flips), with the PPMI value attached.
    The SVD factors carry sign ambiguity, so the embedding stage
    itself is pinned against an independent numpy replay in pytest
    instead of a SQL oracle."""
    from dask_ml_spark.datapipe.embed_train import (cooccurrence_counts,
                                                    ppmi_scores)

    docs = _t(spark, sf_dir, "documents")
    cooc = cooccurrence_counts(docs, window=2, vocab_size=100)
    top = cooc.orderBy(F.desc("n"), F.asc("w1"), F.asc("w2")).limit(50)
    return (top.join(ppmi_scores(cooc), ["w1", "w2"])
            .select("w1", "w2", "n", "ppmi"))


def q_collocations_logdice_topk(spark, sf_dir):
    """logDice collocation strength (datapipe/embed_train.py::
    logdice_scores — Rychlý 2008, the Sketch Engine measure): the
    PPMI companion that doesn't grow with corpus size (PMI inflates
    rare pairs; logDice = 14 + log₂(2n/(n1+n2)) is a capped
    harmonic-mean association, comparable across corpora — the right
    ranking for a training-data collocation audit). Same deterministic
    top-50 integer-count pair selection as ppmi_topk, same
    broadcast-marginal join shape."""
    from dask_ml_spark.datapipe.embed_train import (cooccurrence_counts,
                                                    logdice_scores)

    docs = _t(spark, sf_dir, "documents")
    cooc = cooccurrence_counts(docs, window=2, vocab_size=100)
    top = cooc.orderBy(F.desc("n"), F.asc("w1"), F.asc("w2")).limit(50)
    return (top.join(logdice_scores(cooc), ["w1", "w2"])
            .select("w1", "w2", "n", "logdice"))


def _sql_cooccurrence_base() -> str:
    return f"""
t AS (SELECT regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
      FROM documents),
vocab AS (
  SELECT token AS word FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents)
  GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 100
),
raw AS (
  SELECT toks[i+1] AS wa, toks[i+o+1] AS wb
  FROM t, unnest(range(0, greatest(len(toks)-1, 0))) AS a(i),
       unnest([1, 2]) AS b(o)
  WHERE i + o < len(toks)
),
both_dirs AS (
  SELECT wa AS w1, wb AS w2 FROM raw
  UNION ALL
  SELECT wb AS w1, wa AS w2 FROM raw
),
cooc AS (
  SELECT w1, w2, count(*)::BIGINT AS n
  FROM both_dirs
  WHERE w1 IN (SELECT word FROM vocab) AND w2 IN (SELECT word FROM vocab)
  GROUP BY w1, w2
)"""


SQL_COOCCURRENCE_TOPK = f"""
WITH {_sql_cooccurrence_base()}
SELECT w1, w2, n FROM cooc ORDER BY n DESC, w1, w2 LIMIT 50
"""


SQL_PPMI_TOPK = f"""
WITH {_sql_cooccurrence_base()},
tot AS (SELECT sum(n)::DOUBLE AS t FROM cooc),
m1 AS (SELECT w1, sum(n)::DOUBLE AS n1 FROM cooc GROUP BY w1),
m2 AS (SELECT w2, sum(n)::DOUBLE AS n2 FROM cooc GROUP BY w2),
top AS (SELECT w1, w2, n FROM cooc ORDER BY n DESC, w1, w2 LIMIT 50)
SELECT top.w1, top.w2, top.n,
       round(greatest(0.0, ln((top.n * t) / (n1 * n2))), 6) AS ppmi
FROM top JOIN m1 ON top.w1 = m1.w1 JOIN m2 ON top.w2 = m2.w2
CROSS JOIN tot
"""


SQL_COLLOCATIONS_LOGDICE_TOPK = f"""
WITH {_sql_cooccurrence_base()},
m1 AS (SELECT w1, sum(n) AS n1 FROM cooc GROUP BY w1),
m2 AS (SELECT w2, sum(n) AS n2 FROM cooc GROUP BY w2),
top AS (SELECT w1, w2, n FROM cooc ORDER BY n DESC, w1, w2 LIMIT 50)
SELECT top.w1, top.w2, top.n,
       round(14.0 + ln((2.0 * top.n) / ((n1 + n2)::DOUBLE))
                    / 0.6931471805599453, 6) AS logdice
FROM top JOIN m1 ON top.w1 = m1.w1 JOIN m2 ON top.w2 = m2.w2
"""


def q_source_concentration(spark, sf_dir):
    """Corpus concentration audit (datapipe/profiling.py::
    concentration_profile): how evenly is the character mass spread
    across sources? Gini, HHI, Shannon entropy (+normalized) and the
    top-1 share from ONE groupBy(source) weight aggregate and exact
    driver arithmetic over the ≤G integer totals — the "is this
    dataset secretly one feed?" number every mixture plan needs. The
    oracle replays the ascending-total Σi·xᵢ via a window cumsum on
    the same exact integers."""
    from dask_ml_spark.datapipe.profiling import concentration_profile

    docs = _t(spark, sf_dir, "documents")
    out = concentration_profile(docs, "source", weight_col="n_chars")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "total",
                      r6(F.col("gini")).alias("gini"),
                      r6(F.col("hhi")).alias("hhi"),
                      r6(F.col("entropy")).alias("entropy"),
                      r6(F.col("entropy_normalized"))
                      .alias("entropy_normalized"),
                      r6(F.col("top1_share")).alias("top1_share"))


def _sql_source_concentration() -> str:
    return """
WITH g AS (
    SELECT source::VARCHAR AS g,
           sum(CAST(floor(n_chars) AS BIGINT))::HUGEINT AS w
    FROM documents
    WHERE source IS NOT NULL AND n_chars IS NOT NULL
      AND NOT isnan(n_chars::DOUBLE) AND n_chars >= 0
    GROUP BY 1
), o AS (
    -- ascending totals, ties by label (deterministic, value-neutral)
    SELECT w, row_number() OVER (ORDER BY w, g) AS i FROM g
), s AS (
    SELECT sum(w * i) AS ixi, sum(w) AS tot, count(*)::BIGINT AS k,
           max(w) AS mx
    FROM o
), e AS (
    SELECT sum((w::DOUBLE / (SELECT tot FROM s)::DOUBLE)
               * (w::DOUBLE / (SELECT tot FROM s)::DOUBLE)) AS hhi,
           sum(-(w::DOUBLE / (SELECT tot FROM s)::DOUBLE)
               * ln(w::DOUBLE / (SELECT tot FROM s)::DOUBLE)) AS ent
    FROM g WHERE w > 0
)
SELECT s.k, s.tot::BIGINT AS total,
       floor((2.0 * s.ixi::DOUBLE / (s.k * s.tot::DOUBLE)
              - (s.k + 1.0) / s.k) * 1e6 + 0.5) / 1e6 AS gini,
       floor(e.hhi * 1e6 + 0.5) / 1e6 AS hhi,
       floor(e.ent * 1e6 + 0.5) / 1e6 AS entropy,
       floor(CASE WHEN s.k > 1 THEN e.ent / ln(s.k) END
             * 1e6 + 0.5) / 1e6 AS entropy_normalized,
       floor((s.mx::DOUBLE / s.tot::DOUBLE) * 1e6 + 0.5) / 1e6
           AS top1_share
FROM s, e
"""


def q_readability_docs(spark, sf_dir):
    """Flesch / Flesch–Kincaid readability (datapipe/text_stats.py::
    readability_scores): per-document surface counts (regex words,
    sentence runs, per-word vowel-group syllables — the standard
    deterministic heuristic) and the two classic scores. One narrow
    JVM projection; the oracle replays the identical regexes and the
    literal score arithmetic."""
    from dask_ml_spark.datapipe.text_stats import readability_scores

    docs = _t(spark, sf_dir, "documents")
    out = readability_scores(docs)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("doc_id", "words", "sentences", "syllables",
                      r6(F.col("flesch")).alias("flesch"),
                      r6(F.col("fk_grade")).alias("fk_grade"))


def _sql_readability_docs() -> str:
    return """
WITH c AS (
    -- NULL text counts as empty (the engine's coalesce convention)
    SELECT doc_id,
           len(regexp_extract_all(lower(coalesce(text, '')),
                                  '[a-z]+')) AS words,
           greatest(1, len(regexp_extract_all(coalesce(text, ''),
                                              '[.!?]+')))
               AS sentences,
           list_sum(list_transform(
               regexp_extract_all(lower(coalesce(text, '')),
                                  '[a-z]+'),
               w -> greatest(1, len(regexp_extract_all(w,
                                                       '[aeiouy]+')))))
               AS syl
    FROM documents
)
SELECT doc_id, words::INTEGER AS words, sentences::INTEGER AS sentences,
       coalesce(syl, 0)::INTEGER AS syllables,
       floor(CASE WHEN words > 0
                  THEN 206.835 - 1.015 * (words::DOUBLE
                                          / sentences::DOUBLE)
                       - 84.6 * (syl::DOUBLE / words::DOUBLE)
             END * 1e6 + 0.5) / 1e6 AS flesch,
       floor(CASE WHEN words > 0
                  THEN 0.39 * (words::DOUBLE / sentences::DOUBLE)
                       + 11.8 * (syl::DOUBLE / words::DOUBLE) - 15.59
             END * 1e6 + 0.5) / 1e6 AS fk_grade
FROM c
"""


def q_strip_markup(spark, sf_dir):
    """Markup stripping (text_stats.strip_markup): documents are
    wrapped in synthetic HTML (tags + script block + entities) inside
    the query, stripped, and hashed — the oracle replays both the
    wrapping and the regexp chain, so the round-trip pins every
    pattern. One narrow JVM projection."""
    from dask_ml_spark.datapipe.text_stats import strip_markup

    docs = _t(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(F.lit("<html><head><style>p{color:red}</style></head>"
                       "<body onload=\"x()\"><p class='t'>"),
                 F.col("text"),
                 F.lit("</p><script type=\"text/javascript\">var a=1;"
                       "</script>&amp;&lt;tag&gt;&nbsp;&quot;q&#39;"
                       "</body></html>")).alias("text"))
    out = strip_markup(html)
    return out.select("doc_id", F.md5("text").alias("clean_hash"),
                      F.length("text").cast("long").alias("clean_len"))


SQL_STRIP_MARKUP = r"""
WITH h AS (
    SELECT doc_id,
           '<html><head><style>p{color:red}</style></head><body onload="x()"><p class=''t''>'
           || text ||
           '</p><script type="text/javascript">var a=1;</script>&amp;&lt;tag&gt;&nbsp;&quot;q&#39;</body></html>'
           AS t
    FROM documents
),
s AS (
    SELECT doc_id,
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
          '(?s)<[^>]*>', ' ', 'g'),
        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      '[ \t\n\r\f]+', ' ', 'g')) AS clean
    FROM h
)
SELECT doc_id, md5(clean) AS clean_hash, length(clean)::BIGINT AS clean_len
FROM s
"""


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer-fit metrics (text_stats.vocab_coverage) per source:
    token count, OOV rate, chars-per-token against a fixed vocabulary
    (the corpus's own 20 most frequent tokens, pinned by the same
    deterministic count+tiebreak in both engines)."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.datapipe.text_stats import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    vocab = (docs.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
             .groupBy("w").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), F.asc("w")).limit(20).select("w"))
    return (vocab_coverage(docs, vocab, group_col="source")
            .orderBy("source"))


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (
    SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents
),
vocab AS (
    SELECT token AS w FROM toks GROUP BY token
    ORDER BY count(*) DESC, token ASC LIMIT 20
)
SELECT source,
       count(*)::BIGINT AS n_tokens,
       round(avg(CASE WHEN w IS NULL THEN 1.0 ELSE 0.0 END), 6) AS oov_rate,
       round(avg(length(token)), 6) AS chars_per_token
FROM toks LEFT JOIN vocab ON toks.token = vocab.w
GROUP BY source ORDER BY source
"""


def q_audio_fingerprint_bands(spark, sf_dir):
    """Spectral-gradient audio fingerprints (datapipe/audio_dedup.py)
    as four 16-bit bands — pure JVM expressions under stub=True
    (md5-tile energies), so the oracle replays every bit; the real
    PCM-WAV path shares the comparison math and is pinned in tests.
    The near-dup join is the shared banded-Hamming machinery already
    recall-oracled by image_near_dup_pairs."""
    from dask_ml_spark.datapipe.audio_dedup import audio_fingerprints
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text

    docs = _t(spark, sf_dir, "documents")
    h = audio_fingerprints(attach_binary_from_text(docs))
    return h.select("doc_id", *[F.col(f"h{i}").cast("long").alias(f"h{i}")
                                for i in range(4)])


def _sql_audio_fingerprint_bands() -> str:
    # byte[i mod 13] XOR byte[(5i+1) mod 16], matching
    # audio_dedup._stub_bands_struct — the mixed moduli give the tile
    # period lcm(13,16)=208 > 65 so no bit repeats (ADVICE r6); DuckDB
    # spells bitwise xor as xor() (its ^ is exponent)
    byte = ("('0x' || substr(md5(text), ((%s) %% %d) * 2 + 1, 2))::BIGINT")
    energies = (f"list_transform(range(0, 65), i -> "
                f"xor({byte % ('i', 13)}, {byte % ('5*i+1', 16)}))")
    bands = ", ".join(
        "list_sum(list_transform(range(0, 16), j -> CASE WHEN "
        f"e[16*{b}+j+1] > e[16*{b}+j+2] "
        f"THEN (1::BIGINT << (15 - j)) ELSE 0 END))::BIGINT AS h{b}"
        for b in range(4))
    return (f"WITH g AS (SELECT doc_id, {energies} AS e FROM documents)\n"
            f"SELECT doc_id, {bands} FROM g")


def q_fuzzy_vocab_pairs(spark, sf_dir):
    """Edit-distance fuzzy join (operators/joins.py::fuzzy_self_pairs,
    FastSS deletion-neighborhood blocking — exhaustive recall by
    construction): near-duplicate pairs in the corpus token
    vocabulary at edit distance <= 2. The oracle is the brute-force
    all-pairs levenshtein set (fine at vocabulary size; the Spark
    side never does all-pairs), proving the blocking loses nothing."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.operators.joins import fuzzy_self_pairs

    docs = _t(spark, sf_dir, "documents")
    vocab = (docs.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
             .distinct())
    return fuzzy_self_pairs(vocab, "w", "w", max_edit=2)


SQL_FUZZY_VOCAB_PAIRS = f"""
WITH v AS (
    SELECT DISTINCT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS w
    FROM documents
)
SELECT a.w AS id_a, b.w AS id_b, levenshtein(a.w, b.w)::BIGINT AS distance
FROM v a JOIN v b ON a.w < b.w
WHERE levenshtein(a.w, b.w) <= 2
"""


def _sql_image_near_dup_pairs() -> str:
    ham = " + ".join(f"bit_count(xor(a.h{i}, b.h{i}))" for i in range(4))
    return (f"WITH h AS ({_sql_dhash_bands()})\n"
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            f"({ham})::BIGINT AS hamming\n"
            "FROM h a JOIN h b ON a.doc_id < b.doc_id\n"
            f"WHERE ({ham}) <= 3")


def q_image_dedup_keep_one(spark, sf_dir):
    """The actionable multimodal dedup: dHash near-dup pairs →
    connected components → keep the min-id representative per cluster
    (the same dedup_keep_representatives the text dedup family uses —
    the pair ops compose across modalities). Oracle: recursive-CTE
    min-reachable-id over the brute-force pair set, anti-joined back."""
    from dask_ml_spark.datapipe.dedup import dedup_keep_representatives
    from dask_ml_spark.datapipe.image_dedup import image_near_dup
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text

    docs = _t(spark, sf_dir, "documents")
    blobs = attach_binary_from_text(docs)
    pairs = image_near_dup(blobs, max_hamming=3)
    kept = dedup_keep_representatives(docs, pairs)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("kept_checksum")))


def _sql_image_dedup_keep_one() -> str:
    ham = " + ".join(f"bit_count(xor(a.h{i}, b.h{i}))" for i in range(4))
    return f"""
WITH RECURSIVE h AS ({_sql_dhash_bands()}),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM h a JOIN h b ON a.doc_id < b.doc_id
  WHERE ({ham}) <= 3
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.node
),
dropped AS (
  SELECT node FROM (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
  WHERE node != cluster
)
SELECT source, count(*)::BIGINT AS n_kept,
       sum(doc_id)::BIGINT AS kept_checksum
FROM documents
WHERE doc_id NOT IN (SELECT node FROM dropped)
GROUP BY source
"""


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: blob → 4 evenly-spaced frame
    slices per row (explode-shaped mapInPandas). Slice lengths are pure
    arithmetic on the blob length — SQL-checkable."""
    from dask_ml_spark.datapipe.multimodal import attach_binary_from_text, frame_sample

    docs = _t(spark, sf_dir, "documents")
    blobs = attach_binary_from_text(docs)
    frames = frame_sample(blobs, n_frames=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame_blob").cast("long").alias("frame_len"),
    )


SQL_FRAME_SAMPLE = """
WITH b AS (
    SELECT doc_id, octet_length(encode(text)) AS L,
           greatest(1, octet_length(encode(text)) // 4) AS step
    FROM documents
)
SELECT doc_id, fi AS frame_idx,
       greatest(0, least(L, (fi + 1) * step) - fi * step) AS frame_len
FROM b, generate_series(0, 3) AS t(fi)
"""


# =====================================================================
# curation: boilerplate, shuffling, normalization, link filtering
# =====================================================================

def q_boilerplate_removal(spark, sf_dir):
    """Frequency-threshold boilerplate stripping: every line occurring
    in >= 25 distinct documents is dropped from ALL of them (nav-bar /
    cookie-banner rule — distinct from paragraph_dedup's keep-first).
    The synthetic docs have no newlines, so the query chunks on a
    common word; the operator is generic over `sep`."""
    docs = _t(spark, sf_dir, "documents")
    out = DD.remove_boilerplate(docs, sep=" table ", min_docs=25)
    return out.select("doc_id", "text", "n_lines", "n_kept")


SQL_BOILERPLATE_REMOVAL = """
WITH lines AS (
    SELECT doc_id,
           generate_subscripts(parts, 1) - 1 AS idx,
           unnest(parts) AS line
    FROM (SELECT doc_id, string_split(text, ' table ') AS parts FROM documents)
),
hashed AS (
    SELECT *, md5(line) AS h, length(trim(line)) >= 1 AS counted FROM lines
),
boiler AS (
    SELECT h FROM hashed WHERE counted
    GROUP BY h HAVING count(DISTINCT doc_id) >= 25
)
SELECT doc_id,
       COALESCE(string_agg(line, ' table ' ORDER BY idx)
                FILTER (WHERE keep), '') AS text,
       count(*) AS n_lines,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM (SELECT hashed.*, (b.h IS NULL OR NOT counted) AS keep
      FROM hashed LEFT JOIN boiler b ON hashed.h = b.h)
GROUP BY doc_id
"""


def q_repeated_span_removal(spark, sf_dir):
    """Corpus-wide repeated-span removal (the token-window rendering
    of exact-substring dedup, Lee et al. 2021): every 5-token window
    occurring >= 2 times anywhere in the corpus is removed from all
    but its first (min (doc_id, pos)) occurrence. Window hashing,
    occurrence counting, first-occurrence election, coverage merge,
    and reassembly all replay in SQL."""
    docs = _t(spark, sf_dir, "documents")
    out = DD.remove_repeated_spans(docs, span_tokens=5, min_occurrences=2)
    return out.select("doc_id", "text", "n_tokens", "n_kept")


SQL_REPEATED_SPAN_REMOVAL = f"""
WITH base AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
),
wins AS (
    SELECT b.doc_id, u.p - 1 AS pos,
           md5(array_to_string(b.toks[u.p : u.p + 4], ' ')) AS h
    FROM base b, unnest(range(1, len(b.toks) - 3)) AS u(p)
),
dup AS (
    SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
),
ranked AS (
    SELECT w.doc_id, w.pos,
           row_number() OVER (PARTITION BY w.h
                              ORDER BY w.doc_id, w.pos) AS rn
    FROM wins w JOIN dup USING (h)
),
cov AS (
    SELECT DISTINCT r.doc_id, r.pos + u.i AS idx
    FROM ranked r, unnest(range(0, 5)) AS u(i)
    WHERE r.rn > 1
),
tok AS (
    SELECT doc_id, generate_subscripts(toks, 1) - 1 AS idx,
           unnest(toks) AS tok
    FROM base
)
SELECT t.doc_id,
       COALESCE(string_agg(t.tok, ' ' ORDER BY t.idx)
                FILTER (WHERE c.idx IS NULL), '') AS text,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN c.idx IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.idx = c.idx
GROUP BY t.doc_id
UNION ALL
SELECT doc_id, '' AS text, 0::BIGINT AS n_tokens, 0::BIGINT AS n_kept
FROM base WHERE len(toks) = 0
"""


def q_document_chunks(spark, sf_dir):
    """Overlapping token-window chunking (datapipe/packing.py::
    chunk_documents): 32-token chunks at stride 24 (8-token overlap) —
    the RAG/embedding-ingest splitter, a pure narrow projection (zero
    shuffles); chunk boundaries, contents, and the no-redundant-tail
    rule all replay in SQL."""
    from dask_ml_spark.datapipe.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, stride=24).select(
        "doc_id", "chunk_id", "text", "n_tokens")


SQL_DOCUMENT_CHUNKS = f"""
WITH base AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
), nc AS (
    SELECT doc_id, toks,
           1 + greatest(CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT), 0)
               AS n_chunks
    FROM base WHERE len(toks) > 0
)
SELECT doc_id, u.i AS chunk_id,
       array_to_string(toks[u.i*24 + 1 : u.i*24 + 32], ' ') AS text,
       len(toks[u.i*24 + 1 : u.i*24 + 32])::BIGINT AS n_tokens
FROM nc, unnest(range(0, n_chunks)) AS u(i)
"""


def q_shuffle_shards(spark, sf_dir):
    """Content-deterministic corpus shuffle: md5(seed, doc_id) gives
    shard + within-shard order; per-shard count and first/last key are
    value-checked (the whole permutation is a function of content, so
    the oracle replays it exactly)."""
    from dask_ml_spark.datapipe.sampling import shuffle_shards

    docs = _t(spark, sf_dir, "documents")
    out = shuffle_shards(docs, n_shards=8, key_cols="doc_id", seed=1)
    return (out.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.min("shuffle_key").alias("first_key"),
                 F.max("shuffle_key").alias("last_key")))


SQL_SHUFFLE_SHARDS = """
WITH keyed AS (
    SELECT doc_id,
           md5('1' || chr(31) || doc_id::VARCHAR) AS shuffle_key
    FROM documents
)
SELECT ('0x' || substr(shuffle_key, 1, 15))::BIGINT % 8 AS shard,
       count(*) AS n_docs,
       min(shuffle_key) AS first_key,
       max(shuffle_key) AS last_key
FROM keyed
GROUP BY 1
"""


def q_normalized_text_hash(spark, sf_dir):
    """Unicode NFC + whitespace normalization, value-checked through
    md5: a decomposed 'e<combining-acute>' and a double space are
    appended to every document in BOTH engines, and the normalized
    text must hash identically (NFC composes the accent, the collapse
    removes the double space). Exercises the one legitimately UDF-bound
    step (Spark has no unicode-normalize builtin) as an Arrow batch."""
    from dask_ml_spark.datapipe.text_stats import normalize_text

    docs = (_t(spark, sf_dir, "documents")
            .withColumn("text", F.concat(F.col("text"),
                                         F.lit(" cafe\u0301  x"))))
    out = normalize_text(docs, form="NFC")
    return out.select("doc_id", F.md5("text").alias("text_md5"),
                      F.length("text").cast("long").alias("n_chars_norm"))


SQL_NORMALIZED_TEXT_HASH = """
WITH aug AS (
    SELECT doc_id, text || ' cafe' || chr(769) || '  x' AS text
    FROM documents
),
norm AS (
    -- same order as the operator: strip controls, unicode-normalize,
    -- THEN collapse/trim (NFKC can reintroduce U+0020 runs)
    SELECT doc_id,
           trim(regexp_replace(
               nfc_normalize(regexp_replace(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')),
               '[ \\t]+', ' ', 'g')) AS text
    FROM aug
)
SELECT doc_id, md5(text) AS text_md5, length(text) AS n_chars_norm
FROM norm
"""


def q_outlink_domain_profile(spark, sf_dir):
    """Outbound-link domain profile after a blocklist pass: synthetic
    deterministic URLs are appended in both engines, documents linking
    to a blocked domain are removed (broadcast semi-join -> anti-join),
    and the surviving corpus is profiled per domain. Extraction is one
    JVM regexp_extract_all — the identical RE2 pattern runs in the
    oracle."""
    from dask_ml_spark.datapipe.text_stats import (filter_blocked_domains,
                                                   outlink_domains)

    docs = (_t(spark, sf_dir, "documents")
            .withColumn("text", F.concat(
                F.col("text"), F.lit(" see https://site"),
                (F.col("doc_id") % 20).cast("string"),
                F.lit(".example.com/page and https://cdn.shared.net/x"))))
    block = docs.sparkSession.createDataFrame(
        [("site3.example.com",), ("site7.example.com",)], ["domain"])
    kept = filter_blocked_domains(docs, block)
    return (outlink_domains(kept)
            .groupBy("domain")
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("doc_id").alias("n_docs")))


def _sql_outlink_domain_profile() -> str:
    from dask_ml_spark.datapipe.text_stats import URL_DOMAIN_RE

    return SQL_OUTLINK_DOMAIN_PROFILE_TMPL.replace("__URL_RE__", URL_DOMAIN_RE)


SQL_OUTLINK_DOMAIN_PROFILE_TMPL = """
WITH aug AS (
    SELECT doc_id,
           text || ' see https://site' || (doc_id % 20)::VARCHAR
                || '.example.com/page and https://cdn.shared.net/x' AS text
    FROM documents
),
links AS (
    SELECT doc_id,
           lower(unnest(regexp_extract_all(
               text, '__URL_RE__', 1))) AS domain
    FROM aug
),
bad AS (
    SELECT DISTINCT doc_id FROM links
    WHERE domain IN ('site3.example.com', 'site7.example.com')
)
SELECT domain, count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
FROM links
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
GROUP BY 1
"""


def q_corpus_manifest(spark, sf_dir):
    """Per-source release manifest: counts, token mass, id range, and
    an order-insensitive engine-portable content checksum (bit_xor of
    a 60-bit md5 fold) — ONE hash aggregate, verifiable without
    re-reading shards in any fixed order."""
    from dask_ml_spark.datapipe.profiling import corpus_manifest

    docs = _t(spark, sf_dir, "documents")
    return corpus_manifest(docs, group_cols=("source",))


SQL_CORPUS_MANIFEST = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       bit_xor(('0x' || substr(md5(doc_id::VARCHAR || chr(31) || text), 1, 15))::BIGINT)
           AS content_checksum
FROM documents
GROUP BY source
"""


def q_pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN with PINNED codebooks (the subvectors
    of vec_id 0..15 — same fixed-state pattern as ivf_ann_topk): encode
    compresses 64 float dims to 4 codes in one narrow JVM projection,
    and each query scores the compressed corpus via its literal ADC
    distance table. Assignment, scoring, and ranking all replay in
    SQL. The learned-codebook path (PQIndex.fit) stays the production
    default and is recall-tested against brute force."""
    import numpy as np

    from dask_ml_spark.datapipe.similarity import PQIndex

    emb = _t(spark, sf_dir, "embeddings")
    pq = PQIndex(m=4, k=16)
    rows = (emb.where(F.col("vec_id") < 16).orderBy("vec_id")
            .select("embedding").collect())
    vecs = np.asarray([list(r[0]) for r in rows], dtype="float64")
    pq.codebooks_ = [vecs[:, s * 16:(s + 1) * 16] for s in range(4)]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = pq.search(emb, queries, topk=10)
    return out.select("query_id", "vec_id",
                      F.col("rank").cast("long").alias("rank"))


SQL_PQ_ANN_TOPK = """
WITH ss AS (SELECT unnest(range(0, 4)) AS s),
cw AS (
    SELECT ss.s, e.vec_id AS j,
           (e.embedding[ss.s*16+1 : ss.s*16+16])::DOUBLE[] AS cvec
    FROM embeddings e CROSS JOIN ss WHERE e.vec_id < 16
),
codes AS (
    SELECT e.vec_id, ss.s,
           (SELECT j FROM cw WHERE cw.s = ss.s
            ORDER BY list_distance(
                (e.embedding[ss.s*16+1 : ss.s*16+16])::DOUBLE[],
                cw.cvec) ASC, j ASC
            LIMIT 1) AS j
    FROM embeddings e CROSS JOIN ss
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id,
           sum(pow(list_distance(
               (q.embedding[c.s*16+1 : c.s*16+16])::DOUBLE[], cw.cvec), 2))
               AS score
    FROM embeddings q
    CROSS JOIN codes c
    JOIN cw ON cw.s = c.s AND cw.j = c.j
    WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
    GROUP BY 1, 2
)
SELECT query_id, vec_id, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score ASC, vec_id ASC) AS rank
    FROM scored
) WHERE rank <= 10
"""


def q_ivfpq_ann_topk(spark, sf_dir):
    """IVF-PQ with PINNED state (coarse centroids = embeddings 0..7,
    residual codewords = subvectors of embeddings 8..23): vectors route
    to inverted lists, PQ encodes the residual against the list
    centroid, and each query ADC-scores its 2 probed lists against the
    QUERY residual — the production ANN layout, with assignment,
    residual encoding, probing, and scoring all replayed in SQL."""
    import numpy as np

    from dask_ml_spark.datapipe.similarity import IVFPQIndex

    emb = _t(spark, sf_dir, "embeddings")
    idx = IVFPQIndex(n_lists=8, m=4, k=16, n_probe=2)
    cents = np.asarray(
        [list(r[0]) for r in emb.where(F.col("vec_id") < 8)
         .orderBy("vec_id").select("embedding").collect()], dtype="float64")
    words = np.asarray(
        [list(r[0]) for r in
         emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 24))
         .orderBy("vec_id").select("embedding").collect()], dtype="float64")
    idx.centroids_ = cents
    idx.codebooks_ = [words[:, s * 16:(s + 1) * 16] for s in range(4)]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = idx.search(emb, queries, topk=10)
    return out.select("query_id", "vec_id",
                      F.col("rank").cast("long").alias("rank"))


SQL_IVFPQ_ANN_TOPK = """
WITH ss AS (SELECT unnest(range(0, 4)) AS s),
cent AS (
    SELECT vec_id AS c, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
cw AS (
    SELECT ss.s, e.vec_id - 8 AS j,
           (e.embedding[ss.s*16+1 : ss.s*16+16])::DOUBLE[] AS wvec
    FROM embeddings e CROSS JOIN ss
    WHERE e.vec_id >= 8 AND e.vec_id < 24
),
assign AS (
    SELECT e.vec_id, e.embedding,
           (SELECT c FROM cent
            ORDER BY list_distance(e.embedding::DOUBLE[],
                                   cent.cvec::DOUBLE[]) ASC, c ASC
            LIMIT 1) AS bucket
    FROM embeddings e
),
resid AS (
    SELECT a.vec_id, a.bucket,
           list_transform(range(1, 65),
                          i -> a.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
               AS r
    FROM assign a JOIN cent c ON a.bucket = c.c
),
codes AS (
    SELECT r.vec_id, r.bucket, ss.s,
           (SELECT j FROM cw WHERE cw.s = ss.s
            ORDER BY list_distance(
                (r.r[ss.s*16+1 : ss.s*16+16])::DOUBLE[], cw.wvec) ASC, j ASC
            LIMIT 1) AS j
    FROM resid r CROSS JOIN ss
),
qprobe AS (
    SELECT query_id, embedding, lst, cvec FROM (
        SELECT q.vec_id AS query_id, q.embedding, cent.c AS lst, cent.cvec,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_distance(q.embedding::DOUBLE[],
                                          cent.cvec::DOUBLE[]) ASC,
                            cent.c ASC) AS pr
        FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 5
    ) WHERE pr <= 2
),
scored AS (
    SELECT qp.query_id, codes.vec_id,
           sum(pow(list_distance(
               (list_transform(range(1, 65),
                    i -> qp.embedding[i]::DOUBLE - qp.cvec[i]::DOUBLE)
                )[codes.s*16+1 : codes.s*16+16],
               cw.wvec), 2)) AS score
    FROM qprobe qp
    JOIN codes ON codes.bucket = qp.lst AND codes.vec_id <> qp.query_id
    JOIN cw ON cw.s = codes.s AND cw.j = codes.j
    GROUP BY 1, 2
)
SELECT query_id, vec_id, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score ASC, vec_id ASC) AS rank
    FROM scored
) WHERE rank <= 10
"""


def q_corpus_diff(spark, sf_dir):
    """Release-to-release diff: a v2 corpus is derived deterministically
    (every 7th doc dropped, every 5th edited) and diffed against v1 by
    content hash — added/removed/retained copy counts per source.
    Duplicate content cannot fan out the join (per-side hash counts)."""
    from dask_ml_spark.datapipe.profiling import corpus_diff

    docs = _t(spark, sf_dir, "documents")
    v2 = (docs.where(F.col("doc_id") % 7 != 0)
          .withColumn("text", F.when(F.col("doc_id") % 5 == 0,
                                     F.concat(F.col("text"), F.lit(" v2")))
                      .otherwise(F.col("text"))))
    return corpus_diff(docs, v2, group_cols=("source",))


SQL_CORPUS_DIFF = """
WITH v2 AS (
    SELECT source,
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 0
), o AS (
    SELECT source, md5(text) AS h, count(*) AS n_old
    FROM documents GROUP BY 1, 2
), n AS (
    SELECT source, md5(text) AS h, count(*) AS n_new
    FROM v2 GROUP BY 1, 2
), j AS (
    SELECT coalesce(o.source, n.source) AS source,
           coalesce(n_old, 0) AS no, coalesce(n_new, 0) AS nn
    FROM o FULL OUTER JOIN n ON o.source = n.source AND o.h = n.h
)
SELECT source,
       CAST(sum(greatest(nn - no, 0)) AS BIGINT) AS added,
       CAST(sum(greatest(no - nn, 0)) AS BIGINT) AS removed,
       CAST(sum(least(no, nn)) AS BIGINT) AS retained
FROM j GROUP BY 1
"""


def q_perplexity_bucket_sample(spark, sf_dir):
    """Perplexity-curriculum selection: bigram-LM fluency scores ->
    equal-width buckets -> content-deterministic per-bucket sampling
    rates (keep the mid-perplexity band fully, thin the tails — the
    CCNet bucketing rule). Composition of three oracled operators in
    one Catalyst plan."""
    from dask_ml_spark.datapipe.text_stats import bigram_logprob_scores
    from dask_ml_spark.plans.model_selection import _hash_bucket_expr

    docs = _t(spark, sf_dir, "documents")
    # bigram_logprob_scores already returns avg_logprob rounded to 6,
    # so both engines bucket the same values; the bucket bounds are
    # dyadic (width 0.0625), keeping the arithmetic FP-exact too
    scored = bigram_logprob_scores(docs)
    b = F.width_bucket(F.col("avg_logprob"), F.lit(-3.5), F.lit(-3.25), F.lit(4))
    rates = {1: 0.25, 2: 1.0, 3: 1.0, 4: 0.25, 0: 0.1, 5: 0.1}
    keep_cut = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])[b]
    bucket = _hash_bucket_expr(["doc_id"], 10_000, 17, df=scored)
    out = (scored.withColumn("ppl_bucket", b.cast("int"))
           .where(bucket < keep_cut * 10_000)
           .groupBy("ppl_bucket")
           .agg(F.count("*").alias("n_kept"),
                F.round(F.avg("avg_logprob"), 6).alias("mean_logprob")))
    return out


def _sql_perplexity_bucket_sample(sql_bigram_logprob: str) -> str:
    return f"""
WITH scored AS ({sql_bigram_logprob}),
b AS (
    SELECT doc_id, avg_logprob,
           CASE WHEN avg_logprob < -3.5 THEN 0
                WHEN avg_logprob >= -3.25 THEN 5
                ELSE 1 + floor((avg_logprob - (-3.5)) / 0.0625)::INT END AS ppl_bucket,
           ((((17 + doc_id) % 2147483648) * 2654435761) % 2147483648) % 10000 AS bucket
    FROM scored
), rated AS (
    SELECT *, CASE ppl_bucket WHEN 1 THEN 0.25 WHEN 2 THEN 1.0
                              WHEN 3 THEN 1.0 WHEN 4 THEN 0.25
                              ELSE 0.1 END AS cut
    FROM b
)
SELECT ppl_bucket, count(*) AS n_kept,
       round(avg(avg_logprob), 6) AS mean_logprob
FROM rated
WHERE bucket < cut * 10000
GROUP BY 1
"""


def q_quality_classifier_scores(spark, sf_dir):
    """Weak-supervision quality classifier end to end: heuristic
    length-prior labels -> distributed GaussianNB moments fit ->
    corpus-wide log-odds scoring as a literal-folded projection. The
    oracle replays the features, the labeling rule, the per-class
    mean/var_pop aggregates, sklearn's var_smoothing rule, and the
    full joint-log-likelihood arithmetic — the SCORES hash-match, not
    just the fit."""
    from dask_ml_spark.datapipe.quality_model import (score_quality,
                                                      train_quality_classifier)

    docs = _t(spark, sf_dir, "documents")
    nb = train_quality_classifier(docs)
    scored = score_quality(docs, nb)
    return scored.select(
        "doc_id",
        F.round("quality_logit", 6).alias("quality_logit"),
        (F.col("quality_logit") > 0).cast("int").alias("pred"))


def _sql_quality_classifier_scores() -> str:
    en = ", ".join(f"'{w}'" for w in TS.STOPWORDS["en"])

    def jll(m: str) -> str:
        terms = [f"ln({m}.prior)"]
        for j, f in enumerate(
                ["distinct_ratio", "stopword_ratio", "digit_ratio"], 1):
            terms.append(f"- 0.5 * ln(2 * pi() * {m}.v{j})")
            terms.append(f"- pow(f.{f} - {m}.m{j}, 2) / (2 * {m}.v{j})")
        return " ".join(terms)

    return f"""
WITH feats AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE AS distinct_ratio,
           len(list_intersect(list_distinct(toks), [{en}]))
               / greatest(len(toks), 1)::DOUBLE AS stopword_ratio,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
               / greatest(length(text), 1)::DOUBLE AS digit_ratio
    FROM (SELECT doc_id, text,
                 regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
          FROM documents)
), lab AS (
    SELECT *, CASE WHEN n_tokens >= 40 THEN 1 ELSE 0 END AS label FROM feats
), stats AS (
    SELECT label, count(*)::DOUBLE AS n,
           avg(distinct_ratio) AS m1, var_pop(distinct_ratio) AS v1,
           avg(stopword_ratio) AS m2, var_pop(stopword_ratio) AS v2,
           avg(digit_ratio)    AS m3, var_pop(digit_ratio)    AS v3
    FROM lab GROUP BY label
), eps AS (
    SELECT 1e-9 * max(greatest(v1, v2, v3)) AS e FROM stats
), model AS (
    SELECT label, n / (SELECT sum(n) FROM stats) AS prior,
           m1, v1 + e AS v1, m2, v2 + e AS v2, m3, v3 + e AS v3
    FROM stats CROSS JOIN eps
)
SELECT doc_id, round(logit, 6) AS quality_logit,
       CASE WHEN logit > 0 THEN 1 ELSE 0 END AS pred
FROM (
    SELECT f.doc_id, ({jll('g')}) - ({jll('b')}) AS logit
    FROM feats f
    CROSS JOIN (SELECT * FROM model WHERE label = 1) g
    CROSS JOIN (SELECT * FROM model WHERE label = 0) b
)
"""


def q_bpe_pair_counts(spark, sf_dir):
    """First round of distributed BPE training: adjacent-symbol pair
    frequencies over the word-TYPE table (the corpus is touched once;
    every merge round runs on the vocabulary-bounded types). Top-20
    with full deterministic tie-break."""
    from dask_ml_spark.datapipe.bpe import _pair_counts, _to_symbols, word_types

    docs = _t(spark, sf_dir, "documents")
    words = word_types(docs).withColumn("syms", _to_symbols(F.col("word")))
    return (_pair_counts(words)
            .select(F.col("left").alias("pair_left"),
                    F.col("right").alias("pair_right"),
                    F.col("pair_count"))
            .orderBy(F.desc("pair_count"), "pair_left", "pair_right")
            .limit(20))


SQL_BPE_PAIR_COUNTS = """
WITH words AS (
    SELECT word, count(*) AS n FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]{2,}')) AS word
        FROM documents)
    GROUP BY word
),
syms AS (
    SELECT n, regexp_extract_all(word, '.') AS cs FROM words
    WHERE length(word) >= 2
),
pairs AS (
    SELECT cs[i] AS pair_left, cs[i + 1] AS pair_right, n
    FROM syms, unnest(range(1, len(cs))) AS t(i)
)
SELECT pair_left, pair_right, CAST(sum(n) AS BIGINT) AS pair_count
FROM pairs
GROUP BY 1, 2
ORDER BY pair_count DESC, pair_left, pair_right
LIMIT 20
"""


def q_bpe_merges(spark, sf_dir):
    """Full distributed BPE training (6 merge rounds) — deterministic
    (ties break count desc, pair asc) but its k-round greedy replay is
    not expressible in one SQL pass, so the driver does the rows-only
    check; pytest pins training EXACTLY against an independent
    pure-Python BPE (tests/test_bpe.py)."""
    from dask_ml_spark.datapipe.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, n_merges=6)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, pair_left string, pair_right string, pair_count bigint")


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


# =====================================================================
# catalog assembly
# =====================================================================

def build_catalog():
    """Returns (queries dict, oracle dict). Queries without an oracle
    entry get the driver's rows-only check (iterative/seeded ops)."""
    queries = {
        "pricing_summary": q_pricing_summary,
        "top_revenue_nations": q_top_revenue_nations,
        "revenue_forecast": q_revenue_forecast,
        "shipping_priority": q_shipping_priority,
        "order_priority_returns": q_order_priority_returns,
        "customer_returns_topk": q_customer_returns_topk,
        "hash_split_train_stats": q_hash_split_train_stats,
        "event_props_json": q_event_props_json,
        "event_value_moving_avg": q_event_value_moving_avg,
        "standard_scaler_fit": q_standard_scaler_fit,
        "standard_scaler_transform": q_standard_scaler_transform,
        "minmax_scaler_fit": q_minmax_scaler_fit,
        "robust_scaler_fit": q_robust_scaler_fit,
        "simple_imputer_fit": q_simple_imputer_fit,
        "polynomial_features": q_polynomial_features,
        "pairwise_distance_to_centers": q_pairwise_distance_to_centers,
        "minmax_scaler_transform": q_minmax_scaler_transform,
        "label_encoder_fit": q_label_encoder_fit,
        "label_encoder_transform": q_label_encoder_transform,
        "ordinal_encoder": q_ordinal_encoder,
        "dummy_encoder": q_dummy_encoder,
        "gaussian_nb_fit": q_gaussian_nb_fit,
        "simple_ols_fit": q_simple_ols_fit,
        "ols_newton_fit": q_ols_newton_fit,
        "logistic_newton_fit": q_logistic_newton_fit,
        "poisson_newton_fit": q_poisson_newton_fit,
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
        "pca_covariance": q_pca_covariance,
        "incremental_pca_fit": q_incremental_pca_fit,
        "repetition_scores": q_repetition_scores,
        "bm25_scores": q_bm25_scores,
        "bm25_topk": q_bm25_topk,
        "dedup_clusters": q_dedup_clusters,
        "pii_redaction": q_pii_redaction,
        "token_shards": q_token_shards,
        "sequence_packing": q_sequence_packing,
        "classification_metrics": q_classification_metrics,
        "regression_metrics": q_regression_metrics,
        "token_document_frequency": q_token_document_frequency,
        "tfidf": q_tfidf,
        "exact_dedup": q_exact_dedup,
        "paragraph_dedup": q_paragraph_dedup,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ann_bruteforce_topk": q_ann_bruteforce_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_scaled": q_embedding_near_dup_scaled,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_linear": q_semantic_dedup_linear,
        "quantized_embeddings": q_quantized_embeddings,
        "ann_recall_metrics": q_ann_recall_metrics,
        "idle_customers": q_idle_customers,
        "cross_corpus_dedup": q_cross_corpus_dedup,
        "cross_corpus_minhash": q_cross_corpus_minhash,
        "asof_purchase_attribution": q_asof_purchase_attribution,
        "kbins_discretizer": q_kbins_discretizer,
        "kbins_discretizer_approx": q_kbins_discretizer_approx,
        "small_quantity_revenue": q_small_quantity_revenue,
        "source_token_quota": q_source_token_quota,
        "bracketed_discount_revenue": q_bracketed_discount_revenue,
        "important_parts": q_important_parts,
        "target_encoder": q_target_encoder,
        "row_normalizer": q_row_normalizer,
        "maxabs_scaler": q_maxabs_scaler,
        "interval_session_clicks": q_interval_session_clicks,
        "sole_supplier_orders": q_sole_supplier_orders,
        "corpus_manifest": q_corpus_manifest,
        "corpus_diff": q_corpus_diff,
        "pq_ann_topk": q_pq_ann_topk,
        "ivfpq_ann_topk": q_ivfpq_ann_topk,
        "bloom_decontam_scores": q_bloom_decontam_scores,
        "domain_pagerank": q_domain_pagerank,
        "score_smoothing": q_score_smoothing,
        "token_heavy_hitters": q_token_heavy_hitters,
        "weighted_doc_sample": q_weighted_doc_sample,
        "weighted_lang_sample": q_weighted_lang_sample,
        "variance_threshold": q_variance_threshold,
        "select_kbest": q_select_kbest,
        "f_regression_scores": q_f_regression_scores,
        "time_series_split_stats": q_time_series_split_stats,
        "winsorized_prices": q_winsorized_prices,
        "part_attribute_stats": q_part_attribute_stats,
        "quality_drift": q_quality_drift,
        "chi2_scores": q_chi2_scores,
        "group_kfold_assignment": q_group_kfold_assignment,
        "perplexity_bucket_sample": q_perplexity_bucket_sample,
        "quality_classifier_scores": q_quality_classifier_scores,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_merges": q_bpe_merges,
        "view_click_attribution": q_view_click_attribution,
        "boilerplate_removal": q_boilerplate_removal,
        "repeated_span_removal": q_repeated_span_removal,
        "document_chunks": q_document_chunks,
        "shuffle_shards": q_shuffle_shards,
        "normalized_text_hash": q_normalized_text_hash,
        "outlink_domain_profile": q_outlink_domain_profile,
        "min_cost_supplier": q_min_cost_supplier,
        "late_shipment_priority": q_late_shipment_priority,
        "top_supplier_revenue": q_top_supplier_revenue,
        "part_supplier_variety": q_part_supplier_variety,
        "dominant_part_suppliers": q_dominant_part_suppliers,
        "embedding_centroids": q_embedding_centroids,
        "language_id": q_language_id,
        "cohens_kappa_lang": q_cohens_kappa_lang,
        "mcnemar_quality_screens": q_mcnemar_quality_screens,
        "cochrans_q_screens": q_cochrans_q_screens,
        "mcc_return_rule": q_mcc_return_rule,
        "ece_event_probability": q_ece_event_probability,
        "quality_scores": q_quality_scores,
        "document_fingerprint": q_document_fingerprint,
        "windowed_event_features": q_windowed_event_features,
        "event_type_rollup": q_event_type_rollup,
        "quantile_transformer_fit": q_quantile_transformer_fit,
        "one_hot_encoder": q_one_hot_encoder,
        "count_vectorizer_long": q_count_vectorizer_long,
        "rbf_kernel_to_centers": q_rbf_kernel_to_centers,
        "event_sessionization": q_event_sessionization,
        "multimodal_decode": q_multimodal_decode,
        "image_dhash_bands": q_image_dhash_bands,
        "fuzzy_vocab_pairs": q_fuzzy_vocab_pairs,
        "audio_fingerprint_bands": q_audio_fingerprint_bands,
        "strip_markup": q_strip_markup,
        "cooccurrence_topk": q_cooccurrence_topk,
        "ppmi_topk": q_ppmi_topk,
        "collocations_logdice_topk": q_collocations_logdice_topk,
        "source_concentration": q_source_concentration,
        "readability_docs": q_readability_docs,
        "vocab_coverage": q_vocab_coverage,
        "image_near_dup_pairs": q_image_near_dup_pairs,
        "image_dedup_keep_one": q_image_dedup_keep_one,
        "frame_sample": q_frame_sample,
        "quality_filter": q_quality_filter,
        "weighted_metrics": q_weighted_metrics,
        "pipeline_poly_scale": q_pipeline_poly_scale,
        "simple_imputer_transform": q_simple_imputer_transform,
        "column_transformer": q_column_transformer,
        "robust_scaler_transform": q_robust_scaler_transform,
        "label_encoder_roundtrip": q_label_encoder_roundtrip,
        "part_brand_stats": q_part_brand_stats,
        "curation_pipeline": q_curation_pipeline,
        "training_data_prep": q_training_data_prep,
        "contamination_scores": q_contamination_scores,
        "url_dedup": q_url_dedup,
        "gopher_quality": q_gopher_quality,
        "script_profile": q_script_profile,
        "mixture_sample": q_mixture_sample,
        "temperature_mixture_sample": q_temperature_mixture,
        "epoch_plan": q_epoch_plan,
        "table_profile": q_table_profile,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_logprob,
        # ivf_ann_topk is oracled (fixed quantizer); the rest below are
        # rows-only (iterative / seeded / sketch-based — no SQL equivalent)
        "table_profile_approx": q_table_profile_approx,
        "quantile_transformer_fit_approx": q_quantile_transformer_fit_approx,
        "kmeans_cluster_sizes": q_kmeans_cluster_sizes,
        "gmm_params": q_gmm_params,
        "frequent_itemsets_stats": q_frequent_itemsets_stats,
        "association_rules_topk": q_association_rules_topk,
        "copurchase_triangles": q_copurchase_triangles,
        "time_fill_events": q_time_fill_events,
        "random_projection_norms": q_random_projection_norms,
        "logistic_regression_eval": q_logistic_regression_eval,
        "logistic_saturated_fit": q_logistic_saturated_fit,
        "pca_transform_variance": q_pca_transform_variance,
        "ivf_ann_topk": q_ivf_ann_topk,
        "lsh_ann_topk": q_lsh_ann_topk,
        "knn_graph_topk": q_knn_graph_topk,
        "stratified_sample": q_stratified_sample,
        "kcenter_sample": q_kcenter_sample,
        "knn_classifier_eval": q_knn_classifier_eval,
        "group_quality_topk": q_group_quality_topk,
        "hashing_vectorizer_long": q_hashing_vectorizer_long,
        "hashing_vectorizer_portable": q_hashing_vectorizer_portable,
        "incremental_search_best": q_incremental_search_best,
        "truncated_svd_variance": q_truncated_svd_variance,
        "grid_search_best": q_grid_search_best,
        "ridge_grid_search_hash_cv": q_ridge_grid_search,
        "blockwise_voting_eval": q_blockwise_voting_eval,
        "train_test_split_sizes": q_train_test_split_sizes,
        "spectral_clustering_sizes": q_spectral_clustering_sizes,
        "incremental_sgd_eval": q_incremental_sgd_eval,
        "ks_price_test": q_ks_price_test,
        "ks_price_test_binned": q_ks_price_test_binned,
        "mann_whitney_discount": q_mann_whitney_discount,
        "hl_shift_price": q_hl_shift_price,
        "wilcoxon_user_value": q_wilcoxon_user_value,
        "friedman_user_event_value": q_friedman_user_event_value,
        "benford_price": q_benford_price,
        "chi2_independence_flags": q_chi2_independence_flags,
        "welch_ttest_price": q_welch_ttest_price,
        "welch_bh_by_month": q_welch_bh_by_month,
        "bootstrap_price_ci": q_bootstrap_price_ci,
        "bootstrap_ci_by_flag": q_bootstrap_ci_by_flag,
        "prop_ztest_discount": q_prop_ztest_discount,
        "anova_event_value": q_anova_event_value,
        "pairwise_welch_events": q_pairwise_welch_events,
        # headline = the binned scale path (the r12 promotion: the
        # documented default for continuous columns); the exact
        # tie-averaged-rank path stays oracled as the parity witness
        "spearman_price_quantity": q_spearman_price_quantity,
        "spearman_price_quantity_exact": q_spearman_price_quantity_exact,
        "kendall_price_quantity": q_kendall_price_quantity,
        "hoeffding_price_quantity": q_hoeffding_price_quantity,
        "kruskal_wallis_quantity": q_kruskal_wallis_quantity,
        "jonckheere_priority_price": q_jonckheere_priority_price,
        "brown_forsythe_price": q_brown_forsythe_price,
        "isotonic_price_curve": q_isotonic_price_curve,
        "changepoint_event_value": q_changepoint_event_value,
        "trend_event_value": q_trend_event_value,
        "ks_drift_daily": q_ks_drift_daily,
        "psi_drift_daily": q_psi_drift_daily,
        "catdrift_daily": q_catdrift_daily,
        "zdrift_daily": q_zdrift_daily,
        "corrdrift_monthly": q_corrdrift_monthly,
        "covdrift_monthly": q_covdrift_monthly,
        "quantile_drift_daily": q_quantile_drift_daily,
        "embedding_drift_labels": q_embedding_drift_labels,
        "acf_daily_value": q_acf_daily_value,
        "seasonal_decompose_daily": q_seasonal_decompose_daily,
        "partial_corr_price_quantity": q_partial_corr_price_quantity,
        "mutual_information_events": q_mutual_information_events,
        "feature_corr_matrix": q_feature_corr_matrix,
        "kaplan_meier_conversion": q_kaplan_meier_conversion,
        "poisson_regression_fit": q_poisson_regression_fit,
        "poisson_saturated_fit": q_poisson_saturated_fit,
        "roc_auc_eval": q_roc_auc_eval,
        "roc_auc_binned": q_roc_auc_binned,
        "precision_recall_f1": q_precision_recall_f1,
        "confusion_matrix": q_confusion_matrix,
        "calibration_curve": q_calibration_curve,
        "make_blobs_kmeans": q_make_blobs_kmeans,
        "blobs_deterministic_stats": q_blobs_deterministic_stats,
        "dbscan_cluster_sizes": q_dbscan_cluster_sizes,
        "mahalanobis_outliers": q_mahalanobis_outliers,
        "feature_hasher_long": q_feature_hasher_long,
        "feature_hasher_portable": q_feature_hasher_portable,
        "hyperband_best": q_hyperband_best,
        "parallel_post_fit_eval": q_parallel_post_fit_eval,
        "pipeline_grid_search": q_pipeline_grid_search,
    }
    oracles = {
        "pricing_summary": SQL_PRICING_SUMMARY,
        "top_revenue_nations": SQL_TOP_REVENUE_NATIONS,
        "revenue_forecast": SQL_REVENUE_FORECAST,
        "shipping_priority": SQL_SHIPPING_PRIORITY,
        "order_priority_returns": SQL_ORDER_PRIORITY_RETURNS,
        "customer_returns_topk": SQL_CUSTOMER_RETURNS_TOPK,
        "hash_split_train_stats": SQL_HASH_SPLIT_TRAIN_STATS,
        "event_props_json": SQL_EVENT_PROPS_JSON,
        "event_value_moving_avg": SQL_EVENT_VALUE_MOVING_AVG,
        "standard_scaler_fit": SQL_STANDARD_SCALER_FIT,
        "standard_scaler_transform": SQL_STANDARD_SCALER_TRANSFORM,
        "minmax_scaler_fit": SQL_MINMAX_SCALER_FIT,
        "robust_scaler_fit": SQL_ROBUST_SCALER_FIT,
        "simple_imputer_fit": SQL_SIMPLE_IMPUTER_FIT,
        "polynomial_features": SQL_POLYNOMIAL_FEATURES,
        "pairwise_distance_to_centers": SQL_PAIRWISE_DISTANCE_TO_CENTERS,
        "minmax_scaler_transform": SQL_MINMAX_SCALER_TRANSFORM,
        "label_encoder_fit": SQL_LABEL_ENCODER_FIT,
        "label_encoder_transform": SQL_LABEL_ENCODER_TRANSFORM,
        "ordinal_encoder": SQL_ORDINAL_ENCODER,
        "dummy_encoder": sql_dummy_encoder(["F", "O", "P"]),
        "gaussian_nb_fit": SQL_GAUSSIAN_NB_FIT,
        "simple_ols_fit": SQL_SIMPLE_OLS_FIT,
        "ols_newton_fit": SQL_OLS_NEWTON_FIT,
        "logistic_newton_fit": SQL_LOGISTIC_NEWTON_FIT,
        "poisson_newton_fit": SQL_POISSON_NEWTON_FIT,
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
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "kcenter_sample": _sql_kcenter_sample(),
        "knn_classifier_eval": SQL_KNN_CLASSIFIER_EVAL,
        "group_quality_topk": sql_group_quality_topk(),
        "pca_covariance": SQL_PCA_COVARIANCE,
        "incremental_pca_fit": SQL_INCREMENTAL_PCA_FIT,
        "repetition_scores": SQL_REPETITION_SCORES,
        "bm25_scores": SQL_BM25_SCORES,
        "bm25_topk": _sql_bm25_topk(),
        "dedup_clusters": _sql_dedup_clusters(),
        "pii_redaction": _sql_pii_redaction(),
        "token_shards": SQL_TOKEN_SHARDS,
        "sequence_packing": SQL_SEQUENCE_PACKING,
        "classification_metrics": SQL_CLASSIFICATION_METRICS,
        "regression_metrics": SQL_REGRESSION_METRICS,
        "token_document_frequency": SQL_TOKEN_DOCUMENT_FREQUENCY,
        "tfidf": SQL_TFIDF,
        "exact_dedup": SQL_EXACT_DEDUP,
        "minhash_signatures": sql_minhash_signatures(8),
        "minhash_lsh_pairs": sql_minhash_lsh_pairs(8, 4),
        "simhash": sql_simhash(16),
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
        "contamination_scores": SQL_CONTAMINATION_SCORES,
        "url_dedup": _sql_url_dedup(),
        "gopher_quality": SQL_GOPHER_QUALITY,
        "script_profile": _sql_script_profile(),
        "mixture_sample": _sql_mixture_sample(),
        "temperature_mixture_sample": _sql_temperature_mixture(),
        "epoch_plan": SQL_EPOCH_PLAN,
        "table_profile": _sql_table_profile(),
        # the approx query emits exact stats + a deterministic HLL
        # bound flag; the oracle replays the stats and pins the flag
        "table_profile_approx":
            "SELECT *, TRUE AS hll_ok FROM (" + _sql_table_profile() + ")",
        "unigram_logprob": SQL_UNIGRAM_LOGPROB,
        "bigram_logprob": SQL_BIGRAM_LOGPROB,
        "ann_bruteforce_topk": SQL_ANN_BRUTEFORCE_TOPK,
        "ivf_ann_topk": SQL_IVF_ANN_TOPK,
        "lsh_ann_topk": SQL_LSH_ANN_TOPK,
        "knn_graph_topk": SQL_KNN_GRAPH_TOPK,
        "embedding_near_dup": sql_embedding_near_dup(),
        "embedding_near_dup_scaled": sql_embedding_near_dup_scaled(),
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        "semantic_dedup_linear": sql_semantic_dedup_linear(),
        "quantized_embeddings": SQL_QUANTIZED_EMBEDDINGS,
        "ann_recall_metrics": sql_ann_recall_metrics(),
        "idle_customers": SQL_IDLE_CUSTOMERS,
        "cross_corpus_dedup": SQL_CROSS_CORPUS_DEDUP,
        "cross_corpus_minhash": sql_cross_corpus_minhash(),
        "asof_purchase_attribution": SQL_ASOF_PURCHASE_ATTRIBUTION,
        "kbins_discretizer": SQL_KBINS_DISCRETIZER,
        "kbins_discretizer_approx": SQL_KBINS_DISCRETIZER_APPROX,
        "quantile_transformer_fit_approx": SQL_QUANTILE_TRANSFORMER_FIT_APPROX,
        "target_encoder": SQL_TARGET_ENCODER,
        "small_quantity_revenue": SQL_SMALL_QUANTITY_REVENUE,
        "source_token_quota": SQL_SOURCE_TOKEN_QUOTA,
        "bracketed_discount_revenue": SQL_BRACKETED_DISCOUNT_REVENUE,
        "important_parts": SQL_IMPORTANT_PARTS,
        "row_normalizer": SQL_ROW_NORMALIZER,
        "maxabs_scaler": SQL_MAXABS_SCALER,
        "interval_session_clicks": SQL_INTERVAL_SESSION_CLICKS,
        "sole_supplier_orders": SQL_SOLE_SUPPLIER_ORDERS,
        "corpus_manifest": SQL_CORPUS_MANIFEST,
        "corpus_diff": SQL_CORPUS_DIFF,
        "pq_ann_topk": SQL_PQ_ANN_TOPK,
        "ivfpq_ann_topk": SQL_IVFPQ_ANN_TOPK,
        "bloom_decontam_scores": SQL_CONTAMINATION_SCORES,
        "domain_pagerank": _sql_domain_pagerank(),
        "score_smoothing": SQL_SCORE_SMOOTHING,
        "token_heavy_hitters": SQL_TOKEN_HEAVY_HITTERS,
        "weighted_doc_sample": SQL_WEIGHTED_DOC_SAMPLE,
        "weighted_lang_sample": SQL_WEIGHTED_LANG_SAMPLE,
        "variance_threshold": SQL_VARIANCE_THRESHOLD,
        "select_kbest": _sql_select_kbest(),
        "f_regression_scores": SQL_F_REGRESSION_SCORES,
        "time_series_split_stats": _sql_time_series_split_stats(),
        "winsorized_prices": SQL_WINSORIZED_PRICES,
        "part_attribute_stats": SQL_PART_ATTRIBUTE_STATS,
        "quality_drift": SQL_QUALITY_DRIFT,
        "chi2_scores": SQL_CHI2_SCORES,
        "group_kfold_assignment": SQL_GROUP_KFOLD_ASSIGNMENT,
        "perplexity_bucket_sample":
            _sql_perplexity_bucket_sample(SQL_BIGRAM_LOGPROB),
        "quality_classifier_scores": _sql_quality_classifier_scores(),
        "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
        "view_click_attribution": SQL_VIEW_CLICK_ATTRIBUTION,
        "boilerplate_removal": SQL_BOILERPLATE_REMOVAL,
        "repeated_span_removal": SQL_REPEATED_SPAN_REMOVAL,
        "document_chunks": SQL_DOCUMENT_CHUNKS,
        "shuffle_shards": SQL_SHUFFLE_SHARDS,
        "normalized_text_hash": SQL_NORMALIZED_TEXT_HASH,
        "outlink_domain_profile": _sql_outlink_domain_profile(),
        "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
        "late_shipment_priority": SQL_LATE_SHIPMENT_PRIORITY,
        "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
        "part_supplier_variety": SQL_PART_SUPPLIER_VARIETY,
        "dominant_part_suppliers": SQL_DOMINANT_PART_SUPPLIERS,
        "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
        "language_id": sql_language_id(),
        "cohens_kappa_lang": _sql_cohens_kappa_lang(),
        "mcnemar_quality_screens": _sql_mcnemar_quality_screens(),
        "cochrans_q_screens": _sql_cochrans_q_screens(),
        "mcc_return_rule": _sql_mcc_return_rule(),
        "ece_event_probability": _sql_ece_event_probability(),
        "quality_scores": sql_quality_scores(),
        "document_fingerprint": SQL_DOCUMENT_FINGERPRINT,
        "windowed_event_features": SQL_WINDOWED_EVENT_FEATURES,
        "event_type_rollup": SQL_EVENT_TYPE_ROLLUP,
        "quantile_transformer_fit": SQL_QUANTILE_TRANSFORMER_FIT,
        "one_hot_encoder": SQL_ONE_HOT_ENCODER,
        "count_vectorizer_long": SQL_COUNT_VECTORIZER_LONG,
        "rbf_kernel_to_centers": SQL_RBF_KERNEL_TO_CENTERS,
        "event_sessionization": SQL_EVENT_SESSIONIZATION,
        "multimodal_decode": SQL_MULTIMODAL_DECODE,
        "image_dhash_bands": _sql_dhash_bands(),
        "fuzzy_vocab_pairs": SQL_FUZZY_VOCAB_PAIRS,
        "audio_fingerprint_bands": _sql_audio_fingerprint_bands(),
        "strip_markup": SQL_STRIP_MARKUP,
        "cooccurrence_topk": SQL_COOCCURRENCE_TOPK,
        "ppmi_topk": SQL_PPMI_TOPK,
        "collocations_logdice_topk": SQL_COLLOCATIONS_LOGDICE_TOPK,
        "source_concentration": _sql_source_concentration(),
        "readability_docs": _sql_readability_docs(),
        "vocab_coverage": SQL_VOCAB_COVERAGE,
        "image_near_dup_pairs": _sql_image_near_dup_pairs(),
        "image_dedup_keep_one": _sql_image_dedup_keep_one(),
        "frame_sample": SQL_FRAME_SAMPLE,
        "quality_filter": SQL_QUALITY_FILTER,
        "weighted_metrics": SQL_WEIGHTED_METRICS,
        "pipeline_poly_scale": SQL_PIPELINE_POLY_SCALE,
        "simple_imputer_transform": SQL_SIMPLE_IMPUTER_TRANSFORM,
        "column_transformer": SQL_COLUMN_TRANSFORMER,
        "robust_scaler_transform": SQL_ROBUST_SCALER_TRANSFORM,
        "label_encoder_roundtrip": SQL_LABEL_ENCODER_ROUNDTRIP,
        "part_brand_stats": SQL_PART_BRAND_STATS,
        "curation_pipeline": sql_curation_pipeline(),
        "training_data_prep": sql_training_data_prep(),
        "kmeans_cluster_sizes": sql_kmeans_cluster_sizes(),
        "gmm_params": sql_gmm_params(),
        "frequent_itemsets_stats": SQL_FREQUENT_ITEMSETS_STATS,
        "association_rules_topk": SQL_ASSOCIATION_RULES_TOPK,
        "copurchase_triangles": SQL_COPURCHASE_TRIANGLES,
        "time_fill_events": SQL_TIME_FILL_EVENTS,
        "random_projection_norms": sql_random_projection_norms(),
        "truncated_svd_variance": SQL_TRUNCATED_SVD_VARIANCE,
        "blockwise_voting_eval": sql_blockwise_voting_eval(),
        "pca_transform_variance": SQL_PCA_TRANSFORM_VARIANCE,
        "parallel_post_fit_eval": sql_parallel_post_fit_eval(),
        "hashing_vectorizer_portable": SQL_HASHING_VECTORIZER_PORTABLE,
        "feature_hasher_portable": SQL_FEATURE_HASHER_PORTABLE,
        "logistic_saturated_fit": SQL_LOGISTIC_SATURATED_FIT,
        "poisson_saturated_fit": SQL_POISSON_SATURATED_FIT,
        "roc_auc_eval": SQL_ROC_AUC_EVAL,
        "roc_auc_binned": SQL_ROC_AUC_BINNED,
        "spectral_clustering_sizes": sql_spectral_clustering_sizes(),
        "ridge_grid_search_hash_cv": _sql_ridge_grid_search(),
        "pipeline_grid_search": _sql_pipeline_grid_search(),
        "blobs_deterministic_stats": _sql_blobs_deterministic_stats(),
        "dbscan_cluster_sizes": _sql_dbscan_cluster_sizes(),
        "mahalanobis_outliers": _sql_mahalanobis_outliers(),
        "hyperband_best": _sql_hyperband_best(),
        "incremental_search_best": _sql_incremental_search_best(),
        "incremental_sgd_eval": sql_incremental_sgd_eval(),
        "ks_price_test": _sql_ks_price_test(),
        "ks_price_test_binned": _sql_ks_price_test_binned(),
        "mann_whitney_discount": _sql_mann_whitney_discount(),
        "hl_shift_price": _sql_hl_shift_price(),
        "wilcoxon_user_value": _sql_wilcoxon_user_value(),
        "friedman_user_event_value": _sql_friedman_user_event_value(),
        "benford_price": _sql_benford_price(),
        "chi2_independence_flags": _sql_chi2_independence_flags(),
        "welch_ttest_price": _sql_welch_ttest_price(),
        "welch_bh_by_month": _sql_welch_bh_by_month(),
        "bootstrap_price_ci": _sql_bootstrap_price_ci(),
        "bootstrap_ci_by_flag": _sql_bootstrap_ci_by_flag(),
        "prop_ztest_discount": _sql_prop_ztest_discount(),
        "anova_event_value": _sql_anova_event_value(),
        "pairwise_welch_events": _sql_pairwise_welch_events(),
        "spearman_price_quantity": _sql_spearman_price_quantity(),
        "spearman_price_quantity_exact":
            _sql_spearman_price_quantity_exact(),
        "kendall_price_quantity": _sql_kendall_price_quantity(),
        "hoeffding_price_quantity": _sql_hoeffding_price_quantity(),
        "kruskal_wallis_quantity": _sql_kruskal_wallis_quantity(),
        "jonckheere_priority_price": _sql_jonckheere_priority_price(),
        "brown_forsythe_price": _sql_brown_forsythe_price(),
        "isotonic_price_curve": _sql_isotonic_price_curve(),
        "changepoint_event_value": _sql_changepoint_event_value(),
        "trend_event_value": _sql_trend_event_value(),
        "ks_drift_daily": _sql_ks_drift_daily(),
        "psi_drift_daily": _sql_psi_drift_daily(),
        "catdrift_daily": _sql_catdrift_daily(),
        "zdrift_daily": _sql_zdrift_daily(),
        "corrdrift_monthly": _sql_corrdrift_monthly(),
        "covdrift_monthly": _sql_covdrift_monthly(),
        "quantile_drift_daily": _sql_quantile_drift_daily(),
        "embedding_drift_labels": _sql_embedding_drift_labels(),
        "acf_daily_value": _sql_acf_daily_value(),
        "seasonal_decompose_daily": _sql_seasonal_decompose_daily(),
        "partial_corr_price_quantity":
            _sql_partial_corr_price_quantity(),
        "mutual_information_events": SQL_MUTUAL_INFORMATION_EVENTS,
        "feature_corr_matrix": SQL_FEATURE_CORR_MATRIX,
        "kaplan_meier_conversion": SQL_KAPLAN_MEIER_CONVERSION,
        "precision_recall_f1": SQL_PRECISION_RECALL_F1,
        "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
        "confusion_matrix": SQL_CONFUSION_MATRIX,
        "calibration_curve": SQL_CALIBRATION_CURVE,
    }
    return queries, oracles


# --- rows-only queries (iterative algorithms; driver does weaker check) --

# pinned Lloyd setup shared by the Spark query and its SQL oracle:
# explicit init centers in scaled space + tol=0 → exactly KMEANS_ITERS
# deterministic iterations (reference k_means.py accepts ndarray init)
KMEANS_INIT = [[-1.0, -1.0, 0.0], [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0], [1.0, -1.0, 0.0]]
KMEANS_ITERS = 2
KMEANS_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def q_kmeans_cluster_sizes(spark, sf_dir):
    """DataFrame-Lloyd k-means with pinned init centers — the reference's
    own hand-built Lloyd topology (k_means.py:549-619), seed-free and
    therefore fully SQL-oracle-able: the oracle replays the same
    KMEANS_ITERS center updates from the same literals."""
    from dask_ml_spark.operators.cluster import KMeans
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    scaled = StandardScaler().fit(li, KMEANS_COLS).transform(li)
    km = KMeans(n_clusters=4, init=KMEANS_INIT, max_iter=KMEANS_ITERS,
                tol=0.0, algorithm="lloyd_dataframe").fit(scaled, KMEANS_COLS)
    return (
        km.predict(scaled)
        .groupBy("prediction")
        .agg(F.count("*").alias("n"))
        .select(F.col("prediction").cast("int").alias("cluster"), "n")
    )


def sql_kmeans_cluster_sizes() -> str:
    """Replay the pinned-Lloyd iterations in SQL: per round, a one-row
    center pivot cross-joined to the scaled rows, first-min CASE
    assignment (same tie-break as Spark's array_position of array_min),
    grouped averages with COALESCE to the previous round's center for
    empty clusters."""
    k = len(KMEANS_INIT)
    dims = ["q", "p", "d"]

    def pivot(src: str, name: str) -> str:
        cells = ", ".join(
            f"max(CASE WHEN cluster = {c} THEN c{v} END) AS c{v}{c}"
            for c in range(k) for v in dims
        )
        return f"{name} AS (SELECT {cells} FROM {src})"

    def assign(name: str, piv: str) -> str:
        dist = ", ".join(
            "(" + " + ".join(f"(s.{v} - {piv}.c{v}{c}) * (s.{v} - {piv}.c{v}{c})" for v in dims)
            + f") AS d{c}"
            for c in range(k)
        )
        whens = []
        for c in range(k - 1):
            cond = " AND ".join(f"d{c} <= d{o}" for o in range(c + 1, k))
            whens.append(f"WHEN {cond} THEN {c}")
        case = "CASE " + " ".join(whens) + f" ELSE {k - 1} END"
        return (f"{name} AS (SELECT {', '.join(dims)}, {case} AS cluster "
                f"FROM (SELECT s.*, {dist} FROM scaled s CROSS JOIN {piv}))")

    def update(prev_centers: str, assigned: str, gname: str, cname: str) -> str:
        avgs = ", ".join(f"avg({v}) AS m{v}" for v in dims)
        coal = ", ".join(f"coalesce(g.m{v}, p.c{v}) AS c{v}" for v in dims)
        return (f"{gname} AS (SELECT cluster, {avgs} FROM {assigned} GROUP BY cluster), "
                f"{cname} AS (SELECT p.cluster, {coal} FROM {prev_centers} p "
                f"LEFT JOIN {gname} g ON p.cluster = g.cluster)")

    init_rows = ", ".join(
        "(" + ", ".join([str(c)] + [f"{v!r}" for v in KMEANS_INIT[c]]) + ")"
        for c in range(k)
    )
    parts = [
        "scaled AS (SELECT "
        + ", ".join(
            f"({col} - avg({col}) OVER ()) / stddev_pop({col}) OVER () AS {v}"
            for col, v in zip(KMEANS_COLS, dims)
        )
        + " FROM lineitem)",
        f"c0(cluster, {', '.join('c' + v for v in dims)}) AS (VALUES {init_rows})",
    ]
    prev = "c0"
    for it in range(KMEANS_ITERS):
        parts.append(pivot(prev, f"pv{it}"))
        parts.append(assign(f"a{it}", f"pv{it}"))
        parts.append(update(prev, f"a{it}", f"g{it}", f"c{it + 1}"))
        prev = f"c{it + 1}"
    parts.append(pivot(prev, "pvf"))
    parts.append(assign("af", "pvf"))
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT cluster, count(*) AS n FROM af GROUP BY cluster")


# pinned init (scaled space) + tol=0 → exactly GMM_ITERS EM rounds,
# replayable in SQL just like the Lloyd loop above
GMM_INIT = [[-1.0, -1.0, -1.0], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
GMM_W0 = 1.0 / 3.0
# two rounds, like KMEANS_ITERS: round 1 replays the pinned-literal
# E/M math, round 2 proves the computed-parameter feedback path
GMM_ITERS = 2


def q_gmm_params(spark, sf_dir):
    """Diagonal-covariance Gaussian mixture EM (operators/mixture.py)
    with fully pinned init on the standardized k-means columns: every
    E-step is a literal-parameter projection, every M-step ONE
    aggregate, and tol=0 runs exactly GMM_ITERS rounds — so the oracle
    replays the identical responsibilities, sums, and parameter
    updates round by round."""
    from dask_ml_spark.operators.mixture import GaussianMixture
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    scaled = StandardScaler().fit(li, KMEANS_COLS).transform(li)
    gm = GaussianMixture(
        n_components=3, max_iter=GMM_ITERS, tol=0.0, reg_covar=1e-6,
        init_means=GMM_INIT, init_weights=[GMM_W0] * 3,
        init_variances=[[1.0] * 3] * 3,
    ).fit(scaled, KMEANS_COLS)
    r6 = lambda x: math.floor(float(x) * 1e6 + 0.5) / 1e6  # noqa: E731
    rows = [
        {"component": j,
         "weight": r6(gm.weights_[j]),
         **{f"mu{i}": r6(gm.means_[j][i]) for i in range(3)},
         **{f"var{i}": r6(gm.covariances_[j][i]) for i in range(3)}}
        for j in range(3)
    ]
    return spark.createDataFrame(rows).select(
        "component", "weight", "mu0", "mu1", "mu2", "var0", "var1", "var2")


def sql_gmm_params() -> str:
    """Replay the pinned-init diagonal EM in SQL: per round, a one-row
    parameter pivot cross-joined to the scaled rows, the SAME
    term-order log-density / stable-softmax expressions the Spark side
    codegens, one grouped-sum M-step, and the identical
    mu = sx/n, var = sxx/n − mu² + reg updates."""
    k = len(GMM_INIT)
    dims = ["q", "p", "d"]
    TWO_PI_SQL = "(6.283185307179586::DOUBLE)"

    def pivot(src: str, name: str) -> str:
        cells = ", ".join(
            f"max(CASE WHEN comp = {c} THEN {f} END) AS {f}{c}"
            for c in range(k)
            for f in (["w"] + [f"m{v}" for v in dims] + [f"v{v}" for v in dims])
        )
        return f"{name} AS (SELECT {cells} FROM {src})"

    def estep(name: str, piv: str) -> str:
        # lp{c}: identical left-assoc term order as _log_prob_exprs
        lps = []
        for c in range(k):
            terms = " + ".join(
                f"(ln({TWO_PI_SQL} * v{v}{c}) "
                f"+ (s.{v} - m{v}{c}) * (s.{v} - m{v}{c}) / v{v}{c})"
                for v in dims)
            lps.append(f"ln(w{c}) - 0.5 * ({terms}) AS lp{c}")
        es = " + ".join(f"exp(lp{c} - mx)" for c in range(k))
        rs = ", ".join(f"exp(lp{c} - mx) / es AS r{c}" for c in range(k))
        return (f"{name} AS (SELECT {', '.join(dims)}, {rs} FROM ("
                f"SELECT *, {es} AS es FROM ("
                f"SELECT {', '.join('s.' + v for v in dims)}, "
                f"{', '.join(lps)}, "
                f"greatest({', '.join('ln(w%d) - 0.5 * (%s)' % (c, ' + '.join('(ln(%s * v%s%d) + (s.%s - m%s%d) * (s.%s - m%s%d) / v%s%d)' % (TWO_PI_SQL, v, c, v, v, c, v, v, c, v, c) for v in dims)) for c in range(k))}) AS mx "
                f"FROM scaled s CROSS JOIN {piv})))")

    def mstep(src: str, gname: str, cname: str) -> str:
        sums = ["count(*) AS n"]
        for c in range(k):
            sums.append(f"sum(r{c}) AS n{c}")
            for v in dims:
                sums.append(f"sum(r{c} * {v}) AS sx{c}{v}")
                sums.append(f"sum(r{c} * {v} * {v}) AS sxx{c}{v}")
        unions = []
        for c in range(k):
            cols = [f"{c} AS comp", f"n{c} / n AS w"]
            cols += [f"sx{c}{v} / n{c} AS m{v}" for v in dims]
            cols += [f"sxx{c}{v} / n{c} - (sx{c}{v} / n{c}) * (sx{c}{v} / n{c})"
                     f" + 1e-6 AS v{v}" for v in dims]
            unions.append(f"SELECT {', '.join(cols)} FROM {gname}")
        return (f"{gname} AS (SELECT {', '.join(sums)} FROM {src}), "
                f"{cname} AS ({' UNION ALL '.join(unions)})")

    init_rows = ", ".join(
        "(" + ", ".join(
            [str(c), repr(GMM_W0)]
            + [repr(m) for m in GMM_INIT[c]] + ["1.0"] * len(dims)) + ")"
        for c in range(k))
    parts = [
        "scaled AS (SELECT "
        + ", ".join(
            f"({col} - avg({col}) OVER ()) / stddev_pop({col}) OVER () AS {v}"
            for col, v in zip(KMEANS_COLS, dims))
        + " FROM lineitem)",
        f"c0(comp, w, {', '.join('m' + v for v in dims)}, "
        f"{', '.join('v' + v for v in dims)}) AS (VALUES {init_rows})",
    ]
    prev = "c0"
    for it in range(GMM_ITERS):
        parts.append(pivot(prev, f"pv{it}"))
        parts.append(estep(f"e{it}", f"pv{it}"))
        parts.append(mstep(f"e{it}", f"g{it}", f"c{it + 1}"))
        prev = f"c{it + 1}"
    r6 = lambda e: f"floor({e} * 1e6 + 0.5) / 1e6"  # noqa: E731
    out = ["comp AS component", f"{r6('w')} AS weight"]
    out += [f"{r6('m' + v)} AS mu{i}" for i, v in enumerate(dims)]
    out += [f"{r6('v' + v)} AS var{i}" for i, v in enumerate(dims)]
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT {', '.join(out)} FROM {prev}")


def q_frequent_itemsets_stats(spark, sf_dir):
    """Apriori levels 1-3 (operators/frequent_patterns.py) over the
    order -> part co-purchase baskets: per itemset size, how many
    itemsets clear min_count=2 and the support extremes. The Spark
    side generates combinations with per-basket HOFs (no basket x
    basket self-join); the oracle enumerates them with ordered
    self-joins — agreeing counts check both the combination generation
    and the member pruning."""
    from dask_ml_spark.operators.frequent_patterns import frequent_itemsets

    li = _t(spark, sf_dir, "lineitem")
    fi = frequent_itemsets(li, basket_col="l_orderkey",
                           item_col="l_partkey", min_count=2, max_len=3)
    return (fi.groupBy("size")
            .agg(F.count(F.lit(1)).alias("n_itemsets"),
                 F.max("support").alias("max_support"),
                 F.sum("support").cast("long").alias("total_support"))
            .select(F.col("size").cast("int").alias("size"),
                    "n_itemsets", "max_support", "total_support"))


SQL_FREQUENT_ITEMSETS_STATS = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
f1 AS (SELECT i, count(*) AS s FROM bi GROUP BY i HAVING count(*) >= 2),
p2 AS (SELECT x.i AS ia, y.i AS ib, count(*) AS s
       FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
       GROUP BY 1, 2 HAVING count(*) >= 2),
p3 AS (SELECT x.i AS ia, y.i AS ib, z.i AS ic, count(*) AS s
       FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
            JOIN bi z ON y.b = z.b AND y.i < z.i
       GROUP BY 1, 2, 3 HAVING count(*) >= 2),
u AS (SELECT 1 AS size, s FROM f1
      UNION ALL SELECT 2, s FROM p2
      UNION ALL SELECT 3, s FROM p3)
SELECT size, count(*)::BIGINT AS n_itemsets, max(s)::BIGINT AS max_support,
       sum(s)::BIGINT AS total_support
FROM u GROUP BY size
"""


def q_association_rules_topk(spark, sf_dir):
    """Top-20 co-purchase association rules by lift. Confidence and
    lift are pure integer-ratio arithmetic evaluated in the SAME
    operation order on both engines, so the ordering (lift DESC, then
    rule) is engine-exact; output values are floor-form rounded."""
    from dask_ml_spark.operators.frequent_patterns import association_rules

    li = _t(spark, sf_dir, "lineitem")
    rules = association_rules(li, basket_col="l_orderkey",
                              item_col="l_partkey", min_count=2)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (rules
            .orderBy(F.desc("lift"), "antecedent", "consequent")
            .limit(20)
            .select("antecedent", "consequent", "support",
                    "antecedent_support", "consequent_support",
                    r6(F.col("confidence")).alias("confidence"),
                    r6(F.col("lift")).alias("lift")))


SQL_ASSOCIATION_RULES_TOPK = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
f1 AS (SELECT i, count(*) AS s FROM bi GROUP BY i HAVING count(*) >= 2),
p2 AS (SELECT x.i AS ia, y.i AS ib, count(*) AS s
       FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
       GROUP BY 1, 2 HAVING count(*) >= 2),
dir AS (SELECT ia AS a, ib AS c, s FROM p2
        UNION ALL SELECT ib, ia, s FROM p2),
rules AS (
    SELECT d.a AS antecedent, d.c AS consequent, d.s AS support,
           fa.s AS antecedent_support, fc.s AS consequent_support,
           d.s / fa.s AS confidence,
           d.s / fa.s * (SELECT n FROM n) / fc.s AS lift
    FROM dir d
    JOIN f1 fa ON d.a = fa.i
    JOIN f1 fc ON d.c = fc.i)
SELECT antecedent, consequent, support, antecedent_support,
       consequent_support,
       floor(confidence_raw * 1e6 + 0.5) / 1e6 AS confidence,
       floor(lift_raw * 1e6 + 0.5) / 1e6 AS lift
FROM (
    -- order by the RAW lift (the rounded output alias would shadow it
    -- and two rules with distinct raw lifts rounding to the same 1e-6
    -- value could flip rows at the LIMIT boundary vs the Spark side,
    -- which orders before rounding)
    SELECT antecedent, consequent, support::BIGINT AS support,
           antecedent_support::BIGINT AS antecedent_support,
           consequent_support::BIGINT AS consequent_support,
           confidence AS confidence_raw, lift AS lift_raw
    FROM rules
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 20) q
ORDER BY lift_raw DESC, antecedent, consequent
"""


def q_copurchase_triangles(spark, sf_dir):
    """Triangle counting (datapipe/graph.py triangle_count — Cohen's
    degree-orientation MapReduce algorithm) over the part co-purchase
    graph: parts are adjacent when some order contains both. The top
    10 parts by triangle membership; integer counts, so the ordering
    is engine-exact."""
    from dask_ml_spark.datapipe.graph import triangle_count
    from dask_ml_spark.operators.frequent_patterns import _pairs_hof

    # a half-year shipdate window scopes the graph (the full-corpus
    # co-purchase graph at sf0.1 already has 1.2M edges / 1.9M
    # triangles — honest but bench-dominating); the filter pushes to
    # the parquet scan
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-07-01"))
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("__arr"))
    edges = (arrs
             .select(F.explode(_pairs_hof(F.col("__arr"))).alias("__p"))
             .select(F.col("__p.a").alias("src"),
                     F.col("__p.b").alias("dst"))
             .distinct())
    return (triangle_count(edges)
            .orderBy(F.desc("triangles"), "node")
            .limit(10)
            .select(F.col("node").cast("long").alias("node"), "triangles"))


SQL_COPURCHASE_TRIANGLES = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
            WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-07-01'),
e AS (SELECT DISTINCT x.i AS u, y.i AS v
      FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
t AS (SELECT e1.u AS a, e1.v AS bb, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
nodes AS (SELECT a AS node FROM t
          UNION ALL SELECT bb FROM t
          UNION ALL SELECT c FROM t)
SELECT node, count(*)::BIGINT AS triangles
FROM nodes GROUP BY node
ORDER BY triangles DESC, node
LIMIT 10
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


RP_K, RP_SEED = 16, 42


def q_random_projection_norms(spark, sf_dir):
    """Sparse random projection (operators/random_projection.py,
    Achlioptas/Li) of the 64-dim embeddings down to RP_K dims; the 10
    largest projected L2 norms. The (d, k, seed) matrix needs no data
    pass, folds as literals, and the oracle regenerates the SAME
    matrix from the same seed — so coordinates and ranking are
    engine-exact arithmetic."""
    from dask_ml_spark.operators.random_projection import (
        SparseRandomProjection)

    emb = _t(spark, sf_dir, "embeddings")
    d = 64
    cols = [f"x{i}" for i in range(d)]
    flat = emb.select(
        "vec_id",
        *[F.element_at("embedding", i + 1).cast("double").alias(cols[i])
          for i in range(d)])
    rp = SparseRandomProjection(RP_K, random_state=RP_SEED).fit(flat, cols)
    proj = rp.transform(flat)
    norm2 = F.lit(0.0)
    for j in range(RP_K):
        norm2 = norm2 + F.col(f"rp{j}") * F.col(f"rp{j}")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (proj
            .withColumn("__n", F.sqrt(norm2))
            .orderBy(F.desc("__n"), "vec_id")
            .limit(10)
            .select("vec_id", r6(F.col("__n")).alias("norm"),
                    *[r6(F.col(f"rp{j}")).alias(f"rp{j}") for j in range(4)]))


def sql_random_projection_norms() -> str:
    """Regenerate the seeded Achlioptas matrix with the identical numpy
    calls and fold it as SQL literals, mirroring the Spark fold's term
    order (zero entries skipped on both sides)."""
    from dask_ml_spark.operators.random_projection import (
        SparseRandomProjection)

    d = 64
    W = SparseRandomProjection(RP_K, random_state=RP_SEED) \
        ._make_components(d)
    rps = []
    for j in range(RP_K):
        terms = [f"(embedding[{i + 1}]::DOUBLE) * ({float(W[j][i])!r}::DOUBLE)"
                 for i in range(d) if W[j][i] != 0.0]
        rps.append(" + ".join(terms) if terms else "0.0")
    norm = " + ".join(f"rp{j} * rp{j}" for j in range(RP_K))
    r6 = lambda e: f"floor({e} * 1e6 + 0.5) / 1e6"  # noqa: E731
    return (
        "WITH p AS (SELECT vec_id, "
        + ", ".join(f"{e} AS rp{j}" for j, e in enumerate(rps))
        + " FROM embeddings)\n"
        + "SELECT vec_id, " + r6(f"sqrt({norm})") + " AS norm, "
        + ", ".join(r6(f"rp{j}") + f" AS rp{j}" for j in range(4))
        + f"\nFROM p ORDER BY sqrt({norm}) DESC, vec_id LIMIT 10")


def q_logistic_saturated_fit(spark, sf_dir):
    """Unpenalized logistic regression on ONE binary feature — the
    saturated model whose MLE has a closed form (group log-odds), so
    the distributed LBFGS solver is value-checked against the true
    optimum: intercept = logit(P(y|x=0)), coef = logit(P(y|x=1)) −
    intercept."""
    from dask_ml_spark.operators.linear_model import LogisticRegression

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") > 25).cast("double").alias("x"),
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
    )
    m = LogisticRegression(penalty="none", max_iter=200, tol=1e-12).fit(li, ["x"])
    return spark.createDataFrame([{
        "coef_x": float(m.coef_[0]),
        "intercept": float(m.intercept_),
    }]).select("coef_x", "intercept")


SQL_LOGISTIC_SATURATED_FIT = """
WITH g AS (
    SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS x,
           avg(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS p
    FROM lineitem
    GROUP BY 1
),
lo AS (SELECT x, ln(p / (1 - p)) AS logit FROM g)
SELECT (SELECT logit FROM lo WHERE x = 1) - (SELECT logit FROM lo WHERE x = 0) AS coef_x,
       (SELECT logit FROM lo WHERE x = 0) AS intercept
"""


def q_logistic_regression_eval(spark, sf_dir):
    """SURVEY §7.2 step-3 pipeline: scale → split → logistic fit →
    predict → metrics, on lineitem with label returnflag=='R'."""
    from dask_ml_spark.functions.metrics import accuracy_expr, log_loss_expr
    from dask_ml_spark.operators.linear_model import LogisticRegression
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.plans.model_selection import train_test_split

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    labeled = li.withColumn("label", (F.col("l_returnflag") == "R").cast("double"))
    scaled = StandardScaler().fit(labeled, cols).transform(labeled)
    train, test = train_test_split(scaled, test_size=0.25, random_state=42)
    model = LogisticRegression(C=10.0, max_iter=30, tol=1e-5).fit(train, cols)
    pred = model.predict_proba(model.predict(test))
    return pred.agg(
        accuracy_expr(F.col("label"), F.col("prediction")).alias("accuracy"),
        log_loss_expr(F.col("label"), F.col("probability")).alias("log_loss"),
        F.count("*").alias("n_test"),
    )


def q_pca_transform_variance(spark, sf_dir):
    """PCA fit + transform; variance of each projected component should
    equal the eigenvalues — checks the full loop distributed. Two
    literal-prescaled features make the covariance eigensystem
    closed-form, so the oracle verifies the VALUES (the empirical
    var_samp of each projection must equal the 2×2 covariance
    eigenvalue the SQL computes directly)."""
    from dask_ml_spark.operators.decomposition import PCA

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / F.lit(50.0)).alias("x"),
        (F.col("l_extendedprice") / F.lit(100000.0)).alias("y"),
    )
    pca = PCA(n_components=2).fit(li, ["x", "y"])
    proj = pca.transform(li)
    return proj.agg(
        F.var_samp("pc0").alias("var_pc0"),
        F.var_samp("pc1").alias("var_pc1"),
    )


SQL_PCA_TRANSFORM_VARIANCE = """
WITH m AS (
    SELECT var_samp(x) AS cxx, var_samp(y) AS cyy, covar_samp(x, y) AS cxy
    FROM (SELECT l_quantity / 50.0 AS x, l_extendedprice / 100000.0 AS y FROM lineitem)
)
SELECT (cxx + cyy) / 2 + sqrt(((cxx - cyy) / 2) * ((cxx - cyy) / 2) + cxy * cxy) AS var_pc0,
       (cxx + cyy) / 2 - sqrt(((cxx - cyy) / 2) * ((cxx - cyy) / 2) + cxy * cxy) AS var_pc1
FROM m
"""


def q_hashing_vectorizer_long(spark, sf_dir):
    """Stateless hashing vectorizer, triplet form (xxhash64 is
    Spark-specific — rows-only check; determinism is covered by
    tests/test_text.py)."""
    from dask_ml_spark.operators.text import HashingVectorizer

    docs = _t(spark, sf_dir, "documents")
    hv = HashingVectorizer(n_features=1024, alternate_sign=False)
    return hv.transform_long(docs, "doc_id")


def q_hashing_vectorizer_portable(spark, sf_dir):
    """Same triplet pipeline with the engine-portable md5-prefix hash
    (signed), so the full explode → hash → signed-sum → prune path is
    value-checked against DuckDB — the oracle the xxhash64 default
    can't have."""
    from dask_ml_spark.operators.text import HashingVectorizer

    docs = _t(spark, sf_dir, "documents")
    hv = HashingVectorizer(n_features=256, alternate_sign=True, hash_fn="portable")
    return hv.transform_long(docs, "doc_id")


SQL_HASHING_VECTORIZER_PORTABLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents
)
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(token), 1, 14)) AS BIGINT) % 256 AS INTEGER) AS bucket,
       sum(CASE WHEN CAST(('0x' || substr(md5(token), 15, 1)) AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END) AS value
FROM tok
GROUP BY doc_id, bucket
HAVING sum(CASE WHEN CAST(('0x' || substr(md5(token), 15, 1)) AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END) <> 0
"""


SHA_N, SHA_R, SHA_ETA, SHA_MAX = 6, 2, 3, 12


def q_incremental_search_best(spark, sf_dir):
    """Standalone SuccessiveHalvingSearchCV (reference
    _successive_halving.py:11-306), oracle-able since r9 the same way
    hyperband_best was converted in r8: deterministic_by switches the
    seeded choices to content-deterministic ones (Knuth hash split,
    key-sorted cyclic batches, listed candidates) and the model is
    SufficientStatsRidge, a closed form of the batch sums — so the SQL
    replays the rung scores at every call target, the (score desc, id
    asc) promotions, and the winner. The seeded SGD SuccessiveHalving
    stays the tested production path
    (tests/test_incremental_search.py)."""
    import math

    from dask_ml_spark.operators.local_estimators import SufficientStatsRidge
    from dask_ml_spark.plans.incremental import SuccessiveHalvingSearchCV

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"))
    sha = SuccessiveHalvingSearchCV(
        SufficientStatsRidge(),
        [{"alpha": a} for a in HB_ALPHAS[:SHA_N]],
        n_initial_parameters=SHA_N, n_initial_iter=SHA_R,
        aggressiveness=SHA_ETA, max_iter=SHA_MAX,
        deterministic_by=["l_orderkey", "l_linenumber",
                          "l_extendedprice", "l_discount"])
    sha.fit(li, ["l_extendedprice", "l_discount"], label_col="label")
    return spark.createDataFrame([{
        "best_alpha": float(sha.best_params_["alpha"]),
        "best_score": math.floor(sha.best_score_ * 1e6 + 0.5) / 1e6,
        "n_models": int(sha.n_models_),
    }]).select("best_alpha", "best_score", "n_models")


def q_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN (datapipe/similarity.py::
    CosineLSHIndex): bucket-collision candidates + exact cosine re-rank.
    The 80 hyperplanes (16 bands x 5 bits) are PINNED to the embeddings
    of vec_id 100..179 — deterministic projections make the whole index
    DuckDB-checkable (same fixed-state pattern as ivf_ann_topk); the
    seeded-gaussian fit() stays the production default, recall-tested
    vs brute force."""
    import numpy as np

    from dask_ml_spark.datapipe.similarity import CosineLSHIndex

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = CosineLSHIndex(n_bands=16, bits_per_band=5)
    planes = (emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 180))
              .orderBy("vec_id").select("embedding").collect())
    lsh.hyperplanes_ = np.asarray([list(r[0]) for r in planes], dtype="float64")
    return lsh.search(emb, queries, k=10).select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )


def q_knn_graph_topk(spark, sf_dir):
    """Corpus-wide approximate k-NN graph (datapipe/similarity.py::
    knn_graph): every vector's top-5 cosine neighbors from LSH bucket
    collisions — the self-join rendering (no query broadcast) with the
    PINNED hyperplanes of lsh_ann_topk regrouped as 8 bands x 10
    bits (1024 buckets/band: the graph explodes EVERY bucket, so it
    needs the occupancy a 5-query probe does not — 16x5 measured 2.1M
    candidate pairs at sf0.1 vs 41k for 8x10), so bucketing,
    collision candidates, and ranking all replay in SQL."""
    import numpy as np

    from dask_ml_spark.datapipe.similarity import CosineLSHIndex, knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    lsh = CosineLSHIndex(n_bands=8, bits_per_band=10)
    planes = (emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 180))
              .orderBy("vec_id").select("embedding").collect())
    lsh.hyperplanes_ = np.asarray([list(r[0]) for r in planes], dtype="float64")
    return knn_graph(emb, k=5, index=lsh).select(
        "src", "dst", F.col("rank").cast("long").alias("rank"))


SQL_KNN_GRAPH_TOPK = """
WITH planes AS (
    SELECT vec_id - 100 AS p, embedding::DOUBLE[] AS pvec
    FROM embeddings WHERE vec_id >= 100 AND vec_id < 180
), bits AS (
    SELECT e.vec_id, e.embedding, p // 10 AS band,
           CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.pvec) > 0
                THEN 1 << (p % 10) ELSE 0 END AS bit
    FROM embeddings e CROSS JOIN planes pl
), buckets AS (
    SELECT vec_id, any_value(embedding) AS embedding, band,
           CAST(sum(bit) AS BIGINT) AS bucket
    FROM bits GROUP BY vec_id, band
), cand AS (
    SELECT DISTINCT a.vec_id AS src, a.embedding AS avec,
           b.vec_id AS dst, b.embedding AS bvec
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.vec_id != b.vec_id
), scored AS (
    SELECT src, dst, list_cosine_similarity(avec, bvec) AS score
    FROM cand
)
SELECT src, dst, rank FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY score DESC, dst ASC) AS rank
    FROM scored
) WHERE rank <= 5
"""


def q_score_smoothing(spark, sf_dir):
    """Graph-based quality denoising (datapipe/graph.py::
    smooth_scores): each document's length-based quality score blends
    with the mean score of its semantic neighbors from the pinned-plane
    k-NN graph (the exact edge set of knn_graph_topk). One iteration
    with alpha=0.5 keeps every arithmetic step FP-exact and
    order-independent — integer n_chars sums add exactly in double, the
    avg divides once, and the 0.5/0.5 blend is dyadic — so the whole
    propagation replays bit-for-bit in SQL with no rounding."""
    import numpy as np

    from dask_ml_spark.datapipe.graph import smooth_scores
    from dask_ml_spark.datapipe.similarity import CosineLSHIndex, knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    lsh = CosineLSHIndex(n_bands=8, bits_per_band=10)
    planes = (emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 180))
              .orderBy("vec_id").select("embedding").collect())
    lsh.hyperplanes_ = np.asarray([list(r[0]) for r in planes], dtype="float64")
    edges = knn_graph(emb, k=5, index=lsh)
    scores = docs.select(
        "doc_id", F.col("n_chars").cast("double").alias("score"))
    out = smooth_scores(edges, scores, id_col="doc_id", score_col="score",
                        alpha=0.5, iters=1)
    return out.select("doc_id", F.col("score").alias("smooth_score"))


SQL_SCORE_SMOOTHING = f"""
WITH edges AS ({SQL_KNN_GRAPH_TOPK}),
s0 AS (SELECT doc_id, n_chars::DOUBLE AS s FROM documents),
nb AS (
    SELECT e.src AS doc_id, avg(n.s) AS nbavg
    FROM edges e JOIN s0 n ON n.doc_id = e.dst
    GROUP BY e.src
)
SELECT s0.doc_id,
       CASE WHEN nb.nbavg IS NULL THEN s0.s
            ELSE 0.5 * s0.s + 0.5 * nb.nbavg END AS smooth_score
FROM s0 LEFT JOIN nb ON s0.doc_id = nb.doc_id
"""


def q_token_heavy_hitters(spark, sf_dir):
    """Corpus vocabulary profiling at scale (datapipe/sketches.py::
    heavy_hitters): top-30 most frequent tokens via the Misra-Gries
    per-partition sketch + candidate-recount path. require_sketch=True
    pins that the exactness certificate held (k-th frequency >
    N/(capacity+1)) — so the sketch plan ran AND the answer is provably
    the exact top-30, which is why this shares the plain exact SQL
    oracle."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.datapipe.sketches import heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens_expr(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", k=30, capacity=4096,
                         require_sketch=True).select(
        F.col("value").alias("token"), F.col("freq").cast("long").alias("freq"))


SQL_TOKEN_HEAVY_HITTERS = f"""
WITH toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents
)
SELECT token, count(*)::BIGINT AS freq
FROM toks GROUP BY token
ORDER BY freq DESC, token ASC LIMIT 30
"""


def q_weighted_doc_sample(spark, sf_dir):
    """Quality-weighted corpus subsampling (datapipe/sampling.py::
    weighted_sample): 60 documents drawn WITHOUT replacement with
    probability proportional to length, via the Efraimidis-Spirakis
    exponential-key scheme seeded from the content hash — deterministic,
    so the oracle re-derives every key and verifies the selected
    CONTENT, not just the sample size."""
    from dask_ml_spark.datapipe.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return (weighted_sample(docs, 60, "n_chars", "doc_id", salt=3)
            .select("doc_id", "n_chars"))


SQL_WEIGHTED_DOC_SAMPLE = """
WITH keyed AS (
    SELECT doc_id, n_chars,
           round(-ln((((((3 + doc_id) % 2147483648) * 2654435761)
                       % 2147483648) % 1048576 + 0.5) / 1048576.0)
                 / n_chars, 9) AS aes
    FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars FROM keyed
ORDER BY aes ASC, doc_id ASC LIMIT 60
"""


def q_weighted_lang_sample(spark, sf_dir):
    """Per-group weighted sampling (datapipe/sampling.py::
    weighted_sample_per_group): 5 length-weighted documents per
    language through the two-stage skew-safe top-k — a language holding
    90% of the corpus never funnels through one window task."""
    from dask_ml_spark.datapipe.sampling import weighted_sample_per_group

    docs = _t(spark, sf_dir, "documents")
    return (weighted_sample_per_group(docs, "lang", 5, "n_chars",
                                      "doc_id", salt=7)
            .select("doc_id", "lang", "n_chars"))


SQL_WEIGHTED_LANG_SAMPLE = """
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           round(-ln((((((7 + doc_id) % 2147483648) * 2654435761)
                       % 2147483648) % 1048576 + 0.5) / 1048576.0)
                 / n_chars, 9) AS aes
    FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars FROM (
    SELECT doc_id, lang, n_chars,
           row_number() OVER (PARTITION BY lang
                              ORDER BY aes ASC, doc_id ASC) AS rn
    FROM keyed
) WHERE rn <= 5
"""


def q_chi2_scores(spark, sf_dir):
    """chi2 feature scoring (operators/feature_selection.py::chi2):
    observed per-language mass of two non-negative document features
    (chars, tokens) against the independence expectation — one
    groupBy(label) moments pass, the formula replayed in SQL."""
    from dask_ml_spark.datapipe.dedup import tokens_expr
    from dask_ml_spark.operators.feature_selection import chi2

    docs = _t(spark, sf_dir, "documents")
    x = docs.select(
        "lang", F.col("n_chars").cast("double").alias("nchars"),
        F.size(tokens_expr(F.col("text"))).cast("double").alias("ntokens"))
    s = chi2(x, ["nchars", "ntokens"], "lang")
    return spark.createDataFrame(
        [(c, float(v)) for c, v in s.items()],
        "feature string, chi2 double")


SQL_CHI2_SCORES = f"""
WITH x AS (
    SELECT lang, n_chars::DOUBLE AS nchars,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::DOUBLE
               AS ntokens
    FROM documents
), g AS (
    SELECT lang, count(*)::DOUBLE AS n,
           sum(nchars) AS s0, sum(ntokens) AS s1
    FROM x GROUP BY lang
), t AS (
    SELECT sum(n) AS ntot, sum(s0) AS t0, sum(s1) AS t1 FROM g
)
SELECT 'nchars' AS feature,
       sum(pow(s0 - t0 * n / ntot, 2) / (t0 * n / ntot)) AS chi2
FROM g CROSS JOIN t
UNION ALL
SELECT 'ntokens',
       sum(pow(s1 - t1 * n / ntot, 2) / (t1 * n / ntot))
FROM g CROSS JOIN t
"""


def q_quality_drift(spark, sf_dir):
    """Distribution drift (datapipe/profiling.py::distribution_drift):
    PSI / KL / total-variation of the doc-length distribution between
    the en and de sub-corpora, over 16 fixed dyadic-width bins (width
    128 — FP-exact bucketing in both engines). The standard gate before
    a new shard joins training; the oracle replays histogram,
    smoothing, and the log sums."""
    from dask_ml_spark.datapipe.profiling import distribution_drift

    docs = _t(spark, sf_dir, "documents")
    d = distribution_drift(docs.where(F.col("lang") == "en"),
                           docs.where(F.col("lang") == "de"),
                           "n_chars", bins=16, lo=0.0, hi=2048.0)
    return spark.createDataFrame(
        [(round(d["psi"], 6), round(d["kl"], 6), round(d["tvd"], 6),
          d["n_a"], d["n_b"])],
        "psi double, kl double, tvd double, n_a long, n_b long")


SQL_QUALITY_DRIFT = """
WITH ha AS (
    SELECT least(greatest(CAST(floor(n_chars / 128.0) AS BIGINT), 0), 15)
               AS bin, count(*) AS cnt
    FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
    GROUP BY 1
), hb AS (
    SELECT least(greatest(CAST(floor(n_chars / 128.0) AS BIGINT), 0), 15)
               AS bin, count(*) AS cnt
    FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL
    GROUP BY 1
), tot AS (
    SELECT (SELECT sum(cnt) FROM ha)::DOUBLE AS na,
           (SELECT sum(cnt) FROM hb)::DOUBLE AS nb
), j AS (
    SELECT i.bin, coalesce(ha.cnt, 0)::DOUBLE AS ca,
           coalesce(hb.cnt, 0)::DOUBLE AS cb
    FROM (SELECT unnest(range(0, 16)) AS bin) i
    LEFT JOIN ha ON ha.bin = i.bin LEFT JOIN hb ON hb.bin = i.bin
)
SELECT
    round(sum(((ca + 0.5) / (na + 8) - (cb + 0.5) / (nb + 8))
              * ln(((ca + 0.5) / (na + 8)) / ((cb + 0.5) / (nb + 8)))), 6)
        AS psi,
    round(sum(((ca + 0.5) / (na + 8))
              * ln(((ca + 0.5) / (na + 8)) / ((cb + 0.5) / (nb + 8)))), 6)
        AS kl,
    round(0.5 * sum(abs(ca / na - cb / nb)), 6) AS tvd,
    max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b
FROM j CROSS JOIN tot
"""


def q_winsorized_prices(spark, sf_dir):
    """Winsorizer fit + transform (operators/preprocessing.py): clip
    extendedprice and quantity to their exact [5%, 95%] quantiles,
    then per-flag sums of the clipped columns value-check BOTH the
    fitted bounds and the least/greatest projection (the maxabs_scaler
    idiom). exact=True so the oracle replays the bounds with
    quantile_cont; percentile_approx stays the library default."""
    from dask_ml_spark.operators.preprocessing import Winsorizer

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_extendedprice", "l_quantity"]
    w = Winsorizer(lower=0.05, upper=0.95, approximate=False).fit(li, cols)
    out = w.transform(li)
    return (out.groupBy("l_returnflag")
            .agg(*[F.round(_dsum(c), 4).alias(f"wsum_{c}") for c in cols],
                 F.count("*").alias("n")))


SQL_WINSORIZED_PRICES = """
WITH q AS (
    SELECT quantile_cont(l_extendedprice, 0.05) AS lo_p,
           quantile_cont(l_extendedprice, 0.95) AS hi_p,
           quantile_cont(l_quantity, 0.05) AS lo_q,
           quantile_cont(l_quantity, 0.95) AS hi_q
    FROM lineitem
)
SELECT l_returnflag,
       round((CAST(sum(CAST(floor((least(greatest(l_extendedprice, lo_p), hi_p)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000), 4)
           AS wsum_l_extendedprice,
       round((CAST(sum(CAST(floor((least(greatest(l_quantity, lo_q), hi_q)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000), 4)
           AS wsum_l_quantity,
       count(*)::BIGINT AS n
FROM lineitem CROSS JOIN q
GROUP BY l_returnflag
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


def q_time_series_split_stats(spark, sf_dir):
    """TimeSeriesSplit over the events stream (plans/
    model_selection.py): 4 expanding-window folds cut at exact integer-
    microsecond range boundaries; per fold the train/test row counts
    plus the test block's value mass prove fold MEMBERSHIP, not just
    sizes. The oracle recomputes every boundary and filter in SQL."""
    from functools import reduce

    from dask_ml_spark.plans.model_selection import TimeSeriesSplit

    ev = _t(spark, sf_dir, "events")
    tss = TimeSeriesSplit(n_splits=4, time_col="ts")
    stats = []
    for i, (train, test) in enumerate(tss.split(ev)):
        stats.append(
            train.agg(F.count("*").alias("train_rows")).crossJoin(
                test.agg(
                    F.count("*").alias("test_rows"),
                    F.round(F.coalesce(_dsum("value"), F.lit(0.0)), 6)
                    .alias("test_value_sum")))
            .select(F.lit(i).cast("long").alias("fold"),
                    "train_rows", "test_rows", "test_value_sum"))
    return reduce(lambda a, b: a.unionAll(b), stats)


def _sql_time_series_split_stats(n: int = 4) -> str:
    k = n + 1
    parts = []
    for i in range(n):
        lo = f"(t0 + (t1 - t0) * {i + 1} // {k})"
        hi = f"(t0 + (t1 - t0) * {i + 2} // {k})"
        test = (f"tu >= {lo}" if i == n - 1
                else f"tu >= {lo} AND tu < {hi}")
        parts.append(f"""
SELECT {i}::BIGINT AS fold,
       count(*) FILTER (WHERE tu < {lo})::BIGINT AS train_rows,
       count(*) FILTER (WHERE {test})::BIGINT AS test_rows,
       round(coalesce(CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                           FILTER (WHERE {test}) AS DOUBLE) / 10000, 0), 6)
           AS test_value_sum
FROM e CROSS JOIN b""")
    body = "\nUNION ALL".join(parts)
    return f"""
WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
           FROM events),
e AS (SELECT epoch_us(ts) AS tu, value FROM events)
{body}
"""


def q_variance_threshold(spark, sf_dir):
    """VarianceThreshold fit (operators/feature_selection.py): per-
    column population variance + keep decision; the injected constant
    column is the one that must be dropped. Attrs are one agg row of
    driver state, replayed with var_pop in SQL."""
    from dask_ml_spark.operators.feature_selection import VarianceThreshold

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        F.lit(7.5).alias("const"))
    vt = VarianceThreshold(threshold=0.0).fit(li)
    # extendedprice variance is ~5e8 — snap to 2 decimals on both sides
    # (the standard_scaler_fit / gaussian_nb_fit canonicalization)
    rows = [(c, round(float(v), 2) if c == "l_extendedprice" else float(v),
             int(keep)) for c, v, keep in
            zip(vt.columns_, vt.variances_, vt.support_)]
    return spark.createDataFrame(
        rows, "feature string, variance double, kept long")


SQL_VARIANCE_THRESHOLD = """
SELECT 'l_quantity' AS feature, var_pop(l_quantity) AS variance,
       CASE WHEN var_pop(l_quantity) > 0 THEN 1 ELSE 0 END::BIGINT AS kept
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', round(var_pop(l_extendedprice), 2),
       CASE WHEN var_pop(l_extendedprice) > 0 THEN 1 ELSE 0 END::BIGINT
FROM lineitem
UNION ALL
SELECT 'l_discount', var_pop(l_discount),
       CASE WHEN var_pop(l_discount) > 0 THEN 1 ELSE 0 END::BIGINT
FROM lineitem
UNION ALL
SELECT 'l_tax', var_pop(l_tax),
       CASE WHEN var_pop(l_tax) > 0 THEN 1 ELSE 0 END::BIGINT
FROM lineitem
UNION ALL
SELECT 'const', var_pop(7.5),
       CASE WHEN var_pop(7.5) > 0 THEN 1 ELSE 0 END::BIGINT
FROM lineitem
"""


def q_select_kbest(spark, sf_dir):
    """SelectKBest(f_classif) over the first 8 embedding dims vs the
    class label: per-feature ANOVA F plus the top-3 keep flags. The
    oracle recomputes the per-class (n, sum, sum_sq) moments and the
    same F formula in SQL; selection ranks (f_stat DESC, feature ASC)
    in both engines."""
    from dask_ml_spark.operators.feature_selection import SelectKBest

    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", *[F.element_at("embedding", i + 1).cast("double")
                   .alias(f"d{i}") for i in range(8)])
    kb = SelectKBest(k=3, score_func="f_classif").fit(
        x, columns=[f"d{i}" for i in range(8)], label_col="label")
    rows = [(c, float(s), int(keep)) for c, s, keep in
            zip(kb.columns_, kb.scores_, kb.support_)]
    return spark.createDataFrame(
        rows, "feature string, f_stat double, selected long")


def _sql_select_kbest(dims: int = 8, k: int = 3) -> str:
    sel = ", ".join(f"embedding[{i + 1}]::DOUBLE AS d{i}"
                    for i in range(dims))
    moments = ", ".join(f"sum(d{i}) AS s{i}, sum(d{i}*d{i}) AS q{i}"
                        for i in range(dims))
    totals = ", ".join(f"sum(s{i}) AS ts{i}" for i in range(dims))
    branches = "\nUNION ALL\n".join(f"""
    SELECT 'd{i}' AS feature,
           (sum(n * pow(s{i}/n - ts{i}/ntot, 2)) / (max(ngrp) - 1))
           / (sum(q{i} - s{i}*s{i}/n) / (max(ntot) - max(ngrp))) AS f_stat
    FROM g CROSS JOIN t""" for i in range(dims))
    return f"""
WITH x AS (SELECT label, {sel} FROM embeddings),
g AS (SELECT label, count(*)::DOUBLE AS n, {moments} FROM x GROUP BY label),
t AS (SELECT sum(n) AS ntot, count(*)::DOUBLE AS ngrp, {totals} FROM g),
f AS ({branches}),
ranked AS (
    SELECT feature, f_stat,
           row_number() OVER (ORDER BY f_stat DESC, feature ASC) AS rn
    FROM f
)
SELECT feature, f_stat,
       CASE WHEN rn <= {k} THEN 1 ELSE 0 END::BIGINT AS selected
FROM ranked
"""


def q_f_regression_scores(spark, sf_dir):
    """f_regression univariate F-tests: which lineitem columns predict
    extendedprice. One corr+count agg; F = r^2/(1-r^2)*(n-2), the
    identical closed form replayed over DuckDB's corr."""
    from dask_ml_spark.operators.feature_selection import f_regression

    li = _t(spark, sf_dir, "lineitem")
    scores = f_regression(li, ["l_quantity", "l_discount", "l_tax"],
                          "l_extendedprice")
    rows = [(c, float(v)) for c, v in scores.items()]
    return spark.createDataFrame(rows, "feature string, f_stat double")


SQL_F_REGRESSION_SCORES = """
WITH c AS (
    SELECT count(*)::DOUBLE AS n,
           corr(l_quantity, l_extendedprice) AS rq,
           corr(l_discount, l_extendedprice) AS rd,
           corr(l_tax, l_extendedprice) AS rt
    FROM lineitem
)
SELECT 'l_quantity' AS feature, rq*rq / (1 - rq*rq) * (n - 2) AS f_stat FROM c
UNION ALL
SELECT 'l_discount', rd*rd / (1 - rd*rd) * (n - 2) FROM c
UNION ALL
SELECT 'l_tax', rt*rt / (1 - rt*rt) * (n - 2) FROM c
"""


def q_ann_recall_metrics(spark, sf_dir):
    """Retrieval-quality metrics (datapipe/similarity.py::
    ranking_metrics): recall@10 / MRR@10 / nDCG@10 of the pinned-plane
    LSH index against exact brute force — the standard way to grade an
    ANN index, here end-to-end oracle-checkable because both rankings
    are (the same configs as lsh_ann_topk / ann_bruteforce_topk)."""
    import numpy as np

    from dask_ml_spark.datapipe.similarity import (
        CosineLSHIndex, brute_force_topk, ranking_metrics)

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = CosineLSHIndex(n_bands=16, bits_per_band=5)
    planes = (emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 180))
              .orderBy("vec_id").select("embedding").collect())
    lsh.hyperplanes_ = np.asarray([list(r[0]) for r in planes], dtype="float64")
    pred = lsh.search(emb, queries, k=10)
    truth = brute_force_topk(emb, queries, k=10)
    return ranking_metrics(pred, truth, k=10)


def sql_ann_recall_metrics() -> str:
    return f"""
WITH pred AS ({SQL_LSH_ANN_TOPK}), truth AS ({SQL_ANN_BRUTEFORCE_TOPK}),
hits AS (
    SELECT p.query_id, p.vec_id, p.rank AS pred_rank
    FROM pred p JOIN truth t ON p.query_id = t.query_id AND p.vec_id = t.vec_id
), per_hit AS (
    SELECT query_id, count(*) AS n_hits, min(pred_rank) AS first_hit,
           sum(1.0 / log2(pred_rank + 1)) AS dcg
    FROM hits GROUP BY query_id
), ideal AS (
    SELECT query_id, count(*) AS n_truth, sum(1.0 / log2(rank + 1)) AS idcg
    FROM truth GROUP BY query_id
)
SELECT i.query_id,
       COALESCE(h.n_hits, 0) * 1.0 / i.n_truth AS recall_at_k,
       COALESCE(1.0 / h.first_hit, 0.0) AS mrr_at_k,
       COALESCE(h.dcg, 0.0) / i.idcg AS ndcg_at_k
FROM ideal i LEFT JOIN per_hit h USING (query_id)
"""


SQL_LSH_ANN_TOPK = """
WITH planes AS (
    SELECT vec_id - 100 AS p, embedding::DOUBLE[] AS pvec
    FROM embeddings WHERE vec_id >= 100 AND vec_id < 180
), bits AS (
    SELECT e.vec_id, e.embedding, p // 5 AS band,
           CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.pvec) > 0
                THEN 1 << (p % 5) ELSE 0 END AS bit
    FROM embeddings e CROSS JOIN planes pl
), buckets AS (
    SELECT vec_id, any_value(embedding) AS embedding, band,
           CAST(sum(bit) AS BIGINT) AS bucket
    FROM bits GROUP BY vec_id, band
), cand AS (
    SELECT DISTINCT q.vec_id AS query_id, q.embedding AS qvec,
           d.vec_id, d.embedding
    FROM buckets q JOIN buckets d ON q.band = d.band AND q.bucket = d.bucket
    WHERE q.vec_id < 5 AND d.vec_id != q.vec_id
), scored AS (
    SELECT query_id, vec_id,
           list_cosine_similarity(embedding, qvec) AS score
    FROM cand
)
SELECT query_id, vec_id, rank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
) WHERE rank <= 10
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


def q_source_token_quota(spark, sf_dir):
    """Per-source token budget (datapipe/sampling.py::token_quota,
    batch rendering of streaming/stateful.py::token_quota_stream):
    keep documents in id order until each source's cumulative tokens
    hit the quota. The oracle replays the same running-sum window."""
    from dask_ml_spark.datapipe.sampling import token_quota

    docs = _t(spark, sf_dir, "documents")
    kept = token_quota(docs, quota=5_000)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("tokens_used"),
                 F.sum("doc_id").alias("id_checksum")))


SQL_SOURCE_TOKEN_QUOTA = f"""
WITH t AS (
    SELECT doc_id, source,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens
    FROM documents
), c AS (
    SELECT doc_id, source, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_used,
       sum(doc_id) AS id_checksum
FROM c WHERE cum <= 5000 GROUP BY source
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


def q_kbins_discretizer_approx(spark, sf_dir):
    """Scale-path KBinsDiscretizer: percentile_approx edges. GK rank
    error is <= n/(2*accuracy), so accuracy=250k is the measured
    exactness floor at the ORACLE SF (no sketch compression at n=6e4,
    so DuckDB's quantile_disc replays the edges bit-for-bit — was
    rows-only before r6; 1e5 compresses and drifts). Same deliberate
    oracle-vs-production split as winsorized_prices: the LIBRARY
    default stays accuracy=10000, the bounded 100 TB sketch."""
    from dask_ml_spark.operators.preprocessing import KBinsDiscretizer

    li = _t(spark, sf_dir, "lineitem")
    kb = KBinsDiscretizer(n_bins=8, strategy="quantile", approximate=True,
                          accuracy=250_000).fit(li, ["l_extendedprice"])
    return (kb.transform(li.select("l_extendedprice"))
            .groupBy(F.col("l_extendedprice").cast("long").alias("bin"))
            .agg(F.count("*").alias("n")))


def q_target_encoder(spark, sf_dir):
    """TargetEncoder (operators/encoders.py): smoothed mean-target
    encoding of l_returnflag against l_quantity; the oracle replays
    the exact shrinkage formula per category."""
    from dask_ml_spark.operators.encoders import TargetEncoder

    li = _t(spark, sf_dir, "lineitem")
    te = TargetEncoder(smoothing=20.0).fit(
        li, ["l_returnflag"], target_col="l_quantity")
    return (te.transform(li)
            .groupBy("l_returnflag")
            .agg(F.first("l_returnflag_enc").alias("enc"),
                 F.count("*").alias("n")))


SQL_TARGET_ENCODER = """
WITH g AS (SELECT avg(l_quantity) AS gm FROM lineitem),
s AS (SELECT l_returnflag, count(*) AS n, avg(l_quantity) AS m
      FROM lineitem GROUP BY 1)
SELECT l_returnflag, (n * m + 20.0 * gm) / (n + 20.0) AS enc, n
FROM s CROSS JOIN g
"""


def q_maxabs_scaler(spark, sf_dir):
    """MaxAbsScaler fit + transform: per-flag sums of the scaled
    columns value-check both the fitted maxima and the projection."""
    from dask_ml_spark.operators.preprocessing import MaxAbsScaler

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    out = MaxAbsScaler().fit(li, cols).transform(li)
    return (out.groupBy("l_returnflag")
            .agg(*[F.sum(c).alias(f"sum_{c}") for c in cols]))


SQL_MAXABS_SCALER = """
WITH m AS (
    SELECT max(abs(l_quantity)) AS mq, max(abs(l_extendedprice)) AS mp,
           max(abs(l_discount)) AS md
    FROM lineitem
)
SELECT l_returnflag,
       sum(l_quantity / mq) AS sum_l_quantity,
       sum(l_extendedprice / mp) AS sum_l_extendedprice,
       sum(l_discount / md) AS sum_l_discount
FROM lineitem CROSS JOIN m
GROUP BY l_returnflag
"""


def q_row_normalizer(spark, sf_dir):
    """Normalizer (operators/preprocessing.py): row-wise L2 scaling of
    three lineitem measures — stateless narrow projection; per-flag
    sums of the normalized columns are value-checked."""
    from dask_ml_spark.operators.preprocessing import Normalizer

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    out = Normalizer(norm="l2").fit(li, cols).transform(li)
    return (out.groupBy("l_returnflag")
            .agg(*[F.sum(c).alias(f"sum_{c}") for c in cols]))


SQL_ROW_NORMALIZER = """
WITH n AS (
    SELECT l_returnflag,
           sqrt(l_quantity * l_quantity
                + l_extendedprice * l_extendedprice
                + l_tax * l_tax) AS nrm,
           l_quantity, l_extendedprice, l_tax
    FROM lineitem
)
SELECT l_returnflag,
       sum(l_quantity / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)) AS sum_l_quantity,
       sum(l_extendedprice / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)) AS sum_l_extendedprice,
       sum(l_tax / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)) AS sum_l_tax
FROM n GROUP BY l_returnflag
"""


def q_kbins_discretizer(spark, sf_dir):
    """KBinsDiscretizer (operators/preprocessing.py): exact-quantile
    edges on the continuous l_extendedprice (continuous ⇒ no
    row-on-edge float ambiguity between engines), ordinal transform as
    a pure column expression; per-bin count + sum checked."""
    from dask_ml_spark.operators.preprocessing import KBinsDiscretizer

    li = _t(spark, sf_dir, "lineitem")
    kb = KBinsDiscretizer(n_bins=8, strategy="quantile").fit(
        li, ["l_extendedprice"])
    return (kb.transform(li.select("l_extendedprice",
                                   F.col("l_extendedprice").alias("raw")))
            .groupBy(F.col("l_extendedprice").cast("long").alias("bin"))
            .agg(F.count("*").alias("n"), _dsum("raw").alias("total")))


SQL_KBINS_DISCRETIZER = """
WITH e AS (
    SELECT quantile_cont(l_extendedprice,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
    FROM lineitem
)
SELECT
    (CASE WHEN l_extendedprice >= q[1] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[2] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[3] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[4] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[5] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[6] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[7] THEN 1 ELSE 0 END)::BIGINT AS bin,
    count(*) AS n,
    (CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS total
FROM lineitem CROSS JOIN e
GROUP BY 1
"""


# approx sibling: quantile_disc replays exact-regime GK edges (see
# SQL_QUANTILE_TRANSFORMER_FIT_APPROX note); the bin rule is the same
SQL_KBINS_DISCRETIZER_APPROX = """
WITH e AS (
    SELECT quantile_disc(l_extendedprice,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
    FROM lineitem
)
SELECT
    (CASE WHEN l_extendedprice >= q[1] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[2] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[3] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[4] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[5] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[6] THEN 1 ELSE 0 END
   + CASE WHEN l_extendedprice >= q[7] THEN 1 ELSE 0 END)::BIGINT AS bin,
    count(*)::BIGINT AS n
FROM lineitem CROSS JOIN e
GROUP BY 1
"""


def q_cross_corpus_minhash(spark, sf_dir):
    """Near-duplicate cross-corpus dedup (dedup_against
    method="minhash"): the re-crawled shard's overlap docs collide
    with themselves in every band (estimated Jaccard 1.0) and drop;
    the oracle replays the banded signature join with the same
    integer k/8 >= 0.5 confirmation (no float boundary — 0.5 is
    exact)."""
    from dask_ml_spark.datapipe import dedup as DD2

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < 300)
    new = docs.where(F.col("doc_id") >= 200)
    kept = DD2.dedup_against(new, corpus, method="minhash",
                             n_hashes=8, bands=4, min_jaccard=0.5)
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_new"),
                 F.sum("doc_id").alias("id_checksum")))


def sql_cross_corpus_minhash() -> str:
    sig_sql = sql_minhash_signatures(8)
    r = 8 // 4
    band_selects = []
    for bi in range(4):
        cols = " || '_' || ".join(f"CAST(m{bi * r + j} AS VARCHAR)" for j in range(r))
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, {cols} AS band_key FROM sig")
    banded = " UNION ALL ".join(band_selects)
    est = " + ".join(f"(CASE WHEN sn.m{i} = sc.m{i} THEN 1 ELSE 0 END)"
                     for i in range(8))
    return f"""
WITH sig AS ({sig_sql}), banded AS ({banded}),
dup AS (
    SELECT DISTINCT n.doc_id
    FROM banded n
    JOIN banded c ON n.band = c.band AND n.band_key = c.band_key
    JOIN sig sn ON sn.doc_id = n.doc_id
    JOIN sig sc ON sc.doc_id = c.doc_id
    WHERE n.doc_id >= 200 AND c.doc_id < 300
      AND ({est}) >= 4
)
SELECT d.lang, count(*) AS n_new, sum(d.doc_id) AS id_checksum
FROM documents d
WHERE d.doc_id >= 200 AND d.doc_id NOT IN (SELECT doc_id FROM dup)
GROUP BY d.lang
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


def q_cross_corpus_dedup(spark, sf_dir):
    """Cross-corpus dedup (datapipe/dedup.py::dedup_against): dedupe a
    new shard against an existing corpus — here the shard re-crawls
    part of the corpus (doc_id 200..299 appear in both), so the
    content-hash LEFT ANTI join drops exactly that overlap. Survivor
    content is checked per language (count + id checksum)."""
    from dask_ml_spark.datapipe import dedup as DD2

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < 300)
    new = docs.where(F.col("doc_id") >= 200)
    kept = DD2.dedup_against(new, corpus, method="exact")
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_new"),
                 F.sum("doc_id").alias("id_checksum")))


SQL_CROSS_CORPUS_DEDUP = """
SELECT lang, count(*) AS n_new, sum(doc_id) AS id_checksum
FROM documents n
WHERE n.doc_id >= 200
  AND NOT EXISTS (SELECT 1 FROM documents c
                  WHERE c.doc_id < 300 AND c.text = n.text)
GROUP BY lang
"""


def q_knn_classifier_eval(spark, sf_dir):
    """Brute-force k-NN prediction (operators/neighbors.py): the first
    100 embedding rows are the evaluation batch, the rest train; the
    classifier majority-votes (ties to the smallest label) and the
    regressor means over the SAME 5 euclidean neighbors. Fully
    oracled — the SQL replays distances, the (dist, tid) neighbor
    ranking, the vote, and the mean."""
    from dask_ml_spark.operators.neighbors import (KNeighborsClassifier,
                                                   KNeighborsRegressor)

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") >= 100)
    test = emb.where(F.col("vec_id") < 100).select("vec_id", "embedding")
    clf = KNeighborsClassifier(n_neighbors=5, vec_col="embedding").fit(
        train, label_col="label", id_col="vec_id")
    reg = KNeighborsRegressor(n_neighbors=5, vec_col="embedding").fit(
        train, label_col="label", id_col="vec_id")
    p = clf.predict(test, "vec_id")
    m = reg.predict(test, "vec_id", output_col="knn_mean")
    return (p.join(m, "vec_id")
            .select("vec_id", F.col("prediction").cast("long"),
                    F.round("knn_mean", 6).alias("knn_mean")))


SQL_KNN_CLASSIFIER_EVAL = """
WITH tr AS (
    SELECT vec_id, embedding::DOUBLE[] AS v, label
    FROM embeddings WHERE vec_id >= 100
),
te AS (
    SELECT vec_id, embedding::DOUBLE[] AS v
    FROM embeddings WHERE vec_id < 100
),
d AS (
    SELECT te.vec_id AS qid, tr.vec_id AS tid, tr.label,
           list_sum(list_transform(generate_series(1, len(te.v)),
               i -> (te.v[i] - tr.v[i]) * (te.v[i] - tr.v[i]))) AS dist
    FROM te CROSS JOIN tr
),
r AS (
    SELECT qid, tid, label,
           row_number() OVER (PARTITION BY qid ORDER BY dist, tid) AS rk
    FROM d
),
k AS (SELECT qid, label FROM r WHERE rk <= 5),
v AS (SELECT qid, label, count(*) AS votes FROM k GROUP BY qid, label),
p AS (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid
                              ORDER BY votes DESC, label) AS pr
    FROM v
),
m AS (SELECT qid, round(avg(label::DOUBLE), 6) AS knn_mean
      FROM k GROUP BY qid)
SELECT p.qid AS vec_id, p.label::BIGINT AS prediction, m.knn_mean
FROM p JOIN m ON p.qid = m.qid
WHERE p.pr = 1
"""


KCENTER_K = 6


def q_kcenter_sample(spark, sf_dir):
    """Greedy k-center diversity sample (sampling.kcenter_sample) over
    the embeddings table: k=6 farthest-point selections with min-id
    seed and min-id tie-breaks. Fully oracle-verified — the SQL
    replays every round (chained CTEs: each round's argmax of the
    least squared distance to the previously selected centers) and
    the covering-radius distances round to 6."""
    from dask_ml_spark.datapipe.sampling import kcenter_sample

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_sample(emb, k=KCENTER_K, vec_col="embedding",
                          id_col="vec_id")


def _sql_kcenter_sample() -> str:
    """Round-by-round replay: cN = argmax over rows of min squared
    distance to c1..c(N-1), ties to the smallest vec_id; distances in
    DOUBLE via per-index lambda (same elementwise (a-b)^2 sum as the
    Spark zip_with fold)."""
    def dist(c):
        return ("list_sum(list_transform(generate_series(1, len(e.v)), "
                f"i -> (e.v[i] - {c}.v[i]) * (e.v[i] - {c}.v[i])))")

    ctes = ["e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
            "c1 AS (SELECT vec_id, v, 0.0 AS dist FROM e ORDER BY vec_id LIMIT 1)"]
    for r in range(2, KCENTER_K + 1):
        prev = [f"c{i}" for i in range(1, r)]
        d = (f"least({', '.join(dist(c) for c in prev)})"
             if len(prev) > 1 else dist(prev[0]))
        joins = " CROSS JOIN ".join(["e"] + prev)
        ctes.append(
            f"c{r} AS (SELECT e.vec_id, e.v, {d} AS dist "
            f"FROM {joins} ORDER BY dist DESC, e.vec_id LIMIT 1)")
    selects = [
        f'SELECT {r} AS "round", vec_id, '
        f"floor(dist * 1e6 + 0.5) / 1e6 AS dist FROM c{r}"
        for r in range(1, KCENTER_K + 1)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def q_stratified_sample(spark, sf_dir):
    """Content-hash stratified sampling (datapipe/sampling.py): keep
    30% of English, all German, half of Chinese documents; other
    languages dropped. The oracle recomputes the SAME Knuth-hash bucket
    arithmetic in SQL and checks the selected row CONTENT (per-language
    count + doc_id checksum), not just sizes."""
    from dask_ml_spark.datapipe.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", {"en": 0.3, "de": 1.0, "zh": 0.5}, key_cols="doc_id")
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_checksum")))


def q_unigram_logprob(spark, sf_dir):
    """Unigram-LM fluency scoring (datapipe/text_stats.py): the corpus
    is its own language model; score = mean ln p(token) with additive
    smoothing — the light-weight stand-in for a KenLM perplexity gate."""
    docs = _t(spark, sf_dir, "documents")
    return TS.unigram_logprob_scores(docs)


SQL_UNIGRAM_LOGPROB = f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
    FROM documents
), lm AS (
    SELECT token, count(*) AS c FROM toks GROUP BY token
), stats AS (
    SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM lm
), scored AS (
    SELECT t.doc_id, ln((lm.c + 0.5) / (stats.n + 0.5 * stats.v)) AS logp
    FROM toks t JOIN lm ON t.token = lm.token CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_tokens, round(avg(logp), 6) AS avg_logprob
FROM scored GROUP BY doc_id
"""


def q_bigram_logprob(spark, sf_dir):
    """Conditional bigram-LM fluency scoring (datapipe/text_stats.py::
    bigram_logprob_scores) — word order matters; docs with <2 tokens
    have no bigrams and drop out."""
    docs = _t(spark, sf_dir, "documents")
    return TS.bigram_logprob_scores(docs)


SQL_BIGRAM_LOGPROB = f"""
WITH arrs AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS arr
    FROM documents
), toks AS (
    SELECT doc_id, generate_subscripts(arr, 1) AS ord, unnest(arr) AS token
    FROM arrs
), big AS (
    SELECT l.doc_id, l.token AS a, r.token AS b
    FROM toks l JOIN toks r ON l.doc_id = r.doc_id AND r.ord = l.ord + 1
), uni AS (
    SELECT token, count(*) AS ca FROM toks GROUP BY token
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS v FROM uni
), bi AS (
    SELECT a, b, count(*) AS cab FROM big GROUP BY a, b
), scored AS (
    SELECT g.doc_id,
           ln((bi.cab + 0.5) / (uni.ca + 0.5 * stats.v)) AS logp
    FROM big g
    JOIN bi ON g.a = bi.a AND g.b = bi.b
    JOIN uni ON g.a = uni.token
    CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 6) AS avg_logprob
FROM scored GROUP BY doc_id
"""


PROFILE_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
PROFILE_STR_COLS = ["l_returnflag", "l_linestatus"]


def q_table_profile(spark, sf_dir):
    """One-pass per-column profiling (datapipe/profiling.py): null
    fractions, exact cardinalities (exact only for the oracle — the
    operator defaults to HyperLogLog approx_count_distinct at scale),
    numeric moments, string min/max. The whole profile is one wide
    aggregate; #columns rows reach the driver."""
    from dask_ml_spark.datapipe.profiling import profile_table

    li = _t(spark, sf_dir, "lineitem")
    return profile_table(li, PROFILE_NUM_COLS + PROFILE_STR_COLS,
                         approx_distinct=False)


def q_table_profile_approx(spark, sf_dir):
    """The HLL profiling path, oracle-verified (r7): one fused
    aggregate computes the exact distinct counts AND the HLL++
    estimates, emitting hll_ok = |hll − exact| ≤ max(3·rsd·exact, 2)
    per column. The oracle replays every deterministic stat and
    asserts hll_ok TRUE — a broken sketch flips the flag and fails the
    hash-match. (The library default stays pure-HLL for the 100 TB
    path; this rendering pays the exact-distinct EXPAND only to keep
    the sketch value-checked.)"""
    from dask_ml_spark.datapipe.profiling import profile_table

    li = _t(spark, sf_dir, "lineitem")
    return profile_table(li, PROFILE_NUM_COLS + PROFILE_STR_COLS,
                         check_hll=True)


def _sql_table_profile() -> str:
    parts = []
    for c in PROFILE_NUM_COLS:
        parts.append(f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       round((count(*) - count({c})) / count(*), 6) AS null_frac,
       count(DISTINCT {c}) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), 6) AS min_num,
       round(CAST(max({c}) AS DOUBLE), 6) AS max_num,
       round(avg({c}), 6) AS mean, round(stddev_samp({c}), 6) AS stddev,
       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
FROM lineitem""")
    for c in PROFILE_STR_COLS:
        parts.append(f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       round((count(*) - count({c})) / count(*), 6) AS null_frac,
       count(DISTINCT {c}) AS n_distinct,
       NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
       NULL::DOUBLE AS mean, NULL::DOUBLE AS stddev,
       min({c}) AS min_str, max({c}) AS max_str
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


def q_script_profile(spark, sf_dir):
    """Unicode-script character profile (text_stats.script_profile):
    9 script-range counts + dominant script + non-ASCII fraction per
    document, with mixed-script content fabricated deterministically
    (every 3rd doc gets Cyrillic appended, every 5th Han+kana) so the
    dominant-script tie-break machinery actually runs. Fully oracled —
    the literal character-class patterns parse identically in Java
    regex and RE2."""
    from dask_ml_spark.datapipe.text_stats import script_profile

    docs = _t(spark, sf_dir, "documents")
    spiked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" привет мир словарь текст")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" 漢字かなカナ言語処理")).otherwise(F.lit("")),
        ).alias("text"))
    # round_digits=None + one floor-form rounding of the raw ratio —
    # single rounding on both engines (see q_gopher_quality)
    out = script_profile(spiked, round_digits=None)
    return out.withColumn(
        "non_ascii_frac",
        F.floor(F.col("non_ascii_frac") * 1e6 + F.lit(0.5)) / 1e6)


def _sql_script_profile() -> str:
    from dask_ml_spark.datapipe.text_stats import (_ASCII_PRINTABLE,
                                                   SCRIPT_PATTERNS)

    names = sorted(SCRIPT_PATTERNS)
    cnt = {s: ("(length(t) - length(regexp_replace(t, '"
               + SCRIPT_PATTERNS[s] + "', '', 'g')))")
           for s in names}
    branches = []
    for s in names:
        conds = [f"{cnt[s]} > 0"]
        for o in names:
            if o == s:
                continue
            op = ">" if o < s else ">="
            conds.append(f"{cnt[s]} {op} {cnt[o]}")
        branches.append("WHEN " + " AND ".join(conds) + f" THEN '{s}'")
    case = "CASE " + " ".join(branches) + " ELSE 'none' END"
    count_cols = ", ".join(f"{cnt[s]}::BIGINT AS n_{s}" for s in names)
    na = ("length(regexp_replace(t, '" + _ASCII_PRINTABLE
          + "', '', 'g'))")
    return f"""
WITH spiked AS (
    SELECT doc_id,
           text
           || (CASE WHEN doc_id % 3 = 0
               THEN ' привет мир словарь текст' ELSE '' END)
           || (CASE WHEN doc_id % 5 = 0
               THEN ' 漢字かなカナ言語処理' ELSE '' END) AS t
    FROM documents
)
SELECT doc_id, {count_cols},
       {case} AS dominant_script,
       floor({na} / greatest(length(t), 1)::DOUBLE * 1e6 + 0.5) / 1e6
           AS non_ascii_frac
FROM spiked
"""


def q_gopher_quality(spark, sf_dir):
    """The published Gopher quality-rule battery (text_stats.
    gopher_quality) over every document: word/line statistics, symbol
    and bullet/ellipsis fractions, alphabetic-word fraction, stopword
    presence, and the combined pass flag. Fully oracled — the SQL
    replays every rule from the same splits; ratio columns round via
    an explicit floor(x*1e6+0.5)/1e6 so both engines apply identical
    half-up semantics (Spark round is HALF_UP, DuckDB's is not, and
    dyadic ratios like 1/128 land exactly on the .5 boundary)."""
    from dask_ml_spark.datapipe.text_stats import gopher_quality

    docs = _t(spark, sf_dir, "documents")
    # round_digits=None: take the RAW ratios and apply the
    # engine-portable floor form exactly ONCE — rounding the library's
    # HALF_UP 6-digit values again could disagree with the oracle's
    # single rounding on values within an ulp of a .5e-6 boundary
    out = gopher_quality(docs, round_digits=None)
    fix = [(c, F.floor(F.col(c) * 1e6 + F.lit(0.5)) / 1e6)
           for c in ("mean_word_len", "symbol_ratio", "bullet_line_frac",
                     "ellipsis_line_frac", "alpha_word_frac")]
    return out.withColumns(dict(fix))


SQL_GOPHER_QUALITY = r"""
WITH w AS (
    SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(text, '[ \t\n\r\f]+')) AS word
        FROM documents)
    WHERE length(word) > 0
),
ws AS (
    SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(length(word))::DOUBLE AS sum_len,
           sum(CASE WHEN regexp_matches(word, '[A-Za-z]')
                    THEN 1 ELSE 0 END)::BIGINT AS n_alpha,
           count(DISTINCT CASE WHEN lower(word) IN
               ('the','be','to','of','and','that','have','with')
               THEN lower(word) END)::BIGINT AS n_stop
    FROM w GROUP BY doc_id
),
l AS (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line
    FROM documents
),
ls AS (
    SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(CASE WHEN left(line, 1) IN ('•', '-', '*')
                    THEN 1 ELSE 0 END)::BIGINT AS n_bullet,
           sum(CASE WHEN line LIKE '%...' OR line LIKE '%…'
                    THEN 1 ELSE 0 END)::BIGINT AS n_edots
    FROM l GROUP BY doc_id
),
s AS (
    SELECT doc_id,
           (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
           (length(text) - length(replace(text, '...', ''))) / 3 AS dots3,
           (length(text) - length(replace(text, '…', '')))::BIGINT AS uell
    FROM documents
),
j AS (
    SELECT d.doc_id,
           coalesce(ws.n_words, 0) AS nw,
           coalesce(ws.sum_len, 0.0) AS sum_len,
           coalesce(ws.n_alpha, 0) AS n_alpha,
           coalesce(ws.n_stop, 0) AS n_stop,
           greatest(coalesce(ws.n_words, 0), 1)::DOUBLE AS safe_w,
           coalesce(ls.n_lines, 0) AS nl,
           greatest(coalesce(ls.n_lines, 0), 1)::DOUBLE AS safe_l,
           coalesce(ls.n_bullet, 0) AS n_bullet,
           coalesce(ls.n_edots, 0) AS n_edots,
           s.n_hash, s.dots3, s.uell
    FROM documents d
    LEFT JOIN ws ON d.doc_id = ws.doc_id
    LEFT JOIN ls ON d.doc_id = ls.doc_id
    JOIN s ON d.doc_id = s.doc_id
)
SELECT doc_id, nw AS n_words,
       floor(sum_len / safe_w * 1e6 + 0.5) / 1e6 AS mean_word_len,
       floor((dots3 + uell + n_hash) / safe_w * 1e6 + 0.5) / 1e6
           AS symbol_ratio,
       floor(n_bullet / safe_l * 1e6 + 0.5) / 1e6 AS bullet_line_frac,
       floor(n_edots / safe_l * 1e6 + 0.5) / 1e6 AS ellipsis_line_frac,
       floor(n_alpha / safe_w * 1e6 + 0.5) / 1e6 AS alpha_word_frac,
       n_stop AS n_stop_present,
       (nw >= 50 AND nw <= 100000
        AND sum_len / safe_w >= 3.0 AND sum_len / safe_w <= 10.0
        AND (dots3 + uell + n_hash) / safe_w <= 0.1
        AND n_bullet / safe_l <= 0.9
        AND n_edots / safe_l <= 0.3
        AND n_alpha / safe_w >= 0.8
        AND n_stop >= 2) AS passes
FROM j
"""


def q_url_dedup(spark, sf_dir):
    """URL canonicalization + keep-one dedup (text_stats.url_dedup):
    every document fabricates one of five crawl-style surface forms of
    a logical page (uppercase scheme/host + www + trailing slash,
    explicit default port, utm tracking params, #fragment, real params
    mixed with tracking) and the canonical keep-one must collapse each
    page to its min-id representative — with the ?a=1&b=2 real-param
    page staying DISTINCT. Fully oracled: the SQL replays the
    construction, the whole canonicalization regex chain, and the
    keep-one join."""
    from dask_ml_spark.datapipe.text_stats import url_dedup

    docs = _t(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 40).cast("string")
    v = F.col("doc_id") % 5
    url = (F.when(v == 0, F.concat(F.lit("HTTPS://WWW.Example.com/p/"),
                                   page, F.lit("/")))
           .when(v == 1, F.concat(F.lit("https://example.com:443/p/"), page))
           .when(v == 2, F.concat(F.lit("https://example.com/p/"), page,
                                  F.lit("?utm_source=feed")))
           .when(v == 3, F.concat(F.lit("https://example.com/p/"), page,
                                  F.lit("#frag")))
           .otherwise(F.concat(F.lit("https://example.com/p/"), page,
                               F.lit("?a=1&utm_campaign=x&b=2"))))
    u = docs.select("doc_id", url.alias("url"))
    return url_dedup(u, "url", "doc_id").select(
        "canonical_url", "doc_id", "url")


def _sql_url_dedup() -> str:
    from dask_ml_spark.datapipe.text_stats import sql_canonical_url

    return f"""
WITH u AS (
    SELECT doc_id,
        CASE doc_id % 5
            WHEN 0 THEN 'HTTPS://WWW.Example.com/p/' || (doc_id % 40)::VARCHAR || '/'
            WHEN 1 THEN 'https://example.com:443/p/' || (doc_id % 40)::VARCHAR
            WHEN 2 THEN 'https://example.com/p/' || (doc_id % 40)::VARCHAR || '?utm_source=feed'
            WHEN 3 THEN 'https://example.com/p/' || (doc_id % 40)::VARCHAR || '#frag'
            ELSE 'https://example.com/p/' || (doc_id % 40)::VARCHAR || '?a=1&utm_campaign=x&b=2'
        END AS url
    FROM documents
),
c AS (SELECT doc_id, url, {sql_canonical_url('url')} AS canonical_url FROM u),
k AS (SELECT canonical_url, min(doc_id) AS doc_id FROM c GROUP BY canonical_url)
SELECT c.canonical_url, c.doc_id, c.url
FROM c JOIN k ON c.canonical_url = k.canonical_url AND c.doc_id = k.doc_id
"""


def q_contamination_scores(spark, sf_dir):
    """Benchmark decontamination (datapipe/decontam.py): word-3-gram
    overlap of each corpus document (doc_id >= 20) against an eval set
    stand-in (doc_id < 20). The eval shingle set broadcasts; the corpus
    side is one explode + broadcast-join + per-doc count — no
    corpus-vs-corpus self-join, the shape that survives 100 TB."""
    from dask_ml_spark.datapipe.decontam import contamination_scores

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 20)
    eval_set = docs.where(F.col("doc_id") < 20)
    return contamination_scores(corpus, eval_set, shingle_n=3)


def q_group_kfold_assignment(spark, sf_dir):
    """Group-aware CV folds (GroupKFold, sklearn-parity — dask-ml has
    no group splitter): every document of a source lands in ONE fold,
    so no group straddles a train/test boundary. The oracle replays
    the engine-portable md5-fold + Knuth-bucket fold id, verifying the
    ASSIGNMENT, and count(distinct source) summing to the total source
    count across folds is the no-leakage proof."""
    from dask_ml_spark.plans.model_selection import GroupKFold

    docs = _t(spark, sf_dir, "documents")
    gk = GroupKFold(n_splits=5, group_col="source")
    wf = gk.fold_column(docs)
    return (wf.groupBy(F.col("__fold").cast("long").alias("fold"))
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("source").alias("n_sources")))


SQL_GROUP_KFOLD_ASSIGNMENT = """
WITH keyed AS (
    SELECT source,
           ('0x' || substr(md5(source), 1, 14))::BIGINT AS key
    FROM documents
)
SELECT ((((key % 2147483648) * 2654435761) % 2147483648) % 10000) % 5
           AS fold,
       count(*) AS n_docs,
       count(DISTINCT source) AS n_sources
FROM keyed
GROUP BY 1
"""


def q_domain_pagerank(spark, sf_dir):
    """Domain-authority scoring: the synthetic outlink graph (each doc
    co-links its site domain and a shared CDN, both directions) feeds
    3 iterations of weighted PageRank (datapipe/graph.py) — one join +
    one aggregate per iteration over the degree-normalized edge table.
    Deterministic, so the oracle replays all 3 iterations as chained
    CTEs."""
    from dask_ml_spark.datapipe.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    site = F.concat(F.lit("site"), (F.col("doc_id") % 20).cast("string"),
                    F.lit(".example.com"))
    cdn = F.lit("cdn.shared.net")
    edges = (docs.select(site.alias("src"), cdn.alias("dst"))
             .unionAll(docs.select(cdn.alias("src"), site.alias("dst"))))
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _sql_domain_pagerank(iters: int = 3, d: float = 0.85) -> str:
    head = """
WITH edges AS (
    SELECT src, dst, count(*)::DOUBLE AS w FROM (
        SELECT 'site' || (doc_id % 20)::VARCHAR || '.example.com' AS src,
               'cdn.shared.net' AS dst
        FROM documents
        UNION ALL
        SELECT 'cdn.shared.net',
               'site' || (doc_id % 20)::VARCHAR || '.example.com'
        FROM documents
    ) GROUP BY src, dst
),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges
           UNION ALL SELECT dst FROM edges)),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
norm AS (SELECT src, dst, w / out_w AS p FROM edges JOIN deg USING (src)),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f""",
r{k} AS (
    SELECT nodes.node,
           (1 - {d}) / nn.n + {d} * (coalesce(c.c, 0) + dm.dm / nn.n) AS rank
    FROM nodes CROSS JOIN nn
    CROSS JOIN (SELECT coalesce(sum(rank), 0) AS dm FROM r{k - 1}
                WHERE node NOT IN (SELECT src FROM deg)) dm
    LEFT JOIN (SELECT dst, sum(p * rank) AS c FROM norm
               JOIN r{k - 1} ON norm.src = r{k - 1}.node GROUP BY dst) c
      ON nodes.node = c.dst
)""")
    return (head + "".join(its)
            + f"\nSELECT node, round(rank, 6) AS rank FROM r{iters}")


def q_bloom_decontam_scores(spark, sf_dir):
    """The Bloom-prefiltered rendering of contamination_scores: eval
    shingles fold into an expression-built Bloom bitmap (xxhash64
    double hashing, the bitmap a literal long array referenced once
    through a named column), definite-negative corpus shingles drop at
    scan speed, and only the survivors hit the exact verify join.
    Output is BYTE-IDENTICAL to the exact path by construction (false
    positives just do extra exact work), so this query shares the
    exact oracle verbatim."""
    from dask_ml_spark.datapipe.decontam import contamination_scores_bloom

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 20)
    eval_set = docs.where(F.col("doc_id") < 20)
    return contamination_scores_bloom(corpus, eval_set, shingle_n=3)


SQL_CONTAMINATION_SCORES = f"""
WITH toks_t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
), sh AS (
    SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM toks_t
), eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id < 20
), corpus_sh AS (
    SELECT doc_id, shingle FROM sh WHERE doc_id >= 20
), sizes AS (
    SELECT doc_id, count(*) AS n_shingles FROM corpus_sh GROUP BY doc_id
), overlap AS (
    SELECT c.doc_id, count(*) AS n_overlap
    FROM corpus_sh c JOIN eval_sh e ON c.shingle = e.shingle
    GROUP BY c.doc_id
)
SELECT s.doc_id, s.n_shingles,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(coalesce(o.n_overlap, 0) / s.n_shingles, 6) AS contamination
FROM sizes s LEFT JOIN overlap o ON s.doc_id = o.doc_id
"""


MIXTURE_WEIGHTS = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(15)}
MIXTURE_BUDGET = 5000


def q_mixture_sample(spark, sf_dir):
    """Token-budget mixture planning (datapipe/sampling.py): sources
    src0-4 weighted 2x, src5-14 1x, src15-19 excluded; per-source
    sampling rates derived from actual token mass against a 5000-token
    budget, rows selected by the engine-portable Knuth-hash bucket. The
    oracle recomputes rates AND the selected row content in SQL."""
    from dask_ml_spark.datapipe.sampling import mixture_by_token_budget

    docs = _t(spark, sf_dir, "documents")
    kept = mixture_by_token_budget(docs, MIXTURE_WEIGHTS, MIXTURE_BUDGET)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_checksum"),
                 F.sum("n_tokens").alias("tok_sum")))


def _sql_mixture_sample() -> str:
    wsum = float(sum(MIXTURE_WEIGHTS.values()))
    w_case = " ".join(
        f"WHEN '{s}' THEN {w!r}" for s, w in MIXTURE_WEIGHTS.items())
    return f"""
WITH counted AS (
    SELECT doc_id, source,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens,
           ((((0 + doc_id) % 2147483648) * 2654435761) % 2147483648) % 10000 AS bucket
    FROM documents
), tot AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tot FROM counted GROUP BY source
), cuts AS (
    SELECT source,
           CASE WHEN (CASE source {w_case} ELSE NULL END) IS NULL THEN 0
                ELSE floor(least(1.0,
                       ((CASE source {w_case} END) / {wsum!r} * {MIXTURE_BUDGET}.0)
                       / greatest(tot, 1)) * 10000) END AS cut
    FROM tot
)
SELECT c.source, count(*) AS n_kept,
       CAST(sum(c.doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(c.n_tokens) AS BIGINT) AS tok_sum
FROM counted c JOIN cuts ON c.source = cuts.source
WHERE c.bucket < cuts.cut
GROUP BY c.source
"""


SQL_STRATIFIED_SAMPLE = """
WITH b AS (
  SELECT *, ((((0 + doc_id) % 2147483648) * 2654435761) % 2147483648) % 10000 AS bucket
  FROM documents
)
SELECT lang, count(*) AS n_kept, sum(doc_id) AS id_checksum
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 10000
                         WHEN 'zh' THEN 5000 ELSE 0 END
GROUP BY lang
"""


TEMP_MIX_ALPHA = 0.5
TEMP_MIX_BUDGET = 5_000


def q_temperature_mixture(spark, sf_dir):
    """Temperature-weighted domain mixture
    (datapipe/sampling.py::temperature_mixture): per-source rates
    derive from the data itself (share ∝ token-mass^alpha, the
    multilingual re-balancing rule) and rows are selected by the
    engine-portable hash bucket, so the oracle recomputes both the
    rates AND the selected row content in SQL."""
    from dask_ml_spark.datapipe.sampling import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    kept = temperature_mixture(docs, TEMP_MIX_BUDGET, alpha=TEMP_MIX_ALPHA)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_checksum"),
                 F.sum("n_tokens").alias("tok_sum")))


def _sql_temperature_mixture() -> str:
    return f"""
WITH counted AS (
    SELECT doc_id, source,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens,
           ((((0 + doc_id) % 2147483648) * 2654435761) % 2147483648) % 10000 AS bucket
    FROM documents
), tot AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tot FROM counted GROUP BY source
), psum AS (
    SELECT sum(pow(tot::DOUBLE, {TEMP_MIX_ALPHA!r})) AS ps FROM tot
), cuts AS (
    SELECT source,
           floor(least(1.0,
                 (pow(tot::DOUBLE, {TEMP_MIX_ALPHA!r}) / ps
                  * {TEMP_MIX_BUDGET}.0) / greatest(tot, 1)) * 10000) AS cut
    FROM tot CROSS JOIN psum
)
SELECT c.source, count(*) AS n_kept,
       CAST(sum(c.doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(c.n_tokens) AS BIGINT) AS tok_sum
FROM counted c JOIN cuts ON c.source = cuts.source
WHERE c.bucket < cuts.cut
GROUP BY c.source
"""


def q_epoch_plan(spark, sf_dir):
    """Epoch/repetition planning for data-constrained mixing
    (datapipe/sampling.py::plan_epochs): per-source temperature
    targets with repetition counts for under-represented sources
    (capped at 4 epochs) and sampling rates for over-represented
    ones. One aggregate pass; fully oracled."""
    from dask_ml_spark.datapipe.sampling import plan_epochs

    docs = _t(spark, sf_dir, "documents")
    # budget > corpus so some sources plan multi-epoch repetition
    return plan_epochs(docs, token_budget=200_000, alpha=0.5)


SQL_EPOCH_PLAN = f"""
WITH tot AS (
    SELECT source,
           CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS BIGINT)
             AS tot_tokens
    FROM documents GROUP BY source
), ps AS (SELECT sum(pow(tot_tokens::DOUBLE, 0.5)) AS ps FROM tot)
SELECT source, tot_tokens,
       round(pow(tot_tokens::DOUBLE, 0.5) / ps * 200000.0, 6) AS target_tokens,
       round(least(4.0, pow(tot_tokens::DOUBLE, 0.5) / ps * 200000.0
                        / greatest(tot_tokens, 1)), 6) AS epochs,
       round(least(1.0, pow(tot_tokens::DOUBLE, 0.5) / ps * 200000.0
                        / greatest(tot_tokens, 1)), 6) AS rate
FROM tot CROSS JOIN ps
"""


TRAIN_PREP_BUDGET = 3_000


def q_training_data_prep(spark, sf_dir):
    """The FULL north-star flow, end to end in one Catalyst plan:
    quality filter → exact dedup → language gate → temperature-
    weighted mixture (α=0.5 over the surviving corpus) → fixed-length
    sequence packing. Every stage is the library operator; the oracle
    replays all five stages in SQL including the data-derived mixture
    rates and the distributed prefix sum's chunk arithmetic — the
    chunk table itself hash-matches."""
    from dask_ml_spark.datapipe.dedup import exact_dedup
    from dask_ml_spark.datapipe.packing import pack_sequences
    from dask_ml_spark.datapipe.sampling import temperature_mixture
    from dask_ml_spark.datapipe.text_stats import language_scores, quality_filter

    docs = _t(spark, sf_dir, "documents")
    q = quality_filter(docs).persist()
    survivors = exact_dedup(q).select("doc_id")
    # spread BEFORE persisting (AQE-exempt user repartition): the
    # language filter pushes its regex below the exchange into the
    # cache scan, so cache partitioning bounds its parallelism
    dp = spark.sparkContext.defaultParallelism
    kept = q.join(survivors, "doc_id").repartition(dp, "doc_id").persist()
    en = (language_scores(kept).where(F.col("lang_pred") == "en")
          .select("doc_id"))
    kept_en = kept.join(en, "doc_id")
    mixed = temperature_mixture(kept_en, TRAIN_PREP_BUDGET, alpha=0.5)
    # the mixture already counted tokens — reuse, don't re-tokenize
    packed = pack_sequences(mixed, seq_len=128, token_count_col="n_tokens")
    return packed.select("doc_id", "seq_id", "tok_start", "tok_end")


def sql_training_data_prep() -> str:
    langs = sorted(TS.STOPWORDS)
    scores = ", ".join(f"{_sql_lang_score(l)} AS score_{l}" for l in langs)
    conds = []
    for lang in langs:
        cmp = " AND ".join(
            f"score_{lang} {'>' if other < lang else '>='} score_{other}"
            for other in langs if other != lang
        )
        conds.append(f"WHEN {cmp} THEN '{lang}'")
    case = "CASE " + " ".join(conds) + f" ELSE '{langs[0]}' END"
    return f"""
WITH q AS (
    SELECT doc_id, source, text FROM (
        SELECT *, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks,
               greatest(length(text), 1)::DOUBLE AS safe_chars,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
        FROM documents
    )
    WHERE len(toks) >= 5
      AND n_digit / safe_chars <= 0.3
      AND len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE >= 0.2
), dd AS (
    SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), ' ')) AS h
        FROM q
    ) GROUP BY h
), kept AS (
    SELECT q.doc_id, q.source, q.text FROM q JOIN dd USING (doc_id)
), scored AS (
    SELECT doc_id, {scores} FROM kept
), en AS (
    SELECT doc_id FROM scored WHERE {case} = 'en'
), ke AS (
    SELECT kept.doc_id, kept.source,
           len(regexp_extract_all(lower(kept.text), '{TOKEN_RE_SQL}'))::BIGINT AS n,
           ((((0 + kept.doc_id) % 2147483648) * 2654435761) % 2147483648) % 10000 AS bucket
    FROM kept JOIN en USING (doc_id)
), tot AS (
    SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM ke GROUP BY source
), psum AS (
    SELECT sum(pow(tot::DOUBLE, 0.5)) AS ps FROM tot
), cuts AS (
    SELECT source,
           floor(least(1.0, (pow(tot::DOUBLE, 0.5) / ps
                 * {TRAIN_PREP_BUDGET}.0) / greatest(tot, 1)) * 10000) AS cut
    FROM tot CROSS JOIN psum
), mixed AS (
    SELECT ke.doc_id, ke.n FROM ke JOIN cuts ON ke.source = cuts.source
    WHERE ke.bucket < cuts.cut
), o AS (
    SELECT doc_id, n,
           coalesce(sum(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
    FROM mixed
), chunks AS (
    SELECT doc_id, n, s,
           unnest(generate_series(s // 128, (s + n - 1) // 128)) AS seq_id
    FROM o WHERE n > 0
)
SELECT doc_id, seq_id,
       greatest(0, seq_id * 128 - s) AS tok_start,
       least(n, (seq_id + 1) * 128 - s) AS tok_end
FROM chunks
"""


def q_group_quality_topk(spark, sf_dir):
    """Top-5 documents per language by distinct-token count
    (datapipe/sampling.py::topk_per_group over text_stats quality
    features) — the "keep the best k per stratum" curation primitive.
    Integer sort key + doc_id tie-break keeps the selection
    engine-deterministic, so the oracle checks exact membership."""
    from dask_ml_spark.datapipe.sampling import topk_per_group
    from dask_ml_spark.datapipe.text_stats import quality_scores

    docs = _t(spark, sf_dir, "documents")
    q = quality_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    top = topk_per_group(
        q.select("lang", "doc_id", "n_distinct_tokens"),
        "lang", ["n_distinct_tokens", ("doc_id", True)], k=5)
    return top.select("lang", "doc_id",
                      F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
                      F.col("rank").cast("long").alias("rank"))


def sql_group_quality_topk() -> str:
    return f"""
WITH q AS (
  SELECT doc_id, lang,
         len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))) AS n_distinct_tokens
  FROM documents
), ranked AS (
  SELECT lang, doc_id, n_distinct_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_distinct_tokens DESC, doc_id ASC) AS rank
  FROM q
)
SELECT lang, doc_id, n_distinct_tokens, rank FROM ranked WHERE rank <= 5
"""


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN probe with a FIXED coarse quantizer: the centroids are
    pinned to the embeddings of vec_id 0..15, making bucket assignment
    and probing deterministic — so the whole index (assign → probe →
    bucket join → exact cosine re-rank) is DuckDB-checkable. The
    learned-quantizer path (IVFIndex.fit, sampled k-means) stays the
    production default and is invariant-tested (recall vs brute force)."""
    from dask_ml_spark.datapipe.similarity import IVFIndex

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = IVFIndex(n_lists=16, n_probe=4)
    cent = (emb.where(F.col("vec_id") < 16).orderBy("vec_id")
            .select("embedding").collect())
    ivf.centroids_ = [list(r[0]) for r in cent]
    return ivf.search(emb, queries, k=10).select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )


SQL_IVF_ANN_TOPK = """
WITH cent AS (
    SELECT vec_id AS c, embedding AS cvec FROM embeddings WHERE vec_id < 16
), assign AS (
    SELECT e.vec_id, e.embedding,
           (SELECT c FROM cent
            ORDER BY list_distance(e.embedding, cent.cvec) ASC, c ASC
            LIMIT 1) AS bucket
    FROM embeddings e
), probes AS (
    SELECT q.vec_id AS query_id, q.embedding AS qvec, cent.c AS bucket
    FROM embeddings q CROSS JOIN cent
    WHERE q.vec_id < 5
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_distance(q.embedding, cent.cvec) ASC, cent.c ASC) <= 4
), scored AS (
    SELECT p.query_id, a.vec_id,
           list_cosine_similarity(a.embedding, p.qvec) AS score
    FROM assign a JOIN probes p ON a.bucket = p.bucket
    WHERE a.vec_id != p.query_id
)
SELECT query_id, vec_id, rank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
) WHERE rank <= 10
"""


def q_truncated_svd_variance(spark, sf_dir):
    """TruncatedSVD (reference truncated_svd.py:9-246): single-pass
    Gramian + driver eigh. Run on TWO (literal-prescaled) features so
    the 2×2 Gramian eigensystem has a closed form the SQL oracle can
    evaluate — λ± = (Sxx+Syy)/2 ± sqrt(((Sxx−Syy)/2)² + Sxy²) — turning
    the previously rows-only check into a full value match."""
    from dask_ml_spark.operators.decomposition import TruncatedSVD

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / F.lit(50.0)).alias("x"),
        (F.col("l_extendedprice") / F.lit(100000.0)).alias("y"),
    )
    svd = TruncatedSVD(n_components=2).fit(li, ["x", "y"])
    return spark.createDataFrame([{
        "sv0": float(svd.singular_values_[0]),
        "sv1": float(svd.singular_values_[1]),
        "explained_var0": float(svd.explained_variance_[0]),
        "explained_var1": float(svd.explained_variance_[1]),
    }]).select("sv0", "sv1", "explained_var0", "explained_var1")


# closed-form 2×2 eigensystem of the uncentered Gramian; explained
# variance matches the operator: (λ − n·(comp·mean)²) / (n−1), with the
# eigenvector (Sxy, λ−Sxx) — sign-free because t_mean enters squared
SQL_TRUNCATED_SVD_VARIANCE = """
WITH m AS (
    SELECT count(*)::DOUBLE AS n,
           sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy,
           avg(x) AS mx, avg(y) AS my
    FROM (SELECT l_quantity / 50.0 AS x, l_extendedprice / 100000.0 AS y FROM lineitem)
),
e AS (
    SELECT *,
           (sxx + syy) / 2 + sqrt(((sxx - syy) / 2) * ((sxx - syy) / 2) + sxy * sxy) AS l0,
           (sxx + syy) / 2 - sqrt(((sxx - syy) / 2) * ((sxx - syy) / 2) + sxy * sxy) AS l1
    FROM m
),
v AS (
    SELECT *,
           (sxy * mx + (l0 - sxx) * my) / sqrt(sxy * sxy + (l0 - sxx) * (l0 - sxx)) AS t0,
           (sxy * mx + (l1 - sxx) * my) / sqrt(sxy * sxy + (l1 - sxx) * (l1 - sxx)) AS t1
    FROM e
)
SELECT sqrt(l0) AS sv0, sqrt(greatest(l1, 0.0)) AS sv1,
       (l0 - n * t0 * t0) / (n - 1) AS explained_var0,
       (l1 - n * t1 * t1) / (n - 1) AS explained_var1
FROM v
"""


def q_grid_search_best(spark, sf_dir):
    """GridSearchCV (reference _search.py:131-1728): cached KFold folds,
    thread-pool fit of the (param, fold) grid. Seeded folds — rows-only."""
    from dask_ml_spark.operators.linear_model import LogisticRegression
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.plans.model_selection import GridSearchCV, KFold

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    scaled = StandardScaler().fit(li, cols).transform(li)
    gs = GridSearchCV(
        LogisticRegression(max_iter=10, tol=1e-4),
        {"C": [0.1, 10.0]},
        cv=KFold(n_splits=3, shuffle=True, random_state=7),
        # all 2x3 (param, fold) fits race concurrently — the reference's
        # scheduler runs the whole (param, fold) graph at once
        n_jobs=6,
    )
    gs.fit(scaled, cols, label_col="label")
    return spark.createDataFrame([{
        "best_C": float(gs.best_params_["C"]),
        "best_score": float(gs.best_score_),
        "n_candidates": int(len(gs.cv_results_["mean_test_score"])),
    }])


BLOBS_CENTERS = [[-5.0, 0.0], [0.0, 5.0], [5.0, -5.0]]
BLOBS_N = 10_000
BLOBS_STD = 1.5


def q_mahalanobis_outliers(spark, sf_dir):
    """Empirical-covariance Mahalanobis outlier scoring
    (operators/outliers.py) over three lineitem measures: fit is one
    moments aggregate, Σ⁻¹ folds into a literal quadratic form, and
    the query returns the 10 most outlying rows. Fully oracled — the
    SQL recomputes mean/covariance from raw sums, inverts the 3x3 by
    Cramer (adjugate / det), and replays the same quadratic form and
    ranking."""
    from dask_ml_spark.operators.outliers import MahalanobisOutlier

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    m = MahalanobisOutlier().fit(li, cols)
    scored = m.score_samples(li, "m2")
    return (scored
            .orderBy(F.desc("m2"), "l_orderkey", "l_linenumber")
            .limit(10)
            .select("l_orderkey", "l_linenumber",
                    (F.floor(F.col("m2") * 1e6 + F.lit(0.5)) / 1e6)
                    .alias("m2")))


def _sql_mahalanobis_outliers() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    moments = ", ".join(
        [f"avg({c}) AS m{i}" for i, c in enumerate(cols)]
        + [f"avg({cols[i]} * {cols[j]}) AS p{i}{j}"
           for i in range(3) for j in range(i, 3)])
    covs = ", ".join(f"p{i}{j} - m{i} * m{j} AS c{i}{j}"
                     for i in range(3) for j in range(i, 3))
    det = ("c00*(c11*c22 - c12*c12) - c01*(c01*c22 - c12*c02) "
           "+ c02*(c01*c12 - c11*c02)")
    # precision = adjugate / det (symmetric 3x3)
    prec = f"""
    (c11*c22 - c12*c12) / ({det}) AS q00,
    (c02*c12 - c01*c22) / ({det}) AS q01,
    (c01*c12 - c02*c11) / ({det}) AS q02,
    (c00*c22 - c02*c02) / ({det}) AS q11,
    (c02*c01 - c00*c12) / ({det}) AS q12,
    (c00*c11 - c01*c01) / ({det}) AS q22"""
    q = {(0, 0): "q00", (0, 1): "q01", (0, 2): "q02",
         (1, 0): "q01", (1, 1): "q11", (1, 2): "q12",
         (2, 0): "q02", (2, 1): "q12", (2, 2): "q22"}
    # EXACT same i,j accumulation order as score_samples
    terms = " + ".join(
        f"{q[(i, j)]} * ({cols[i]} - m{i}) * ({cols[j]} - m{j})"
        for i in range(3) for j in range(3))
    return f"""
WITH st AS (SELECT {moments} FROM lineitem),
cv AS (SELECT *, {covs} FROM st),
pr AS (SELECT *, {prec} FROM cv),
sc AS (
    SELECT l.l_orderkey, l.l_linenumber, 0.0 + {terms} AS m2
    FROM lineitem l CROSS JOIN pr
)
SELECT l_orderkey, l_linenumber,
       floor(m2 * 1e6 + 0.5) / 1e6 AS m2
FROM sc ORDER BY sc.m2 DESC, l_orderkey, l_linenumber LIMIT 10
"""


DBSCAN_N = 2000
DBSCAN_EPS = 0.8
DBSCAN_MINPTS = 5


def q_dbscan_cluster_sizes(spark, sf_dir):
    """DBSCAN (operators/cluster.py) over content-deterministic blobs:
    the grid-cell-join implementation's full contract — core set,
    min-core-id components, nearest-core border assignment, noise —
    verified against a brute-force SQL replay (all-pairs distances +
    recursive-CTE reachability). Coordinates quantize to 6 decimals
    via floor(x*1e6+0.5) in BOTH engines first, so every downstream
    threshold compares identical doubles (Box-Muller cos/ln can differ
    in the last ulp between engines)."""
    from dask_ml_spark.datasets import make_blobs_deterministic
    from dask_ml_spark.operators.cluster import DBSCAN

    pts = make_blobs_deterministic(DBSCAN_N, BLOBS_CENTERS,
                                   cluster_std=BLOBS_STD, spark=spark)
    quant = pts.select(
        F.col("id"),
        *[(F.floor(F.col(f"x{j}") * 1e6 + F.lit(0.5)) / 1e6).alias(f"x{j}")
          for j in range(2)])
    out = DBSCAN(eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS).fit_predict(
        quant, ["x0", "x1"], id_col="id")
    return (out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("cluster"))


def _sql_dbscan_cluster_sizes() -> str:
    """Brute-force replay: generate the same quantized points,
    all-pairs eps-neighborhoods, core set (self included, >= min_pts),
    min-core-id labels via recursive reachability over core-core
    edges, nearest-core border assignment (ties -> smallest core id),
    noise -1."""
    W = float(1 << 56)
    two_pi = 2.0 * 3.141592653589793

    def h(tag):
        return ("CAST(('0x' || substr(md5(id::VARCHAR || '_0_" + tag
                + "'), 1, 14)) AS BIGINT)")

    k = len(BLOBS_CENTERS)
    feats = []
    for j in range(2):
        u1 = f"(({h(f'a{j}')}) + 0.5) / {W!r}"
        u2 = f"(({h(f'b{j}')}) + 0.5) / {W!r}"
        z = f"sqrt(-2.0 * ln({u1})) * cos({two_pi!r} * ({u2}))"
        centers = ", ".join(f"({c[j]!r})" for c in BLOBS_CENTERS)
        cj = f"list_extract([{centers}], (({h('c')}) % {k}) + 1)"
        feats.append(
            f"floor(({cj} + {BLOBS_STD!r} * ({z})) * 1e6 + 0.5) / 1e6"
            f" AS x{j}")
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    return f"""
WITH RECURSIVE pts AS (
    SELECT id, {feats[0]}, {feats[1]}
    FROM range({DBSCAN_N}) t(id)
),
pairs AS (
    SELECT a.id AS ia, b.id AS ib,
           (a.x0 - b.x0) * (a.x0 - b.x0)
           + (a.x1 - b.x1) * (a.x1 - b.x1) AS d2
    FROM pts a JOIN pts b ON a.id <> b.id
    WHERE (a.x0 - b.x0) * (a.x0 - b.x0)
          + (a.x1 - b.x1) * (a.x1 - b.x1) <= {eps2!r}
),
cnt AS (SELECT ia AS id, count(*) + 1 AS n FROM pairs GROUP BY ia),
core AS (SELECT id FROM cnt WHERE n >= {DBSCAN_MINPTS}),
ce AS (
    SELECT p.ia, p.ib FROM pairs p
    JOIN core c1 ON p.ia = c1.id JOIN core c2 ON p.ib = c2.id
),
reach AS (
    SELECT id AS node, id AS lbl FROM core
    UNION
    SELECT ce.ib AS node, reach.lbl FROM reach JOIN ce ON ce.ia = reach.node
),
core_lbl AS (SELECT node AS id, min(lbl) AS cluster FROM reach GROUP BY node),
border AS (
    SELECT p.ia AS id, cl.cluster,
           row_number() OVER (PARTITION BY p.ia
                              ORDER BY p.d2, p.ib) AS rk
    FROM pairs p
    JOIN core c ON p.ib = c.id
    JOIN core_lbl cl ON cl.id = p.ib
    WHERE p.ia NOT IN (SELECT id FROM core)
),
lbl AS (
    SELECT id, cluster FROM core_lbl
    UNION ALL
    SELECT id, cluster FROM border WHERE rk = 1
)
SELECT coalesce(l.cluster, -1)::BIGINT AS cluster, count(*)::BIGINT AS n
FROM pts LEFT JOIN lbl l ON pts.id = l.id
GROUP BY 1 ORDER BY 1
"""


def q_blobs_deterministic_stats(spark, sf_dir):
    """Content-deterministic distributed data generation
    (datasets.py::make_blobs_deterministic): every row is a pure
    function of its index (Knuth hash → Box–Muller), entirely JVM
    expressions over spark.range — so unlike the numpy-RNG
    make_blobs (rows-only make_blobs_kmeans), the generated VALUES are
    verified by the oracle replaying the identical arithmetic."""
    from dask_ml_spark.datasets import make_blobs_deterministic

    df = make_blobs_deterministic(BLOBS_N, BLOBS_CENTERS,
                                  cluster_std=BLOBS_STD, spark=spark)
    return (df.groupBy("cluster")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("x0"), 6).alias("mean_x0"),
                 F.round(F.avg("x1"), 6).alias("mean_x1"),
                 F.round(F.stddev_pop("x0"), 6).alias("std_x0"))
            .orderBy("cluster"))


def _sql_blobs_deterministic_stats() -> str:
    k = len(BLOBS_CENTERS)
    W = float(1 << 56)
    two_pi = 2.0 * 3.141592653589793

    def h(tag):
        return ("CAST(('0x' || substr(md5(id::VARCHAR || '_0_" + tag
                + "'), 1, 14)) AS BIGINT)")

    feats = []
    for j in range(2):
        u1 = f"(({h(f'a{j}')}) + 0.5) / {W!r}"
        u2 = f"(({h(f'b{j}')}) + 0.5) / {W!r}"
        z = f"sqrt(-2.0 * ln({u1})) * cos({two_pi!r} * ({u2}))"
        center = ("CASE cluster "
                  + " ".join(f"WHEN {c} THEN {BLOBS_CENTERS[c][j]!r}"
                             for c in range(k))
                  + " END")
        feats.append(f"{center} + {BLOBS_STD!r} * ({z}) AS x{j}")
    return f"""
WITH r AS (SELECT range AS id FROM range({BLOBS_N})),
c AS (SELECT id, ({h('c')}) % {k} AS cluster FROM r),
pts AS (SELECT cluster, {', '.join(feats)} FROM c)
SELECT cluster::INT AS cluster, count(*) AS n,
       round(avg(x0), 6) AS mean_x0, round(avg(x1), 6) AS mean_x1,
       round(stddev_pop(x0), 6) AS std_x0
FROM pts GROUP BY cluster ORDER BY cluster
"""


RIDGE_GRID_C = [0.1, 10.0]


def q_ridge_grid_search(spark, sf_dir):
    """A GridSearchCV whose ENTIRE result is value-verified: ridge
    regression (one-step-exact newton = the ridge normal equations)
    over content-deterministic HashKFold folds (Knuth-hash bucket % k,
    the hash_split arithmetic), so the oracle can replay fold
    assignment, per-fold penalized normal equations (Cramer's rule),
    held-out R², and candidate ranking — the first value-verified
    model-selection query (the seeded grid_search_best stays rows-only
    by design, mirroring the reference's seeded folds)."""
    from dask_ml_spark.operators.linear_model import LinearRegression
    from dask_ml_spark.plans.model_selection import GridSearchCV, HashKFold

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", F.col("l_extendedprice").cast("double"))
    gs = GridSearchCV(
        LinearRegression(penalty="l2", solver="newton"),
        {"C": RIDGE_GRID_C},
        cv=HashKFold(n_splits=3, key_cols=["l_orderkey", "l_linenumber"]),
        refit=False, n_jobs=6)
    gs.fit(li, ["l_quantity", "l_discount"], label_col="label")
    rows = [
        {"C": float(p["C"]), "mean_r2": round(float(s), 6)}
        for p, s in zip(gs.cv_results_["params"],
                        gs.cv_results_["mean_test_score"])
    ]
    best = max(r["mean_r2"] for r in rows)
    for r in rows:
        r["is_best"] = r["mean_r2"] == best
    return spark.createDataFrame(rows).select("C", "mean_r2", "is_best")


def _sql_ridge_grid_search() -> str:
    """Replay the whole search in SQL: Knuth-hash fold ids, per-fold
    sufficient statistics (one grouped pass; train sums = total −
    held-out fold), the 3×3 penalized normal equations by Cramer's
    rule per (fold, C), held-out R² expanded in the same sufficient
    statistics, then the per-candidate fold mean and argmax."""
    cand = ", ".join(f"({c!r})" for c in RIDGE_GRID_C)
    det = ("a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) "
           "+ a13*(a12*a23 - a22*a13)")
    return f"""
WITH f AS (
    SELECT l_quantity AS x1, l_discount AS x2,
           l_extendedprice::DOUBLE AS y,
           ((((0 + l_orderkey) % 2147483648) * 2654435761 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761
             % 2147483648 % 10000 % 3 AS fold
    FROM lineitem
),
per AS (
    SELECT fold, count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
           sum(y) AS sy, sum(x1*x1) AS s11, sum(x2*x2) AS s22,
           sum(x1*x2) AS s12, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
           sum(y*y) AS syy
    FROM f GROUP BY fold
),
tot AS (
    SELECT sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2, sum(sy) AS sy,
           sum(s11) AS s11, sum(s22) AS s22, sum(s12) AS s12,
           sum(s1y) AS s1y, sum(s2y) AS s2y
    FROM per
),
tr AS (
    SELECT p.fold, t.n - p.n AS n, t.s1 - p.s1 AS s1, t.s2 - p.s2 AS s2,
           t.sy - p.sy AS sy, t.s11 - p.s11 AS s11, t.s22 - p.s22 AS s22,
           t.s12 - p.s12 AS s12, t.s1y - p.s1y AS s1y, t.s2y - p.s2y AS s2y
    FROM per p CROSS JOIN tot t
),
cand(c) AS (VALUES {cand}),
mats AS (
    SELECT tr.fold, cand.c,
           tr.s11/tr.n + 1.0/cand.c AS a11, tr.s12/tr.n AS a12,
           tr.s1/tr.n AS a13, tr.s22/tr.n + 1.0/cand.c AS a22,
           tr.s2/tr.n AS a23, 1.0 AS a33,
           tr.s1y/tr.n AS b1, tr.s2y/tr.n AS b2, tr.sy/tr.n AS b3
    FROM tr CROSS JOIN cand
),
coef AS (
    SELECT fold, c,
      (b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
         + a13*(b2*a23 - a22*b3)) / ({det}) AS w1,
      (a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
         + a13*(a12*b3 - b2*a13)) / ({det}) AS w2,
      (a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
         + b1*(a12*a23 - a22*a13)) / ({det}) AS b
    FROM mats
),
scored AS (
    SELECT coef.c, coef.fold,
      1 - (p.syy - 2*w1*p.s1y - 2*w2*p.s2y - 2*b*p.sy
           + w1*w1*p.s11 + w2*w2*p.s22 + 2*w1*w2*p.s12
           + 2*w1*b*p.s1 + 2*w2*b*p.s2 + b*b*p.n)
        / (p.syy - p.sy*p.sy/p.n) AS r2
    FROM coef JOIN per p ON coef.fold = p.fold
),
means AS (SELECT c, round(avg(r2), 6) AS mean_r2 FROM scored GROUP BY c)
SELECT c AS "C", mean_r2,
       mean_r2 = (SELECT max(mean_r2) FROM means) AS is_best
FROM means
"""


def q_blockwise_voting_eval(spark, sf_dir):
    """BlockwiseVotingClassifier (reference _blockwise.py:11-291): one
    sklearn-protocol clone fit per partition, majority-vote predict.
    Run on a deterministic single-partition layout so the vote reduces
    to one CentroidClassifier — whose nearest-class-centroid decision
    the SQL oracle evaluates in closed form (per-class feature means +
    first-min distance). Multi-partition voting stays covered by
    tests/test_models.py (partitioning-dependent, not oracle-able)."""
    from dask_ml_spark.functions.metrics import accuracy_expr
    from dask_ml_spark.operators.ensemble import BlockwiseVotingClassifier
    from dask_ml_spark.operators.local_estimators import CentroidClassifier
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    scaled = StandardScaler().fit(li, cols).transform(li).coalesce(1)
    bv = BlockwiseVotingClassifier(CentroidClassifier()).fit(scaled, cols, label_col="label")
    pred = bv.predict(scaled)
    return pred.agg(
        accuracy_expr(F.col("label"), F.col("prediction")).alias("accuracy"),
        F.count("*").alias("n"),
    )


def sql_blockwise_voting_eval() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    feats = [f"f{i}" for i in range(len(cols))]
    scaled = ", ".join(
        f"({c} - avg({c}) OVER ()) / stddev_pop({c}) OVER () AS {f}"
        for c, f in zip(cols, feats)
    )
    cent = ", ".join(f"avg({f}) AS c{f}" for f in feats)
    pv = ", ".join(
        f"max(CASE WHEN label = {lab} THEN c{f} END) AS {tag}{f}"
        for lab, tag in ((0.0, "a"), (1.0, "b")) for f in feats
    )
    d0 = " + ".join(f"(s.{f} - pv.a{f}) * (s.{f} - pv.a{f})" for f in feats)
    d1 = " + ".join(f"(s.{f} - pv.b{f}) * (s.{f} - pv.b{f})" for f in feats)
    return f"""
WITH scaled AS (
    SELECT {scaled},
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label
    FROM lineitem
),
cent AS (SELECT label, {cent} FROM scaled GROUP BY label),
pv AS (SELECT {pv} FROM cent),
pred AS (
    SELECT label, CASE WHEN ({d0}) <= ({d1}) THEN 0.0 ELSE 1.0 END AS prediction
    FROM scaled s CROSS JOIN pv
)
SELECT avg(CASE WHEN prediction = label THEN 1.0 ELSE 0.0 END) AS accuracy,
       count(*) AS n
FROM pred
"""


def q_train_test_split_sizes(spark, sf_dir):
    """train_test_split / randomSplit (reference _split.py:361-520).
    Seeded row-level Bernoulli split — rows-only (fractions are
    approximate by design, like the reference's blockwise splits)."""
    from dask_ml_spark.plans.model_selection import train_test_split

    li = _t(spark, sf_dir, "lineitem")
    train, test = train_test_split(li, test_size=0.25, random_state=42)
    n_train, n_test = train.count(), test.count()
    return spark.createDataFrame([{
        "n_train": int(n_train),
        "n_test": int(n_test),
        "test_frac": float(n_test) / float(n_train + n_test),
    }])


SPECTRAL_GAMMA = 0.5
SPECTRAL_LANDMARKS = [
    [-1.2, -1.2, -1.2], [-1.2, 0.0, 1.2], [0.0, -1.2, 1.2], [0.0, 0.0, 0.0],
    [0.0, 1.2, -1.2], [1.2, -1.2, 0.0], [1.2, 0.0, -1.2], [1.2, 1.2, 1.2],
]
SPECTRAL_KM_INIT = [[-0.6, -0.3, 0.0], [-0.4, 0.3, 0.3], [-0.2, 0.0, -0.2]]
SPECTRAL_ITERS = 2


def _spectral_proj():
    """The Nyström embedding map for the PINNED landmarks — computed
    in numpy from the literals alone, so the Spark query and the SQL
    generator derive the IDENTICAL l×k weight matrix (the driver-side
    SVD is not a distributed computation; what the oracle verifies is
    everything distributed: scaling, the kernel embedding of every
    row, the Lloyd rounds, and the final assignment)."""
    import numpy as np

    from dask_ml_spark.operators.pairwise import rbf_kernel_matrix

    lm = np.asarray(SPECTRAL_LANDMARKS, dtype="float64")
    A = rbf_kernel_matrix(lm, lm, SPECTRAL_GAMMA)
    U, S, _ = np.linalg.svd(A, hermitian=True)
    k = len(SPECTRAL_KM_INIT)
    S_inv_sqrt = np.where(S[:k] > 1e-12, 1.0 / np.sqrt(S[:k]), 0.0)
    return U[:, :k] * S_inv_sqrt


def q_spectral_clustering_sizes(spark, sf_dir):
    """Nyström spectral clustering (reference spectral.py:22-375):
    kernel block + distributed embedding + k-means. Landmarks and
    k-means init are PINNED literals (the kmeans_cluster_sizes trick
    one level up), so the full pipeline — standardize, RBF-embed
    through the SVD map, replayed Lloyd rounds, final assignment — is
    SQL-oracle-able. The seeded-sampling path stays available on the
    operator (landmarks=None)."""
    from dask_ml_spark.operators.cluster import SpectralClustering
    from dask_ml_spark.operators.preprocessing import StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    scaled = StandardScaler().fit(li, cols).transform(li)
    sc = SpectralClustering(
        n_clusters=3, gamma=SPECTRAL_GAMMA, landmarks=SPECTRAL_LANDMARKS,
        kmeans_params={"init": SPECTRAL_KM_INIT, "max_iter": SPECTRAL_ITERS,
                       "tol": 0.0, "algorithm": "lloyd_dataframe"})
    return (
        sc.fit_predict(scaled, cols)
        .groupBy("prediction")
        .agg(F.count("*").alias("n"))
        .select(F.col("prediction").cast("long").alias("cluster"), "n")
    )


def sql_spectral_clustering_sizes() -> str:
    """Replay the pinned spectral pipeline in SQL: standardize with
    population stddev windows, compute the k embedding columns as
    Σ_i proj[i][j]·exp(-γ·||x - landmark_i||²) (full-precision numpy
    literals), then the same pivot/assign/update Lloyd replay as
    sql_kmeans_cluster_sizes over the embedding coordinates."""
    proj = _spectral_proj()
    k = len(SPECTRAL_KM_INIT)
    dims = [f"e{j}" for j in range(k)]
    cols = KMEANS_COLS
    svars = ["q", "p", "d"]

    kernels = []
    for i, lm in enumerate(SPECTRAL_LANDMARKS):
        d2 = " + ".join(f"({v} - {lm[a]!r}) * ({v} - {lm[a]!r})"
                        for a, v in enumerate(svars))
        kernels.append(f"exp(-{SPECTRAL_GAMMA!r} * ({d2})) AS kk{i}")
    embs = []
    for j in range(k):
        terms = [f"kk{i} * {float(proj[i, j])!r}"
                 for i in range(len(SPECTRAL_LANDMARKS))
                 if float(proj[i, j]) != 0.0]
        embs.append("(" + " + ".join(terms) + f") AS e{j}")

    def pivot(src: str, name: str) -> str:
        cells = ", ".join(
            f"max(CASE WHEN cluster = {c} THEN c{v} END) AS c{v}{c}"
            for c in range(k) for v in dims)
        return f"{name} AS (SELECT {cells} FROM {src})"

    def assign(name: str, piv: str) -> str:
        dist = ", ".join(
            "(" + " + ".join(f"(s.{v} - {piv}.c{v}{c}) * (s.{v} - {piv}.c{v}{c})"
                             for v in dims) + f") AS d{c}"
            for c in range(k))
        whens = []
        for c in range(k - 1):
            cond = " AND ".join(f"d{c} <= d{o}" for o in range(c + 1, k))
            whens.append(f"WHEN {cond} THEN {c}")
        case = "CASE " + " ".join(whens) + f" ELSE {k - 1} END"
        return (f"{name} AS (SELECT {', '.join(dims)}, {case} AS cluster "
                f"FROM (SELECT s.*, {dist} FROM emb s CROSS JOIN {piv}))")

    def update(prev: str, assigned: str, gname: str, cname: str) -> str:
        avgs = ", ".join(f"avg({v}) AS m{v}" for v in dims)
        coal = ", ".join(f"coalesce(g.m{v}, p.c{v}) AS c{v}" for v in dims)
        return (f"{gname} AS (SELECT cluster, {avgs} FROM {assigned} GROUP BY cluster), "
                f"{cname} AS (SELECT p.cluster, {coal} FROM {prev} p "
                f"LEFT JOIN {gname} g ON p.cluster = g.cluster)")

    init_rows = ", ".join(
        "(" + ", ".join([str(c)] + [f"{v!r}" for v in SPECTRAL_KM_INIT[c]]) + ")"
        for c in range(k))
    parts = [
        "scaled AS (SELECT "
        + ", ".join(
            f"({col} - avg({col}) OVER ()) / stddev_pop({col}) OVER () AS {v}"
            for col, v in zip(cols, svars))
        + " FROM lineitem)",
        f"kern AS (SELECT {', '.join(kernels)} FROM scaled)",
        f"emb AS (SELECT {', '.join(embs)} FROM kern)",
        f"c0(cluster, {', '.join('c' + v for v in dims)}) AS (VALUES {init_rows})",
    ]
    prev = "c0"
    for it in range(SPECTRAL_ITERS):
        parts.append(pivot(prev, f"pv{it}"))
        parts.append(assign(f"a{it}", f"pv{it}"))
        parts.append(update(prev, f"a{it}", f"g{it}", f"c{it + 1}"))
        prev = f"c{it + 1}"
    parts.append(pivot(prev, "pvf"))
    parts.append(assign("af", "pvf"))
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT cluster::BIGINT AS cluster, count(*) AS n "
              "FROM af GROUP BY cluster")


SGD_N_BLOCKS = 8


def q_incremental_sgd_eval(spark, sf_dir):
    """Incremental wrapper (reference wrappers.py:419-603): sequential
    partial_fit as chained single-partition executor jobs (the model
    travels between executors, partition data never leaves them), then
    distributed broadcast predict + accuracy. Oracle-able since r9:
    deterministic_by keys the blocks by the engine-portable Knuth hash
    (content-deterministic block multisets in block order), and
    SGDClassifier's partial_fit is one mean-gradient step per block —
    a closed form of batch aggregates, so the SQL replays the
    8-block sequential chain as chained CTE updates and scores the
    final weights. Accuracy is a thresholded count ratio, so the
    float-association slack between numpy block sums and SQL sums
    cannot move it at the 1e-6 rounding. The seeded shuffle_blocks
    mode stays the production default (tests/test_models.py)."""
    from dask_ml_spark.operators.local_estimators import SGDClassifier
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.operators.wrappers import Incremental

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    scaled = StandardScaler().fit(li, cols).transform(li)
    inc = Incremental(SGDClassifier(lr=0.1),
                      deterministic_by=["l_orderkey", "l_linenumber"],
                      n_blocks=SGD_N_BLOCKS)
    inc.fit(scaled, cols, label_col="label", classes=[0.0, 1.0])
    pred = inc.predict(scaled)
    acc = F.avg((F.col("label") == F.col("prediction")).cast("double"))
    return pred.agg(
        (F.floor(acc * 1e6 + F.lit(0.5)) / 1e6).alias("accuracy"),
        F.count("*").alias("n"),
    )


def sql_incremental_sgd_eval() -> str:
    """Replay the deterministic Incremental SGD chain: fold = the
    2-key Knuth hash mod 8 (same chain as hash_split), then per block
    one mean-gradient logistic step
        p = sigmoid(clip(x·w + b, ±35)); g = p − y
        c_k ← c_k − lr·(Σ g·x_k / n + alpha·c_k);  b ← b − lr·Σg/n
    exactly SGDClassifier.partial_fit's arithmetic, chained through 8
    CTEs, then broadcast predict (margin > 0) and accuracy."""
    lr, alpha = 0.1, 1e-4
    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    nf = len(feats)
    xs = ", ".join(
        f"(({c} - avg({c}) OVER ()) / stddev_pop({c}) OVER ()) AS x{i}"
        for i, c in enumerate(feats))
    margin = " + ".join(f"x{i}*c{i}" for i in range(nf)) + " + b0"
    chain = []
    prev = "w0"
    for b in range(SGD_N_BLOCKS):
        sums = ", ".join(f"sum(g * x{i}) AS s{i}" for i in range(nf))
        ups = ", ".join(
            f"CASE WHEN n > 0 THEN c{i} - {lr!r} * (s{i}/n + {alpha!r}*c{i})"
            f" ELSE c{i} END AS c{i}" for i in range(nf))
        chain.append(f"""g{b} AS (
    SELECT count(*)::DOUBLE AS n, {sums}, sum(g) AS sg
    FROM (SELECT {', '.join(f'x{i}' for i in range(nf))},
                 1.0/(1.0 + exp(-greatest(-35.0::DOUBLE,
                     least(35.0::DOUBLE, {margin})))) - y AS g
          FROM train CROSS JOIN {prev} WHERE fold = {b})
), w{b + 1} AS (
    SELECT {ups},
           CASE WHEN n > 0 THEN b0 - {lr!r} * (sg / n) ELSE b0 END AS b0
    FROM {prev} CROSS JOIN g{b})""")
        prev = f"w{b + 1}"
    chain_sql = ",\n".join(chain)
    return f"""
WITH train AS (
    SELECT {xs},
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
           ((((0 + l_orderkey) % 2147483648) * 2654435761 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761
             % 2147483648 % {SGD_N_BLOCKS} AS fold
    FROM lineitem
),
w0 AS (SELECT {', '.join(f'0.0::DOUBLE AS c{i}' for i in range(nf))},
              0.0::DOUBLE AS b0),
{chain_sql}
SELECT floor(avg(CASE WHEN (CASE WHEN {margin} > 0 THEN 1.0 ELSE 0.0 END) = y
                      THEN 1.0 ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS accuracy,
       count(*) AS n
FROM train CROSS JOIN {prev}
"""


def q_poisson_regression_fit(spark, sf_dir):
    """Poisson GLM with log link via distributed IRLS (reference
    glm.py:332-385). Iterative solver — rows-only."""
    from dask_ml_spark.operators.linear_model import PoissonRegression

    li = _t(spark, sf_dir, "lineitem").withColumn("label", F.col("l_quantity"))
    pr = PoissonRegression(max_iter=15).fit(li, ["l_discount", "l_tax"], label_col="label")
    return spark.createDataFrame([{
        "coef_discount": float(pr.coef_[0]),
        "coef_tax": float(pr.coef_[1]),
        "intercept": float(pr.intercept_),
    }])


def q_ks_price_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov (functions/stats.py::ks_2sample,
    beyond-reference — the distribution-shift gate for data
    experiments): did returned lineitems ship at different prices than
    non-returned? D over the pooled distinct prices (inclusive ECDFs,
    counts are exact in double so D is bit-exact cross-engine) + the
    asymptotic Kolmogorov p (identical 25-term series both engines)."""
    from dask_ml_spark.functions.stats import ks_2sample

    li = _t(spark, sf_dir, "lineitem")
    out = ks_2sample(li, "l_extendedprice", "l_returnflag",
                     groups=("N", "R"))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2", r6(F.col("d_stat")).alias("d_stat"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_ks_price_test() -> str:
    from dask_ml_spark.functions.stats import _ks_p_sql

    p = _ks_p_sql("lam")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS v, l_returnflag AS g
    FROM lineitem WHERE l_returnflag IN ('N', 'R')
), g AS (
    SELECT v,
           sum(CASE WHEN g = 'N' THEN 1.0 ELSE 0.0 END) AS c1,
           sum(CASE WHEN g = 'R' THEN 1.0 ELSE 0.0 END) AS c2
    FROM k GROUP BY v
), c AS (
    SELECT v, c1, c2,
           sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS f1,
           sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS f2,
           (SELECT sum(c1) FROM g) AS n1, (SELECT sum(c2) FROM g) AS n2
    FROM g
), d AS (
    SELECT max(n1) AS n1, max(n2) AS n2,
           max(abs(f1/n1 - f2/n2)) AS d_stat
    FROM c
), l AS (
    SELECT n1, n2, d_stat,
           d_stat * sqrt(n1 * n2 / (n1 + n2)) AS lam
    FROM d
)
SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
       floor(d_stat * 1e6 + 0.5) / 1e6 AS d_stat,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM l
"""


KS_BINS = 128


def q_ks_price_test_binned(spark, sf_dir):
    """The KS test's 100 TB scale path (the roc_auc_binned pattern):
    equal-width binning replaces the distinct-value prefix pass with
    one min/max aggregate + one ≤K-group aggregate — continuous data
    makes the exact path's distinct-value frame row-count-sized. The
    binned D is conservative (≤ exact) within the largest per-bin
    mass; deterministic, so fully oracled."""
    from dask_ml_spark.functions.stats import ks_2sample

    li = _t(spark, sf_dir, "lineitem")
    out = ks_2sample(li, "l_extendedprice", "l_returnflag",
                     groups=("N", "R"), bins=KS_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2", r6(F.col("d_stat")).alias("d_stat"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_ks_price_test_binned() -> str:
    from dask_ml_spark.functions.stats import _ks_p_sql

    p = _ks_p_sql("lam")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS v, l_returnflag AS g
    FROM lineitem WHERE l_returnflag IN ('N', 'R')
), lim AS (SELECT min(v) AS lo, max(v) AS hi FROM k),
b AS (
    -- width mirrors the engine's (hi - lo) or 1.0 zero-width guard
    SELECT least({KS_BINS - 1},
                 floor((v - (SELECT lo FROM lim))
                       / (SELECT CASE WHEN hi = lo THEN 1.0
                                      ELSE hi - lo END FROM lim)
                       * {KS_BINS}))
               AS bkt,
           sum(CASE WHEN g = 'N' THEN 1.0 ELSE 0.0 END) AS c1,
           sum(CASE WHEN g = 'R' THEN 1.0 ELSE 0.0 END) AS c2
    FROM k GROUP BY 1
), c AS (
    SELECT sum(c1) OVER w AS f1, sum(c2) OVER w AS f2,
           (SELECT sum(c1) FROM b) AS n1, (SELECT sum(c2) FROM b) AS n2
    FROM b WINDOW w AS (ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)
), d AS (
    SELECT max(n1) AS n1, max(n2) AS n2,
           max(abs(f1/n1 - f2/n2)) AS d_stat
    FROM c
), l AS (
    SELECT n1, n2, d_stat,
           d_stat * sqrt(n1 * n2 / (n1 + n2)) AS lam
    FROM d
)
SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
       floor(d_stat * 1e6 + 0.5) / 1e6 AS d_stat,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM l
"""


def q_mann_whitney_discount(spark, sf_dir):
    """Two-sample Mann–Whitney U (functions/stats.py::mann_whitney_u):
    discount levels of returned vs non-returned items — 11 distinct
    discount values, so the tie correction does real work. U is the
    tie-averaged rank-sum (the exact-AUC identity: AUC = U/(n1·n2));
    z is tie- and continuity-corrected; p via the shared A&S 26.2.17
    normal tail (identical literal arithmetic both engines). Counts
    and their products stay below 2^53, so u/z are exact. r12: the
    rank-biserial effect size r = 2U/(n1·n2) − 1 joins the output
    (the eta² convention — at corpus n significance is a given; r
    says whether the groups actually move the ranks)."""
    from dask_ml_spark.functions.stats import mann_whitney_u

    li = _t(spark, sf_dir, "lineitem")
    out = mann_whitney_u(li, "l_discount", "l_returnflag",
                         groups=("N", "R"))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2", "u_stat",
                      r6(F.col("z")).alias("z"),
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("rank_biserial")).alias("rank_biserial"))


def _sql_mann_whitney_discount() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH k AS (
    SELECT l_discount::DOUBLE AS v, l_returnflag AS g
    FROM lineitem WHERE l_returnflag IN ('N', 'R')
), g AS (
    SELECT v,
           sum(CASE WHEN g = 'N' THEN 1.0 ELSE 0.0 END) AS c1,
           sum(CASE WHEN g = 'R' THEN 1.0 ELSE 0.0 END) AS c2
    FROM k GROUP BY v
), c AS (
    SELECT v, c1, c2,
           sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - c2 AS b2
    FROM g
), a AS (
    SELECT sum(c1 * (b2 + 0.5 * c2)) AS u,
           sum(c1) AS n1, sum(c2) AS n2,
           sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS ties
    FROM c
), s AS (
    SELECT u, n1, n2,
           n1 * n2 / 2.0 AS mu,
           n1 * n2 / 12.0 * ((n1 + n2 + 1.0)
               - ties / ((n1 + n2) * (n1 + n2 - 1.0))) AS var
    FROM a
), z AS (
    SELECT u, n1, n2,
           CASE WHEN var <= 0.0 THEN 0.0
                ELSE sign(u - mu) * greatest(0.0, abs(u - mu) - 0.5)
                     / sqrt(var) END AS z,
           var
    FROM s
)
SELECT n1::BIGINT AS n1, n2::BIGINT AS n2, u AS u_stat,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor((CASE WHEN var <= 0.0 THEN 1.0
                   ELSE least(1.0, 2.0 * {sf}) END) * 1e6 + 0.5) / 1e6
           AS p_value,
       floor((2.0 * u / (n1 * n2) - 1.0) * 1e6 + 0.5) / 1e6
           AS rank_biserial
FROM z
"""


def q_benford_price(spark, sf_dir):
    """Benford first-digit screen (functions/stats.py::benford_test —
    the fabricated-data smell test): leading significant digits of the
    prices on the exact 0.01 fixed-point grid vs the log₁₀(1+1/d)
    law, χ²₈ (even-dof closed form replayed by the oracle) + Nigrini's
    MAD. TPC-H prices are range-uniform, not multiplicative, so the
    screen FLAGS them — which is the demonstration: the statistic
    detects non-Benford generation processes. One ≤9-row digit
    aggregate; the digit extraction is integer/string rendering, free
    of the log₁₀ ulp boundary hazard."""
    from dask_ml_spark.functions.stats import benford_test

    li = _t(spark, sf_dir, "lineitem")
    out = benford_test(li, "l_extendedprice", grid=2)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("chi2") / 1000.0).alias("chi2_k"),
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("mad")).alias("mad"))


def _sql_benford_price() -> str:
    import math as _m

    from dask_ml_spark.functions.stats import _chi2_sf_sql

    ps = [_m.log10(1.0 + 1.0 / dd) for dd in range(1, 10)]
    digit_counts = ", ".join(
        f"sum(CASE WHEN d = {dd} THEN 1 ELSE 0 END)::BIGINT AS o{dd}"
        for dd in range(1, 10))
    # in-order left-associative chains mirror the engine's digit loop
    chi2 = " + ".join(
        f"(o{dd}::DOUBLE - n::DOUBLE * {ps[dd - 1]!r})"
        f" * (o{dd}::DOUBLE - n::DOUBLE * {ps[dd - 1]!r})"
        f" / (n::DOUBLE * {ps[dd - 1]!r})" for dd in range(1, 10))
    mad = " + ".join(
        f"abs(o{dd}::DOUBLE / n::DOUBLE - {ps[dd - 1]!r})"
        for dd in range(1, 10))
    p = _chi2_sf_sql("chi2", 8)
    return f"""
WITH k AS (
    SELECT CAST(floor(abs(l_extendedprice::DOUBLE) * 100.0 + 0.5)
                AS BIGINT) AS c
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
), dd AS (
    SELECT CAST(substr(c::VARCHAR, 1, 1) AS INTEGER) AS d
    FROM k WHERE c >= 1
), agg AS (
    SELECT count(*)::BIGINT AS n, {digit_counts} FROM dd
), s AS (
    SELECT n, ({chi2}) AS chi2, ({mad}) / 9.0 AS mad FROM agg
)
SELECT n,
       floor(chi2 / 1000.0 * 1e6 + 0.5) / 1e6 AS chi2_k,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value,
       floor(mad * 1e6 + 0.5) / 1e6 AS mad
FROM s
"""


def q_wilcoxon_user_value(spark, sf_dir):
    """Wilcoxon signed-rank test (functions/stats.py::
    wilcoxon_signed_rank — the PAIRED nonparametric test): does each
    user's mean click value differ from THAT USER's mean view value?
    Pairs are per-user (click-mean, view-mean) — the within-unit
    design no two-sample test can express. The per-user means use the
    catalog's exact fixed-point convention (_davg twin: int64 1e-4
    units / count) so the pair values — and therefore the |d| ranks —
    are bit-identical cross-engine; the signed-rank machinery is the
    mann_whitney bounded-driver shape on the |d| axis with exact
    doubled-rank bignum sums."""
    from dask_ml_spark.functions.stats import wilcoxon_signed_rank

    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    kept = ev.where(v.isNotNull() & ~F.isnan(v)
                    & F.col("user_id").isNotNull())
    cv = F.when(F.col("event_type") == "click", v)
    vv = F.when(F.col("event_type") == "view", v)
    fx = lambda c: F.floor(c * 10000 + F.lit(0.5)).cast("long")  # noqa
    paired = (kept.groupBy("user_id")
              .agg(F.sum(fx(cv)).alias("__sa"),
                   F.count(cv).alias("__ca"),
                   F.sum(fx(vv)).alias("__sb"),
                   F.count(vv).alias("__cb"))
              .where((F.col("__ca") > 0) & (F.col("__cb") > 0))
              .select((F.col("__sa").cast("double") / 10000
                       / F.col("__ca")).alias("a"),
                      (F.col("__sb").cast("double") / 10000
                       / F.col("__cb")).alias("b")))
    out = wilcoxon_signed_rank(paired, "a", "b")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "w_plus",
                      r6(F.col("z")).alias("z"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_wilcoxon_user_value() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH e AS (
    SELECT user_id, event_type, value::DOUBLE AS v
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
      AND user_id IS NOT NULL
), p AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'
                         THEN CAST(floor(v * 10000 + 0.5) AS BIGINT)
                    END) AS DOUBLE) / 10000
           / count(CASE WHEN event_type = 'click' THEN v END) AS a,
           CAST(sum(CASE WHEN event_type = 'view'
                         THEN CAST(floor(v * 10000 + 0.5) AS BIGINT)
                    END) AS DOUBLE) / 10000
           / count(CASE WHEN event_type = 'view' THEN v END) AS b
    FROM e GROUP BY user_id
    HAVING count(CASE WHEN event_type = 'click' THEN v END) > 0
       AND count(CASE WHEN event_type = 'view' THEN v END) > 0
), d AS (
    SELECT a - b AS d FROM p WHERE a - b <> 0.0
), g AS (
    SELECT abs(d) AS v, count(*)::HUGEINT AS c,
           sum(CASE WHEN d > 0.0 THEN 1 ELSE 0 END)::HUGEINT AS cp
    FROM d GROUP BY 1
), c AS (
    SELECT v, c, cp,
           sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
    FROM g
), a2 AS (
    -- doubled tie-averaged ranks: 2·rank = 2·cum_before + c + 1
    SELECT sum(cp * (2 * (cum - c) + c + 1)) AS w2, sum(c) AS n,
           sum(c * c * c - c) AS ties
    FROM c
), s AS (
    SELECT n, w2::DOUBLE / 2.0 AS w,
           (n * (n + 1)) / 4.0 AS mu,
           (n * (n + 1.0) * (2.0 * n + 1.0)) / 24.0
           - ties::DOUBLE / 48.0 AS var
    FROM a2
), z AS (
    SELECT n, w,
           CASE WHEN var <= 0.0 THEN 0.0
                ELSE sign(w - mu) * greatest(0.0, abs(w - mu) - 0.5)
                     / sqrt(var) END AS z,
           var
    FROM s
)
SELECT n::BIGINT AS n, w AS w_plus,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor((CASE WHEN var <= 0.0 THEN 1.0
                   ELSE least(1.0, 2.0 * {sf}) END) * 1e6 + 0.5) / 1e6
           AS p_value
FROM z
"""


def q_friedman_user_event_value(spark, sf_dir):
    """Friedman blocked rank test (functions/stats.py::friedman_test —
    the paired/blocked member completing the rank-family square:
    MW→KW unpaired, Wilcoxon→Friedman blocked): do users rank the
    five event types' values differently, each user their own
    control? One (user, type) fixed-point mean is the raw-row pass;
    ranks are computed IN-ROW over each user's 5-element array (no
    shuffle-touching sort); one groupBy(type) of doubled-rank sums;
    Q with the tie-correction divisor and the even-dof χ²₄ closed
    form the oracle replays exactly."""
    from dask_ml_spark.functions.stats import friedman_test

    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    kept = ev.where(v.isNotNull() & ~F.isnan(v)
                    & F.col("user_id").isNotNull()
                    & F.col("event_type").isNotNull())
    fx = F.floor(v * 10000 + F.lit(0.5)).cast("long")
    cells = (kept.groupBy("user_id", "event_type")
             .agg(F.sum(fx).alias("__s"), F.count(v).alias("__c"))
             .select("user_id", "event_type",
                     (F.col("__s").cast("double") / 10000
                      / F.col("__c")).alias("v")))
    out = friedman_test(cells, "v", "user_id", "event_type")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "b", r6(F.col("q_stat")).alias("q_stat"),
                      "dof",
                      r6(F.col("tie_correction"))
                      .alias("tie_correction"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_friedman_user_event_value() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    p = _chi2_sf_sql("qc", 4)
    return f"""
WITH e AS (
    SELECT user_id, event_type, value::DOUBLE AS v
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
      AND user_id IS NOT NULL AND event_type IS NOT NULL
), cells AS (
    SELECT user_id, event_type,
           CAST(sum(CAST(floor(v * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 / count(v) AS v
    FROM e GROUP BY user_id, event_type
), kk AS (
    SELECT count(DISTINCT event_type) AS k FROM cells
), cb AS (
    -- complete blocks only (the standard Friedman requirement)
    SELECT user_id FROM cells GROUP BY user_id
    HAVING count(*) = (SELECT k FROM kk)
), r AS (
    -- doubled tie-averaged within-block ranks:
    -- 2·rank = 2·(#smaller) + #equal + 1
    SELECT c.event_type,
           2 * (rank() OVER (PARTITION BY c.user_id ORDER BY c.v) - 1)
           + count(*) OVER (PARTITION BY c.user_id, c.v) + 1 AS r2,
           count(*) OVER (PARTITION BY c.user_id, c.v) AS ce
    FROM cells c JOIN cb USING (user_id)
), g AS (
    SELECT event_type, sum(r2::HUGEINT) AS rs,
           count(*)::HUGEINT AS b,
           sum((ce * ce - 1)::HUGEINT) AS ts
    FROM r GROUP BY event_type
), s AS (
    SELECT sum(rs * rs) AS ssq, sum(ts) AS ties, max(b) AS b,
           count(*)::BIGINT AS k
    FROM g
), q AS (
    SELECT k, b,
           (12.0 * ssq::DOUBLE / (4.0 * b * k * (k + 1.0))
            - 3.0 * b * (k + 1.0))
           / (1.0 - ties::DOUBLE
                    / ((b * k * (k * k - 1))::DOUBLE)) AS qc,
           1.0 - ties::DOUBLE
                 / ((b * k * (k * k - 1))::DOUBLE) AS corr
    FROM s
)
SELECT k, b::BIGINT AS b,
       floor(qc * 1e6 + 0.5) / 1e6 AS q_stat,
       (k - 1)::BIGINT AS dof,
       floor(corr * 1e6 + 0.5) / 1e6 AS tie_correction,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM q
"""


HL_BINS = 512


def q_hl_shift_price(spark, sf_dir):
    """Hodges–Lehmann location shift (functions/stats.py::
    hodges_lehmann_shift — the robust BY-HOW-MUCH companion of
    mann_whitney's p and rank_biserial): median over all cross-pair
    price differences, returned vs non-returned items, via the binned
    O(K²) exact-integer convolution (one shared-grid bucket aggregate;
    nearest-rank lower-median selection the oracle replays in
    HUGEINT)."""
    from dask_ml_spark.functions.stats import hodges_lehmann_shift

    li = _t(spark, sf_dir, "lineitem")
    out = hodges_lehmann_shift(li, "l_extendedprice", "l_returnflag",
                               groups=("N", "R"), bins=HL_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2", r6(F.col("shift")).alias("shift"))


def _sql_hl_shift_price() -> str:
    K = HL_BINS
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS v,
           (l_returnflag = 'N') AS is1
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_returnflag IN ('N', 'R')
), lim AS (
    SELECT min(v) AS lo, max(v) AS hi FROM k
), w AS (
    SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS width
    FROM lim
), cells AS (
    SELECT greatest(0, least({K - 1},
               CAST(floor((v - (SELECT lo FROM w))
                          / (SELECT width FROM w) * {K}) AS INTEGER)))
               AS b,
           is1, count(*)::HUGEINT AS c
    FROM k GROUP BY 1, 2
), c1 AS (SELECT b, c FROM cells WHERE is1),
c2 AS (SELECT b, c FROM cells WHERE NOT is1),
nn AS (
    SELECT (SELECT sum(c) FROM c1) AS n1,
           (SELECT sum(c) FROM c2) AS n2
), conv AS (
    SELECT c1.b - c2.b AS d, sum(c1.c * c2.c) AS cw
    FROM c1 CROSS JOIN c2 GROUP BY 1
), cum AS (
    SELECT d, sum(cw) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS cum
    FROM conv
), med AS (
    SELECT min(d) AS d_med FROM cum
    WHERE cum >= ((SELECT n1 FROM nn) * (SELECT n2 FROM nn) + 1) // 2
)
SELECT (SELECT n1 FROM nn)::BIGINT AS n1,
       (SELECT n2 FROM nn)::BIGINT AS n2,
       floor(d_med * ((SELECT width FROM w) / {K}) * 1e6 + 0.5) / 1e6
           AS shift
FROM med
"""


def q_chi2_independence_flags(spark, sf_dir):
    """Pearson chi-square independence test (functions/stats.py::
    chi2_independence): is return flag independent of line status? One
    distributed groupBy pass, bounded contingency to the driver,
    even-dof EXACT tail probability (dof = (3−1)(2−1) = 2 at every SF
    — the fixed-point the SQL replays; Q(x; 2) = e^{−x/2})."""
    from dask_ml_spark.functions.stats import chi2_independence

    li = _t(spark, sf_dir, "lineitem")
    out = chi2_independence(li, "l_returnflag", "l_linestatus")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(r6(F.col("chi2")).alias("chi2"),
                      F.col("dof").cast("long").alias("dof"),
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("cramers_v")).alias("cramers_v"))


def _sql_chi2_independence_flags() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    p = _chi2_sf_sql("chi2", 2)
    return f"""
WITH c AS (
    SELECT l_returnflag AS a, l_linestatus AS b, count(*)::DOUBLE AS o
    FROM lineitem
    WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
    GROUP BY 1, 2
), ra AS (SELECT a, sum(o) AS ra FROM c GROUP BY a),
cb AS (SELECT b, sum(o) AS cb FROM c GROUP BY b),
-- the FULL row x column product: structurally empty cells contribute
-- (0 - e)^2/e = e to the Pearson statistic (mirrors the engine)
m AS (
    SELECT coalesce(c.o, 0.0) AS o, ra.ra, cb.cb,
           (SELECT sum(o) FROM c) AS n
    FROM ra CROSS JOIN cb
    LEFT JOIN c ON c.a = ra.a AND c.b = cb.b
), s AS (
    SELECT sum((o - ra*cb/n) * (o - ra*cb/n) / (ra*cb/n)) AS chi2,
           max(n) AS n,
           least((SELECT count(*) FROM ra) - 1,
                 (SELECT count(*) FROM cb) - 1) AS mindim
    FROM m
)
SELECT floor(chi2 * 1e6 + 0.5) / 1e6 AS chi2, 2::BIGINT AS dof,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value,
       floor(sqrt(chi2 / (n * mindim)) * 1e6 + 0.5) / 1e6 AS cramers_v
FROM s
"""


def q_welch_ttest_price(spark, sf_dir):
    """Welch's unequal-variance t-test (functions/stats.py::
    welch_ttest): do returned and non-returned lineitems differ in
    mean price? ONE aggregate pass (counts, sums, sum-squares per
    group via conditional sums); Welch–Satterthwaite dof; two-sided p
    via the shared A&S normal tail (dof ~ 2·10^5 here — the normal
    approximation to t is exact to <1e-8). All raw sums are shared-
    term-order expressions both engines replay."""
    from dask_ml_spark.functions.stats import welch_ttest

    li = _t(spark, sf_dir, "lineitem")
    out = welch_ttest(li, "l_extendedprice", "l_returnflag",
                      groups=("N", "R"))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2",
                      r6(F.col("mean_diff")).alias("mean_diff"),
                      r6(F.col("t_stat")).alias("t_stat"),
                      r6(F.col("dof") / 1000.0).alias("dof_k"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_welch_ttest_price() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(t)")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS v,
           CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS one,
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS two
    FROM lineitem WHERE l_returnflag IN ('N', 'R')
), a AS (
    SELECT sum(one) AS n1, sum(two) AS n2,
           sum(one * v) AS s1, sum(two * v) AS s2,
           sum(one * v * v) AS q1, sum(two * v * v) AS q2
    FROM k
), m AS (
    SELECT n1, n2, s1/n1 AS m1, s2/n2 AS m2,
           (q1 - n1 * (s1/n1) * (s1/n1)) / (n1 - 1.0) AS v1,
           (q2 - n2 * (s2/n2) * (s2/n2)) / (n2 - 1.0) AS v2
    FROM a
), t AS (
    SELECT n1, n2, m1 - m2 AS mean_diff,
           (m1 - m2) / sqrt(v1/n1 + v2/n2) AS t,
           ((v1/n1 + v2/n2) * (v1/n1 + v2/n2))
               / ((v1/n1) * (v1/n1) / (n1 - 1.0)
                  + (v2/n2) * (v2/n2) / (n2 - 1.0)) AS dof
    FROM m
)
SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
       floor(mean_diff * 1e6 + 0.5) / 1e6 AS mean_diff,
       floor(t * 1e6 + 0.5) / 1e6 AS t_stat,
       floor(dof / 1000.0 * 1e6 + 0.5) / 1e6 AS dof_k,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM t
"""


def q_welch_bh_by_month(spark, sf_dir):
    """Per-stratum hypothesis sweep + multiple-testing control
    (functions/stats.py::welch_ttest_by + benjamini_hochberg): ONE
    conditional-sum groupBy computes a Welch test of returned-vs-kept
    price for EVERY ship month, then BH step-up q-values control the
    FDR over the ~80-test family (at corpus scale every per-stratum
    sweep needs this — thousands of 0.05-level tests guarantee false
    discoveries). The q map is a bounded driver computation joined
    back as a broadcast; the oracle replays the sweep as per-month
    conditional sums and BH as a rank + suffix-min window."""
    from dask_ml_spark.functions.stats import benjamini_hochberg, welch_ttest_by

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format(F.col("l_shipdate"), "yyyy-MM"))
    tests = welch_ttest_by(li, "l_extendedprice", "l_returnflag",
                           ("N", "R"), "ship_month")
    out = benjamini_hochberg(tests, "p_value", alpha=0.05)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("ship_month", "n1", "n2",
                      r6(F.col("t_stat")).alias("t_stat"),
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("q_value")).alias("q_value"),
                      "reject", "valid")


def _sql_welch_bh_by_month() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(t)")
    return f"""
WITH k AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           l_extendedprice::DOUBLE AS v,
           CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS one,
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS two
    FROM lineitem
    WHERE l_returnflag IN ('N', 'R')
      AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
), a AS (
    SELECT ship_month, sum(one) AS n1, sum(two) AS n2,
           sum(one * v) AS s1, sum(two * v) AS s2,
           sum(one * v * v) AS q1, sum(two * v * v) AS q2
    FROM k GROUP BY ship_month
), m AS (
    SELECT ship_month, n1, n2, s1/n1 AS m1, s2/n2 AS m2,
           (q1 - n1 * (s1/n1) * (s1/n1)) / (n1 - 1.0) AS v1,
           (q2 - n2 * (s2/n2) * (s2/n2)) / (n2 - 1.0) AS v2
    FROM a
), t AS (
    SELECT ship_month, n1, n2,
           CASE WHEN n1 >= 2 AND n2 >= 2
                     AND v1/n1 + v2/n2 > 0.0
                THEN (m1 - m2) / sqrt(v1/n1 + v2/n2) END AS t,
           (n1 >= 2 AND n2 >= 2
            AND coalesce(v1/n1 + v2/n2, -1.0) > 0.0) AS valid
    FROM m
), p AS (
    SELECT ship_month, n1, n2, t, valid,
           CASE WHEN valid THEN least(1.0, 2.0 * {sf}) END AS p
    FROM t
), fam AS (
    SELECT *, row_number() OVER (ORDER BY p) AS rn,
           count(*) OVER () AS mm
    FROM p WHERE p IS NOT NULL
), adj AS (
    SELECT *, least(1.0, min(p * mm / rn)
               OVER (ORDER BY rn ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING)) AS q
    FROM fam
)
SELECT p.ship_month, p.n1::BIGINT AS n1, p.n2::BIGINT AS n2,
       floor(p.t * 1e6 + 0.5) / 1e6 AS t_stat,
       floor(p.p * 1e6 + 0.5) / 1e6 AS p_value,
       floor(adj.q * 1e6 + 0.5) / 1e6 AS q_value,
       CASE WHEN adj.q IS NOT NULL THEN adj.q <= 0.05 END AS reject,
       p.valid AS valid
FROM p LEFT JOIN adj ON p.ship_month = adj.ship_month
"""


def q_embedding_drift_labels(spark, sf_dir):
    """Per-dimension embedding-space drift (datapipe/profiling.py::
    embedding_drift — the multivariate drift screen): posexplode fans
    vectors into (dim, value) rows, ONE conditional-sum groupBy(dim)
    computes all 64 Welch tests, BH controls the family. The oracle
    replays the explode with a lateral unnest(range(length)) and the
    sweep with the welch_bh window template."""
    from dask_ml_spark.datapipe.profiling import embedding_drift

    em = _t(spark, sf_dir, "embeddings")
    out = embedding_drift(em, "embedding", "label", (0, 1))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        "dim", "n1", "n2",
        r6(F.col("mean_diff")).alias("mean_diff"),
        r6(F.col("t_stat")).alias("t_stat"),
        r6(F.col("p_value")).alias("p_value"),
        r6(F.col("q_value")).alias("q_value"),
        "reject", "valid")


def _sql_embedding_drift_labels() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(t)")
    return f"""
WITH k AS (
    SELECT t.i AS dim, embedding[t.i + 1]::DOUBLE AS v,
           CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS one,
           CASE WHEN label = 1 THEN 1.0 ELSE 0.0 END AS two
    FROM embeddings, unnest(range(length(embedding))) AS t(i)
    WHERE label IN (0, 1)
      AND embedding[t.i + 1] IS NOT NULL
      AND NOT isnan(embedding[t.i + 1]::DOUBLE)
), a AS (
    SELECT dim, sum(one) AS n1, sum(two) AS n2,
           sum(one * v) AS s1, sum(two * v) AS s2,
           sum(one * v * v) AS q1, sum(two * v * v) AS q2
    FROM k GROUP BY dim
), m AS (
    SELECT dim, n1, n2, s1/n1 AS m1, s2/n2 AS m2,
           (q1 - n1 * (s1/n1) * (s1/n1)) / (n1 - 1.0) AS v1,
           (q2 - n2 * (s2/n2) * (s2/n2)) / (n2 - 1.0) AS v2
    FROM a
), t AS (
    SELECT dim, n1, n2, m1 - m2 AS diff,
           CASE WHEN n1 >= 2 AND n2 >= 2
                     AND v1/n1 + v2/n2 > 0.0
                THEN (m1 - m2) / sqrt(v1/n1 + v2/n2) END AS t,
           (n1 >= 2 AND n2 >= 2
            AND coalesce(v1/n1 + v2/n2, -1.0) > 0.0) AS valid
    FROM m
), p AS (
    SELECT dim, n1, n2, diff, t, valid,
           CASE WHEN valid THEN least(1.0, 2.0 * {sf}) END AS p
    FROM t
), fam AS (
    SELECT *, row_number() OVER (ORDER BY p) AS rn,
           count(*) OVER () AS mm
    FROM p WHERE p IS NOT NULL
), adj AS (
    SELECT *, least(1.0, min(p * mm / rn)
               OVER (ORDER BY rn ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING)) AS q
    FROM fam
)
SELECT p.dim::BIGINT AS dim, p.n1::BIGINT AS n1, p.n2::BIGINT AS n2,
       floor(p.diff * 1e6 + 0.5) / 1e6 AS mean_diff,
       floor(p.t * 1e6 + 0.5) / 1e6 AS t_stat,
       floor(p.p * 1e6 + 0.5) / 1e6 AS p_value,
       floor(adj.q * 1e6 + 0.5) / 1e6 AS q_value,
       CASE WHEN adj.q IS NOT NULL THEN adj.q <= 0.05 END AS reject,
       p.valid AS valid
FROM p LEFT JOIN adj ON p.dim = adj.dim
"""


BOOT_B = 50
BOOT_M = 2654435761
BOOT_P = 1 << 31


def q_bootstrap_price_ci(spark, sf_dir):
    """Poisson-bootstrap CI for the mean price (functions/stats.py::
    bootstrap_ci — the 100 TB bootstrap: every row gets a
    hash-deterministic Poisson(1) multiplicity per replicate, so all
    50 replicates reduce in ONE aggregate pass; no resampled
    materialization, no shuffle). Nearest-rank percentile selection
    means engine FP drift in a replicate mean cannot move the chosen
    rank; the oracle replays every draw bit-for-bit (the u values are
    exact int/2^31 doubles) via a 50-row constants join. grid=4 (the
    catalog _dsum convention): Σw·v and Σv accumulate as exact int64
    1e-4 units in BOTH engines, so the replicate means and the
    headline mean are bit-stable under any plan-shape change — raw
    double sums left only ~30× margin to the 1e-6 output grid."""
    from dask_ml_spark.functions.stats import bootstrap_ci

    li = _t(spark, sf_dir, "lineitem")
    out = bootstrap_ci(li, "l_extendedprice",
                       ["l_orderkey", "l_linenumber"],
                       n_boot=BOOT_B, alpha=0.1, grid=4)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("mean")).alias("mean"),
                      r6(F.col("ci_lo")).alias("ci_lo"),
                      r6(F.col("ci_hi")).alias("ci_hi"), "n_boot")


def _sql_bootstrap_price_ci() -> str:
    from dask_ml_spark.functions.stats import _pois1_weight_sql

    consts = ", ".join(f"({b}, {pow(BOOT_M, b + 1, BOOT_P)})"
                       for b in range(BOOT_B))
    ladder = _pois1_weight_sql("u")
    # nearest-rank (1-indexed): k_lo = ceil(0.05*50) = 3,
    # k_hi = ceil(0.95*50) = 48 — catalog fixed-point literals
    # grid=4 fixed point: vq = int64 1e-4 units; w is a small integer,
    # so wx = Σ vq·w and sw = Σ w are exact int64 sums in both engines
    # (the r10 _dsum convention); the final int64 → double conversion
    # and the (÷1e4, ÷sw) op order mirror the engine exactly
    return f"""
WITH base AS (
    SELECT CAST(floor(l_extendedprice::DOUBLE * 10000 + 0.5) AS BIGINT)
               AS vq,
           ((((0 + l_orderkey) % {BOOT_P}) * {BOOT_M} % {BOOT_P}
             + l_linenumber) % {BOOT_P}) * {BOOT_M} % {BOOT_P} AS k0
    FROM lineitem
), consts(b, a) AS (VALUES {consts}),
w AS (
    SELECT vq, b, CAST({ladder} AS BIGINT) AS w FROM (
        SELECT vq, b,
               (((k0 + 1 + b) * CAST(a AS BIGINT)) % {BOOT_P})::DOUBLE
                   / {float(BOOT_P)!r} AS u
        FROM base CROSS JOIN consts)
), reps AS (
    SELECT b, sum(vq * w) AS wx, sum(w) AS sw FROM w GROUP BY b
), means AS (
    SELECT (wx::DOUBLE / 10000) / sw AS m FROM reps WHERE sw > 0
)
SELECT (SELECT count(*) FROM base)::BIGINT AS n,
       floor(((SELECT sum(vq) FROM base)::DOUBLE / 10000)
             / (SELECT count(*) FROM base) * 1e6 + 0.5) / 1e6 AS mean,
       floor((SELECT m FROM means ORDER BY m LIMIT 1 OFFSET 2)
             * 1e6 + 0.5) / 1e6 AS ci_lo,
       floor((SELECT m FROM means ORDER BY m LIMIT 1 OFFSET 47)
             * 1e6 + 0.5) / 1e6 AS ci_hi,
       {BOOT_B}::BIGINT AS n_boot
"""


def q_bootstrap_ci_by_flag(spark, sf_dir):
    """Per-group Poisson-bootstrap CIs (functions/stats.py::
    bootstrap_ci_by — the corpus-report sweep: mean price per return
    flag WITH error bars, still ONE raw-row pass): the same
    hash-deterministic draws as bootstrap_price_ci, aggregated by
    (flag, replicate) — ≤G·B groups — and nearest-rank CIs per flag
    driver-side. grid=4 fixed-point sums; the oracle replays every
    draw and selects the same ranks with a per-flag window."""
    from dask_ml_spark.functions.stats import bootstrap_ci_by

    li = _t(spark, sf_dir, "lineitem")
    out = bootstrap_ci_by(li, "l_extendedprice",
                          ["l_orderkey", "l_linenumber"],
                          by="l_returnflag", n_boot=BOOT_B, alpha=0.1,
                          grid=4)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("l_returnflag", "n",
                      r6(F.col("mean")).alias("mean"),
                      r6(F.col("ci_lo")).alias("ci_lo"),
                      r6(F.col("ci_hi")).alias("ci_hi"),
                      "n_boot", "valid")


def _sql_bootstrap_ci_by_flag() -> str:
    from dask_ml_spark.functions.stats import _pois1_weight_sql

    consts = ", ".join(f"({b}, {pow(BOOT_M, b + 1, BOOT_P)})"
                       for b in range(BOOT_B))
    ladder = _pois1_weight_sql("u")
    # nearest-rank per flag (1-indexed): k_lo = ceil(0.05*50) = 3,
    # k_hi = ceil(0.95*50) = 48 — the engine's ranks, as a window
    return f"""
WITH base AS (
    SELECT l_returnflag::VARCHAR AS g,
           CAST(floor(l_extendedprice::DOUBLE * 10000 + 0.5) AS BIGINT)
               AS vq,
           ((((0 + l_orderkey) % {BOOT_P}) * {BOOT_M} % {BOOT_P}
             + l_linenumber) % {BOOT_P}) * {BOOT_M} % {BOOT_P} AS k0
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
), consts(b, a) AS (VALUES {consts}),
w AS (
    SELECT g, vq, b, CAST({ladder} AS BIGINT) AS w FROM (
        SELECT g, vq, b,
               (((k0 + 1 + b) * CAST(a AS BIGINT)) % {BOOT_P})::DOUBLE
                   / {float(BOOT_P)!r} AS u
        FROM base CROSS JOIN consts)
), reps AS (
    SELECT g, b, sum(vq * w) AS wx, sum(w) AS sw
    FROM w GROUP BY g, b
), means AS (
    SELECT g, (wx::DOUBLE / 10000) / sw AS m,
           row_number() OVER (PARTITION BY g ORDER BY
                              (wx::DOUBLE / 10000) / sw) AS rk
    FROM reps WHERE sw > 0
), st AS (
    SELECT g, count(*)::BIGINT AS n, sum(vq) AS s FROM base GROUP BY g
)
SELECT st.g AS l_returnflag, st.n AS n,
       floor((st.s::DOUBLE / 10000) / st.n * 1e6 + 0.5) / 1e6 AS mean,
       floor((SELECT m FROM means WHERE means.g = st.g AND rk = 3)
             * 1e6 + 0.5) / 1e6 AS ci_lo,
       floor((SELECT m FROM means WHERE means.g = st.g AND rk = 48)
             * 1e6 + 0.5) / 1e6 AS ci_hi,
       {BOOT_B}::BIGINT AS n_boot,
       TRUE AS valid
FROM st
"""


def q_prop_ztest_discount(spark, sf_dir):
    """Two-sample proportion z-test (functions/stats.py::prop_ztest):
    is the fraction of deep-discounted lines different between
    returned and kept items? ONE conditional-sum aggregate; pooled
    variance; two-sided p via the shared A&S normal tail."""
    from dask_ml_spark.functions.stats import prop_ztest

    li = _t(spark, sf_dir, "lineitem")
    out = prop_ztest(li, F.col("l_discount") > 0.05, "l_returnflag",
                     ("N", "R"))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n1", "n2", r6(F.col("p1")).alias("p1"),
                      r6(F.col("p2")).alias("p2"),
                      r6(F.col("z")).alias("z"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_prop_ztest_discount() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH k AS (
    SELECT CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS s,
           CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS one,
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS two
    FROM lineitem WHERE l_returnflag IN ('N', 'R')
), a AS (
    SELECT sum(one) AS n1, sum(two) AS n2,
           sum(one * s) AS s1, sum(two * s) AS s2
    FROM k
), z AS (
    SELECT n1, n2, s1/n1 AS p1, s2/n2 AS p2,
           CASE WHEN ((s1+s2)/(n1+n2)) * (1.0 - (s1+s2)/(n1+n2))
                     * (1.0/n1 + 1.0/n2) <= 0.0 THEN 0.0
                ELSE (s1/n1 - s2/n2)
                     / sqrt(((s1+s2)/(n1+n2)) * (1.0 - (s1+s2)/(n1+n2))
                            * (1.0/n1 + 1.0/n2)) END AS z
    FROM a
)
SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
       floor(p1 * 1e6 + 0.5) / 1e6 AS p1,
       floor(p2 * 1e6 + 0.5) / 1e6 AS p2,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor(CASE WHEN z = 0.0 THEN 1.0
                  ELSE least(1.0, 2.0 * {sf}) END * 1e6 + 0.5) / 1e6
           AS p_value
FROM z
"""


def q_anova_event_value(spark, sf_dir):
    """One-way ANOVA across all event types (functions/stats.py::
    anova_oneway — the k-group generalization of the Welch pair test):
    one groupBy(event_type) pass of (n, Σx, Σx²), F assembled from k
    rows of driver state, p via the large-within-dof χ² limit of k·F
    (df_within ≈ 10^5 here; the even-dof exact tail replays in SQL).
    Only the self-normalizing F/p are emitted — the raw SS terms are
    1e9-scale order-dependent sums."""
    from dask_ml_spark.functions.stats import anova_oneway

    ev = _t(spark, sf_dir, "events")
    out = anova_oneway(ev, "value", "event_type")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "n", r6(F.col("f_stat")).alias("f_stat"),
                      "df_between", "df_within",
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("eta_squared")).alias("eta_squared"))


def _sql_anova_event_value() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    # events has 5 event types -> df_between = 4 (even): exact tail
    tail = _chi2_sf_sql("4.0 * f", 4)
    return f"""
WITH g AS (
    -- filter parity with anova_oneway: NaN values and NULL groups are
    -- dropped by the engine too
    SELECT event_type, count(*)::DOUBLE AS n, sum(value) AS s,
           sum(value * value) AS q
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
      AND event_type IS NOT NULL
    GROUP BY event_type
), t AS (
    SELECT count(*)::BIGINT AS k, sum(n) AS n_tot, sum(s) AS s_tot,
           sum(n * (s/n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g))
               * (s/n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g)))
               AS ssb,
           sum(q - n * (s/n) * (s/n)) AS ssw
    FROM g
), f AS (
    SELECT k, n_tot, (ssb / (k - 1)) / (ssw / (n_tot - k)) AS f,
           ssb / (ssb + ssw) AS eta2
    FROM t
)
SELECT k, n_tot::BIGINT AS n,
       floor(f * 1e6 + 0.5) / 1e6 AS f_stat,
       (k - 1)::BIGINT AS df_between,
       (n_tot - k)::BIGINT AS df_within,
       floor({tail} * 1e6 + 0.5) / 1e6 AS p_value,
       floor(eta2 * 1e6 + 0.5) / 1e6 AS eta_squared
FROM f
"""


def q_pairwise_welch_events(spark, sf_dir):
    """Post-hoc pairwise Welch after ANOVA (functions/stats.py::
    pairwise_welch — "which event types differ?"): all C(5,2)=10
    pairwise unequal-variance t-tests from the SAME single
    (n, Σx, Σx²) groupBy pass anova runs, BH-corrected across the pair
    family driver-side. The oracle replays the pair loop as a
    self-join of the 5-row group aggregate and BH as a suffix-min
    window."""
    from dask_ml_spark.functions.stats import pairwise_welch

    ev = _t(spark, sf_dir, "events")
    out = pairwise_welch(ev, "value", "event_type")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        "group_a", "group_b", "n_a", "n_b",
        r6(F.col("mean_diff")).alias("mean_diff"),
        r6(F.col("t_stat")).alias("t_stat"),
        r6(F.col("dof")).alias("dof"),
        r6(F.col("p_value")).alias("p_value"),
        r6(F.col("q_value")).alias("q_value"),
        "reject")


def _sql_pairwise_welch_events() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(t)")
    # every events group has >= 2 rows and positive variance at any
    # SF the oracle runs at, so the valid-filter parity is vacuous
    # here (the engine would exclude invalid pairs from m; there are
    # none) — documented rather than replicated
    return f"""
WITH g AS (
    SELECT event_type::VARCHAR AS grp, count(*)::DOUBLE AS n,
           sum(value::DOUBLE) AS s, sum(value::DOUBLE * value) AS q
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
      AND event_type IS NOT NULL
    GROUP BY 1
), st AS (
    SELECT grp, n, s / n AS m,
           (q - n * (s / n) * (s / n)) / (n - 1.0) AS v
    FROM g
), pr AS (
    SELECT a.grp AS ga, b.grp AS gb, a.n AS na, b.n AS nb,
           a.m - b.m AS diff,
           (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS t,
           (a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n)
               / ((a.v / a.n) * (a.v / a.n) / (a.n - 1.0)
                  + (b.v / b.n) * (b.v / b.n) / (b.n - 1.0)) AS dof
    FROM st a JOIN st b ON a.grp < b.grp
), pp AS (
    SELECT ga, gb, na, nb, diff, t, dof,
           least(1.0, 2.0 * {sf}) AS p
    FROM pr
), rk AS (
    SELECT *, row_number() OVER (ORDER BY p, ga, gb) AS j,
           count(*) OVER () AS m
    FROM pp
), bh AS (
    SELECT *, least(1.0, min(p * m / j) OVER
               (ORDER BY j ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING)) AS qv
    FROM rk
)
SELECT ga AS group_a, gb AS group_b, na::BIGINT AS n_a,
       nb::BIGINT AS n_b,
       floor(diff * 1e6 + 0.5) / 1e6 AS mean_diff,
       floor(t * 1e6 + 0.5) / 1e6 AS t_stat,
       floor(dof * 1e6 + 0.5) / 1e6 AS dof,
       floor(p * 1e6 + 0.5) / 1e6 AS p_value,
       floor(qv * 1e6 + 0.5) / 1e6 AS q_value,
       qv <= 0.05 AS reject
FROM bh
"""


ISO_BINS = 64


def q_isotonic_price_curve(spark, sf_dir):
    """Binned isotonic regression (functions/stats.py::
    isotonic_fit_binned — the calibration-curve fitter): the monotone
    fit of mean price vs quantity. One min/max pass + ONE ≤K-bucket
    (n, Σy) aggregate (grid=4 fixed point); the monotone solve uses
    the MINIMAX characterization y*_i = max_{j≤i} min_{k≥i} mean(j..k)
    — equal to PAV (pytest-pinned) but SQL-replayable op-for-op, which
    PAV's data-dependent pooling order is not. The oracle builds all
    pair means from window cumsums and takes the two grouped
    extremes."""
    from dask_ml_spark.functions.stats import isotonic_fit_binned

    li = _t(spark, sf_dir, "lineitem")
    out = isotonic_fit_binned(li, "l_quantity", "l_extendedprice",
                              bins=ISO_BINS, grid=4)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("bucket", r6(F.col("x_lo")).alias("x_lo"),
                      r6(F.col("x_hi")).alias("x_hi"), "n",
                      r6(F.col("y_mean")).alias("y_mean"),
                      r6(F.col("y_fit")).alias("y_fit"))


def _sql_isotonic_price_curve() -> str:
    K = ISO_BINS
    return f"""
WITH k AS (
    SELECT l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
      AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
), lim AS (SELECT min(x) AS lo, max(x) AS hi FROM k),
w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd
      FROM lim),
b AS (
    SELECT CAST(least({K - 1}, floor((x - (SELECT lo FROM w))
                                     / (SELECT wd FROM w) * {K}))
                AS BIGINT) AS bkt,
           count(*)::BIGINT AS n,
           sum(CAST(floor(y * 10000 + 0.5) AS BIGINT)) AS s
    FROM k GROUP BY 1
), c AS (
    SELECT bkt, n, s,
           sum(n) OVER (ORDER BY bkt) AS cn,
           sum(s) OVER (ORDER BY bkt) AS cs,
           row_number() OVER (ORDER BY bkt) AS i
    FROM b
), pm AS (
    -- mean of y over buckets j..k from the inclusive cumsums — the
    -- engine's exact op order: (int-units :: DOUBLE / 1e4) / count
    SELECT a.i AS ji, bb.i AS ki,
           ((bb.cs - a.cs + a.s)::DOUBLE / 10000)
               / (bb.cn - a.cn + a.n) AS m
    FROM c a JOIN c bb ON a.i <= bb.i
), im AS (
    SELECT t.i AS ti, pm.ji, min(pm.m) AS mn
    FROM c t JOIN pm ON pm.ji <= t.i AND pm.ki >= t.i
    GROUP BY 1, 2
), fit AS (
    SELECT ti, max(mn) AS yfit FROM im GROUP BY ti
)
SELECT c.bkt AS bucket,
       floor(((SELECT lo FROM w) + c.bkt * ((SELECT wd FROM w) / {K}))
             * 1e6 + 0.5) / 1e6 AS x_lo,
       floor(((SELECT lo FROM w)
              + (c.bkt + 1) * ((SELECT wd FROM w) / {K}))
             * 1e6 + 0.5) / 1e6 AS x_hi,
       c.n AS n,
       floor(((c.s::DOUBLE / 10000) / c.n) * 1e6 + 0.5) / 1e6 AS y_mean,
       floor(fit.yfit * 1e6 + 0.5) / 1e6 AS y_fit
FROM c JOIN fit ON fit.ti = c.i
"""


def q_brown_forsythe_price(spark, sf_dir):
    """Brown–Forsythe variance-homogeneity test (functions/stats.py::
    brown_forsythe): do price spreads differ across return flags?
    Two passes — per-group medians (approximate=False so DuckDB
    quantile_cont replays them exactly, the winsorized_prices
    convention; the LIBRARY default is the percentile_approx sketch),
    then the one-way F over |x − med_g|. Only the self-normalizing
    W/p are emitted."""
    from dask_ml_spark.functions.stats import brown_forsythe

    li = _t(spark, sf_dir, "lineitem")
    out = brown_forsythe(li, "l_extendedprice", "l_returnflag",
                         approximate=False)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "n", r6(F.col("f_stat")).alias("f_stat"),
                      "df_between", "df_within",
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("eta_squared")).alias("eta_squared"))


def _sql_brown_forsythe_price() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    # 3 return flags -> df_between = 2 (even): exact tail
    tail = _chi2_sf_sql("2.0 * f", 2)
    return f"""
WITH kept AS (
    -- filter parity with brown_forsythe/anova_oneway: NaN values and
    -- NULL groups are dropped by the engine too
    SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS x
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_returnflag IS NOT NULL
), med AS (
    SELECT grp, quantile_cont(x, 0.5) AS m
    FROM kept GROUP BY grp
), z AS (
    SELECT kept.grp AS grp, abs(x - m) AS v
    FROM kept JOIN med ON kept.grp = med.grp
), g AS (
    SELECT grp, count(*)::DOUBLE AS n, sum(v) AS s, sum(v * v) AS q
    FROM z GROUP BY grp
), t AS (
    SELECT count(*)::BIGINT AS k, sum(n) AS n_tot,
           sum(n * (s/n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g))
               * (s/n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g)))
               AS ssb,
           sum(q - n * (s/n) * (s/n)) AS ssw
    FROM g
), f AS (
    SELECT k, n_tot, (ssb / (k - 1)) / (ssw / (n_tot - k)) AS f,
           ssb / (ssb + ssw) AS eta2
    FROM t
)
SELECT k, n_tot::BIGINT AS n,
       floor(f * 1e6 + 0.5) / 1e6 AS f_stat,
       (k - 1)::BIGINT AS df_between,
       (n_tot - k)::BIGINT AS df_within,
       floor({tail} * 1e6 + 0.5) / 1e6 AS p_value,
       floor(eta2 * 1e6 + 0.5) / 1e6 AS eta_squared
FROM f
"""


def q_spearman_price_quantity_exact(spark, sf_dir):
    """EXACT Spearman rank correlation (functions/stats.py::
    spearman_rho): price vs quantity with tie-averaged ranks
    (quantity has ~50 distinct values — the tie machinery does real
    work). Per column one distinct-value groupBy + prefix pass builds
    the rank map, joined back (AQE broadcasts the small maps); one
    Pearson co-moment aggregate over the rank pair. Since r12 this is
    the PARITY WITNESS, not the headline: on a continuous column
    (price: distinct ≈ N) the rank map is a row-count-sized sort in
    disguise, so the catalog headline `spearman_price_quantity` is
    the binned scale path (5× faster at sf0.1, |Δρ| = O(1/K)); this
    exact sibling stays oracled to pin the binned path's accuracy."""
    from dask_ml_spark.functions.stats import spearman_rho

    li = _t(spark, sf_dir, "lineitem")
    out = spearman_rho(li, "l_extendedprice", "l_quantity")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("rho")).alias("rho"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_spearman_price_quantity_exact() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("(abs(rho) * sqrt(n - 1.0))")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS a, l_quantity::DOUBLE AS b
    FROM lineitem
), ra AS (
    SELECT a, cum - c + (c + 1.0) / 2.0 AS r FROM (
        SELECT a, c, sum(c) OVER (ORDER BY a ROWS UNBOUNDED PRECEDING)
               AS cum
        FROM (SELECT a, count(*)::DOUBLE AS c FROM k GROUP BY a))
), rb AS (
    SELECT b, cum - c + (c + 1.0) / 2.0 AS r FROM (
        SELECT b, c, sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
               AS cum
        FROM (SELECT b, count(*)::DOUBLE AS c FROM k GROUP BY b))
), j AS (
    SELECT ra.r AS x, rb.r AS y
    FROM k JOIN ra ON k.a = ra.a JOIN rb ON k.b = rb.b
), c AS (
    SELECT count(*)::DOUBLE AS n, corr(x, y) AS rho FROM j
)
SELECT n::BIGINT AS n,
       floor(rho * 1e6 + 0.5) / 1e6 AS rho,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM c
"""


SPEARMAN_BINS = 256


def q_spearman_price_quantity(spark, sf_dir):
    """Spearman rank correlation, the CATALOG HEADLINE (functions/
    stats.py::spearman_rho_binned — since r12 the binned scale path
    is the documented default for continuous columns; the exact
    tie-averaged-rank path stays oracled as
    `spearman_price_quantity_exact`, the parity witness): the exact
    path's rank map groups by distinct value, which on a continuous
    price column is distinct ≈ N (a row-count-sized sort in
    disguise). Here: one min/max aggregate + ONE
    groupBy(bucket_a, bucket_b) count (≤K² cells), then exact integer
    arithmetic driver-side — no rank join, no prefix machinery,
    |ρ_binned − ρ_exact| = O(1/K) (parity-pinned). The oracle replays
    the integer sums in HUGEINT, bit-for-bit."""
    from dask_ml_spark.functions.stats import spearman_rho_binned

    li = _t(spark, sf_dir, "lineitem")
    out = spearman_rho_binned(li, "l_extendedprice", "l_quantity",
                              bins=SPEARMAN_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("rho")).alias("rho"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_spearman_price_quantity() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    K = SPEARMAN_BINS
    sf = _normal_sf_sql("(abs(rho) * sqrt(n - 1.0))")
    # doubled tie-averaged bucket ranks (2·rank = 2·cum − c + 1 with an
    # INCLUSIVE cumsum) keep every sum integral; HUGEINT accumulation
    # replays the engine's Python-bignum driver arithmetic bit-for-bit
    # — the only float ops are the same two final divisions
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS a, l_quantity::DOUBLE AS b
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
), lim AS (
    SELECT min(a) AS la, max(a) AS ha, min(b) AS lb, max(b) AS hb FROM k
), w AS (
    SELECT la, lb,
           CASE WHEN ha = la THEN 1.0 ELSE ha - la END AS wa,
           CASE WHEN hb = lb THEN 1.0 ELSE hb - lb END AS wb
    FROM lim
), cells AS (
    SELECT CAST(least({K - 1}, floor((a - (SELECT la FROM w))
                                     / (SELECT wa FROM w) * {K}))
                AS BIGINT) AS ba,
           CAST(least({K - 1}, floor((b - (SELECT lb FROM w))
                                     / (SELECT wb FROM w) * {K}))
                AS BIGINT) AS bb,
           count(*)::BIGINT AS cw
    FROM k GROUP BY 1, 2
), ra AS (
    SELECT ba, 2 * cum - c + 1 AS r2 FROM (
        SELECT ba, c, sum(c) OVER (ORDER BY ba ROWS UNBOUNDED PRECEDING)
               AS cum
        FROM (SELECT ba, sum(cw) AS c FROM cells GROUP BY ba))
), rb AS (
    SELECT bb, 2 * cum - c + 1 AS r2 FROM (
        SELECT bb, c, sum(c) OVER (ORDER BY bb ROWS UNBOUNDED PRECEDING)
               AS cum
        FROM (SELECT bb, sum(cw) AS c FROM cells GROUP BY bb))
), j AS (
    SELECT cells.cw::HUGEINT AS cw, ra.r2::HUGEINT AS x,
           rb.r2::HUGEINT AS y
    FROM cells JOIN ra USING (ba) JOIN rb USING (bb)
), s AS (
    SELECT sum(cw) AS n, sum(cw * x) AS sx, sum(cw * y) AS sy,
           sum(cw * x * x) AS sxx, sum(cw * y * y) AS syy,
           sum(cw * x * y) AS sxy
    FROM j
), c AS (
    SELECT n,
           (n * sxy - sx * sy)::DOUBLE
           / sqrt((n * sxx - sx * sx)::DOUBLE
                  * (n * syy - sy * sy)::DOUBLE) AS rho
    FROM s
)
SELECT n::BIGINT AS n,
       floor(rho * 1e6 + 0.5) / 1e6 AS rho,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM c
"""


CP_BINS = 64


def q_changepoint_event_value(spark, sf_dir):
    """Mean-shift changepoint over event time (functions/stats.py::
    changepoint_mean — the ks-binned skeleton as a drift monitor):
    bucket the stream into 64 equal-width time bins, one ≤K-group
    (n, Σx, Σx²) aggregate, driver-side max-|t| split scan with a
    Bonferroni-corrected p. Deterministic (smallest-split tie-break),
    so the SQL oracle replays the scan as a window cumsum + argmax."""
    from dask_ml_spark.functions.stats import changepoint_mean

    ev = _t(spark, sf_dir, "events")
    out = changepoint_mean(ev, "value", "ts", bins=CP_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(r6(F.col("split_value")).alias("split_value"),
                      r6(F.col("t_stat")).alias("t_stat"),
                      r6(F.col("p_value")).alias("p_value"),
                      "n_before", "n_after",
                      r6(F.col("mean_before")).alias("mean_before"),
                      r6(F.col("mean_after")).alias("mean_after"))


def _sql_changepoint_event_value() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    K = CP_BINS
    sf = _normal_sf_sql("abs(t)")
    return f"""
WITH k AS (
    SELECT epoch(ts)::DOUBLE AS o, value::DOUBLE AS v
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), lim AS (SELECT min(o) AS lo, max(o) AS hi FROM k),
w AS (SELECT CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd,
             lo FROM lim),
b AS (
    SELECT least({K - 1},
                 floor((o - (SELECT lo FROM w))
                       / (SELECT wd FROM w) * {K})) AS bkt,
           count(*)::DOUBLE AS n, sum(v) AS s, sum(v * v) AS q
    FROM k GROUP BY 1
), c AS (
    SELECT bkt,
           sum(n) OVER cw AS n1, sum(s) OVER cw AS s1,
           sum(q) OVER cw AS q1,
           (SELECT sum(n) FROM b) AS tn,
           (SELECT sum(s) FROM b) AS tsum,
           (SELECT sum(q) FROM b) AS tq
    FROM b WINDOW cw AS (ORDER BY bkt ROWS UNBOUNDED PRECEDING)
), t AS (
    -- identical operation order as the engine's driver scan
    SELECT bkt, n1, tn - n1 AS n2, s1/n1 AS m1,
           (tsum - s1) / (tn - n1) AS m2,
           (m1 - m2) / sqrt((((q1 - n1 * (s1/n1) * (s1/n1))
                              + ((tq - q1) - (tn - n1)
                                 * ((tsum - s1)/(tn - n1))
                                 * ((tsum - s1)/(tn - n1))))
                             / (tn - 2.0))
                            * (1.0/n1 + 1.0/(tn - n1))) AS t
    FROM c
    WHERE bkt < {K - 1} AND n1 >= 2 AND tn - n1 >= 2
      AND (((q1 - n1 * (s1/n1) * (s1/n1))
            + ((tq - q1) - (tn - n1) * ((tsum - s1)/(tn - n1))
               * ((tsum - s1)/(tn - n1)))) / (tn - 2.0))
          * (1.0/n1 + 1.0/(tn - n1)) > 0.0
), best AS (
    SELECT * FROM t ORDER BY abs(t) DESC, bkt ASC LIMIT 1
)
SELECT floor(((SELECT lo FROM w) + (bkt + 1) * ((SELECT wd FROM w) / {K}))
             * 1e6 + 0.5) / 1e6 AS split_value,
       floor(t * 1e6 + 0.5) / 1e6 AS t_stat,
       floor(least(1.0, {K - 1} * (2.0 * {sf})) * 1e6 + 0.5) / 1e6
           AS p_value,
       n1::BIGINT AS n_before, n2::BIGINT AS n_after,
       floor(m1 * 1e6 + 0.5) / 1e6 AS mean_before,
       floor(m2 * 1e6 + 0.5) / 1e6 AS mean_after
FROM best
"""


TREND_BINS = 64


def q_trend_event_value(spark, sf_dir):
    """Mann–Kendall trend + Theil–Sen slope over event time
    (functions/stats.py::trend_test — the monotone-drift monitor
    changepoint can't express): the ks-binned skeleton, then the
    64-point bucket-mean series drives S, the tie-corrected z, and the
    pairwise-slope median driver-side. grid=4 (the _dsum convention)
    makes every bucket mean — and therefore every sign in S —
    bit-stable under plan-shape changes; the oracle replays the
    C(64,2) pair loop as a self-join."""
    from dask_ml_spark.functions.stats import trend_test

    ev = _t(spark, sf_dir, "events")
    out = trend_test(ev, "value", "ts", bins=TREND_BINS, grid=4)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "n_buckets", "s_stat",
                      r6(F.col("z")).alias("z"),
                      r6(F.col("p_value")).alias("p_value"),
                      r6(F.col("sen_slope") * 86400.0)
                      .alias("sen_slope_per_day"))


def _sql_trend_event_value() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    K = TREND_BINS
    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH k AS (
    SELECT epoch(ts)::DOUBLE AS o, value::DOUBLE AS v
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), lim AS (SELECT min(o) AS lo, max(o) AS hi FROM k),
w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd
      FROM lim),
b AS (
    SELECT least({K - 1}, floor((o - (SELECT lo FROM w))
                                / (SELECT wd FROM w) * {K})) AS bkt,
           count(*)::BIGINT AS n,
           sum(CAST(floor(v * 10000 + 0.5) AS BIGINT)) AS s
    FROM k GROUP BY 1
), m AS (
    -- bucket means from exact int64 1e-4-unit sums (grid=4), in the
    -- engine's exact op order; midpoints vs the bucket grid
    SELECT bkt, n, (s::DOUBLE / 10000) / n AS mv,
           (SELECT lo FROM w) + (bkt + 0.5) * ((SELECT wd FROM w) / {K})
               AS x
    FROM b
), pairs AS (
    SELECT a.mv AS m1, c.mv AS m2, a.x AS x1, c.x AS x2
    FROM m a JOIN m c ON a.bkt < c.bkt
), sstat AS (
    SELECT sum(CASE WHEN m2 > m1 THEN 1 WHEN m2 < m1 THEN -1
               ELSE 0 END)::BIGINT AS s,
           count(*)::BIGINT AS np FROM pairs
), bc AS (
    SELECT count(*)::BIGINT AS nb, sum(n)::BIGINT AS n_rows FROM m
), tc AS (
    SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS t
    FROM (SELECT count(*)::BIGINT AS t FROM m GROUP BY mv)
    WHERE t > 1
), vr AS (
    SELECT ((SELECT nb FROM bc) * ((SELECT nb FROM bc) - 1)
            * (2 * (SELECT nb FROM bc) + 5)
            - (SELECT t FROM tc))::DOUBLE / 18.0 AS var
), zz AS (
    SELECT CASE WHEN (SELECT var FROM vr) <= 0.0 THEN 0.0
                WHEN (SELECT s FROM sstat) > 0
                    THEN ((SELECT s FROM sstat) - 1)
                         / sqrt((SELECT var FROM vr))
                WHEN (SELECT s FROM sstat) < 0
                    THEN ((SELECT s FROM sstat) + 1)
                         / sqrt((SELECT var FROM vr))
                ELSE 0.0 END AS z
), sl AS (
    SELECT (m2 - m1) / (x2 - x1) AS sl FROM pairs
), med AS (
    SELECT (SELECT sl FROM sl ORDER BY sl
            LIMIT 1 OFFSET (((SELECT np FROM sstat) - 1) // 2)) AS lo_s,
           (SELECT sl FROM sl ORDER BY sl
            LIMIT 1 OFFSET ((SELECT np FROM sstat) // 2)) AS hi_s
)
SELECT (SELECT n_rows FROM bc) AS n,
       (SELECT nb FROM bc) AS n_buckets,
       (SELECT s FROM sstat) AS s_stat,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor(CASE WHEN (SELECT var FROM vr) <= 0.0 THEN 1.0
                  ELSE least(1.0, 2.0 * {sf}) END * 1e6 + 0.5) / 1e6
           AS p_value,
       floor((SELECT lo_s + (hi_s - lo_s) / 2.0 FROM med) * 86400.0
             * 1e6 + 0.5) / 1e6 AS sen_slope_per_day
FROM zz
"""


DRIFT_BINS = 24
DRIFT_REF_END = "2024-01-08"


def q_ks_drift_daily(spark, sf_dir):
    """Windowed distribution-drift monitor (streaming/drift.py::
    ks_drift — the stats family made continuous): fit a reference
    histogram on the first week of events, then a one-sample binned KS
    of EVERY daily window against it — ONE groupBy(window) aggregation
    whose K−1 ECDF points are conditional sums (no cumsum, so the
    identical code path is append-mode-streaming legal; the
    stream-vs-batch parity test pins that). The oracle recomputes the
    reference and replays every window's D and Kolmogorov-tail p."""
    from dask_ml_spark.streaming.drift import ks_drift, reference_histogram

    ev = _t(spark, sf_dir, "events")
    ref = reference_histogram(
        ev.where(F.col("ts") < F.lit(DRIFT_REF_END)), "value",
        bins=DRIFT_BINS)
    out = ks_drift(ev, "value", "ts", ref, window="1 day")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "n", r6(F.col("d_stat")).alias("d_stat"),
        r6(F.col("p_value")).alias("p_value"))


def _sql_ks_drift_daily() -> str:
    from dask_ml_spark.functions.stats import _ks_p_sql

    K = DRIFT_BINS
    p = _ks_p_sql("(d * sqrt(n::DOUBLE))")
    les = ",\n           ".join(
        f"sum(CASE WHEN bkt <= {k} THEN 1.0 ELSE 0.0 END) AS le{k}"
        for k in range(K - 1))
    ref_les = ", ".join(
        f"sum(CASE WHEN bkt <= {k} THEN 1.0 ELSE 0.0 END) AS rle{k}"
        for k in range(K - 1))
    dterms = ", ".join(
        f"abs(le{k} / n::DOUBLE - (SELECT rle{k} / rn FROM refcum))"
        for k in range(K - 1))
    return f"""
WITH kept AS (
    SELECT ts, value::DOUBLE AS v FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
), lim AS (
    SELECT min(v) AS lo, max(v) AS hi FROM kept
    WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd
         FROM lim),
bk AS (
    SELECT ts, greatest(0, least({K - 1},
               CAST(floor((v - (SELECT lo FROM w))
                          / (SELECT wd FROM w) * {K}) AS INTEGER)))
               AS bkt
    FROM kept
), refcum AS (
    SELECT count(*)::DOUBLE AS rn, {ref_les}
    FROM bk WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), win AS (
    SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n,
           {les}
    FROM bk GROUP BY 1
), d AS (
    SELECT day, n, greatest({dterms}) AS d
    FROM win
)
SELECT strftime(day, '%Y-%m-%d') AS day, n,
       floor(d * 1e6 + 0.5) / 1e6 AS d_stat,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM d
"""


def q_psi_drift_daily(spark, sf_dir):
    """Population Stability Index per daily window (streaming/
    drift.py::psi_drift — the model-monitoring industry's standard
    drift score, same one-windowed-aggregation shape as ks_drift so it
    inherits append-mode streaming legality): K per-bucket conditional
    sums per window, Laplace half-count smoothing on both sides so
    empty buckets stay defined, Σ(p−q)·ln(p/q) as a stateless
    projection. The oracle recomputes the reference histogram and
    replays every window's smoothed PSI."""
    from dask_ml_spark.streaming.drift import psi_drift, reference_histogram

    ev = _t(spark, sf_dir, "events")
    ref = reference_histogram(
        ev.where(F.col("ts") < F.lit(DRIFT_REF_END)), "value",
        bins=DRIFT_BINS)
    out = psi_drift(ev, "value", "ts", ref, window="1 day")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "n", r6(F.col("psi")).alias("psi"))


def _sql_psi_drift_daily() -> str:
    K = DRIFT_BINS
    half_k = float(K) / 2.0
    ref_cs = ", ".join(
        f"sum(CASE WHEN bkt = {k} THEN 1.0 ELSE 0.0 END) AS rc{k}"
        for k in range(K))
    win_cs = ",\n           ".join(
        f"sum(CASE WHEN bkt = {k} THEN 1.0 ELSE 0.0 END) AS c{k}"
        for k in range(K))
    # q_k is computed once (refq CTE) exactly as the engine's Python
    # literal; the per-window terms mirror (p - q) * ln(p / q)
    qk = ", ".join(f"(rc{k} + 0.5) / (rn + {half_k!r}) AS q{k}"
                   for k in range(K))
    terms = " + ".join(
        f"(((c{k} + 0.5) / (n::DOUBLE + {half_k!r}))"
        f" - (SELECT q{k} FROM refq))"
        f" * ln(((c{k} + 0.5) / (n::DOUBLE + {half_k!r}))"
        f" / (SELECT q{k} FROM refq))"
        for k in range(K))
    return f"""
WITH kept AS (
    SELECT ts, value::DOUBLE AS v FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
), lim AS (
    SELECT min(v) AS lo, max(v) AS hi FROM kept
    WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd
         FROM lim),
bk AS (
    SELECT ts, greatest(0, least({K - 1},
               CAST(floor((v - (SELECT lo FROM w))
                          / (SELECT wd FROM w) * {K}) AS INTEGER)))
               AS bkt
    FROM kept
), refc AS (
    SELECT count(*)::DOUBLE AS rn, {ref_cs}
    FROM bk WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), refq AS (
    SELECT {qk} FROM refc
), win AS (
    SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n,
           {win_cs}
    FROM bk GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, n,
       floor((0.0 + {terms}) * 1e6 + 0.5) / 1e6 AS psi
FROM win
"""


def q_catdrift_daily(spark, sf_dir):
    """Categorical-mix drift per daily window (streaming/drift.py::
    categorical_drift — psi_drift for string columns, with an OTHER
    bucket absorbing categories unseen at fit time): one conditional
    sum per reference category per window, Laplace half-count
    smoothing, stateless PSI projection — the event-type mix monitor.
    The oracle replays the reference fit and every window's PSI via a
    days × categories join."""
    from dask_ml_spark.streaming.drift import (categorical_drift,
                                               reference_categories)

    ev = _t(spark, sf_dir, "events")
    ref = reference_categories(
        ev.where(F.col("ts") < F.lit(DRIFT_REF_END)), "event_type")
    out = categorical_drift(ev, "event_type", "ts", ref, window="1 day")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "n", r6(F.col("psi")).alias("psi"),
        r6(F.col("other_frac")).alias("other_frac"))


def _sql_catdrift_daily() -> str:
    return f"""
WITH kept AS (
    SELECT ts, event_type::VARCHAR AS c FROM events
    WHERE event_type IS NOT NULL
), refc AS (
    SELECT c, count(*)::DOUBLE AS rc FROM kept
    WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00' GROUP BY c
), refn AS (
    SELECT sum(rc) AS rn, (count(*) + 1)::DOUBLE / 2.0 AS hk FROM refc
), win AS (
    SELECT date_trunc('day', ts) AS day, c, count(*)::DOUBLE AS cnt
    FROM kept GROUP BY 1, 2
), wn AS (
    SELECT day, sum(cnt) AS n FROM win GROUP BY day
), terms AS (
    -- every (day, reference category) pair, zero-filled: a category
    -- MISSING from a window still contributes its smoothed term
    SELECT d.day, r.rc, coalesce(w.cnt, 0.0) AS cnt
    FROM (SELECT DISTINCT day FROM win) d
    CROSS JOIN refc r
    LEFT JOIN win w ON w.day = d.day AND w.c = r.c
), seen_psi AS (
    SELECT t.day,
           sum(((t.cnt + 0.5) / (wn.n + (SELECT hk FROM refn))
                - (t.rc + 0.5) / ((SELECT rn FROM refn)
                                  + (SELECT hk FROM refn)))
               * ln(((t.cnt + 0.5) / (wn.n + (SELECT hk FROM refn)))
                    / ((t.rc + 0.5) / ((SELECT rn FROM refn)
                                       + (SELECT hk FROM refn)))))
               AS s,
           sum(t.cnt) AS seen_cnt
    FROM terms t JOIN wn ON t.day = wn.day
    GROUP BY t.day
), full_psi AS (
    SELECT sp.day, wn.n,
           sp.s + ((wn.n - sp.seen_cnt + 0.5)
                   / (wn.n + (SELECT hk FROM refn))
                   - 0.5 / ((SELECT rn FROM refn)
                            + (SELECT hk FROM refn)))
                  * ln(((wn.n - sp.seen_cnt + 0.5)
                        / (wn.n + (SELECT hk FROM refn)))
                       / (0.5 / ((SELECT rn FROM refn)
                                 + (SELECT hk FROM refn)))) AS psi,
           (wn.n - sp.seen_cnt) / wn.n AS other_frac
    FROM seen_psi sp JOIN wn ON sp.day = wn.day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n,
       floor(psi * 1e6 + 0.5) / 1e6 AS psi,
       floor(other_frac * 1e6 + 0.5) / 1e6 AS other_frac
FROM full_psi
"""


def q_zdrift_daily(spark, sf_dir):
    """Mean/variance drift per daily window (streaming/drift.py::
    z_drift — the first-moment companion to ks/psi): ONE
    groupBy(window) of (n, Σx, Σx²) against a fixed reference's
    (μ, σ²), z = (mean_w − μ)/√(σ²/n_w) with a two-sided normal p and
    the window/reference variance ratio. Streaming-legal by the same
    conditional-sum argument; the oracle recomputes the reference
    moments and replays every window."""
    from dask_ml_spark.streaming.drift import reference_moments, z_drift

    ev = _t(spark, sf_dir, "events")
    ref = reference_moments(
        ev.where(F.col("ts") < F.lit(DRIFT_REF_END)), "value")
    out = z_drift(ev, "value", "ts", ref, window="1 day")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "n", r6(F.col("mean")).alias("mean"),
        r6(F.col("z_mean")).alias("z_mean"),
        r6(F.col("p_value")).alias("p_value"),
        r6(F.col("var_ratio")).alias("var_ratio"))


def _sql_zdrift_daily() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH kept AS (
    SELECT ts, value::DOUBLE AS v FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
), ref AS (
    SELECT count(*)::DOUBLE AS rn, sum(v) AS rs, sum(v * v) AS rq
    FROM kept WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), m AS (
    -- identical op order as reference_moments: mu = s/n first, then
    -- var = (q - n*mu*mu) / (n - 1.0)
    SELECT rs / rn AS mu,
           (rq - rn * (rs / rn) * (rs / rn)) / (rn - 1.0) AS var0
    FROM ref
), win AS (
    SELECT date_trunc('day', ts) AS day, count(*)::DOUBLE AS n,
           sum(v) AS s, sum(v * v) AS q
    FROM kept GROUP BY 1
), z AS (
    SELECT day, n, s / n AS mean,
           (s / n - (SELECT mu FROM m))
               / sqrt((SELECT var0 FROM m) / n) AS z,
           CASE WHEN n >= 2.0 THEN
               ((q - n * (s / n) * (s / n)) / (n - 1.0))
                   / (SELECT var0 FROM m)
           END AS var_ratio
    FROM win
)
SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n,
       floor(mean * 1e6 + 0.5) / 1e6 AS mean,
       floor(z * 1e6 + 0.5) / 1e6 AS z_mean,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value,
       floor(var_ratio * 1e6 + 0.5) / 1e6 AS var_ratio
FROM z
"""


CORR_REF_END = "1996-01-01"


def q_quantile_drift_daily(spark, sf_dir):
    """Windowed tail-quantile drift (streaming/drift.py::
    quantile_drift — "did p99 move?", which the mean-based z_drift
    can't see and KS/PSI don't localize): per daily window the
    p50/p90/p99 read off the binned CDF built from the SAME K
    conditional sums as ks_drift (one windowed aggregation,
    streaming-legal), each with its delta vs the reference's own
    binned quantile. The oracle replays every crossing + interpolation
    from the identical integer counts. Accuracy contract (pinned in
    tests/test_streaming_drift.py::test_quantile_drift_accuracy_bound):
    |q̂ − q_true| ≤ (hi − lo)/bins whenever the window's true quantile
    is inside the reference support; out-of-support tails saturate at
    the edge (delta becomes a sign-correct lower bound — see the
    quantile_drift docstring)."""
    from dask_ml_spark.streaming.drift import (quantile_drift,
                                               reference_histogram)

    ev = _t(spark, sf_dir, "events")
    ref = reference_histogram(
        ev.where(F.col("ts") < F.lit(DRIFT_REF_END)), "value",
        bins=DRIFT_BINS)
    out = quantile_drift(ev, "value", "ts", ref, window="1 day",
                         probes=(0.5, 0.9, 0.99))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"), "n",
        *[r6(F.col(c)).alias(c)
          for c in ("q50", "d50", "q90", "d90", "q99", "d99")])


def _sql_quantile_drift_daily() -> str:
    K = DRIFT_BINS
    # relational replay (the wide CASE-chain form exceeded DuckDB's
    # parser tree depth): per-(day, bucket) counts + a window cumsum
    # give (prev, cum) per present bucket; exactly one bucket crosses
    # each probe target, so a conditional sum selects its
    # interpolation. Counts are exact integers, the interpolation is
    # the engine's literal arithmetic.
    unit = f"((SELECT wd FROM w) / {K})"
    lo = "(SELECT lo FROM w)"

    def interp(t):
        return (f"{lo} + (bkt + ({t} - prev) / (cum - prev)) * {unit}")

    win_cols = []
    ref_scalars = []
    for q, lbl in ((0.5, "50"), (0.9, "90"), (0.99, "99")):
        t = f"({q!r} * n)"
        rt = f"({q!r} * (SELECT rn FROM rtot))"
        win_cols.append(
            f"sum(CASE WHEN prev < {t} AND cum >= {t} "
            f"THEN {interp(t)} ELSE 0.0 END) AS q{lbl}")
        ref_scalars.append(
            f"(SELECT {interp(rt)} FROM rcc "
            f"WHERE prev < {rt} AND cum >= {rt} "
            f"ORDER BY bkt LIMIT 1) AS rq{lbl}")
    wcols = ",\n           ".join(win_cols)
    rcols = ", ".join(ref_scalars)
    return f"""
WITH kept AS (
    SELECT ts, value::DOUBLE AS v FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
), lim AS (
    SELECT min(v) AS lo, max(v) AS hi FROM kept
    WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00'
), w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS wd
         FROM lim),
bk AS (
    SELECT ts, greatest(0, least({K - 1},
               CAST(floor((v - (SELECT lo FROM w))
                          / (SELECT wd FROM w) * {K}) AS INTEGER)))
               AS bkt
    FROM kept
), rc AS (
    SELECT bkt, count(*)::DOUBLE AS c FROM bk
    WHERE ts < TIMESTAMP '{DRIFT_REF_END} 00:00:00' GROUP BY bkt
), rtot AS (SELECT sum(c) AS rn FROM rc),
rcc AS (
    SELECT bkt, sum(c) OVER (ORDER BY bkt) AS cum,
           sum(c) OVER (ORDER BY bkt) - c AS prev
    FROM rc
), rq AS (SELECT {rcols}),
wc AS (
    SELECT date_trunc('day', ts) AS day, bkt, count(*)::DOUBLE AS c
    FROM bk GROUP BY 1, 2
), cc AS (
    SELECT day, bkt, c,
           sum(c) OVER (PARTITION BY day ORDER BY bkt) AS cum,
           sum(c) OVER (PARTITION BY day ORDER BY bkt) - c AS prev,
           sum(c) OVER (PARTITION BY day) AS n
    FROM wc
), qv AS (
    SELECT day, max(n) AS n,
           {wcols}
    FROM cc GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n,
       floor(q50 * 1e6 + 0.5) / 1e6 AS q50,
       floor((q50 - (SELECT rq50 FROM rq)) * 1e6 + 0.5) / 1e6 AS d50,
       floor(q90 * 1e6 + 0.5) / 1e6 AS q90,
       floor((q90 - (SELECT rq90 FROM rq)) * 1e6 + 0.5) / 1e6 AS d90,
       floor(q99 * 1e6 + 0.5) / 1e6 AS q99,
       floor((q99 - (SELECT rq99 FROM rq)) * 1e6 + 0.5) / 1e6 AS d99
FROM qv
"""


KENDALL_BINS = 128


def q_kendall_price_quantity(spark, sf_dir):
    """Kendall's τ-b rank correlation, binned scale path (functions/
    stats.py::kendall_tau_binned — exact τ is all n(n−1)/2 pair
    orientations, quadratic; here one min/max aggregate + ONE
    groupBy(bucket_a, bucket_b) count ≤K² cells, then 2-D prefix sums
    over the cell grid count concordant/discordant pairs in O(K²)
    exact bignum ops — within-bucket pairs become ties, which τ-b's
    tie correction absorbs). The oracle replays the cell grid with
    dense-grid HUGEINT window cumsums, bit-for-bit up to the final
    float divisions."""
    from dask_ml_spark.functions.stats import kendall_tau_binned

    li = _t(spark, sf_dir, "lineitem")
    out = kendall_tau_binned(li, "l_extendedprice", "l_quantity",
                             bins=KENDALL_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("tau")).alias("tau"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_kendall_price_quantity() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    K = KENDALL_BINS
    sf = _normal_sf_sql("abs(z)")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS a, l_quantity::DOUBLE AS b
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
), lim AS (
    SELECT min(a) AS la, max(a) AS ha, min(b) AS lb, max(b) AS hb FROM k
), w AS (
    SELECT la, lb,
           CASE WHEN ha = la THEN 1.0 ELSE ha - la END AS wa,
           CASE WHEN hb = lb THEN 1.0 ELSE hb - lb END AS wb
    FROM lim
), cells AS (
    SELECT CAST(least({K - 1}, floor((a - (SELECT la FROM w))
                                     / (SELECT wa FROM w) * {K}))
                AS BIGINT) AS ba,
           CAST(least({K - 1}, floor((b - (SELECT lb FROM w))
                                     / (SELECT wb FROM w) * {K}))
                AS BIGINT) AS bb,
           count(*)::HUGEINT AS c
    FROM k GROUP BY 1, 2
), grid AS (
    SELECT ga.range AS gi, gb.range AS gj
    FROM range({K}) ga CROSS JOIN range({K}) gb
), dense AS (
    SELECT gi, gj, coalesce(cells.c, 0::HUGEINT) AS c
    FROM grid LEFT JOIN cells ON cells.ba = gi AND cells.bb = gj
), rowcum AS (
    SELECT gi, gj,
           sum(c) OVER (PARTITION BY gi ORDER BY gj
                        ROWS UNBOUNDED PRECEDING) AS rc
    FROM dense
), pref AS (
    -- P(gi, gj) = sum of cells with ba <= gi AND bb <= gj
    SELECT gi, gj,
           sum(rc) OVER (PARTITION BY gj ORDER BY gi
                         ROWS UNBOUNDED PRECEDING) AS p2
    FROM rowcum
), cd AS (
    -- each unordered pair counted once from its larger-a member:
    -- concordant partners are P(i-1, j-1); discordant are
    -- A(i-1) - P(i-1, j) with A(i) = P(i, K-1)
    SELECT sum(x.c * coalesce(pll.p2, 0::HUGEINT)) AS conc,
           sum(x.c * (coalesce(pa.p2, 0::HUGEINT)
                      - coalesce(plj.p2, 0::HUGEINT))) AS disc
    FROM cells x
    LEFT JOIN pref pll ON pll.gi = x.ba - 1 AND pll.gj = x.bb - 1
    LEFT JOIN pref plj ON plj.gi = x.ba - 1 AND plj.gj = x.bb
    LEFT JOIN pref pa  ON pa.gi = x.ba - 1 AND pa.gj = {K - 1}
), ta AS (
    SELECT sum(t * (t - 1) // 2) AS n1,
           sum(t * (t - 1) * (2 * t + 5)) AS vt,
           sum(t * (t - 1)) AS st1,
           sum(t * (t - 1) * (t - 2)) AS st2
    FROM (SELECT sum(c) AS t FROM cells GROUP BY ba)
), tb AS (
    SELECT sum(u * (u - 1) // 2) AS n2,
           sum(u * (u - 1) * (2 * u + 5)) AS vu,
           sum(u * (u - 1)) AS su1,
           sum(u * (u - 1) * (u - 2)) AS su2
    FROM (SELECT sum(c) AS u FROM cells GROUP BY bb)
), nn AS (
    SELECT sum(c) AS n, sum(c) * (sum(c) - 1) // 2 AS n0 FROM cells
), st AS (
    SELECT n, (conc - disc)::DOUBLE
              / sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE) AS tau,
           (conc - disc)::DOUBLE
           / sqrt((n * (n - 1) * (2 * n + 5) - vt - vu)::DOUBLE / 18.0
                  + st1::DOUBLE * su1::DOUBLE
                    / (2.0 * n * (n - 1.0))
                  + CASE WHEN n > 2
                         THEN st2::DOUBLE * su2::DOUBLE
                              / (9.0 * n * (n - 1.0) * (n - 2.0))
                         ELSE 0.0 END) AS z
    FROM cd, ta, tb, nn
)
SELECT n::BIGINT AS n,
       floor(tau * 1e6 + 0.5) / 1e6 AS tau,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM st
"""


JT_ORDER = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
            "5-LOW"]
JT_BINS = 256


def q_jonckheere_priority_price(spark, sf_dir):
    """Jonckheere–Terpstra ordered-alternative test (functions/
    stats.py::jonckheere_terpstra): does order value TREND across the
    five priority levels, urgent → low? KW would only say "differ";
    JT tests the monotone dose-response and is the right tool when
    the groups carry an order. Implemented as Kendall's S between the
    group ordinal and the binned value (the textbook equivalence —
    JT's centered statistic IS S), so it reuses the exact-integer
    2-D-prefix cell core; the oracle replays the ordinal×bucket grid
    with HUGEINT window cumsums."""
    from dask_ml_spark.functions.stats import jonckheere_terpstra

    od = _t(spark, sf_dir, "orders")
    out = jonckheere_terpstra(od, "o_totalprice", "o_orderpriority",
                              order=JT_ORDER, bins=JT_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "k", r6(F.col("tau")).alias("tau"),
                      r6(F.col("z")).alias("z"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_jonckheere_priority_price() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    K = JT_BINS
    kk = len(JT_ORDER)
    sf = _normal_sf_sql("abs(z)")
    case = "CASE " + " ".join(
        f"WHEN o_orderpriority = '{g}' THEN {i}"
        for i, g in enumerate(JT_ORDER)) + " END"
    return f"""
WITH k AS (
    SELECT {case} AS o, o_totalprice::DOUBLE AS v
    FROM orders
    WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
      AND o_orderpriority IN ({', '.join(f"'{g}'" for g in JT_ORDER)})
), lim AS (
    SELECT min(v) AS lv, max(v) AS hv FROM k
), w AS (
    SELECT lv, CASE WHEN hv = lv THEN 1.0 ELSE hv - lv END AS wv
    FROM lim
), cells AS (
    SELECT o AS ba,
           CAST(least({K - 1}, floor((v - (SELECT lv FROM w))
                                     / (SELECT wv FROM w) * {K}))
                AS BIGINT) AS bb,
           count(*)::HUGEINT AS c
    FROM k GROUP BY 1, 2
), grid AS (
    SELECT ga.range AS gi, gb.range AS gj
    FROM range({kk}) ga CROSS JOIN range({K}) gb
), dense AS (
    SELECT gi, gj, coalesce(cells.c, 0::HUGEINT) AS c
    FROM grid LEFT JOIN cells ON cells.ba = gi AND cells.bb = gj
), rowcum AS (
    SELECT gi, gj,
           sum(c) OVER (PARTITION BY gi ORDER BY gj
                        ROWS UNBOUNDED PRECEDING) AS rc
    FROM dense
), pref AS (
    SELECT gi, gj,
           sum(rc) OVER (PARTITION BY gj ORDER BY gi
                         ROWS UNBOUNDED PRECEDING) AS p2
    FROM rowcum
), cd AS (
    SELECT sum(x.c * coalesce(pll.p2, 0::HUGEINT)) AS conc,
           sum(x.c * (coalesce(pa.p2, 0::HUGEINT)
                      - coalesce(plj.p2, 0::HUGEINT))) AS disc
    FROM cells x
    LEFT JOIN pref pll ON pll.gi = x.ba - 1 AND pll.gj = x.bb - 1
    LEFT JOIN pref plj ON plj.gi = x.ba - 1 AND plj.gj = x.bb
    LEFT JOIN pref pa  ON pa.gi = x.ba - 1 AND pa.gj = {K - 1}
), ta AS (
    SELECT sum(t * (t - 1) // 2) AS n1,
           sum(t * (t - 1) * (2 * t + 5)) AS vt,
           sum(t * (t - 1)) AS st1,
           sum(t * (t - 1) * (t - 2)) AS st2
    FROM (SELECT sum(c) AS t FROM cells GROUP BY ba)
), tb AS (
    SELECT sum(u * (u - 1) // 2) AS n2,
           sum(u * (u - 1) * (2 * u + 5)) AS vu,
           sum(u * (u - 1)) AS su1,
           sum(u * (u - 1) * (u - 2)) AS su2
    FROM (SELECT sum(c) AS u FROM cells GROUP BY bb)
), nn AS (
    SELECT sum(c) AS n, sum(c) * (sum(c) - 1) // 2 AS n0 FROM cells
), st AS (
    SELECT n, (conc - disc)::DOUBLE
              / sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE) AS tau,
           (conc - disc)::DOUBLE
           / sqrt((n * (n - 1) * (2 * n + 5) - vt - vu)::DOUBLE / 18.0
                  + st1::DOUBLE * su1::DOUBLE
                    / (2.0 * n * (n - 1.0))
                  + CASE WHEN n > 2
                         THEN st2::DOUBLE * su2::DOUBLE
                              / (9.0 * n * (n - 1.0) * (n - 2.0))
                         ELSE 0.0 END) AS z
    FROM cd, ta, tb, nn
)
SELECT n::BIGINT AS n, {kk}::BIGINT AS k,
       floor(tau * 1e6 + 0.5) / 1e6 AS tau,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM st
"""


def q_kruskal_wallis_quantity(spark, sf_dir):
    """Kruskal–Wallis rank ANOVA (functions/stats.py::kruskal_wallis —
    the k-group Mann–Whitney / rank-based anova_oneway): quantity
    across the three return flags. ONE groupBy(value, group) count is
    the only raw-row pass (~50 distinct quantities × 3 flags of
    driver state); global tie-averaged ranks and the k rank sums
    assemble in exact doubled-integer arithmetic, H with the
    tie-correction divisor, p from the even-dof χ² closed form the
    oracle replays exactly."""
    from dask_ml_spark.functions.stats import kruskal_wallis

    li = _t(spark, sf_dir, "lineitem")
    out = kruskal_wallis(li, "l_quantity", "l_returnflag")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("k", "n", r6(F.col("h_stat")).alias("h_stat"),
                      "dof",
                      r6(F.col("tie_correction"))
                      .alias("tie_correction"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_kruskal_wallis_quantity() -> str:
    from dask_ml_spark.functions.stats import _chi2_sf_sql

    p = _chi2_sf_sql("hc", 2)
    return f"""
WITH k AS (
    SELECT l_quantity::DOUBLE AS v, l_returnflag::VARCHAR AS g
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
      AND l_returnflag IS NOT NULL
), vc AS (
    SELECT v, count(*)::HUGEINT AS c FROM k GROUP BY v
), r AS (
    -- doubled tie-averaged global ranks: 2·rank = 2·(cum − c) + c + 1
    SELECT v, 2 * (cum - c) + c + 1 AS r2 FROM (
        SELECT v, c, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS cum
        FROM vc)
), cells AS (
    SELECT v, g, count(*)::HUGEINT AS c FROM k GROUP BY v, g
), gr AS (
    SELECT g, sum(cells.c) AS ng, sum(cells.c * r.r2) AS rg2
    FROM cells JOIN r USING (v) GROUP BY g
), nn AS (
    SELECT sum(c) AS n, sum(c * c * c - c) AS tie_sum FROM vc
), s AS (
    SELECT count(*)::BIGINT AS k,
           sum((rg2 * rg2)::DOUBLE / (4.0 * ng)) AS s4
    FROM gr
), h AS (
    SELECT s.k, nn.n,
           (12.0 * s.s4 / (nn.n * (nn.n + 1.0)) - 3.0 * (nn.n + 1.0))
           / (1.0 - nn.tie_sum::DOUBLE
                    / ((nn.n * nn.n * nn.n - nn.n)::DOUBLE)) AS hc,
           1.0 - nn.tie_sum::DOUBLE
                 / ((nn.n * nn.n * nn.n - nn.n)::DOUBLE) AS corr
    FROM s, nn
)
SELECT k, n::BIGINT AS n,
       floor(hc * 1e6 + 0.5) / 1e6 AS h_stat,
       (k - 1)::BIGINT AS dof,
       floor(corr * 1e6 + 0.5) / 1e6 AS tie_correction,
       floor({p} * 1e6 + 0.5) / 1e6 AS p_value
FROM h
"""


def q_corrdrift_monthly(spark, sf_dir):
    """Feature-relationship drift (streaming/drift.py::corr_drift —
    the drift family member marginal monitors can't see): per 30-day
    ship window the Pearson r between price and quantity, Fisher-
    transformed against a fixed reference r. ONE groupBy(window)
    co-moment aggregate; streaming-legal. The oracle recomputes the
    reference and replays every window (Spark's tumbling windows are
    1970-epoch aligned, which the SQL mirrors with integer epoch
    division)."""
    from dask_ml_spark.streaming.drift import (corr_drift,
                                               reference_correlation)

    li = _t(spark, sf_dir, "lineitem")
    ref = reference_correlation(
        li.where(F.col("l_shipdate") < F.lit(CORR_REF_END)),
        "l_extendedprice", "l_quantity")
    out = corr_drift(li, "l_extendedprice", "l_quantity", "l_shipdate",
                     ref, window="30 days")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("win"),
        "n", r6(F.col("corr")).alias("corr"),
        r6(F.col("z")).alias("z"),
        r6(F.col("p_value")).alias("p_value"))


def _sql_corrdrift_monthly() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    w = 30 * 86400
    return f"""
WITH kept AS (
    SELECT l_shipdate AS ts, l_extendedprice::DOUBLE AS a,
           l_quantity::DOUBLE AS b
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
), ref AS (
    SELECT 0.5 * ln((1.0 + corr(a, b)) / (1.0 - corr(a, b))) AS z0
    FROM kept WHERE ts < TIMESTAMP '{CORR_REF_END} 00:00:00'
), win AS (
    -- Spark tumbling windows align to the 1970 epoch
    SELECT to_timestamp((epoch(ts)::BIGINT // {w}) * {w}) AS ws,
           count(*)::BIGINT AS n, corr(a, b) AS r
    FROM kept GROUP BY 1
), z AS (
    SELECT ws, n, r,
           CASE WHEN n >= 4 AND r IS NOT NULL AND abs(r) < 1.0
                THEN (0.5 * ln((1.0 + r) / (1.0 - r))
                      - (SELECT z0 FROM ref)) * sqrt(n - 3.0)
           END AS z
    FROM win
)
SELECT strftime(ws, '%Y-%m-%d') AS win, n,
       floor(r * 1e6 + 0.5) / 1e6 AS corr,
       floor(z * 1e6 + 0.5) / 1e6 AS z,
       floor(CASE WHEN z IS NULL THEN NULL
                  ELSE least(1.0, 2.0 * {sf}) END * 1e6 + 0.5) / 1e6
           AS p_value
FROM z
"""


COV_COLS = ["l_extendedprice", "l_quantity", "l_discount", "l_tax"]


def q_partial_corr_price_quantity(spark, sf_dir):
    """Partial Pearson correlation (functions/stats.py::
    partial_correlation — the confounder screen): price vs quantity
    CONTROLLING for discount, ρ = −P_ab/√(P_aa·P_bb) from the inverse
    of the 3×3 correlation matrix built in ONE co-moment aggregate.
    tail='normal' here (dof ≈ n — the documented corpus convention
    the SQL replays; the library default is the exact t tail). The
    oracle replays the one-control closed form
    (r_ab − r_ac·r_bc)/√((1−r_ac²)(1−r_bc²)), which the matrix
    inverse equals algebraically."""
    from dask_ml_spark.functions.stats import partial_correlation

    li = _t(spark, sf_dir, "lineitem")
    out = partial_correlation(li, "l_extendedprice", "l_quantity",
                              ["l_discount"], tail="normal")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", "g_controls", r6(F.col("r")).alias("r"),
                      r6(F.col("t_stat") / 100.0).alias("t_stat_c"),
                      "dof", r6(F.col("p_value")).alias("p_value"))


def _sql_partial_corr_price_quantity() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(t)")
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS a, l_quantity::DOUBLE AS b,
           l_discount::DOUBLE AS c
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
      AND l_discount IS NOT NULL AND NOT isnan(l_discount)
), m AS (
    SELECT count(*)::BIGINT AS n, corr(a, b) AS rab,
           corr(a, c) AS rac, corr(b, c) AS rbc
    FROM k
), p AS (
    SELECT n,
           (rab - rac * rbc)
           / sqrt((1.0 - rac * rac) * (1.0 - rbc * rbc)) AS r
    FROM m
), t AS (
    SELECT n, r, (n - 3) AS dof,
           r * sqrt((n - 3) / (1.0 - r * r)) AS t
    FROM p
)
SELECT n, 1::BIGINT AS g_controls,
       floor(r * 1e6 + 0.5) / 1e6 AS r,
       floor(t / 100.0 * 1e6 + 0.5) / 1e6 AS t_stat_c,
       dof::BIGINT AS dof,
       floor(least(1.0, 2.0 * {sf}) * 1e6 + 0.5) / 1e6 AS p_value
FROM t
"""


def q_covdrift_monthly(spark, sf_dir):
    """Covariance-structure drift (streaming/drift.py::cov_drift — the
    multivariate drift-family member: ALL d(d−1)/2 pairwise Pearson
    correlations per 30-day ship window, each Fisher-compared to a
    fixed reference, with an in-row Benjamini–Hochberg step-up over
    the window's pair family plus max|z| / Frobenius-delta family
    scalars). ONE groupBy(window) aggregation of the 6 corr
    aggregates + a stateless array-HOF projection; streaming-legal.
    The oracle recomputes the reference, replays every window's
    Fisher z and p, and reproduces the BH q via the partitioned
    suffix-min window (tied p's share the largest-rank q — exactly
    the engine's min over {p_(k) ≥ p} of p_(k)·m/k)."""
    from dask_ml_spark.streaming.drift import (cov_drift,
                                               reference_comoments)

    li = _t(spark, sf_dir, "lineitem")
    ref = reference_comoments(
        li.where(F.col("l_shipdate") < F.lit(CORR_REF_END)), COV_COLS)
    out = cov_drift(li, COV_COLS, "l_shipdate", ref, window="30 days")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("win"),
        "col_a", "col_b", "n",
        r6(F.col("corr")).alias("corr"),
        r6(F.col("z")).alias("z"),
        r6(F.col("p_value")).alias("p_value"),
        r6(F.col("q_value")).alias("q_value"),
        "reject",
        r6(F.col("max_abs_z")).alias("max_abs_z"),
        r6(F.col("frob_delta")).alias("frob_delta"),
        "valid")


def _sql_covdrift_monthly() -> str:
    from dask_ml_spark.functions.stats import _normal_sf_sql

    sf = _normal_sf_sql("abs(z)")
    w = 30 * 86400
    d = len(COV_COLS)
    pairs = [(i, j) for i in range(d) for j in range(i + 1, d)]
    ref_cols = ", ".join(
        f"corr(x{i}, x{j}) AS r{k}" for k, (i, j) in enumerate(pairs))
    win_cols = ", ".join(
        f"corr(x{i}, x{j}) AS c{k}" for k, (i, j) in enumerate(pairs))
    z_cols = ", ".join(
        f"""CASE WHEN n >= 4 AND c{k} IS NOT NULL AND abs(c{k}) < 1.0
             THEN (0.5 * ln((1.0 + c{k}) / (1.0 - c{k}))
                   - (SELECT 0.5 * ln((1.0 + r{k}) / (1.0 - r{k}))
                      FROM ref)) * sqrt(n - 3.0) END AS z{k}"""
        for k in range(len(pairs)))
    # frob: left-to-right addition in pair index order (the engine's
    # Python-loop order) so the double sum is bit-reproducible
    frob_terms = " + ".join(
        f"""CASE WHEN z{k} IS NOT NULL
             THEN (c{k} - (SELECT r{k} FROM ref))
                  * (c{k} - (SELECT r{k} FROM ref)) ELSE 0.0 END"""
        for k in range(len(pairs)))
    any_valid = " OR ".join(
        f"z{k} IS NOT NULL" for k in range(len(pairs)))
    kept_where = " AND ".join(
        f"{c} IS NOT NULL AND NOT isnan({c}::DOUBLE)" for c in COV_COLS)
    kept_sel = ", ".join(
        f"{c}::DOUBLE AS x{i}" for i, c in enumerate(COV_COLS))
    branches = "\n    UNION ALL\n".join(
        f"""    SELECT ws, n, '{COV_COLS[i]}' AS col_a,
           '{COV_COLS[j]}' AS col_b, c{k} AS r, z{k} AS z, frob
    FROM zf""" for k, (i, j) in enumerate(pairs))
    return f"""
WITH kept AS (
    SELECT l_shipdate AS ts, {kept_sel}
    FROM lineitem
    WHERE {kept_where}
), ref AS (
    SELECT {ref_cols}
    FROM kept WHERE ts < TIMESTAMP '{CORR_REF_END} 00:00:00'
), win AS (
    -- Spark tumbling windows align to the 1970 epoch
    SELECT to_timestamp((epoch(ts)::BIGINT // {w}) * {w}) AS ws,
           count(*)::BIGINT AS n, {win_cols}
    FROM kept GROUP BY 1
), z AS (
    SELECT *, {z_cols}
    FROM win
), zf AS (
    SELECT *, CASE WHEN {any_valid}
                   THEN sqrt(0.0 + {frob_terms}) END AS frob
    FROM z
), pairs AS (
{branches}
), p AS (
    SELECT *, CASE WHEN z IS NOT NULL
                   THEN least(1.0, 2.0 * {sf}) END AS p
    FROM pairs
), fam AS (
    SELECT ws, p, row_number() OVER (PARTITION BY ws ORDER BY p) AS rn,
           count(*) OVER (PARTITION BY ws) AS mm
    FROM p WHERE p IS NOT NULL
), adj AS (
    SELECT ws, p,
           least(1.0, min(p * mm / rn)
                 OVER (PARTITION BY ws ORDER BY rn
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING)) AS q
    FROM fam
), adj_d AS (
    -- tied p's share one q (largest-rank suffix min) — dedup so the
    -- join back stays 1:1
    SELECT ws, p, min(q) AS q FROM adj GROUP BY ws, p
), mz AS (
    SELECT ws, max(abs(z)) AS maxz FROM pairs GROUP BY ws
)
SELECT strftime(p.ws, '%Y-%m-%d') AS win, p.col_a, p.col_b, p.n,
       floor(p.r * 1e6 + 0.5) / 1e6 AS corr,
       floor(p.z * 1e6 + 0.5) / 1e6 AS z,
       floor(p.p * 1e6 + 0.5) / 1e6 AS p_value,
       floor(adj_d.q * 1e6 + 0.5) / 1e6 AS q_value,
       CASE WHEN adj_d.q IS NOT NULL THEN adj_d.q <= 0.05 END AS reject,
       floor(mz.maxz * 1e6 + 0.5) / 1e6 AS max_abs_z,
       floor(p.frob * 1e6 + 0.5) / 1e6 AS frob_delta,
       p.z IS NOT NULL AS valid
FROM p
LEFT JOIN adj_d ON p.ws = adj_d.ws AND p.p = adj_d.p
LEFT JOIN mz ON p.ws = mz.ws
"""


def q_seasonal_decompose_daily(spark, sf_dir):
    """Classical additive seasonal decomposition (functions/stats.py::
    seasonal_decompose — trend + weekly seasonal + residual of the
    daily mean event value; the residual is what drift monitors
    should watch once the known cycle is removed). One raw-row bucket
    aggregate, then the decomposition over the ≤K bucket grid
    driver-side: centered 7-day moving average (NULL at edges/gaps —
    surfaced, not interpolated), grid-anchored position means,
    centered seasonal. The oracle replays the windows and means over
    the same dense grid."""
    from dask_ml_spark.functions.stats import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    out = seasonal_decompose(ev, "value", "ts", period=7,
                             step=86400.0)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("bucket", "n", r6(F.col("x")).alias("x"),
                      r6(F.col("trend")).alias("trend"),
                      r6(F.col("seasonal")).alias("seasonal"),
                      r6(F.col("resid")).alias("resid"))


def _sql_seasonal_decompose_daily() -> str:
    return """
WITH s AS (
    SELECT CAST(floor(epoch(ts)::DOUBLE / 86400.0) AS BIGINT) AS b,
           count(*)::BIGINT AS n, avg(value::DOUBLE) AS x
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1
), lim AS (
    SELECT min(b) AS lo, max(b) AS hi FROM s
), grid AS (
    -- list-valued range() accepts expressions where the table
    -- function does not
    SELECT unnest(range(lo, hi + 1)) AS b FROM lim
), d AS (
    SELECT grid.b, coalesce(s.n, 0::BIGINT) AS n, s.x
    FROM grid LEFT JOIN s USING (b)
), tr AS (
    -- full centered 7-window over the dense grid: edge-truncated or
    -- gap-containing windows report NULL (the engine's contract)
    SELECT b, n, x,
           CASE WHEN count(*) OVER w = 7 AND count(x) OVER w = 7
                THEN sum(x) OVER w / 7.0 END AS trend
    FROM d
    WINDOW w AS (ORDER BY b ROWS BETWEEN 3 PRECEDING
                 AND 3 FOLLOWING)
), pm AS (
    SELECT b % 7 AS pos, avg(x - trend) AS m
    FROM tr WHERE trend IS NOT NULL AND x IS NOT NULL
    GROUP BY 1
), ctr AS (
    SELECT avg(m) AS c FROM pm
), sea AS (
    SELECT pos, m - (SELECT c FROM ctr) AS s FROM pm
)
SELECT tr.b AS bucket, tr.n,
       floor(tr.x * 1e6 + 0.5) / 1e6 AS x,
       floor(tr.trend * 1e6 + 0.5) / 1e6 AS trend,
       floor(sea.s * 1e6 + 0.5) / 1e6 AS seasonal,
       floor((tr.x - tr.trend - sea.s) * 1e6 + 0.5) / 1e6 AS resid
FROM tr LEFT JOIN sea ON tr.b % 7 = sea.pos
ORDER BY bucket
"""


def q_acf_daily_value(spark, sf_dir):
    """Autocorrelation of the daily mean event value
    (functions/stats.py::autocorrelation): one raw-row bucket
    aggregate, then ONE explode-over-lags + ONE integer equi-join +
    ONE groupBy(lag) of co-moment aggregates — the time-series
    dependence diagnostic with no keyless window. Per-lag Pearson
    (each lag's own pair means), so every acf is a self-normalizing
    ratio."""
    from dask_ml_spark.functions.stats import autocorrelation

    ev = _t(spark, sf_dir, "events")
    out = autocorrelation(ev, "value", "ts", lags=7, step=86400.0)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("lag", "n_pairs", r6(F.col("acf")).alias("acf"),
                      r6(F.col("band_lo")).alias("band_lo"),
                      r6(F.col("band_hi")).alias("band_hi"))


def _sql_acf_daily_value() -> str:
    from dask_ml_spark.functions.stats import _Z975

    return f"""
WITH s AS (
    SELECT CAST(floor(epoch(ts)::DOUBLE / 86400.0) AS BIGINT) AS b,
           avg(value::DOUBLE) AS x
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1
), e AS (
    SELECT s.b, s.x, l.lag, s.b + l.lag AS b2
    FROM s CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
)
SELECT e.lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
       floor(corr(e.x, s2.x) * 1e6 + 0.5) / 1e6 AS acf,
       floor(-({_Z975!r} / sqrt(count(*)::DOUBLE)) * 1e6 + 0.5) / 1e6
           AS band_lo,
       floor(({_Z975!r} / sqrt(count(*)::DOUBLE)) * 1e6 + 0.5) / 1e6
           AS band_hi
FROM e JOIN s s2 ON e.b2 = s2.b
GROUP BY e.lag
"""


def q_mutual_information_events(spark, sf_dir):
    """Discrete mutual information (functions/stats.py::
    mutual_information): how informative is the event type about the
    user's activity band? MI + the √(H·H)-normalized coefficient —
    the dependence measure that, unlike the chi-square p, stays
    interpretable at corpus row counts. Empty cells contribute 0 (the
    correct MI convention; contrast the chi-square fix)."""
    from dask_ml_spark.functions.stats import mutual_information

    ev = _t(spark, sf_dir, "events")
    banded = ev.withColumn(
        "value_band", F.floor(F.col("value") / 25.0).cast("long"))
    out = mutual_information(banded, "event_type", "value_band")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(r6(F.col("mi")).alias("mi"),
                      r6(F.col("mi_normalized")).alias("mi_normalized"),
                      "n")


SQL_MUTUAL_INFORMATION_EVENTS = """
WITH c AS (
    SELECT event_type AS a,
           CAST(floor(value / 25.0) AS BIGINT)::VARCHAR AS b,
           count(*)::DOUBLE AS o
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2
), m AS (
    SELECT o,
           sum(o) OVER (PARTITION BY a) AS ra,
           sum(o) OVER (PARTITION BY b) AS cb,
           sum(o) OVER () AS n
    FROM c
), s AS (
    SELECT sum((o/n) * ln((o/n) / ((ra/n) * (cb/n)))) AS mi,
           max(n) AS n
    FROM m
), ha AS (
    SELECT -sum(p * ln(p)) AS h FROM (
        SELECT sum(o) / (SELECT max(n) FROM m) AS p FROM c GROUP BY a)
), hb AS (
    SELECT -sum(p * ln(p)) AS h FROM (
        SELECT sum(o) / (SELECT max(n) FROM m) AS p FROM c GROUP BY b)
)
SELECT floor(mi * 1e6 + 0.5) / 1e6 AS mi,
       floor(mi / sqrt((SELECT h FROM ha) * (SELECT h FROM hb))
             * 1e6 + 0.5) / 1e6 AS mi_normalized,
       n::BIGINT AS n
FROM s
"""


def q_feature_corr_matrix(spark, sf_dir):
    """All-pairs Pearson correlations (functions/stats.py::
    corr_matrix) over the four lineitem measures in ONE aggregate pass
    — d(d+1)/2 streaming co-moment aggregates share a single scan with
    map-side merge (the d²-passes naive form never touches the data
    more than once here)."""
    from dask_ml_spark.functions.stats import corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    out = corr_matrix(li, ["l_quantity", "l_extendedprice",
                           "l_discount", "l_tax"])
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("col_a", "col_b", r6(F.col("corr")).alias("corr"))


SQL_FEATURE_CORR_MATRIX = """
WITH pairs AS (
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           corr(l_quantity, l_extendedprice) AS corr FROM lineitem
    UNION ALL SELECT 'l_quantity', 'l_discount',
           corr(l_quantity, l_discount) FROM lineitem
    UNION ALL SELECT 'l_quantity', 'l_tax',
           corr(l_quantity, l_tax) FROM lineitem
    UNION ALL SELECT 'l_extendedprice', 'l_discount',
           corr(l_extendedprice, l_discount) FROM lineitem
    UNION ALL SELECT 'l_extendedprice', 'l_tax',
           corr(l_extendedprice, l_tax) FROM lineitem
    UNION ALL SELECT 'l_discount', 'l_tax',
           corr(l_discount, l_tax) FROM lineitem
)
SELECT col_a, col_b, floor(corr * 1e6 + 0.5) / 1e6 AS corr
FROM pairs ORDER BY col_a, col_b
"""


def q_kaplan_meier_conversion(spark, sf_dir):
    """Kaplan–Meier time-to-purchase curve (functions/stats.py::
    kaplan_meier) over the event log: per user, duration = days from
    their first event to their first purchase; users who never
    purchase are right-censored at their last event. The
    product-limit curve runs as groupBy(duration) + three two-phase
    prefix sums — no per-user or keyless window."""
    from dask_ml_spark.functions.stats import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    d = F.to_date(F.col("ts").cast("timestamp"))
    per = ev.groupBy("user_id").agg(
        F.min(d).alias("first_d"),
        F.max(d).alias("last_d"),
        F.min(F.when(F.col("event_type") == "purchase", d))
        .alias("purch_d"))
    dur = F.when(F.col("purch_d").isNotNull(),
                 F.datediff(F.col("purch_d"), F.col("first_d"))
                 ).otherwise(F.datediff(F.col("last_d"), F.col("first_d")))
    subj = per.select(dur.cast("double").alias("duration"),
                      F.col("purch_d").isNotNull().cast("int")
                      .alias("event"))
    out = kaplan_meier(subj, "duration", "event")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select(F.col("duration").cast("long").alias("duration"),
                      "n_risk", "n_events", "n_censored",
                      r6(F.col("survival")).alias("survival"))


SQL_KAPLAN_MEIER_CONVERSION = """
WITH per AS (
    SELECT user_id,
           min(CAST(ts AS DATE)) AS first_d,
           max(CAST(ts AS DATE)) AS last_d,
           min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS DATE) END) AS purch_d
    FROM events GROUP BY user_id
), subj AS (
    SELECT CASE WHEN purch_d IS NOT NULL
                THEN date_diff('day', first_d, purch_d)
                ELSE date_diff('day', first_d, last_d) END::DOUBLE AS t,
           CASE WHEN purch_d IS NOT NULL THEN 1.0 ELSE 0.0 END AS e
    FROM per
), g AS (
    SELECT t, sum(e) AS d, sum(1.0 - e) AS c, count(*)::DOUBLE AS n
    FROM subj GROUP BY t
), r AS (
    SELECT t, d, c,
           (SELECT sum(n) FROM g)
               - (sum(n) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) - n) AS nr
    FROM g
), f AS (
    SELECT t, d, c, nr,
           CASE WHEN 1.0 - d/nr > 0.0 THEN ln(1.0 - d/nr)
                ELSE 0.0 END AS lnf,
           CASE WHEN 1.0 - d/nr <= 0.0 THEN 1.0 ELSE 0.0 END AS zf
    FROM r
), s AS (
    SELECT t, d, c, nr,
           CASE WHEN sum(zf) OVER w > 0.0 THEN 0.0
                ELSE exp(sum(lnf) OVER w) END AS surv
    FROM f
    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
)
SELECT t::BIGINT AS duration, nr::BIGINT AS n_risk,
       d::BIGINT AS n_events, c::BIGINT AS n_censored,
       floor(surv * 1e6 + 0.5) / 1e6 AS survival
FROM s
"""


def q_calibration_curve(spark, sf_dir):
    """Reliability-diagram points for a synthetic probability column."""
    from dask_ml_spark.functions.metrics import calibration_curve

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_discount") * 10.0).alias("probability"),  # in [0, 1]
    )
    return calibration_curve(li, n_bins=10)


SQL_CALIBRATION_CURVE = """
WITH p AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
           l_discount * 10.0 AS prob
    FROM lineitem
)
SELECT CAST(least(9, floor(prob * 10)) AS INTEGER) AS bin,
       avg(prob) AS mean_predicted,
       avg(label) AS fraction_positive,
       count(*) AS n
FROM p
GROUP BY 1
"""


def q_confusion_matrix(spark, sf_dir):
    """Long-form confusion matrix over a thresholded score."""
    from dask_ml_spark.functions.metrics import confusion_matrix

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_quantity") > 25).cast("double").alias("prediction"),
    )
    return confusion_matrix(li)


SQL_CONFUSION_MATRIX = """
SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
       CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS prediction,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
"""


def q_precision_recall_f1(spark, sf_dir):
    """One-pass binary precision/recall/F1 over a thresholded score."""
    from dask_ml_spark.functions.metrics import precision_recall_f1

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_quantity") > 25).cast("double").alias("prediction"),
    )
    m = precision_recall_f1(li)
    return spark.createDataFrame([{
        "precision": m["precision"], "recall": m["recall"], "f1": m["f1"],
        "tp": int(m["tp"]), "fp": int(m["fp"]), "fn": int(m["fn"]),
    }]).select("precision", "recall", "f1", "tp", "fp", "fn")


SQL_PRECISION_RECALL_F1 = """
WITH p AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
           CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS prediction
    FROM lineitem
),
c AS (
    SELECT sum(CASE WHEN label = 1 AND prediction = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
           sum(CASE WHEN label = 0 AND prediction = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
           sum(CASE WHEN label = 1 AND prediction = 0 THEN 1 ELSE 0 END)::BIGINT AS fn
    FROM p
)
SELECT tp / (tp + fp)::DOUBLE AS precision,
       tp / (tp + fn)::DOUBLE AS recall,
       2.0 * (tp / (tp + fp)::DOUBLE) * (tp / (tp + fn)::DOUBLE)
           / ((tp / (tp + fp)::DOUBLE) + (tp / (tp + fn)::DOUBLE)) AS f1,
       tp, fp, fn
FROM c
"""


def q_roc_auc_eval(spark, sf_dir):
    """Distributed exact ROC-AUC (rank-sum with tie-averaged ranks) of
    a continuous score against a binary label; the oracle reproduces
    the same formulation with a SQL window prefix sum."""
    from dask_ml_spark.functions.metrics import roc_auc_score

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_extendedprice") / (F.lit(1.0) + F.col("l_discount"))).alias("score"),
    )
    auc = roc_auc_score(li, "label", "score")
    return spark.createDataFrame([{"auc": float(auc)}]).select("auc")


SQL_ROC_AUC_EVAL = """
WITH scored AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
           l_extendedprice / (1.0 + l_discount) AS score
    FROM lineitem
),
g AS (
    SELECT score, count(*)::DOUBLE AS c, sum(label) AS p
    FROM scored GROUP BY score
),
w AS (
    SELECT p, c - p AS neg,
           COALESCE(sum(c - p) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
    FROM g
)
SELECT sum(p * (neg_below + 0.5 * neg)) / (sum(p) * sum(neg)) AS auc FROM w
"""


def q_roc_auc_binned(spark, sf_dir):
    """The 100 TB ROC-AUC path (functions/metrics.py::roc_auc_score
    with bins=4096): scores bucket into K equal-width bins — one
    min/max pass + one ≤K-group aggregate, no score-sorted shuffle —
    with |error| bounded by the within-bin pair mass (O(1/K)). The
    oracle replays the identical bucketing arithmetic in SQL, so this
    is a full hash-match, not rows-only."""
    from dask_ml_spark.functions.metrics import roc_auc_score

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_extendedprice") / (F.lit(1.0) + F.col("l_discount"))).alias("score"),
    )
    auc = roc_auc_score(li, "label", "score", bins=4096)
    return spark.createDataFrame([{"auc": float(auc)}]).select(
        F.round(F.col("auc"), 9).alias("auc"))


SQL_ROC_AUC_BINNED = """
WITH scored AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
           l_extendedprice / (1.0 + l_discount) AS score
    FROM lineitem
),
rng AS (
    SELECT min(score) AS lo,
           CASE WHEN max(score) = min(score) THEN 1.0
                ELSE max(score) - min(score) END AS width
    FROM scored
),
g AS (
    SELECT least(4095, floor((score - lo) / width * 4096))::INT AS b,
           count(*)::DOUBLE AS c, sum(label) AS p
    FROM scored, rng GROUP BY 1
),
w AS (
    SELECT p, c - p AS neg,
           COALESCE(sum(c - p) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
    FROM g
)
SELECT round(sum(p * (neg_below + 0.5 * neg)) / (sum(p) * sum(neg)), 9) AS auc
FROM w
"""


def q_poisson_saturated_fit(spark, sf_dir):
    """Unpenalized Poisson/log GLM on ONE binary feature — saturated
    model, closed-form MLE (group means under the log link), so the
    MLlib IRLS path is value-checked against the true optimum:
    intercept = ln(mean(y | x=0)), coef = ln(mean(y | x=1)) − intercept."""
    from dask_ml_spark.operators.linear_model import PoissonRegression

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") > 0.05).cast("double").alias("x"),
        F.col("l_quantity").alias("label"),
    )
    pr = PoissonRegression(C=float("inf"), max_iter=100, tol=1e-12).fit(
        li, ["x"], label_col="label")
    return spark.createDataFrame([{
        "coef_x": float(pr.coef_[0]),
        "intercept": float(pr.intercept_),
    }]).select("coef_x", "intercept")


SQL_POISSON_SATURATED_FIT = """
WITH g AS (
    SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS x,
           avg(l_quantity) AS m
    FROM lineitem GROUP BY 1
)
SELECT ln((SELECT m FROM g WHERE x = 1)) - ln((SELECT m FROM g WHERE x = 0)) AS coef_x,
       ln((SELECT m FROM g WHERE x = 0)) AS intercept
"""


def q_make_blobs_kmeans(spark, sf_dir):
    """Synthetic data generators (reference datasets.py:78-206) feeding
    clustering: make_blobs per-partition seeded generation → KMeans.
    Seeded — rows-only."""
    from dask_ml_spark.datasets import make_blobs
    from dask_ml_spark.operators.cluster import KMeans

    df = make_blobs(n_samples=20000, n_features=4, centers=3,
                    cluster_std=0.8, random_state=5, n_partitions=8, spark=spark)
    cols = [c for c in df.columns if c.startswith("x")]
    km = KMeans(n_clusters=3, random_state=5, max_iter=10).fit(df, cols)
    return (
        km.predict(df)
        .groupBy("prediction")
        .agg(F.count("*").alias("n"))
        .select(F.col("prediction").cast("long").alias("cluster"), "n")
    )


def q_feature_hasher_long(spark, sf_dir):
    """FeatureHasher over dict-shaped rows (categorical flags + a
    numeric), triplet output. xxhash64 buckets are Spark-specific —
    rows-only; determinism covered by tests."""
    from dask_ml_spark.operators.text import FeatureHasher

    li = _t(spark, sf_dir, "lineitem")
    feats = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
        F.create_map(
            F.concat(F.lit("rf="), F.col("l_returnflag")), F.lit(1.0),
            F.concat(F.lit("ls="), F.col("l_linestatus")), F.lit(1.0),
            F.lit("qty"), F.col("l_quantity").cast("double"),
        ).alias("features_raw"),
    )
    fh = FeatureHasher(n_features=4096)
    return fh.transform_long(feats, "row_id")


def q_feature_hasher_portable(spark, sf_dir):
    """Same dict-shaped hashing with the engine-portable md5-prefix
    hash — the oracle value-checks explode → hash → signed weighted sum
    → prune against DuckDB."""
    from dask_ml_spark.operators.text import FeatureHasher

    li = _t(spark, sf_dir, "lineitem")
    feats = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
        F.create_map(
            F.concat(F.lit("rf="), F.col("l_returnflag")), F.lit(1.0),
            F.concat(F.lit("ls="), F.col("l_linestatus")), F.lit(1.0),
            F.lit("qty"), F.col("l_quantity").cast("double"),
        ).alias("features_raw"),
    )
    fh = FeatureHasher(n_features=512, hash_fn="portable")
    return fh.transform_long(feats, "row_id")


SQL_FEATURE_HASHER_PORTABLE = """
WITH kv AS (
    SELECT l_orderkey * 10 + l_linenumber AS row_id, key, value
    FROM lineitem,
         (VALUES (1), (2), (3)) AS t(slot),
         LATERAL (SELECT CASE slot WHEN 1 THEN 'rf=' || l_returnflag
                                   WHEN 2 THEN 'ls=' || l_linestatus
                                   ELSE 'qty' END AS key,
                         CASE slot WHEN 3 THEN l_quantity ELSE 1.0 END AS value)
)
SELECT row_id,
       CAST(CAST(('0x' || substr(md5(key), 1, 14)) AS BIGINT) % 512 AS INTEGER) AS bucket,
       sum(value * CASE WHEN CAST(('0x' || substr(md5(key), 15, 1)) AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END) AS value
FROM kv
GROUP BY row_id, bucket
HAVING sum(value * CASE WHEN CAST(('0x' || substr(md5(key), 15, 1)) AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END) <> 0
"""


def q_quality_filter(spark, sf_dir):
    """Curation filter (datapipe/text_stats.py::quality_filter) — the
    predicate-only composable form; survivors keyed by doc_id."""
    from dask_ml_spark.datapipe.text_stats import quality_filter

    docs = _t(spark, sf_dir, "documents")
    return quality_filter(docs).select("doc_id", "n_chars")


SQL_QUALITY_FILTER = f"""
WITH s AS (
    SELECT doc_id, n_chars,
           regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks,
           greatest(length(text), 1)::DOUBLE AS safe_chars,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
    FROM documents
)
SELECT doc_id, n_chars FROM s
WHERE len(toks) >= 5
  AND n_digit / safe_chars <= 0.3
  AND len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE >= 0.2
"""


HB_ALPHAS = [1e6, 1e7, 3e7, 1e8, 3e8, 1e9, 3e9, 1e10, 3e10]
HB_MAX_ITER, HB_ETA = 9, 3
HB_BATCH = 50_000


def _hyperband_schedule(R: int = HB_MAX_ITER, eta: int = HB_ETA):
    """Mirror of HyperbandSearchCV._brackets + the engine's ACTUAL
    call accounting (plans/incremental.py: round 0 gives every model
    exactly ONE call; SHA step k then tops the (score desc, id asc)
    top n_k up to r_k total calls). Pure arithmetic in (R, eta) — the
    oracle embeds these as literals, so if the engine ever deviates
    from its own schedule the driver's hash check fails."""
    import math

    s_max = int(math.floor(math.log(R) / math.log(eta)))
    B = (s_max + 1) * R
    out = []
    for s in range(s_max, -1, -1):
        n = int(math.ceil(B / R * eta ** s / (s + 1)))
        r = max(1, int(R * eta ** -s))
        steps, k = [], 0
        while True:  # _sha_steps(n, r, eta, limit=R) mirror
            n_k = max(1, int(math.floor(n * eta ** -k)))
            r_k = min(int(r * eta ** k), R)
            steps.append((n_k, r_k))
            if n_k == 1 or r_k >= R:
                break
            k += 1
        targets = [1] + [rk for (_nk, rk) in steps[1:]]
        keeps = [n] + [nk for (nk, _rk) in steps[1:]]
        total = keeps[0] * targets[0] + sum(
            keeps[i] * (targets[i] - targets[i - 1])
            for i in range(1, len(keeps)))
        out.append({"s": s, "n": n, "targets": targets,
                    "keeps": keeps, "total": total})
    return out


def q_hyperband_best(spark, sf_dir):
    """HyperbandSearchCV (reference _hyperband.py:58-664) made fully
    oracle-able (was rows-only through r7): deterministic_by switches
    the engine's seeded choices to content-deterministic ones (Knuth
    hash split, key-sorted cyclic batches, listed candidates) and the
    model is SufficientStatsRidge, whose state after any batch
    multiset is a closed form of the batch sums — so the SQL replays
    the split, the per-batch sufficient statistics, every rung's
    Cramer-ridge scores, the (score desc, id asc) promotions, and the
    bracket winners. One row per bracket; n_models/partial_fit_calls
    come from the ENGINE's metadata and are checked against the
    schedule arithmetic the oracle embeds. The seeded SGD Hyperband
    stays the production path (tests/test_incremental_search.py)."""
    import math

    from dask_ml_spark.operators.local_estimators import SufficientStatsRidge
    from dask_ml_spark.plans.incremental import HyperbandSearchCV

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"))
    # the full 4-column key: the synthetic lineitem duplicates
    # (l_orderkey, l_linenumber) pairs, and deterministic_by REQUIRES a
    # unique key (the engine validates) — ties would make the key sort
    # and the oracle's row_number silently arbitrary
    hb = HyperbandSearchCV(
        SufficientStatsRidge(),
        [{"alpha": a} for a in HB_ALPHAS],
        max_iter=HB_MAX_ITER, aggressiveness=HB_ETA,
        deterministic_by=["l_orderkey", "l_linenumber",
                          "l_extendedprice", "l_discount"])
    hb.fit(li, ["l_extendedprice", "l_discount"], label_col="label")
    winner = next(s for s, sha in hb._bracket_searches
                  if sha.best_score_ == hb.best_score_)
    rows = []
    for (s, sha), meta in zip(hb._bracket_searches,
                              hb.metadata_["brackets"]):
        rows.append({
            "bracket": int(s),
            "n_models": int(meta["n_models"]),
            "partial_fit_calls": int(meta["partial_fit_calls"]),
            "best_alpha": float(sha.best_params_["alpha"]),
            "best_score": math.floor(sha.best_score_ * 1e6 + 0.5) / 1e6,
            "is_winner": bool(s == winner),
        })
    return spark.createDataFrame(rows).select(
        "bracket", "n_models", "partial_fit_calls",
        "best_alpha", "best_score", "is_winner")


def _sql_incremental_search_best() -> str:
    """Single-bracket SuccessiveHalving replay — the hyperband oracle's
    structure with the standalone schedule: steps for
    (n=6, r=2, eta=3, limit=12) give ranking targets [1, 6, 12] calls
    and keeps [6, 2, 1] (round 0 trains every model exactly ONE call,
    then each SHA step tops the (score desc, id asc) top n_k up to r_k
    — the engine's own accounting, embedded as literals so a schedule
    deviation fails the driver's hash check)."""
    import math

    steps, k = [], 0
    while True:  # _sha_steps(SHA_N, SHA_R, SHA_ETA, limit=SHA_MAX)
        n_k = max(1, int(math.floor(SHA_N * SHA_ETA ** -k)))
        r_k = min(int(SHA_R * SHA_ETA ** k), SHA_MAX)
        steps.append((n_k, r_k))
        if n_k == 1 or r_k >= SHA_MAX:
            break
        k += 1
    targets = [1] + [rk for (_nk, rk) in steps[1:]]
    keeps = [SHA_N] + [nk for (nk, _rk) in steps[1:]]
    calls_vals = ", ".join(f"({c})" for c in sorted(set(targets)))
    cand_vals = ", ".join(f"({i}, {a!r})"
                          for i, a in enumerate(HB_ALPHAS[:SHA_N]))
    stats = ["n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y"]
    wsum = ", ".join(
        f"sum((c // b + CASE WHEN batch < c % b THEN 1 ELSE 0 END) * {x}) AS {x}"
        for x in stats)
    chains = []
    prev = None
    for j, (c, nk) in enumerate(zip(targets, keeps)):
        rung = f"r{j}"
        src = (f"fitsc WHERE c = {c}" if j == 0 else
               f"fitsc JOIN k{j} USING (mid) WHERE c = {c}")
        chains.append(f"{rung} AS (SELECT mid, alpha, score FROM {src})")
        if j + 1 < len(targets):
            chains.append(
                f"k{j + 1} AS (SELECT mid FROM (SELECT mid, "
                f"row_number() OVER (ORDER BY score DESC, mid) AS rk "
                f"FROM {rung}) WHERE rk <= {keeps[j + 1]})")
        prev = rung
    chain_sql = ",\n".join(chains)
    return f"""
WITH split AS (
    SELECT l_extendedprice::DOUBLE AS x1, l_discount AS x2,
           (l_extendedprice * (1 - l_discount))::DOUBLE AS y,
           l_orderkey, l_linenumber, l_extendedprice, l_discount,
           ((((((((0 + l_orderkey) % 2147483648) * 2654435761
                 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761 % 2147483648
             + trunc(l_extendedprice)::BIGINT) % 2147483648)
                 * 2654435761 % 2147483648
             + trunc(l_discount)::BIGINT) % 2147483648) * 2654435761
             % 2147483648 % 10000 AS bucket
    FROM lineitem
),
train AS (
    SELECT * FROM (
        SELECT x1, x2, y,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                  l_extendedprice, l_discount) - 1
                   AS rn
        FROM split WHERE bucket < 8500)
    WHERE rn < 1000000
),
bt AS (
    SELECT rn // {HB_BATCH} AS batch, count(*)::DOUBLE AS n,
           sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
           sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
           sum(x1*y) AS s1y, sum(x2*y) AS s2y
    FROM train GROUP BY 1
),
nb AS (SELECT count(*)::BIGINT AS b FROM bt),
te AS (
    SELECT count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
           sum(y) AS sy, sum(x1*x1) AS s11, sum(x2*x2) AS s22,
           sum(x1*x2) AS s12, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
           sum(y*y) AS syy
    FROM (SELECT * FROM (
              SELECT x1, x2, y,
                     row_number() OVER (ORDER BY l_orderkey,
                                        l_linenumber, l_extendedprice,
                                        l_discount) AS rn2
              FROM split WHERE bucket >= 8500)
          WHERE rn2 <= 500000)
),
calls(c) AS (VALUES {calls_vals}),
st AS (
    SELECT c, {wsum}
    FROM calls CROSS JOIN bt CROSS JOIN nb GROUP BY c
),
cand(mid, alpha) AS (VALUES {cand_vals}),
mom AS (
    SELECT mid, alpha, c,
           s1/n AS m1, s2/n AS m2, sy/n AS my,
           s11/n - (s1/n)*(s1/n) + alpha AS va,
           s12/n - (s1/n)*(s2/n) AS vb,
           s22/n - (s2/n)*(s2/n) + alpha AS vc,
           s1y/n - (s1/n)*(sy/n) AS c1,
           s2y/n - (s2/n)*(sy/n) AS c2
    FROM cand CROSS JOIN st
),
coefs AS (
    SELECT mid, alpha, c,
           (c1*vc - vb*c2) / (va*vc - vb*vb) AS w1,
           (c2*va - vb*c1) / (va*vc - vb*vb) AS w2,
           my - ((c1*vc - vb*c2) / (va*vc - vb*vb) * m1
                 + (c2*va - vb*c1) / (va*vc - vb*vb) * m2) AS b0
    FROM mom
),
fitsc AS (
    SELECT mid, alpha, c,
           1 - (t.syy - 2*w1*t.s1y - 2*w2*t.s2y - 2*b0*t.sy
                + w1*w1*t.s11 + w2*w2*t.s22 + 2*w1*w2*t.s12
                + 2*w1*b0*t.s1 + 2*w2*b0*t.s2 + b0*b0*t.n)
             / (t.syy - t.sy*t.sy/t.n) AS score
    FROM coefs CROSS JOIN te t
),
{chain_sql}
SELECT alpha AS best_alpha,
       floor(score * 1e6 + 0.5) / 1e6 AS best_score,
       {SHA_N}::BIGINT AS n_models
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, mid) AS rk
      FROM {prev}) WHERE rk = 1
"""


def _sql_hyperband_best() -> str:
    """Generated rung-by-rung replay (the kcenter chained-CTE idiom):
    hash split -> per-batch sufficient statistics -> model states for
    every rung target (cyclic batch counts are a closed form of c and
    the batch count) -> Cramer-ridge + expanded test R² per (model,
    calls) -> per-bracket promotion chains -> winners. Schedule
    geometry (targets/keeps/totals) is embedded as literals from
    _hyperband_schedule."""
    sched = _hyperband_schedule()
    all_calls = sorted({c for br in sched for c in br["targets"]})
    calls_vals = ", ".join(f"({c})" for c in all_calls)
    cand_vals = ", ".join(f"({i}, {a!r})" for i, a in enumerate(HB_ALPHAS))
    stats = ["n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y"]
    wsum = ", ".join(
        f"sum((c // b + CASE WHEN batch < c % b THEN 1 ELSE 0 END) * {x}) AS {x}"
        for x in stats)

    # per-bracket promotion chains
    chains, finals = [], []
    for br in sched:
        s, n, targets, keeps = br["s"], br["n"], br["targets"], br["keeps"]
        prev = None
        for k, (c, nk) in enumerate(zip(targets, keeps)):
            rung = f"b{s}r{k}"
            src = (f"fitsc WHERE c = {c} AND mid < {n}" if k == 0 else
                   f"fitsc JOIN b{s}k{k} USING (mid) WHERE c = {c}")
            chains.append(f"{rung} AS (SELECT mid, alpha, score FROM {src})")
            if k + 1 < len(targets):
                nk_next = keeps[k + 1]
                chains.append(
                    f"b{s}k{k + 1} AS (SELECT mid FROM (SELECT mid, "
                    f"row_number() OVER (ORDER BY score DESC, mid) AS rk "
                    f"FROM {rung}) WHERE rk <= {nk_next})")
            prev = rung
        finals.append(
            f"b{s}best AS (SELECT {s} AS bracket, {n} AS n_models, "
            f"{br['total']} AS partial_fit_calls, alpha AS best_alpha, "
            f"score FROM (SELECT *, row_number() OVER "
            f"(ORDER BY score DESC, mid) AS rk FROM {prev}) WHERE rk = 1)")
    union = " UNION ALL ".join(f"SELECT * FROM b{br['s']}best"
                               for br in sched)
    return f"""
WITH split AS (
    SELECT l_extendedprice::DOUBLE AS x1, l_discount AS x2,
           (l_extendedprice * (1 - l_discount))::DOUBLE AS y,
           l_orderkey, l_linenumber, l_extendedprice, l_discount,
           -- 4-key Knuth chain (engine casts doubles to long by
           -- TRUNCATION, hence trunc() here, not ::BIGINT rounding)
           ((((((((0 + l_orderkey) % 2147483648) * 2654435761
                 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761 % 2147483648
             + trunc(l_extendedprice)::BIGINT) % 2147483648)
                 * 2654435761 % 2147483648
             + trunc(l_discount)::BIGINT) % 2147483648) * 2654435761
             % 2147483648 % 10000 AS bucket
    FROM lineitem
),
train AS (
    -- mirrors the engine's _collect_batches cap: the key-sorted train
    -- frame is trimmed to its smallest 1M keys (no-op below the cap)
    SELECT * FROM (
        SELECT x1, x2, y,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                  l_extendedprice, l_discount) - 1
                   AS rn
        FROM split WHERE bucket < 8500)
    WHERE rn < 1000000
),
bt AS (
    SELECT rn // {HB_BATCH} AS batch, count(*)::DOUBLE AS n,
           sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
           sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
           sum(x1*y) AS s1y, sum(x2*y) AS s2y
    FROM train GROUP BY 1
),
nb AS (SELECT count(*)::BIGINT AS b FROM bt),
te AS (
    -- mirrors the engine's 500k key-sorted test cap (no-op below it)
    SELECT count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
           sum(y) AS sy, sum(x1*x1) AS s11, sum(x2*x2) AS s22,
           sum(x1*x2) AS s12, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
           sum(y*y) AS syy
    FROM (SELECT * FROM (
              SELECT x1, x2, y,
                     row_number() OVER (ORDER BY l_orderkey,
                                        l_linenumber, l_extendedprice,
                                        l_discount) AS rn2
              FROM split WHERE bucket >= 8500)
          WHERE rn2 <= 500000)
),
calls(c) AS (VALUES {calls_vals}),
st AS (
    SELECT c, {wsum}
    FROM calls CROSS JOIN bt CROSS JOIN nb GROUP BY c
),
cand(mid, alpha) AS (VALUES {cand_vals}),
mom AS (
    SELECT mid, alpha, c,
           s1/n AS m1, s2/n AS m2, sy/n AS my,
           s11/n - (s1/n)*(s1/n) + alpha AS va,
           s12/n - (s1/n)*(s2/n) AS vb,
           s22/n - (s2/n)*(s2/n) + alpha AS vc,
           s1y/n - (s1/n)*(sy/n) AS c1,
           s2y/n - (s2/n)*(sy/n) AS c2
    FROM cand CROSS JOIN st
),
coefs AS (
    SELECT mid, alpha, c,
           (c1*vc - vb*c2) / (va*vc - vb*vb) AS w1,
           (c2*va - vb*c1) / (va*vc - vb*vb) AS w2,
           my - ((c1*vc - vb*c2) / (va*vc - vb*vb) * m1
                 + (c2*va - vb*c1) / (va*vc - vb*vb) * m2) AS b0
    FROM mom
),
fitsc AS (
    SELECT mid, alpha, c,
           1 - (t.syy - 2*w1*t.s1y - 2*w2*t.s2y - 2*b0*t.sy
                + w1*w1*t.s11 + w2*w2*t.s22 + 2*w1*w2*t.s12
                + 2*w1*b0*t.s1 + 2*w2*b0*t.s2 + b0*b0*t.n)
             / (t.syy - t.sy*t.sy/t.n) AS score
    FROM coefs CROSS JOIN te t
),
{", ".join(chains)},
{", ".join(finals)},
allb AS ({union}),
win AS (
    SELECT bracket FROM (
        SELECT bracket, row_number() OVER
            (ORDER BY score DESC, bracket DESC) AS rk
        FROM allb) WHERE rk = 1
)
SELECT bracket::BIGINT AS bracket, n_models::BIGINT AS n_models,
       partial_fit_calls::BIGINT AS partial_fit_calls,
       best_alpha::DOUBLE AS best_alpha,
       floor(score * 1e6 + 0.5) / 1e6 AS best_score,
       bracket = (SELECT bracket FROM win) AS is_winner
FROM allb
"""


def q_weighted_metrics(spark, sf_dir):
    """Weighted metric aggregates (reference passes sample_weight
    through sklearn formulas): sum(w*x)/sum(w) shape, one pass."""
    from dask_ml_spark.functions.metrics import accuracy_expr, mse_expr

    li = _t(spark, sf_dir, "lineitem")
    y = (F.col("l_returnflag") == "R").cast("double")
    pred = (F.col("l_discount") > 0.05).cast("double")
    w = F.col("l_tax") + 0.01
    yr = F.col("l_extendedprice")
    pr = F.col("l_quantity") * 2000.0
    # weighted_accuracy exercises the library expr (an O(1) ratio —
    # self-normalizing, plan-shape safe); weighted_mse is an ~1e9-scale
    # ratio whose raw-double numerator drifts past the hash grid, so the
    # catalog rendering uses the decimal-exact form of the SAME formula
    # (mse_expr itself — the production path — is pytest-pinned).
    return li.agg(
        accuracy_expr(y, pred, w).alias("weighted_accuracy"),
        (_dsum_wide(w * F.pow(pr - yr, 2)) / _dsum(w)).alias("weighted_mse"),
        _dsum(w).alias("sum_w"),
    )


SQL_WEIGHTED_METRICS = """
SELECT sum((l_tax + 0.01) * CASE WHEN (CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) =
                                      (CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END)
                                 THEN 1.0 ELSE 0.0 END) / sum(l_tax + 0.01) AS weighted_accuracy,
       CAST(sum(CAST(floor((l_tax + 0.01) * pow(l_quantity * 2000.0 - l_extendedprice, 2) * 10000 + 0.5) / 10000 AS DECIMAL(27,4))) AS DOUBLE)
           / (CAST(sum(CAST(floor((l_tax + 0.01) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS weighted_mse,
       (CAST(sum(CAST(floor((l_tax + 0.01) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000) AS sum_w
FROM lineitem
"""


def q_pipeline_poly_scale(spark, sf_dir):
    """compose.Pipeline chaining StandardScaler -> PolynomialFeatures
    (reference compose/_column_transformer.py + Pipeline semantics):
    fitted state folds into one fused projection — no UDF, no shuffle."""
    from dask_ml_spark.operators.compose import Pipeline
    from dask_ml_spark.operators.preprocessing import PolynomialFeatures, StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline([
        ("scale", StandardScaler()),
        ("poly", PolynomialFeatures(degree=2, include_bias=False)),
    ])
    pipe.fit(li, ["l_quantity", "l_discount"])
    out = pipe.transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("z_quantity"),
        F.col("l_discount").alias("z_discount"),
        F.col("l_quantity^2").alias("z_quantity_sq"),
        F.col("l_quantity l_discount").alias("z_cross"),
        F.col("l_discount^2").alias("z_discount_sq"),
    )


SQL_PIPELINE_POLY_SCALE = """
WITH z AS (
    SELECT l_orderkey, l_linenumber,
           (l_quantity - avg(l_quantity) OVER ()) / stddev_pop(l_quantity) OVER () AS zq,
           (l_discount - avg(l_discount) OVER ()) / stddev_pop(l_discount) OVER () AS zd
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       zq AS z_quantity, zd AS z_discount,
       zq * zq AS z_quantity_sq, zq * zd AS z_cross, zd * zd AS z_discount_sq
FROM z
"""


def q_simple_imputer_transform(spark, sf_dir):
    """SimpleImputer transform path (reference impute.py fillna): nulls
    fabricated from zero discounts, filled with the fitted mean — fit is
    one aggregate, transform a pure coalesce projection."""
    from dask_ml_spark.operators.preprocessing import SimpleImputer

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "d2", F.when(F.col("l_discount") == 0, None).otherwise(F.col("l_discount"))
    )
    imp = SimpleImputer(strategy="mean").fit(li, ["d2"])
    return imp.transform(li).select("l_orderkey", "l_linenumber", "d2")


SQL_SIMPLE_IMPUTER_TRANSFORM = """
WITH s AS (
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS d2
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       coalesce(d2, (SELECT avg(d2) FROM s)) AS d2
FROM s
"""


def q_column_transformer(spark, sf_dir):
    """compose.ColumnTransformer (reference _column_transformer.py:12-219):
    standard-scale two measures, min-max a third — different fitted
    transformers per column subset, one fused projection."""
    from dask_ml_spark.operators.compose import ColumnTransformer
    from dask_ml_spark.operators.preprocessing import MinMaxScaler, StandardScaler

    li = _t(spark, sf_dir, "lineitem")
    ct = ColumnTransformer([
        ("std", StandardScaler(), ["l_quantity", "l_extendedprice"]),
        ("mm", MinMaxScaler(), ["l_discount"]),
    ])
    out = ct.fit(li).transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("z_quantity"),
        F.col("l_extendedprice").alias("z_price"),
        F.col("l_discount").alias("mm_discount"),
    )


SQL_COLUMN_TRANSFORMER = """
SELECT l_orderkey, l_linenumber,
       (l_quantity - avg(l_quantity) OVER ()) / stddev_pop(l_quantity) OVER () AS z_quantity,
       (l_extendedprice - avg(l_extendedprice) OVER ()) / stddev_pop(l_extendedprice) OVER () AS z_price,
       (l_discount - min(l_discount) OVER ()) / (max(l_discount) OVER () - min(l_discount) OVER ()) AS mm_discount
FROM lineitem
"""


def q_parallel_post_fit_eval(spark, sf_dir):
    """ParallelPostFit (reference wrappers.py:298-401): driver-side fit
    on a sample, broadcast-model Arrow predict over the full table,
    metric aggregate. The fit sample is selected by the engine-portable
    content hash (same Knuth-bucket arithmetic as stratified_sample)
    instead of an order-dependent limit(), so the SQL oracle can
    reproduce the exact training subset and verify the full
    fit→broadcast→predict→metric loop by value."""
    from dask_ml_spark.functions.metrics import accuracy_expr
    from dask_ml_spark.operators.local_estimators import CentroidClassifier
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.operators.wrappers import ParallelPostFit
    from dask_ml_spark.plans.model_selection import _hash_bucket_expr

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    scaled = StandardScaler().fit(li, cols).transform(li)
    bucket = _hash_bucket_expr(["l_orderkey", "l_linenumber"], 10_000, 0, df=scaled)
    sample = scaled.where(bucket < F.lit(1000))  # content-chosen ~10%
    ppf = ParallelPostFit(CentroidClassifier())
    ppf.fit(sample, cols, label_col="label")
    pred = ppf.predict(scaled)
    return pred.agg(
        accuracy_expr(F.col("label"), F.col("prediction")).alias("accuracy"),
        F.count("*").alias("n"),
    )


def sql_parallel_post_fit_eval() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    feats = [f"f{i}" for i in range(len(cols))]
    scaled = ", ".join(
        f"({c} - avg({c}) OVER ()) / stddev_pop({c}) OVER () AS {f}"
        for c, f in zip(cols, feats)
    )
    # same Knuth chain as _hash_bucket_expr over (l_orderkey, l_linenumber)
    hash_expr = ("(((((((0 + l_orderkey) % 2147483648) * 2654435761) % 2147483648)"
                 " + l_linenumber) % 2147483648) * 2654435761) % 2147483648 % 10000")
    cent = ", ".join(f"avg({f}) AS c{f}" for f in feats)
    pv = ", ".join(
        f"max(CASE WHEN label = {lab} THEN c{f} END) AS {tag}{f}"
        for lab, tag in ((0.0, "a"), (1.0, "b")) for f in feats
    )
    d0 = " + ".join(f"(s.{f} - pv.a{f}) * (s.{f} - pv.a{f})" for f in feats)
    d1 = " + ".join(f"(s.{f} - pv.b{f}) * (s.{f} - pv.b{f})" for f in feats)
    return f"""
WITH scaled AS (
    SELECT l_orderkey, l_linenumber, {scaled},
           CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label
    FROM lineitem
),
samp AS (SELECT * FROM scaled WHERE {hash_expr} < 1000),
cent AS (SELECT label, {cent} FROM samp GROUP BY label),
pv AS (SELECT {pv} FROM cent),
pred AS (
    SELECT label, CASE WHEN ({d0}) <= ({d1}) THEN 0.0 ELSE 1.0 END AS prediction
    FROM scaled s CROSS JOIN pv
)
SELECT avg(CASE WHEN prediction = label THEN 1.0 ELSE 0.0 END) AS accuracy,
       count(*) AS n
FROM pred
"""


def q_robust_scaler_transform(spark, sf_dir):
    """RobustScaler transform path: (x - median)/IQR with the fitted
    exact quantiles folded in as literals."""
    from dask_ml_spark.operators.preprocessing import RobustScaler

    li = _t(spark, sf_dir, "lineitem")
    sc = RobustScaler().fit(li, ["l_quantity", "l_extendedprice"])
    return sc.transform(li).select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("r_quantity"),
        F.col("l_extendedprice").alias("r_price"),
    )


SQL_ROBUST_SCALER_TRANSFORM = """
WITH q AS (
    SELECT quantile_cont(l_quantity, 0.25) AS q1_q, quantile_cont(l_quantity, 0.5) AS med_q,
           quantile_cont(l_quantity, 0.75) AS q3_q,
           quantile_cont(l_extendedprice, 0.25) AS q1_p, quantile_cont(l_extendedprice, 0.5) AS med_p,
           quantile_cont(l_extendedprice, 0.75) AS q3_p
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       (l_quantity - med_q) / (q3_q - q1_q) AS r_quantity,
       (l_extendedprice - med_p) / (q3_p - q1_p) AS r_price
FROM lineitem, q
"""


def q_label_encoder_roundtrip(spark, sf_dir):
    """LabelEncoder transform -> inverse_transform round-trip
    (reference label.py:146-196): codes come back as the original
    labels; the oracle is an identity projection."""
    from dask_ml_spark.operators.encoders import LabelEncoder

    o = _t(spark, sf_dir, "orders")
    le = LabelEncoder().fit(o, "o_orderpriority")
    coded = le.transform(o, output_col="code")
    back = le.inverse_transform(coded, "code", output_col="decoded")
    return back.select("o_orderkey", F.col("decoded").alias("o_orderpriority_rt"))


SQL_LABEL_ENCODER_ROUNDTRIP = """
SELECT o_orderkey, o_orderpriority AS o_orderpriority_rt FROM orders
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


PIPE_GRID_C = [0.2, 2.0, 20.0]


def q_pipeline_grid_search(spark, sf_dir):
    """GridSearchCV over a Pipeline with step__param candidates —
    exercises prefix sharing (ONE scaler fit per fold, cached
    transformed folds, final-stage candidates race over them;
    reference _search.py:619-749) — and, since r7, every value is
    oracle-verified: content-deterministic HashKFold folds + a
    StandardScaler prefix + one-step-exact newton ridge let the SQL
    replay fold hash, per-fold train mean/std, the scaled-space
    penalized normal equations (which DECOUPLE the intercept: scaled
    features have exact zero train mean), the back-substituted
    raw-space coefficients, held-out R², and candidate ranking."""
    from dask_ml_spark.operators.compose import Pipeline
    from dask_ml_spark.operators.linear_model import LinearRegression
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.plans.model_selection import GridSearchCV, HashKFold

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "label", F.col("l_extendedprice").cast("double"))
    gs = GridSearchCV(
        Pipeline([("scale", StandardScaler()),
                  ("ridge", LinearRegression(penalty="l2", solver="newton"))]),
        {"ridge__C": PIPE_GRID_C},
        cv=HashKFold(n_splits=3, key_cols=["l_orderkey", "l_linenumber"]),
        refit=False, n_jobs=6)
    gs.fit(li, ["l_quantity", "l_discount"], label_col="label")
    rows = [
        {"C": float(p["ridge__C"]), "mean_r2": round(float(s), 6)}
        for p, s in zip(gs.cv_results_["params"],
                        gs.cv_results_["mean_test_score"])
    ]
    best = max(r["mean_r2"] for r in rows)
    for r in rows:
        r["is_best"] = r["mean_r2"] == best
    return spark.createDataFrame(rows).select("C", "mean_r2", "is_best")


def _sql_pipeline_grid_search() -> str:
    """Replay the PIPELINE search in SQL: Knuth-hash fold ids, per-fold
    sufficient statistics (train sums = total − held-out fold), the
    TRAIN-fold scaler (population mean/std — fit on train only, no
    leakage), then the ridge normal equations in SCALED space, where
    the train means are exactly zero so the intercept decouples:

        [1+1/C  g12 ] [w1]   [c1]
        [g12  1+1/C ] [w2] = [c2],   b = ybar_train

    with g12 the train correlation and c1/c2 the scaled feature-label
    covariances — all pure algebra over the raw sums. Coefficients
    back-substitute to raw space (W = w/sd, B = b − Σ w·m/sd) and the
    held-out R² expands in the test fold's raw sufficient statistics."""
    cand = ", ".join(f"({c!r})" for c in PIPE_GRID_C)
    den = "((1.0+1.0/c)*(1.0+1.0/c) - g12*g12)"
    u1 = f"((c1*(1.0+1.0/c) - g12*c2) / {den})"  # scaled-space w1
    u2 = f"((c2*(1.0+1.0/c) - g12*c1) / {den})"  # scaled-space w2
    return f"""
WITH f AS (
    SELECT l_quantity AS x1, l_discount AS x2,
           l_extendedprice::DOUBLE AS y,
           ((((0 + l_orderkey) % 2147483648) * 2654435761 % 2147483648
             + l_linenumber) % 2147483648) * 2654435761
             % 2147483648 % 10000 % 3 AS fold
    FROM lineitem
),
per AS (
    SELECT fold, count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
           sum(y) AS sy, sum(x1*x1) AS s11, sum(x2*x2) AS s22,
           sum(x1*x2) AS s12, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
           sum(y*y) AS syy
    FROM f GROUP BY fold
),
tot AS (
    SELECT sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2, sum(sy) AS sy,
           sum(s11) AS s11, sum(s22) AS s22, sum(s12) AS s12,
           sum(s1y) AS s1y, sum(s2y) AS s2y
    FROM per
),
tr AS (
    SELECT p.fold, t.n - p.n AS n, t.s1 - p.s1 AS s1, t.s2 - p.s2 AS s2,
           t.sy - p.sy AS sy, t.s11 - p.s11 AS s11, t.s22 - p.s22 AS s22,
           t.s12 - p.s12 AS s12, t.s1y - p.s1y AS s1y, t.s2y - p.s2y AS s2y
    FROM per p CROSS JOIN tot t
),
sm AS (
    SELECT fold, sy/n AS ybar, s1/n AS m1, s2/n AS m2,
           sqrt(s11/n - (s1/n)*(s1/n)) AS sd1,
           sqrt(s22/n - (s2/n)*(s2/n)) AS sd2,
           (s12/n - (s1/n)*(s2/n))
             / (sqrt(s11/n - (s1/n)*(s1/n)) * sqrt(s22/n - (s2/n)*(s2/n)))
             AS g12,
           (s1y/n - (s1/n)*(sy/n)) / sqrt(s11/n - (s1/n)*(s1/n)) AS c1,
           (s2y/n - (s2/n)*(sy/n)) / sqrt(s22/n - (s2/n)*(s2/n)) AS c2
    FROM tr
),
cand(c) AS (VALUES {cand}),
coef AS (
    SELECT fold, c,
           {u1} / sd1 AS w1,
           {u2} / sd2 AS w2,
           ybar - {u1} * m1 / sd1 - {u2} * m2 / sd2 AS b
    FROM sm CROSS JOIN cand
),
scored AS (
    SELECT coef.c, coef.fold,
      1 - (p.syy - 2*w1*p.s1y - 2*w2*p.s2y - 2*b*p.sy
           + w1*w1*p.s11 + w2*w2*p.s22 + 2*w1*w2*p.s12
           + 2*w1*b*p.s1 + 2*w2*b*p.s2 + b*b*p.n)
        / (p.syy - p.sy*p.sy/p.n) AS r2
    FROM coef JOIN per p ON coef.fold = p.fold
),
means AS (SELECT c, round(avg(r2), 6) AS mean_r2 FROM scored GROUP BY c)
SELECT c AS "C", mean_r2,
       mean_r2 = (SELECT max(mean_r2) FROM means) AS is_best
FROM means
"""


def q_curation_pipeline(spark, sf_dir):
    """North-star composite: the full curation flow a training-data
    pipeline runs — quality filter → exact dedup (keep smallest id per
    normalized-content hash) → keep English docs. Every stage is the
    library operator; the whole flow is one Catalyst plan."""
    from dask_ml_spark.datapipe.dedup import exact_dedup
    from dask_ml_spark.datapipe.text_stats import language_scores, quality_filter

    docs = _t(spark, sf_dir, "documents")
    # persist the two fan-out points: q feeds dedup AND the keep-join,
    # kept feeds language scoring AND the final join — without the
    # caches the regexp-heavy filter re-runs once per reference.
    # explicit repartition BEFORE the persist: downstream filters on
    # computed columns push below exchanges into the cache scan, so
    # the CACHE's own partition count bounds the parallelism of every
    # regex-heavy consumer — and AQE would coalesce the join output to
    # ~2 partitions here (30 MB of text). A user-specified repartition
    # is AQE-exempt.
    dp = spark.sparkContext.defaultParallelism
    q = quality_filter(docs).persist()
    survivors = exact_dedup(q).select("doc_id")
    kept = q.join(survivors, "doc_id").repartition(dp, "doc_id").persist()
    en = (
        language_scores(kept)
        .where(F.col("lang_pred") == "en")
        .select("doc_id")
    )
    return kept.join(en, "doc_id").select("doc_id", "n_chars", "source")


def sql_curation_pipeline() -> str:
    langs = sorted(TS.STOPWORDS)
    scores = ", ".join(f"{_sql_lang_score(l)} AS score_{l}" for l in langs)
    conds = []
    for lang in langs:
        cmp = " AND ".join(
            f"score_{lang} {'>' if other < lang else '>='} score_{other}"
            for other in langs if other != lang
        )
        conds.append(f"WHEN {cmp} THEN '{lang}'")
    case = "CASE " + " ".join(conds) + f" ELSE '{langs[0]}' END"
    return f"""
WITH q AS (
    SELECT doc_id, n_chars, source, text FROM (
        SELECT *, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks,
               greatest(length(text), 1)::DOUBLE AS safe_chars,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
        FROM documents
    )
    WHERE len(toks) >= 5
      AND n_digit / safe_chars <= 0.3
      AND len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE >= 0.2
), dd AS (
    SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), ' ')) AS h
        FROM q
    ) GROUP BY h
), kept AS (
    SELECT q.doc_id, q.n_chars, q.source, q.text FROM q JOIN dd USING (doc_id)
), scored AS (
    SELECT doc_id, {scores} FROM kept
), en AS (
    SELECT doc_id FROM scored WHERE {case} = 'en'
)
SELECT kept.doc_id, kept.n_chars, kept.source FROM kept JOIN en USING (doc_id)
"""


HOEFFD_BINS = 128


def q_hoeffding_price_quantity(spark, sf_dir):
    """Hoeffding's D independence test, binned scale path (functions/
    stats.py::hoeffding_d) — the NON-monotone dependence screen:
    Pearson/Spearman/Kendall all measure monotone association and
    return ~0 on a V-shaped or sign-symmetric coupling; D estimates
    30·∫(F₁₂ − F₁F₂)²dF₁₂, nonzero for ANY dependence. Same plan
    shape as kendall_tau_binned: one min/max aggregate + ONE
    groupBy(bucket_a, bucket_b) count ≤K² cells, then an O(K²)
    exact-bignum prefix sweep assembles the three Hoeffding sums from
    quarter-tie bivariate ranks. The oracle replays the cell grid
    with dense-grid HUGEINT window cumsums — bit-for-bit up to the
    final float divisions; p is the documented Blum–Kiefer–Rosenblatt
    dominant-eigenvalue tail, identical literal constants in both
    engines."""
    from dask_ml_spark.functions.stats import hoeffding_d

    li = _t(spark, sf_dir, "lineitem")
    out = hoeffding_d(li, "l_extendedprice", "l_quantity",
                      bins=HOEFFD_BINS)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return out.select("n", r6(F.col("d")).alias("d"),
                      r6(F.col("p_value")).alias("p_value"))


def _sql_hoeffding_price_quantity() -> str:
    from dask_ml_spark.functions.stats import (
        _HOEFFD_C0, _HOEFFD_LAM1, _normal_sf_sql)

    K = HOEFFD_BINS
    sf = _normal_sf_sql("sqrt((x + 1.0/36.0) / {lam})".format(
        lam=repr(_HOEFFD_LAM1)))
    return f"""
WITH k AS (
    SELECT l_extendedprice::DOUBLE AS a, l_quantity::DOUBLE AS b
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
), lim AS (
    SELECT min(a) AS la, max(a) AS ha, min(b) AS lb, max(b) AS hb FROM k
), w AS (
    SELECT la, lb,
           CASE WHEN ha = la THEN 1.0 ELSE ha - la END AS wa,
           CASE WHEN hb = lb THEN 1.0 ELSE hb - lb END AS wb
    FROM lim
), cells AS (
    SELECT CAST(least({K - 1}, floor((a - (SELECT la FROM w))
                                     / (SELECT wa FROM w) * {K}))
                AS BIGINT) AS ba,
           CAST(least({K - 1}, floor((b - (SELECT lb FROM w))
                                     / (SELECT wb FROM w) * {K}))
                AS BIGINT) AS bb,
           count(*)::HUGEINT AS c
    FROM k GROUP BY 1, 2
), grid AS (
    SELECT ga.range AS gi, gb.range AS gj
    FROM range({K}) ga CROSS JOIN range({K}) gb
), dense AS (
    SELECT gi, gj, coalesce(cells.c, 0::HUGEINT) AS c
    FROM grid LEFT JOIN cells ON cells.ba = gi AND cells.bb = gj
), rowcum AS (
    SELECT gi, gj,
           sum(c) OVER (PARTITION BY gi ORDER BY gj
                        ROWS UNBOUNDED PRECEDING) AS rc
    FROM dense
), pref AS (
    -- P(gi, gj) = sum of cells with ba <= gi AND bb <= gj
    SELECT gi, gj,
           sum(rc) OVER (PARTITION BY gj ORDER BY gi
                         ROWS UNBOUNDED PRECEDING) AS p2
    FROM rowcum
), amarg AS (
    -- doubled tie-averaged mid-rank per a-bucket: 2R = 2·cuminc − t + 1
    SELECT ba, 2 * sum(t) OVER (ORDER BY ba ROWS UNBOUNDED PRECEDING)
               - t + 1 AS r2
    FROM (SELECT ba, sum(c) AS t FROM cells GROUP BY ba)
), bmarg AS (
    SELECT bb, 2 * sum(u) OVER (ORDER BY bb ROWS UNBOUNDED PRECEDING)
               - u + 1 AS s2
    FROM (SELECT bb, sum(u2.c) AS u FROM cells u2 GROUP BY bb)
), percell AS (
    -- quadrupled quarter-tie bivariate rank:
    -- 4Q = 4 + 4·P(strict both) + 2·(rowBelow + colBelow) + (c − 1)
    --    = 3 + c + 2·(pref(ba−1, bb) + pref(ba, bb−1))   [algebra]
    SELECT x.c, am.r2, bm.s2,
           3 + x.c + 2 * (coalesce(plj.p2, 0::HUGEINT)
                          + coalesce(pjl.p2, 0::HUGEINT)) AS q4
    FROM cells x
    JOIN amarg am ON am.ba = x.ba
    JOIN bmarg bm ON bm.bb = x.bb
    LEFT JOIN pref plj ON plj.gi = x.ba - 1 AND plj.gj = x.bb
    LEFT JOIN pref pjl ON pjl.gi = x.ba AND pjl.gj = x.bb - 1
), sums AS (
    SELECT sum(c * (q4 - 4) * (q4 - 8)) AS n1,
           sum(c * (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)) AS n2,
           sum(c * (r2 - 4) * (s2 - 4) * (q4 - 4)) AS n3,
           sum(c) AS n
    FROM percell
), dd AS (
    SELECT n,
           (30 * ((n - 2) * (n - 3) * n1 + n2 - 2 * (n - 2) * n3))::DOUBLE
           / (16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4))::DOUBLE AS d
    FROM sums
), st AS (
    SELECT n, d, n::DOUBLE * d / 30.0 AS x FROM dd
)
SELECT n::BIGINT AS n,
       floor(d * 1e6 + 0.5) / 1e6 AS d,
       floor(CASE WHEN x + 1.0/36.0 <= 0.0 THEN 1.0
                  ELSE least(1.0, {repr(_HOEFFD_C0)} * 2.0 * {sf})
             END * 1e6 + 0.5) / 1e6 AS p_value
FROM st
"""
