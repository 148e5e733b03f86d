"""Window function coverage: ranking, value, and aggregate window
functions with ROWS and RANGE frames.

Reference: WindowAggregateOperator.java:78, frames at
operator/window/WindowFrame.java:24-34, ranking fns window/range/*,
value fns window/value/* (SURVEY.md §2.6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pinot_spark.catalog import load_tables
from pinot_spark.queries import query, _r2, _r4


@query(
    "window_rank_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
             dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    WHERE rn <= 3 ORDER BY c_mktsegment, rn
    """,
)
def window_rank_topn_per_group(spark, sf_dir):
    """RANK / DENSE_RANK / ROW_NUMBER top-N per group
    (RankWindowFunction, DenseRankWindowFunction, RowNumberWindowFunction)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    """Running aggregate over ROWS frame (window/aggregate/ sliding SUM)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey", _r2(F.sum("o_totalprice").over(w)).alias("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
           lag(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2_price
    FROM orders WHERE o_custkey < 30 ORDER BY o_custkey, o_orderkey
    """,
)
def window_lead_lag(spark, sf_dir):
    """LEAD / LAG with offset + default (LeadValueWindowFunction,
    LagValueWindowFunction)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_first_last_ntile",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           first_value(s_name) OVER w AS first_name,
           last_value(s_name)  OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_name,
           ntile(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def window_first_last_ntile(spark, sf_dir):
    """FIRST_VALUE / LAST_VALUE (full frame) / NTILE
    (FirstValueWindowFunction, LastValueWindowFunction, NtileWindowFunction)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t["supplier"]
        .select(
            "s_suppkey",
            "s_acctbal",
            F.first("s_name").over(w).alias("first_name"),
            F.last("s_name").over(w_full).alias("last_name"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "window_sliding_rows_frame",
    oracle="""
    SELECT o_orderkey,
           round(avg(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS ma5,
           min(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3
    FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """,
)
def window_sliding_rows_frame(spark, sf_dir):
    """Bounded sliding ROWS frame (WindowFrame.java ROWS k PRECEDING/FOLLOWING)."""
    t = load_tables(spark, sf_dir)
    base = Window.orderBy("o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            _r4(F.avg("o_totalprice").over(base.rowsBetween(-2, 2))).alias("ma5"),
            F.min("o_totalprice").over(base.rowsBetween(-2, 0)).alias("min3"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
    FROM orders WHERE o_custkey < 20 ORDER BY o_orderkey
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame with numeric offset (WindowFrame.java:24-34 RANGE)."""
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, 0)
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 20)
        .select("o_orderkey", "o_totalprice", F.count("*").over(w).alias("n_within_10k"))
        .orderBy("o_orderkey")
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 4) AS pct_rank,
           round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 4) AS cume
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def window_percent_cume(spark, sf_dir):
    """PERCENT_RANK / CUME_DIST."""
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            _r4(F.percent_rank().over(w)).alias("pct_rank"),
            _r4(F.cume_dist().over(w)).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@query(
    "window_frame_exclude",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER w - o_totalprice, 2) AS sum_excl_current,
           round((sum(o_totalprice) OVER w - o_totalprice)
                 / nullif(count(*) OVER w - 1, 0), 4) AS avg_excl_current
    FROM orders WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_frame_exclude(spark, sf_dir):
    """Window frame EXCLUDE CURRENT ROW
    (reference operator/window/WindowFrame.java:24-34 EXCLUDE modes —
    Spark has no EXCLUDE clause, so the rewrite is frame-aggregate minus
    the current row's contribution: SUM−v, AVG=(SUM−v)/(COUNT−1).  The
    same subtraction pattern covers EXCLUDE GROUP with a per-peer-group
    pre-aggregate."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 2)
    )
    price = F.col("o_totalprice")
    sum_x = F.sum(price).over(w) - price
    cnt_x = F.count("*").over(w) - F.lit(1)
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            _r2(sum_x).alias("sum_excl_current"),
            _r4(sum_x / F.nullif(cnt_x, F.lit(0))).alias("avg_excl_current"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
