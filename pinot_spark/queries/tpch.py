"""TPC-H-shaped core relational queries (SSE+MSE parity: scan, filter,
agg, group-by, order-by, join — reference: TPCHQueryIntegrationTest.java:56).
Adapted to the driver's synthetic star schema (dates span 1995-2001).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pinot_spark.catalog import load_tables
from pinot_spark.queries import query, _r2, _r4, dsum2, dsum_exact

# ---------------------------------------------------------------------------
# TPC-H-shaped core relational queries (SSE+MSE parity: scan, filter, agg,
# group-by, order-by, join — reference: TPCHQueryIntegrationTest.java:56)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE                                          AS sum_qty,
           round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)::DOUBLE                                     AS sum_base_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE                  AS sum_disc_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2)::DOUBLE    AS sum_charge,
           round(avg(l_quantity), 4)                                          AS avg_qty,
           round(avg(l_extendedprice), 4)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan partial/final aggregation.

    Pinot shape: AggregationOperator + GroupByCombine + broker reduce
    (pinot-core/.../operator/query/GroupByOperator.java:54). Spark:
    single HashAggregate pair, shipdate filter pushed to parquet.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    # dsum2 inputs as SQL text: the whole micros-sum parses in one py4j
    # round trip per aggregate (see dsum2) — same Catalyst tree as the
    # Column build.
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum2("l_quantity").alias("sum_qty"),
            dsum2("l_extendedprice").alias("sum_base_price"),
            dsum2(disc_price).alias("sum_disc_price"),
            dsum2(charge).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + global agg (predicate pushdown showcase)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum2("l_extendedprice * l_discount").alias("revenue"))
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           CAST(o_orderdate AS DATE)                         AS orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k (TakeOrderedAndProject)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum2("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; nation/region broadcast (Pinot dimension-table
    lookup joins — LookupJoinOperator.java:56 → broadcast hash join)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum2("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes, adapted to the driver's synthetic schema
# (no partsupp table, no commit/receipt dates — each query keeps the
# original's OPERATOR shape: correlated subqueries, scalar subqueries,
# exists/not-exists, window-over-agg, CASE-sum pivots).
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost, l_suppkey) AS rn
        FROM costs
    )
    SELECT p_partkey, p_name, s_name, round(unit_cost, 2) AS min_cost
    FROM part, ranked, supplier
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND rn = 1 AND p_size <= 5
    ORDER BY min_cost, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part cheapest supplier (correlated-min →
    window rank over a grouped sub-aggregate; partsupp is synthesized
    from lineitem). Pinot: MSE join + window
    (pinot-query-runtime/.../operator/WindowAggregateOperator.java:78)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    costs = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = costs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        t["part"]
        .filter(F.col("p_size") <= 5)
        .join(best, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("unit_cost", 2).alias("min_cost"),
        )
        .orderBy("min_cost", "p_partkey")
        .limit(100)
    )


@query(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(CAST(volume AS DECIMAL(38,6))), 2)::DOUBLE AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bi-directional nation-pair revenue by year. Self-joined
    broadcast dims (nation ×2) + disjunctive pair predicate."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(
            F.col("l_shipdate").between(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum2("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3'
                          THEN CAST(volume AS DECIMAL(38,6)) ELSE 0 END)::DOUBLE
                 / sum(CAST(volume AS DECIMAL(38,6)))::DOUBLE, 4) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — conditional-sum ratio over an
    8-way join (Pinot: CASE transform + SUM, reference
    CaseTransformFunction.java; Spark: when()+sum, exact decimal sums
    so the ratio is order-independent)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    # round-17: a dsum_exact micros build was interleave-A/B'd and REVERTED
    # here — q8's sums run over the small post-join subset, so the decimal
    # parse never dominates and the bigger micros expression tree lost
    # ~0.05s/run in planning (0.740 -> 0.787 median). See OPTIMIZATION_r17.md.
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    joined = (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_type") == "ECONOMY"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"]).filter(F.col("r_name") == "ASIA"),
              F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    num = F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(38,6)")))
    den = F.sum(vol)
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(F.round(num.cast("double") / den.cast("double"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           round(sum(CAST(amount AS DECIMAL(38,6))), 2)::DOUBLE AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * 0.1 AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-line profit per nation/year. Supply cost proxied
    by retailprice*qty*0.1 (no partsupp in the synthetic schema); LIKE
    predicate on p_name exercises the scan-filter path."""
    t = load_tables(spark, sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").like("%widget%")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum2("amount").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH value_per_part AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS part_value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_0', 'NATION_1')
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(part_value, 2)::DOUBLE AS part_value
    FROM value_per_part
    WHERE part_value > (SELECT sum(part_value) * 0.001 FROM value_per_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts above a global-fraction threshold — scalar
    subquery over the same grouped aggregate (Pinot MSE spool/WITH reuse,
    SURVEY.md §2.6). The scalar side is a 1-row broadcast."""
    t = load_tables(spark, sf_dir)
    vpp = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name").isin("NATION_0", "NATION_1"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum_exact("l_extendedprice").alias("part_value"))
    )
    threshold = vpp.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        vpp.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT year(l_shipdate) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-sum pivot over late shipments (shipmode is
    absent; lateness = shipped >60 days after order date)."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — CTE reused by
    a scalar-max subquery (revenue values rounded to exact 2dp before the
    equality so both engines compare identical doubles)."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct-supplier counts with a NOT-IN anti-join
    exclusion (Pinot MSE left-anti join, HashJoinOperator.java:170)."""
    t = load_tables(spark, sf_dir)
    bad_suppliers = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["part"]
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
        )
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice AS DECIMAL(38,6))) / 7.0, 2)::DOUBLE
             AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated-average subquery → grouped threshold join
    (quantities are integer-valued so avg is order-independent)."""
    t = load_tables(spark, sf_dir)
    thresholds = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_brand") == "Brand#1"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100)
    ORDER BY s_suppkey
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery with HAVING → aggregate + left-semi
    join (Pinot dynamic-broadcast semi join,
    PinotJoinToDynamicBroadcastRule.java)."""
    t = load_tables(spark, sf_dir)
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["part"].filter(F.col("p_type") == "SMALL"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_suppkey")
    )


@query(
    "q21_last_shipper_in_order",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_last_shipper_in_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS (left-semi, non-equi) + NOT EXISTS
    (left-anti, non-equi over shipdate) on multi-supplier finished
    orders (receipt/commit dates absent → lateness = shipped last)."""
    t = load_tables(spark, sf_dir)
    l1 = t["lineitem"].select(
        F.col("l_orderkey").alias("o1_key"),
        F.col("l_suppkey").alias("s1_key"),
        F.col("l_shipdate").alias("d1_ship"),
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = t["lineitem"].select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
        F.col("l_shipdate").alias("d3_ship"),
    )
    waiting = (
        l1.join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("o1_key"),
            "left_semi",
        )
        .join(
            l2,
            (F.col("o2_key") == F.col("o1_key")) & (F.col("s2_key") != F.col("s1_key")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3_key") == F.col("o1_key"))
            & (F.col("s3_key") != F.col("s1_key"))
            & (F.col("d3_ship") > F.col("d1_ship")),
            "left_anti",
        )
    )
    return (
        waiting.join(t["supplier"], F.col("s_suppkey") == F.col("s1_key"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
