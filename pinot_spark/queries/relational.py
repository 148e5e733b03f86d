"""Relational operator coverage: join variants (semi/anti/outer/non-equi),
set ops, DISTINCT, GROUPING SETS/ROLLUP/CUBE, HAVING, FILTER-clause aggs,
CTE/subqueries, VALUES, UNNEST.

Reference: SURVEY.md §2.5 (BaseJoinOperator.java:58 join types,
HashJoinOperator.java:170 semi/anti), §2.6 (SetOperator.java:29,
UnnestOperator.java:41, RepeatOperator.java:53 grouping sets,
LiteralValueOperator.java).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.queries import query, _r2, _r4, dsum2


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4: EXISTS subquery → left-semi join
    (HashJoinOperator.java:170 SEMI)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    return (
        o.join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: multi-join + group + top-k with broadcast dim."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: LEFT OUTER join with join-condition filter + nested agg
    (BaseJoinOperator.java:314 LEFT).

    Round-17: orders is aggregated to (o_custkey, count) BEFORE the left
    join, so the join carries one row per ordering customer instead of
    every order row; unmatched customers coalesce to 0 — exactly the
    count(o_orderkey)-over-left-join value. Equivalent because
    count(o_orderkey) per c_custkey only ever counts that customer's own
    matched order rows; like the old shape's groupBy(c_custkey), this
    relies on c_custkey being the (non-null) customer PK — the TPC-H
    contract (guide §2.3 aggregate before you shuffle; interleaved
    same-JVM A/B at sf0.1: 0.524 → 0.465 s median, faster in 8/8 pairs;
    rows + schema proved identical on all three SFs)."""
    t = load_tables(spark, sf_dir)
    per_cust_orders = (
        t["orders"]
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("__n"))
    )
    per_cust = (
        t["customer"]
        .join(per_cust_orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("c_count"),
        )
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.00 * (sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,6)))::DOUBLE)
                 / (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))::DOUBLE), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: join + conditional aggregation ratio (CASE inside SUM)."""
    t = load_tables(spark, sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)).cast("decimal(38,6)")).cast("double")
                / F.sum(disc.cast("decimal(38,6)")).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: IN-subquery over grouped HAVING → semi join against an
    aggregate (PinotJoinToDynamicBroadcastRule analog: Spark broadcasts
    the tiny filtered key set).

    Round-17: the outer query's group key contains o_orderkey, so every
    output group IS one qualifying order and its total_qty equals the
    per-order sum the HAVING subquery already computes. Both sums are
    therefore produced in ONE lineitem aggregation and carried through
    the joins — the second lineitem scan, the detail join and the final
    re-aggregation disappear (guide §1.2 remove passes: 2 lineitem
    passes → 1). Equivalent on any data where o_orderkey is the orders
    PK and c_custkey the customer PK (the TPC-H contract; with
    duplicated PK rows the reference shape would double-count the very
    same groups). Interleaved same-JVM A/B at sf0.1: 0.960 → 0.854 s
    median, faster in 8/8 pairs; rows proved order-identical on all
    three SFs."""
    t = load_tables(spark, sf_dir)
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"), dsum2("l_quantity").alias("total_qty"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"), "total_qty")
    )
    return (
        t["orders"]
        .join(per_order, "o_orderkey")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 50))
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs predicate across the join — exercises
    Catalyst's CNF conversion + partial pushdown (Pinot: Or/AndFilterOperator
    bitmap algebra, pinot-core/.../operator/filter/OrFilterOperator.java)."""
    t = load_tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 50))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q22_anti_join",
    oracle="""
    SELECT substr(c_name, 1, 9) AS cntry, count(*) AS numcust, round(sum(CAST(c_acctbal AS DECIMAL(38,6))), 2)::DOUBLE AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY cntry ORDER BY cntry
    """,
)
def q22_anti_join(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS → left-anti join
    (HashJoinOperator.java:172 ANTI)."""
    t = load_tables(spark, sf_dir)
    # scalar subquery stays in the plan as a 1-row broadcast (no eager
    # driver-side collect at build time)
    avg_bal = (
        t["customer"].filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(t["orders"].filter(F.col("o_orderpriority") == "1-URGENT"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("cntry"))
        .agg(F.count("*").alias("numcust"), dsum2("c_acctbal").alias("totacctbal"))
        .orderBy("cntry")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT n.n_name, s.cnt_supp, c.cnt_cust
    FROM (SELECT s_nationkey, count(*) AS cnt_supp FROM supplier GROUP BY s_nationkey) s
    FULL OUTER JOIN (SELECT c_nationkey, count(*) AS cnt_cust FROM customer GROUP BY c_nationkey) c
      ON s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = coalesce(s.s_nationkey, c.c_nationkey)
    ORDER BY n.n_name
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER equi-join (BaseJoinOperator.java:318 FULL)."""
    t = load_tables(spark, sf_dir)
    s = t["supplier"].groupBy("s_nationkey").agg(F.count("*").alias("cnt_supp"))
    c = t["customer"].groupBy("c_nationkey").agg(F.count("*").alias("cnt_cust"))
    return (
        s.join(c, F.col("s_nationkey") == F.col("c_nationkey"), "full_outer")
        .join(
            F.broadcast(t["nation"]),
            F.col("n_nationkey") == F.coalesce(F.col("s_nationkey"), F.col("c_nationkey")),
        )
        .select("n_name", "cnt_supp", "cnt_cust")
        .orderBy("n_name")
    )


@query(
    "join_non_equi_theta",
    oracle="""
    SELECT p_brand, count(*) AS n_expensive
    FROM part p JOIN (SELECT avg(p_retailprice) AS avg_price, p_brand AS b2 FROM part GROUP BY p_brand) a
      ON p.p_brand = a.b2 AND p.p_retailprice > a.avg_price * 1.05
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_non_equi_theta(spark, sf_dir):
    """Join with non-equi residual condition (NonEquiJoinOperator.java:35 —
    residual predicates post-filter the hash-join output)."""
    t = load_tables(spark, sf_dir)
    a = t["part"].groupBy(F.col("p_brand").alias("b2")).agg(F.avg("p_retailprice").alias("avg_price"))
    return (
        t["part"]
        .join(a, (F.col("p_brand") == F.col("b2")) & (F.col("p_retailprice") > F.col("avg_price") * 1.05))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_expensive"))
        .orderBy("p_brand")
    )


@query(
    "set_ops_union_intersect_except",
    oracle="""
    WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
         build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT c_custkey FROM big UNION SELECT c_custkey FROM build)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM build)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT c_custkey FROM big EXCEPT SELECT c_custkey FROM build)
    ORDER BY op
    """,
)
def set_ops_union_intersect_except(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT (SetOperator.java:29 family)."""
    t = load_tables(spark, sf_dir)
    big = t["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey")
    build = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = big.union(build).distinct().agg(F.count("*").alias("n")).select(F.lit("union").alias("op"), "n")
    i = big.intersect(build).agg(F.count("*").alias("n")).select(F.lit("intersect").alias("op"), "n")
    e = big.subtract(build).agg(F.count("*").alias("n")).select(F.lit("except").alias("op"), "n")
    return u.unionByName(i).unionByName(e).orderBy("op")


@query(
    "set_ops_all_variants",
    oracle="""
    SELECT 'intersect_all' AS op, count(*) AS n FROM
      (SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
       INTERSECT ALL SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
    UNION ALL
    SELECT 'except_all', count(*) FROM
      (SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
       EXCEPT ALL SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
    ORDER BY op
    """,
)
def set_ops_all_variants(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL multiset semantics
    (IntersectAllOperator, MinusAllOperator)."""
    t = load_tables(spark, sf_dir)
    lo = t["lineitem"].filter(F.col("l_quantity") < 10).select("l_suppkey")
    hi = t["lineitem"].filter(F.col("l_quantity") > 40).select("l_suppkey")
    ia = lo.intersectAll(hi).agg(F.count("*").alias("n")).select(F.lit("intersect_all").alias("op"), "n")
    ea = lo.exceptAll(hi).agg(F.count("*").alias("n")).select(F.lit("except_all").alias("op"), "n")
    return ia.unionByName(ea).orderBy("op")


@query(
    "distinct_select",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_select(spark, sf_dir):
    """SELECT DISTINCT (DistinctOperator.java:39)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def grouping_sets(spark, sf_dir):
    """GROUPING SETS (query.thrift:35-41; RepeatOperator.java:53)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "rollup_cube",
    oracle="""
    SELECT 'rollup' AS op, l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube', l_returnflag, l_linestatus, count(*)
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY op, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_cube(spark, sf_dir):
    """ROLLUP + CUBE expansions."""
    t = load_tables(spark, sf_dir)
    r = (
        t["lineitem"].rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
        .select(F.lit("rollup").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    c = (
        t["lineitem"].cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
        .select(F.lit("cube").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    return r.unionByName(c).orderBy(
        "op", F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
    )


@query(
    "having_clause",
    oracle="""
    SELECT l_suppkey, round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)::DOUBLE AS total
    FROM lineitem GROUP BY l_suppkey
    HAVING sum(l_extendedprice) > 2000000 AND count(*) > 10
    ORDER BY total DESC, l_suppkey
    """,
)
def having_clause(spark, sf_dir):
    """HAVING (broker reduce/HavingFilterHandler.java)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(F.sum("l_extendedprice").alias("__total"), dsum2("l_extendedprice").alias("__dtotal"), F.count("*").alias("__n"))
        .filter((F.col("__total") > 2000000) & (F.col("__n") > 10))
        .select("l_suppkey", F.col("__dtotal").alias("total"))
        .orderBy(F.desc("total"), F.asc("l_suppkey"))
    )


@query(
    "filtered_aggregation",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_total,
           round(avg(l_quantity) FILTER (WHERE l_tax < 0.04), 4) AS avg_lowtax_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def filtered_aggregation(spark, sf_dir):
    """Per-aggregation FILTER (WHERE ...) — FilteredAggregationOperator /
    FilteredGroupByOperator (SURVEY.md §2.4)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_quantity > 25) AS n_big,
               round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_total,
               round(avg(l_quantity) FILTER (WHERE l_tax < 0.04), 4) AS avg_lowtax_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@query(
    "case_when_projection",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished' ELSE 'open' END AS status_name
    FROM orders ORDER BY o_orderkey LIMIT 50
    """,
)
def case_when_projection(spark, sf_dir):
    """CASE WHEN (searched + simple) — CaseTransformFunction."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.when(F.col("o_orderstatus") == "F", "finished").otherwise("open").alias("status_name"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "values_literal",
    oracle="""
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag) ORDER BY id
    """,
)
def values_literal(spark, sf_dir):
    """VALUES clause / literal-only select (LiteralValueOperator)."""
    return spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS t(id, tag) ORDER BY id")


@query(
    "cte_with_reuse",
    oracle="""
    WITH nat_rev AS (
      SELECT n_name, s_suppkey, round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)::DOUBLE AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, s_suppkey)
    SELECT n_name, count(*) AS n_suppliers, round(sum(rev), 2) AS nation_rev
    FROM nat_rev GROUP BY n_name ORDER BY n_name
    """,
)
def cte_with_reuse(spark, sf_dir):
    """WITH / CTE (WithStatements.json corpus; spool = shared subplan)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH nat_rev AS (
          SELECT n_name, s_suppkey, round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)::DOUBLE AS rev
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name, s_suppkey)
        SELECT n_name, count(*) AS n_suppliers, round(sum(rev), 2) AS nation_rev
        FROM nat_rev GROUP BY n_name ORDER BY n_name
        """
    )


@query(
    "unnest_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents WHERE doc_id < 100)
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def unnest_explode(spark, sf_dir):
    """UNNEST(array) → explode (UnnestOperator.java:41)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "unnest_posexplode_zip",
    oracle="""
    SELECT doc_id, pos, word
    FROM (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                 unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 5)
    WHERE pos < 3 ORDER BY doc_id, pos
    """,
)
def unnest_posexplode_zip(spark, sf_dir):
    """UNNEST with ordinality → posexplode (UnnestOperator zips arrays
    with position, null-padded — :39)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 5)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("pos") < 3)
        .orderBy("doc_id", "pos")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM (SELECT * FROM supplier WHERE s_acctbal > 9000) s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n.n_name, s.s_suppkey
    """,
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join (BaseJoinOperator.java:314-318 join-type matrix;
    unmatched right rows null-padded)."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .filter(F.col("s_acctbal") > 9000)
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("n_name", "s_suppkey")
    )


@query(
    "join_lookup_dimension",
    oracle="""
    SELECT c_mktsegment, n_name, r_name, count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY c_mktsegment, n_name, r_name
    ORDER BY c_mktsegment, n_name
    """,
)
def join_lookup_dimension(spark, sf_dir):
    """Lookup join against replicated dimension tables
    (LookupJoinOperator.java:56, DimensionTableConfig.java): nation and
    region broadcast to every task — zero shuffle of the fact side."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("c_mktsegment", "n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            _r4(F.avg("c_acctbal")).alias("avg_bal"),
        )
        .orderBy("c_mktsegment", "n_name")
    )


@query(
    "agg_count_metadata_only",
    oracle="""
    SELECT count(*) AS n_rows, count(l_orderkey) AS n_keys FROM lineitem
    """,
)
def agg_count_metadata_only(spark, sf_dir):
    """Metadata-answered COUNT (NonScanBasedAggregationOperator.java,
    FastFilteredCountOperator.java): with
    spark.sql.parquet.aggregatePushdown the count comes from parquet
    row-group footers, no data scan."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.count("*").alias("n_rows"), F.count("l_orderkey").alias("n_keys")
    )
