"""DDL surface (ddl.py ← pinot-sql-ddl DdlCompiler.java):
CREATE TABLE (column list + CTAS), CREATE MATERIALIZED VIEW with rollup
registration + routing, REFRESH, DROP."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pinot_spark.catalog import load_tables
from pinot_spark.dialect import PinotEngine


@pytest.fixture()
def engine(spark, sf_dir, tmp_path):
    load_tables(spark, sf_dir)
    eng = PinotEngine(spark)
    from pinot_spark.ddl import DdlExecutor

    eng._ddl = DdlExecutor(spark, storage_dir=str(tmp_path))
    return eng


def test_create_table_column_list(engine, spark):
    [r] = engine.sql(
        "CREATE TABLE IF NOT EXISTS trips ("
        "  trip_id LONG, carrier STRING, fare DOUBLE, ts TIMESTAMP)"
    ).collect()
    assert r.operation == "CREATE_TABLE" and r.rows == 0
    schema = dict(spark.table("trips").dtypes)
    assert schema == {"trip_id": "bigint", "carrier": "string", "fare": "double", "ts": "timestamp"}


def test_create_table_as_select(engine, spark):
    [r] = engine.sql(
        "CREATE TABLE big_orders WITH ('type' = 'offline') AS "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000 LIMIT 100000"
    ).collect()
    assert r.operation == "CREATE_TABLE" and r.rows > 0
    assert spark.table("big_orders").count() == r.rows


def test_create_mv_registers_rollup_and_routes(engine, spark):
    [r] = engine.sql(
        "CREATE MATERIALIZED VIEW sales_by_flag "
        "REFRESH EVERY 1 DAY "
        "PROPERTIES ('timeColumnName' = 'l_shipdate') "
        "AS SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS qty "
        "FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert r.operation == "CREATE_MATERIALIZED_VIEW"
    assert r.rollup_registered
    # the MV view answers directly
    mv_rows = {x.l_returnflag: x.cnt for x in spark.table("sales_by_flag").collect()}
    base = {
        x.l_returnflag: x.cnt
        for x in spark.table("lineitem").groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    assert mv_rows == base
    # and the rollup router answers a covered group-by from partials
    routed = engine.ddl.mv_catalog.route(
        spark, spark.table("lineitem"), ["l_returnflag"], [("count", "*", "cnt")]
    )
    assert {x.l_returnflag: x.cnt for x in routed.collect()} == base


def test_mv_refresh_and_drop(engine, spark):
    engine.sql(
        "CREATE MATERIALIZED VIEW tiny_mv AS "
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"
    )
    r = engine.ddl.refresh("tiny_mv")
    assert r.rows == 5
    engine.sql("DROP MATERIALIZED VIEW tiny_mv")
    assert not any(v.name == "tiny_mv" for v in engine.ddl.mv_catalog.mvs)
    with pytest.raises(Exception):
        spark.table("tiny_mv").collect()


def test_non_rollup_mv_is_view_only(engine, spark):
    [r] = engine.sql(
        "CREATE MATERIALIZED VIEW joined_mv AS "
        "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).collect()
    assert r.operation == "CREATE_MATERIALIZED_VIEW" and not r.rollup_registered
    assert spark.table("joined_mv").count() == 25
