"""As-of / range join queries (§2.3 extended join surface), oracle-
checked against DuckDB's native ASOF JOIN and a plain BETWEEN join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround, oracle_dround
from multichannel_commerce_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join_broadcast,
)
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


@query(
    "asof_join_latest_order",
    oracle=f"""
    WITH day_orders AS (
      SELECT o_custkey, o_orderdate,
             COUNT(*) AS day_orders,
             {oracle_dround("SUM(o_totalprice)")} AS day_spend
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT
      e.user_id, e.event_id, e.ts,
      d.o_orderdate AS matched_ts,
      d.day_orders, d.day_spend
    FROM events e
    ASOF LEFT JOIN day_orders d
      ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    """,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each event picks up the most
    recent same-customer order-day aggregate at or before its
    timestamp. Spark has no ASOF JOIN — this is the union-and-window
    form (operators/asof.py): one shuffle on the key, same price as an
    equi-join, vs DuckDB's native ASOF oracle."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    day_orders = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
        )
        .agg(
            F.count(F.lit(1)).alias("day_orders"),
            dround(F.sum("o_totalprice")).alias("day_spend"),
        )
    )
    return asof_join(
        ev,
        day_orders,
        keys=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["day_orders", "day_spend"],
    )


@query(
    "range_join_value_bands",
    oracle="""
    WITH bands AS (
      SELECT 'low' AS band, CAST(0.0 AS DOUBLE) AS lo, CAST(100.0 AS DOUBLE) AS hi
      UNION ALL SELECT 'mid', CAST(100.0 AS DOUBLE), CAST(500.0 AS DOUBLE)
      UNION ALL SELECT 'high', CAST(500.0 AS DOUBLE), CAST(1e18 AS DOUBLE)
    )
    SELECT e.event_id, e."value", b.band
    FROM events e
    LEFT JOIN bands b ON e."value" >= b.lo AND e."value" < b.hi
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join: event values banded by a small
    broadcast interval table — BroadcastNestedLoopJoin is the intended
    plan at this interval cardinality."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    return range_join_broadcast(ev, bands, "value", "lo", "hi").select(
        "event_id", "value", "band"
    )
