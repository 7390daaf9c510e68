"""Join operators — SURVEY.md §2.3.

The reference's only join is a left-outer enrichment of order rollups
with freight costs (silver_to_gold.py:512-516,603-607), with a projected
build side carrying a synthetic literal column (J2) and coalesce defaults
for misses. The star schema implies the full join surface (inner / semi /
anti / FK-dim lookups), which we expose here.

Scale notes: dimension joins broadcast the small side explicitly; the
fact-fact join relies on AQE for skew handling; all join inputs are
projected to the needed columns before the join so the shuffle carries
minimal bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


@query(
    "left_join_enrich",
    oracle="""
    WITH freight AS (
      SELECT l_orderkey AS order_reference,
             ROUND(SUM(l_quantity * 2.5), 2) AS freight_cost,
             'shipped' AS freight_status
      FROM lineitem
      WHERE l_returnflag = 'R'
      GROUP BY l_orderkey
    )
    SELECT
      o.o_orderkey            AS order_no,
      o.o_totalprice          AS order_total,
      COALESCE(f.freight_cost, 0.0)          AS freight_cost,
      COALESCE(f.freight_status, 'pending')  AS freight_status
    FROM orders o
    LEFT JOIN freight f ON o.o_orderkey = f.order_reference
    """,
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2+P3: left-outer freight enrichment with projected build side,
    synthetic literal column, and coalesce defaults for misses
    (silver_to_gold.py:512-516,603-607,530-533)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    freight = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_orderkey").alias("order_reference"))
        .agg(F.round(F.sum(F.col("l_quantity") * 2.5), 2).alias("freight_cost"))
        .withColumn("freight_status", F.lit("shipped"))
    )
    return o.join(freight, o.o_orderkey == freight.order_reference, "left").select(
        o.o_orderkey.alias("order_no"),
        o.o_totalprice.alias("order_total"),
        F.coalesce(freight.freight_cost, F.lit(0.0)).alias("freight_cost"),
        F.coalesce(freight.freight_status, F.lit("pending")).alias("freight_status"),
    )


@query(
    "broadcast_dim_join",
    oracle="""
    SELECT
      c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-style dim lookups (implied by the gold star schema,
    silver_to_gold.py:725-726): fact→dim joins with explicit broadcast of
    the small sides — no shuffle of the big side at any scale."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@query(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join: customers having at least one large order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join: customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "range_join",
    oracle="""
    SELECT
      l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size, l.l_quantity
    FROM lineitem l
    JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity > p.p_size
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + non-equi (theta) join condition — Spark evaluates the
    range predicate as a post-join filter on the hash join, keeping the
    equi key as the shuffle key (absent in the reference; declared
    surface per SURVEY.md §2.3)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return li.join(
        p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size)
    ).select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")


@query(
    "regional_supplier_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders   o ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic six-table local-supplier revenue query (TPC-H Q5
    shape): customer⋈orders⋈lineitem⋈supplier with the
    same-nation condition, rolled up per nation within one region for
    one year. Exercises Catalyst's join planning end-to-end: the date
    range and region filter push into the scans, region/nation/supplier
    /customer broadcast, and the only repartition-scale shuffles are
    the orders⋈lineitem equi-join and the 25-key aggregate. Revenue
    sums through DECIMAL so the result is addition-order-independent
    across engines. Declared surface SURVEY.md §2.3/§2.4."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(38,6)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
