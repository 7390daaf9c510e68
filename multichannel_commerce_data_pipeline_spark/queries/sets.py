"""Set operations — SURVEY.md §2.7.

U1 is the reference's 3-way UNION ALL unifying the per-channel CM2 fact
tables inside exec_daily_kpi (scripts/sql/.sql:17-23). INTERSECT /
EXCEPT are declared engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


@query(
    "union_channels",
    oracle="""
    SELECT 'wholesale' AS channel, o_orderkey AS order_no, o_totalprice AS net_revenue
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'shopify' AS channel, o_orderkey AS order_no, o_totalprice AS net_revenue
    FROM orders WHERE o_orderpriority = '2-HIGH'
    UNION ALL
    SELECT 'livestreaming' AS channel, o_orderkey AS order_no, o_totalprice AS net_revenue
    FROM orders WHERE o_orderpriority = '3-MEDIUM'
    """,
)
def union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: 3-way UNION ALL with channel tags — the exec_daily_kpi fact
    unification (scripts/sql/.sql:17-23). unionByName keeps it robust to
    column order."""
    o = load(spark, sf_dir, "orders")

    def channel(tag: str, prio: str) -> DataFrame:
        return o.filter(F.col("o_orderpriority") == prio).select(
            F.lit(tag).alias("channel"),
            F.col("o_orderkey").alias("order_no"),
            F.col("o_totalprice").alias("net_revenue"),
        )

    return (
        channel("wholesale", "1-URGENT")
        .unionByName(channel("shopify", "2-HIGH"))
        .unionByName(channel("livestreaming", "3-MEDIUM"))
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers who placed both urgent and low
    priority orders."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer keys never seen in orders."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)  # subtract == EXCEPT DISTINCT


@query(
    "union_distinct_parties",
    oracle="""
    SELECT party_key, nation_key FROM (
      SELECT c_custkey AS party_key, c_nationkey AS nation_key FROM customer
      WHERE c_custkey <= 500
      UNION
      SELECT s_suppkey AS party_key, s_nationkey AS nation_key FROM supplier
    )
    """,
)
def union_distinct_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 declared surface: UNION DISTINCT — customers and suppliers
    merged into one deduplicated party relation (overlapping keys with
    equal nation collapse). One shuffle for the distinct; Spark plans
    partial-aggregate dedup before the exchange."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500).select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_nationkey").alias("nation_key"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_nationkey").alias("nation_key"),
    )
    return c.union(s).distinct()
