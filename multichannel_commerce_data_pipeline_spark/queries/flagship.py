"""Flagship query: the reference's `exec_daily_kpi` view re-expressed
end-to-end (scripts/sql/.sql:3-26 — the one hand-written analytics query
in the reference), composed from the same operator spine:

  lineitem order rollup (A1)  →  freight left-join w/ coalesce (J1+J2+P3)
  →  geo dim broadcast joins  →  3-way channel UNION ALL (U1)
  →  grouped SUM / COUNT DISTINCT / AOV / margin% (A5)  →  ORDER BY (O1)

Cross-engine determinism: every money column is aggregated as DECIMAL
(exact, order-independent — a double SUM's value depends on partial-agg
order, which differs between Spark's distributed combine and DuckDB's
scan order), then cast to DOUBLE only at the output edge. Ratios divide
the already-exact decimal sums as doubles, so both engines divide
bit-identical operands.

Scale shape: one shuffle for the order rollup, one for the freight
rollup (both keyed on orderkey, so AQE can plan the order-freight join
shuffle-free), broadcast joins for the ≤25-row dims, and a final
partial-aggregated group-by on the KPI grain. No collect(), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround, oracle_dround
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load, parallelize_small_scan

# channel tagging mirrors the reference's three CM2 fact tables
# (wholesale / shopify / livestreaming, silver_to_gold.py:499-632)
_CHANNELS = [
    ("wholesale", "1-URGENT"),
    ("shopify", "2-HIGH"),
    ("livestreaming", "3-MEDIUM"),
]

_DEC = "decimal(18,6)"


def _dec(col) -> F.Column:
    return col.cast(_DEC)


ORACLE = f"""
    WITH order_rollup AS (
      SELECT l_orderkey AS order_no,
             ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                       * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS net_revenue
      FROM lineitem GROUP BY 1
    ),
    freight AS (
      SELECT l_orderkey AS order_no,
             ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))
                       * CAST(2.5 AS DECIMAL(18,6))), 2) AS freight_cost
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ),
    geo AS (
      SELECT c.c_custkey, n.n_name AS country, rg.r_name AS region
      FROM customer c
      JOIN nation n  ON c.c_nationkey = n.n_nationkey
      JOIN region rg ON n.n_regionkey = rg.r_regionkey
    ),
    cm2 AS (
      SELECT o.o_orderkey AS order_no, o.o_orderdate, o.o_orderpriority,
             g.country, g.region, r.net_revenue,
             COALESCE(f.freight_cost, CAST(0 AS DECIMAL(18,2))) AS freight_cost,
             ROUND(r.net_revenue * CAST(0.35 AS DECIMAL(18,6))
                   - COALESCE(f.freight_cost, CAST(0 AS DECIMAL(18,2)))
                   - CAST(8.00 AS DECIMAL(18,2)), 2) AS cm2_amount
      FROM orders o
      JOIN order_rollup r ON r.order_no = o.o_orderkey
      LEFT JOIN freight f ON f.order_no = o.o_orderkey
      JOIN geo g ON g.c_custkey = o.o_custkey
    ),
    tagged AS (
      SELECT 'wholesale' AS channel, * FROM cm2 WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'shopify' AS channel, * FROM cm2 WHERE o_orderpriority = '2-HIGH'
      UNION ALL
      SELECT 'livestreaming' AS channel, * FROM cm2 WHERE o_orderpriority = '3-MEDIUM'
    )
    SELECT
      strftime(o_orderdate, '%Y%m%d')                    AS date_key,
      channel, country, region,
      CAST(ROUND(SUM(net_revenue), 2) AS DOUBLE)         AS revenue,
      CAST(ROUND(SUM(cm2_amount), 2) AS DOUBLE)          AS cm2,
      COUNT(DISTINCT order_no)                           AS orders,
      {oracle_dround("CAST(SUM(net_revenue) AS DOUBLE) / COUNT(DISTINCT order_no)")}
        AS aov,
      {oracle_dround(
          "CAST(SUM(cm2_amount) AS DOUBLE) / CAST(SUM(net_revenue) AS DOUBLE) * 100"
      )} AS margin_pct
    FROM tagged
    GROUP BY 1, 2, 3, 4
    ORDER BY date_key DESC, channel, country
"""


@query("exec_daily_kpi", oracle=ORACLE)
def exec_daily_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship daily-KPI rollup (see module docstring)."""
    # The driver's lineitem parquet is one row group, so the scan (and
    # with it the decimal-heavy partial aggregation) would run as a
    # single task; parallelize_small_scan fans it out and is a no-op on
    # a real multi-split table. Fanning out BY the rollup key makes the
    # fan-out exchange satisfy the groupBy's distribution requirement —
    # one shuffle of the fact rows, not round-robin + hash.
    li = parallelize_small_scan(
        spark, load(spark, sf_dir, "lineitem"), by="l_orderkey"
    )
    o = load(spark, sf_dir, "orders")

    # The 3-channel priority filter keeps ~60% of orders, and per-order
    # rollups are row-independent — so the (filtered) orders join runs
    # BEFORE the rollup, dropping excluded orders' lineitems ahead of
    # the decimal aggregation and its shuffle (~40% fewer shuffled
    # bytes). Grouping on l_orderkey itself (plus the functionally-
    # dependent carried order attrs) keeps the fan-out exchange
    # satisfying the groupBy's distribution — still ONE shuffle of the
    # fact rows. At 100 TB the orders side stops broadcasting and AQE
    # picks a sort-merge join that reuses the same keyed exchange; the
    # runtime bloom filter (session default) then prunes lineitem rows
    # at the scan.
    o_filtered = o.filter(
        F.col("o_orderpriority").isin([p for _, p in _CHANNELS])
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")

    # One pass over the surviving lineitems computes BOTH rollups: net
    # revenue and the conditional freight sum (oracle keeps the
    # reference's two-CTE + left-join shape; SUM(CASE WHEN) over the
    # same rows is NULL exactly when the left join misses, so results
    # hash-match). Saves a second lineitem scan, its shuffle, and the
    # subsequent left join — at 100 TB that is the difference between
    # one and two full-table exchanges on the fact table.
    order_rollup = (
        li.join(o_filtered, li.l_orderkey == o_filtered.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("order_no"),
            "o_custkey",
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))),
                2,
            ).alias("net_revenue"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R",
                        _dec(F.col("l_quantity")) * F.expr(f"CAST(2.5 AS {_DEC})"),
                    )
                ),
                2,
            ).alias("freight_cost_raw"),
        )
    )
    geo = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(load(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("n_name").alias("country"), F.col("r_name").alias("region"))
    )

    freight_cost = F.coalesce(
        F.col("freight_cost_raw"), F.expr("CAST(0 AS DECIMAL(18,2))")
    )
    cm2 = (
        order_rollup.join(geo, geo.c_custkey == F.col("o_custkey"))
        .select(
            "order_no",
            "o_orderdate",
            "o_orderpriority",
            "country",
            "region",
            "net_revenue",
            F.round(
                F.col("net_revenue") * F.expr(f"CAST(0.35 AS {_DEC})")
                - freight_cost
                - F.expr("CAST(8.00 AS DECIMAL(18,2))"),
                2,
            ).alias("cm2_amount"),
        )
    )

    # The reference's view UNION ALLs three *materialized* CM2 tables
    # (scripts/sql/.sql:17-23). Expressing that here as a union of three
    # filters over one cm2 plan would execute the whole join pipeline
    # three times — so the engine uses the single-pass equivalent (the
    # three priorities partition the rows, so a CASE channel map yields
    # the identical relation; the oracle keeps the UNION ALL shape and
    # hash-matches).
    channel = F.when(
        F.col("o_orderpriority") == _CHANNELS[0][1], _CHANNELS[0][0]
    )
    for name, prio in _CHANNELS[1:]:
        channel = channel.when(F.col("o_orderpriority") == prio, name)
    tagged = cm2.filter(
        F.col("o_orderpriority").isin([p for _, p in _CHANNELS])
    ).select(channel.alias("channel"), "*")

    revenue_sum = F.sum("net_revenue")
    cm2_sum = F.sum("cm2_amount")
    # COUNT(DISTINCT order_no) in the reference view — but cm2 is one
    # row per order by construction (orders ⋈ 1:1 rollup ⋈ 1:1 geo, and
    # the channels partition rows by priority), so the engine exploits
    # the uniqueness constraint and counts rows instead: same values,
    # no two-phase distinct expand on the KPI grain. The oracle keeps
    # COUNT(DISTINCT) and hash-matches; distinct_ratio_kpi exercises
    # the real exact-distinct path (A5) where uniqueness does NOT hold.
    n_orders = F.count(F.lit(1))
    return (
        tagged.groupBy(
            F.date_format("o_orderdate", "yyyyMMdd").alias("date_key"),
            "channel",
            "country",
            "region",
        )
        .agg(
            F.round(revenue_sum, 2).cast("double").alias("revenue"),
            F.round(cm2_sum, 2).cast("double").alias("cm2"),
            n_orders.alias("orders"),
            dround(revenue_sum.cast("double") / n_orders).alias("aov"),
            dround(cm2_sum.cast("double") / revenue_sum.cast("double") * 100).alias(
                "margin_pct"
            ),
        )
        .orderBy(F.desc("date_key"), "channel", "country")
    )
