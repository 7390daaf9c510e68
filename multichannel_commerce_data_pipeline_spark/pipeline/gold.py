"""Gold derivations — CM1 (order-line contribution margin) and CM2
(order-level margin after freight and payment fees) per channel, the
dimension tables, and the ``exec_daily_kpi`` reporting view.

Re-expresses silver_to_gold.py:267-632 and scripts/sql/.sql:3-26 with
two deliberate fixes over the reference (SURVEY.md §3.2.5, §4.2):

* geo / payment-source assignment is a **deterministic hash bucket** of
  the order key instead of a ``rand()`` cascade — same marginal
  distribution, but stable across re-executions (the reference can put
  one order in different countries in its CM1 vs CM2 rows), and
  reproducible in any SQL engine;
* money outputs round through a decimal cast (functions.dround), so
  results hash-match engines that round HALF_UP on decimals.

Every builder has a DuckDB SQL twin right below it. Scale notes: CM1 is
a pure projection (no shuffle); CM2 shuffles once on order_no for the
rollup and broadcasts the freight build side; the KPI is a union of
already-aggregated inputs followed by one grouped aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import (
    dround,
    oracle_dround,
    oracle_hash32,
    portable_hash32,
)

# Marginal distributions matching the *intent* of the reference's
# sequential-Bernoulli rand() cascades (silver_to_gold.py:304-328).
COUNTRIES: list[tuple[str, float]] = [
    ("United States", 0.30),
    ("United Kingdom", 0.15),
    ("France", 0.10),
    ("Germany", 0.10),
    ("Japan", 0.10),
    ("Australia", 0.08),
    ("Singapore", 0.07),
    ("Brazil", 0.10),
]
REGIONS: dict[str, list[str]] = {
    "North America": ["United States"],
    "Europe": ["United Kingdom", "France", "Germany"],
    "APAC": ["Japan", "Australia", "Singapore"],
    "LATAM": ["Brazil"],
}
PAYMENT_SOURCES: list[tuple[str, float]] = [("hilldun", 0.4), ("direct", 0.6)]

COUNTRY_SEED = 7
PAYMENT_SEED = 11
N_BUCKETS = 1000

# Channel economics (lit constants, as in the reference's CM1 builders).
COGS_PCT = {"wholesale": 0.55, "shopify": 0.45, "livestreaming": 0.50}
FEE_PCT = {"hilldun": 0.035, "direct": 0.02}  # P12 equality switch
PLATFORM_FEE = 8.0


# -- deterministic categorical assignment (Spark + oracle twins) ----------

def hashed_choice(key: Column, choices: Sequence[tuple[str, float]], seed: int) -> Column:
    """Categorical value with given marginals from a portable hash bucket
    of a (string) key — cross-engine replacement for rand() cascades."""
    bucket = portable_hash32(key, seed) % F.lit(N_BUCKETS)
    expr = None
    cum = 0.0
    for value, p in choices[:-1]:
        cum += p
        cond = bucket < int(round(cum * N_BUCKETS))
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    last = choices[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def oracle_hashed_choice(expr: str, choices: Sequence[tuple[str, float]], seed: int) -> str:
    bucket = f"({oracle_hash32(expr, seed)} % {N_BUCKETS})"
    parts = ["CASE"]
    cum = 0.0
    for value, p in choices[:-1]:
        cum += p
        parts.append(f"WHEN {bucket} < {int(round(cum * N_BUCKETS))} THEN '{value}'")
    parts.append(f"ELSE '{choices[-1][0]}' END")
    return " ".join(parts)


def region_for(country: Column) -> Column:
    """P10: IN-list region rollup (silver_to_gold.py:346-352)."""
    expr = None
    for region, members in REGIONS.items():
        cond = country.isin(*members)
        expr = F.when(cond, region) if expr is None else expr.when(cond, region)
    return expr.otherwise("Other")


def oracle_region_for(expr: str) -> str:
    parts = ["CASE"]
    for region, members in REGIONS.items():
        in_list = ", ".join(f"'{m}'" for m in members)
        parts.append(f"WHEN {expr} IN ({in_list}) THEN '{region}'")
    parts.append("ELSE 'Other' END")
    return " ".join(parts)


# -- CM1: order-line contribution margin (pure projection) ----------------

def cm1(silver: DataFrame, channel: str, revenue: Column) -> DataFrame:
    """Wide CM1 projection (silver_to_gold.py:267-497): date keys,
    deterministic geo, lit economics, margin arithmetic. No shuffle."""
    cogs_pct = COGS_PCT[channel]
    country = hashed_choice(F.col("order_id"), COUNTRIES, COUNTRY_SEED)
    return silver.select(
        F.col("order_id").alias("order_no"),
        F.col("buyer_name"),
        F.to_date("order_ts").alias("order_date"),
        F.date_format("order_ts", "yyyyMMdd").alias("date_key"),
        F.col("sku"),
        F.col("quantity"),
        revenue.alias("net_revenue"),
        country.alias("country"),
        region_for(country).alias("region"),
        F.lit(channel).alias("channel"),
        F.lit("USD").alias("currency"),
        (revenue * F.lit(1.0 - cogs_pct)).alias("cm1_amount"),
    )


def oracle_cm1(silver_sql: str, channel: str, revenue_expr: str) -> str:
    cogs_pct = COGS_PCT[channel]
    country = oracle_hashed_choice("order_id", COUNTRIES, COUNTRY_SEED)
    return f"""
    SELECT
      order_id                                   AS order_no,
      buyer_name,
      CAST(order_ts AS DATE)                     AS order_date,
      strftime(order_ts, '%Y%m%d')               AS date_key,
      sku,
      quantity,
      {revenue_expr}                             AS net_revenue,
      {country}                                  AS country,
      {oracle_region_for(f"({country})")}        AS region,
      '{channel}'                                AS channel,
      'USD'                                      AS currency,
      ({revenue_expr})
        * (CAST(1.0 AS DOUBLE) - CAST({cogs_pct!r} AS DOUBLE)) AS cm1_amount
    FROM ({silver_sql})
    """


# -- CM2: order rollup + freight enrichment + fees ------------------------

def cm2(cm1_df: DataFrame, freight_silver: DataFrame) -> DataFrame:
    """A1 order rollup → J1/J2 broadcast left join with the projected
    freight build side (silver_to_gold.py:499-632) → fee arithmetic.
    One shuffle (group-by order_no); freight side broadcast."""
    rolled = cm1_df.groupBy(
        "order_no", "buyer_name", "date_key", "country", "region", "channel"
    ).agg(
        F.sum("quantity").alias("total_quantity"),
        # The reference rounds the rollup money sums to 2dp at aggregation
        # time (silver_to_gold.py:505-508 spark_round(sum(...), 2)); doing
        # the same also removes accumulation-order sensitivity from the
        # cross-engine comparison of double sums.
        dround(F.sum("net_revenue")).alias("net_revenue"),
        dround(F.sum("cm1_amount")).alias("cm1_amount"),
    )
    build = F.broadcast(
        freight_silver.select(
            "order_reference",
            F.col("cost").alias("freight_cost_raw"),
            F.lit("shipped").alias("freight_status_raw"),
        )
    )
    joined = rolled.join(build, rolled.order_no == build.order_reference, "left")
    payment = hashed_choice(F.col("order_no"), PAYMENT_SOURCES, PAYMENT_SEED)
    fee_rate = F.when(payment == "hilldun", FEE_PCT["hilldun"]).otherwise(
        FEE_PCT["direct"]
    )
    freight_cost = F.coalesce(F.col("freight_cost_raw"), F.lit(0.0))
    payment_fee = dround(F.col("net_revenue") * fee_rate)
    return joined.select(
        "order_no",
        "buyer_name",
        "date_key",
        "country",
        "region",
        "channel",
        "total_quantity",
        "net_revenue",
        "cm1_amount",
        freight_cost.alias("freight_cost"),
        F.coalesce(F.col("freight_status_raw"), F.lit("no_shipment")).alias(
            "freight_status"
        ),
        payment.alias("payment_source"),
        payment_fee.alias("payment_fee"),
        dround(
            F.col("cm1_amount") - freight_cost - payment_fee - F.lit(PLATFORM_FEE)
        ).alias("cm2_amount"),
    )


def oracle_cm2(cm1_sql: str, freight_silver_sql: str) -> str:
    payment = oracle_hashed_choice("order_no", PAYMENT_SOURCES, PAYMENT_SEED)
    fee_rate = (
        f"CASE WHEN ({payment}) = 'hilldun' THEN CAST({FEE_PCT['hilldun']!r} AS DOUBLE) "
        f"ELSE CAST({FEE_PCT['direct']!r} AS DOUBLE) END"
    )
    payment_fee = oracle_dround(f"net_revenue * ({fee_rate})")
    return f"""
    SELECT
      order_no, buyer_name, date_key, country, region, channel,
      total_quantity, net_revenue, cm1_amount,
      COALESCE(freight_cost_raw, 0.0)                    AS freight_cost,
      COALESCE(freight_status_raw, 'no_shipment')        AS freight_status,
      {payment}                                          AS payment_source,
      {payment_fee}                                      AS payment_fee,
      {oracle_dround(
        f"cm1_amount - COALESCE(freight_cost_raw, 0.0) - ({payment_fee}) "
        f"- CAST({PLATFORM_FEE!r} AS DOUBLE)"
      )}                                                 AS cm2_amount
    FROM (
      SELECT order_no, buyer_name, date_key, country, region, channel,
             CAST(SUM(quantity) AS BIGINT)          AS total_quantity,
             {oracle_dround("SUM(net_revenue)")}    AS net_revenue,
             {oracle_dround("SUM(cm1_amount)")}     AS cm1_amount
      FROM ({cm1_sql})
      GROUP BY order_no, buyer_name, date_key, country, region, channel
    ) rolled
    LEFT JOIN (
      SELECT order_reference, cost AS freight_cost_raw,
             'shipped' AS freight_status_raw
      FROM ({freight_silver_sql})
    ) f ON rolled.order_no = f.order_reference
    """


# -- exec_daily_kpi (scripts/sql/.sql:3-26) -------------------------------

def exec_daily_kpi(cm2_frames: Sequence[DataFrame]) -> DataFrame:
    """U1 + A5 + O1: union the channel CM2 facts, aggregate per
    (date_key, channel, country, region) with revenue / margin / exact
    order count / AOV / margin%."""
    unioned = cm2_frames[0]
    for other in cm2_frames[1:]:
        unioned = unioned.unionByName(other)
    return (
        unioned.groupBy("date_key", "channel", "country", "region")
        .agg(
            dround(F.sum("net_revenue")).alias("revenue"),
            dround(F.sum("cm2_amount")).alias("cm2_amount"),
            F.countDistinct("order_no").alias("orders"),
            dround(F.sum("net_revenue") / F.countDistinct("order_no")).alias("aov"),
            dround(
                F.sum("cm2_amount") / F.sum("net_revenue") * F.lit(100.0)
            ).alias("cm2_margin_pct"),
        )
        .orderBy(F.desc("date_key"), "channel", "country")
    )


def oracle_exec_daily_kpi(cm2_sqls: Sequence[str]) -> str:
    union = "\nUNION ALL\n".join(f"SELECT * FROM ({s})" for s in cm2_sqls)
    return f"""
    SELECT
      date_key, channel, country, region,
      {oracle_dround("SUM(net_revenue)")}                           AS revenue,
      {oracle_dround("SUM(cm2_amount)")}                            AS cm2_amount,
      COUNT(DISTINCT order_no)                                      AS orders,
      {oracle_dround("SUM(net_revenue) / COUNT(DISTINCT order_no)")} AS aov,
      {oracle_dround("SUM(cm2_amount) / SUM(net_revenue) * CAST(100.0 AS DOUBLE)")}  AS cm2_margin_pct
    FROM ({union})
    GROUP BY date_key, channel, country, region
    """


# -- dimensions -----------------------------------------------------------

def dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """F3: a real generated date dimension (the reference hard-codes a
    single literal row, silver_to_gold.py:634-641) — sequence + date
    parts, all JVM-side."""
    d = F.col("d")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.to_date(F.lit(start)), F.to_date(F.lit(end)))
            ).alias("d")
        )
        .select(
            F.date_format(d, "yyyyMMdd").alias("date_key"),
            d.alias("date"),
            F.year(d).alias("year"),
            F.quarter(d).alias("quarter"),
            F.month(d).alias("month"),
            F.dayofmonth(d).alias("day_of_month"),
            F.dayofweek(d).alias("day_of_week"),
            F.weekofyear(d).alias("week_of_year"),
        )
    )


def oracle_dim_date(start: str, end: str) -> str:
    # DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday.
    return f"""
    SELECT
      strftime(d, '%Y%m%d')        AS date_key,
      CAST(d AS DATE)              AS "date",
      year(d)                      AS year,
      quarter(d)                   AS quarter,
      month(d)                     AS month,
      dayofmonth(d)                AS day_of_month,
      dayofweek(d) + 1             AS day_of_week,
      weekofyear(d)                AS week_of_year
    FROM generate_series(DATE '{start}', DATE '{end}', INTERVAL 1 DAY) AS t(d)
    """


def dim_channels(spark: SparkSession) -> DataFrame:
    """S6: local-data dimension (silver_to_gold.py:710-715)."""
    return spark.createDataFrame(
        [
            (1, "wholesale", "B2B"),
            (2, "shopify", "D2C"),
            (3, "livestreaming", "social"),
        ],
        "channel_id INT, channel_name STRING, channel_type STRING",
    )
