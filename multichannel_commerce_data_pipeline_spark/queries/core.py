"""Core scan / projection / filter / scalar-expression operators.

Covers SURVEY.md §2.1 S1-ish scans (parquet with pushdown) and §2.2
P1–P13: projection-with-rename, casts, coalesce defaults, comparison
filters, literal columns, arithmetic, searched CASE, regex predicates,
IN-lists, deterministic bucketing (the seeded replacement for the
reference's rand() cascades), equality predicates, withColumn.

Reference semantics being re-expressed (file:line into /root/reference):
  - projection w/ rename + cast + coalesce: bronze_to_silver_all_sources.py:39-79
  - searched CASE country/region mapping: scripts/ingestion/silver_to_gold.py:285-353
  - regex geo predicates (rlike):          scripts/ingestion/silver_to_gold.py:285-302
  - IN-list region rollup:                 scripts/ingestion/silver_to_gold.py:346-352
  - rand() cascade (made deterministic):   scripts/ingestion/silver_to_gold.py:304-328
  - arithmetic margin math:                scripts/ingestion/silver_to_gold.py:336-343,542-544
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround, oracle_dround
from multichannel_commerce_data_pipeline_spark.operators.bucketing import (
    deterministic_bucket,
    oracle_bucket_sql,
)
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import (
    TABLE_NAMES,
    load,
    parallelize_small_scan,
)


@query(
    "projection_clean",
    oracle="""
    SELECT
      o_orderkey                         AS order_id,
      CAST(o_custkey AS VARCHAR)         AS customer_id,
      COALESCE(o_orderstatus, 'UNKNOWN') AS status,
      CAST(o_totalprice AS DOUBLE)       AS price,
      COALESCE(o_orderpriority, '')      AS priority
    FROM orders
    """,
)
def projection_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P5: rename / cast / coalesce-to-default projection —
    the silver conformance shape (bronze_to_silver_all_sources.py:39-79)."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.coalesce(F.col("o_orderstatus"), F.lit("UNKNOWN")).alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.coalesce(F.col("o_orderpriority"), F.lit("")).alias("priority"),
    )


@query(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '1995-06-01 00:00:00' AND l_quantity < 10
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: comparison filters; both predicates reach the parquet scan as
    PushedFilters (checkpoint-style filter, bronze_to_silver_all_sources.py:28)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") > F.lit("1995-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "case_when_bands",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice >= 300000 THEN 'platinum'
        WHEN o_totalprice >= 150000 THEN 'gold'
        WHEN o_totalprice >= 50000  THEN 'silver'
        ELSE 'bronze'
      END AS tier,
      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders
    """,
)
def case_when_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P12: searched CASE chain + equality predicate
    (silver_to_gold.py:285-353,535-541 re-expressed on orders)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "platinum")
        .when(F.col("o_totalprice") >= 150000, "gold")
        .when(F.col("o_totalprice") >= 50000, "silver")
        .otherwise("bronze")
        .alias("tier"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )


@query(
    "regex_predicate",
    oracle=r"""
    SELECT
      p_partkey,
      p_name,
      CASE
        WHEN regexp_matches(p_type, '(?i)^promo')    THEN 'PROMO'
        WHEN regexp_matches(p_type, '(?i)brushed')   THEN 'BRUSHED'
        WHEN regexp_matches(p_type, '(?i)polished$') THEN 'POLISHED'
        ELSE 'OTHER'
      END AS type_class
    FROM part
    WHERE regexp_matches(p_name, '(?i)(red|green|blue)')
    """,
)
def regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9+F7: rlike geo-style inference (silver_to_gold.py:285-302) —
    regex predicate cascade classifying rows by pattern match."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("(?i)(red|green|blue)")).select(
        "p_partkey",
        "p_name",
        F.when(F.col("p_type").rlike("(?i)^promo"), "PROMO")
        .when(F.col("p_type").rlike("(?i)brushed"), "BRUSHED")
        .when(F.col("p_type").rlike("(?i)polished$"), "POLISHED")
        .otherwise("OTHER")
        .alias("type_class"),
    )


@query(
    "in_list_rollup",
    oracle="""
    SELECT
      n_nationkey,
      n_name,
      CASE
        WHEN n_name IN ('UNITED STATES', 'CANADA', 'BRAZIL', 'ARGENTINA', 'PERU')
          THEN 'Americas'
        WHEN n_name IN ('FRANCE', 'GERMANY', 'UNITED KINGDOM', 'ROMANIA', 'RUSSIA')
          THEN 'Europe'
        WHEN n_name IN ('CHINA', 'JAPAN', 'INDIA', 'INDONESIA', 'VIETNAM')
          THEN 'Asia'
        ELSE 'Rest of World'
      END AS region_group
    FROM nation
    """,
)
def in_list_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: isin() region rollup (silver_to_gold.py:346-352)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        "n_name",
        F.when(
            F.col("n_name").isin("UNITED STATES", "CANADA", "BRAZIL", "ARGENTINA", "PERU"),
            "Americas",
        )
        .when(
            F.col("n_name").isin("FRANCE", "GERMANY", "UNITED KINGDOM", "ROMANIA", "RUSSIA"),
            "Europe",
        )
        .when(
            F.col("n_name").isin("CHINA", "JAPAN", "INDIA", "INDONESIA", "VIETNAM"),
            "Asia",
        )
        .otherwise("Rest of World")
        .alias("region_group"),
    )


_BUCKET = oracle_bucket_sql("o_orderkey", 1000)

@query(
    "deterministic_bucket",
    oracle=f"""
    SELECT
      o_orderkey,
      {_BUCKET} AS bucket,
      CASE
        WHEN {_BUCKET} < 350 THEN 'United States'
        WHEN {_BUCKET} < 470 THEN 'United Kingdom'
        WHEN {_BUCKET} < 570 THEN 'Germany'
        WHEN {_BUCKET} < 650 THEN 'France'
        WHEN {_BUCKET} < 720 THEN 'Japan'
        ELSE 'Rest of World'
      END AS country
    FROM orders
    """,
)
def deterministic_bucket_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/F5 made deterministic: the reference assigns countries with a
    nondeterministic rand() cascade (silver_to_gold.py:304-328), which
    recomputes differently per action. We replace it with a pure
    multiplicative-hash bucket on the primary key — same distribution,
    reproducible, and Catalyst-foldable."""
    o = load(spark, sf_dir, "orders")
    bucket = deterministic_bucket(F.col("o_orderkey"), 1000)
    country = (
        F.when(bucket < 350, "United States")
        .when(bucket < 470, "United Kingdom")
        .when(bucket < 570, "Germany")
        .when(bucket < 650, "France")
        .when(bucket < 720, "Japan")
        .otherwise("Rest of World")
    )
    return o.select("o_orderkey", bucket.alias("bucket"), country.alias("country"))


@query(
    "arithmetic_margin",
    oracle=f"""
    SELECT
      l_orderkey,
      l_linenumber,
      {oracle_dround("l_extendedprice * (1 - l_discount)")}               AS net_revenue,
      {oracle_dround("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS gross_charge,
      {oracle_dround("l_extendedprice / l_quantity")}                     AS unit_price,
      {oracle_dround("l_extendedprice * (1 - l_discount) - l_quantity * 100.0")} AS cm1_amount
    FROM lineitem
    """,
)
def arithmetic_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+F6: derived unit-economics arithmetic — net revenue, unit
    price, CM1 margin with a literal unit cost
    (silver_to_gold.py:336-343,406-414,532-544). Rounding goes through
    a decimal cast (functions.dround) because plain double rounding
    resolves half-cent ties differently per engine — unit_price =
    extendedprice/quantity hits exact .005 constantly.

    The 4× decimal-cast rounding is compute-heavy per row, so the scan
    is fanned out when the file has fewer splits than cores (no-op on a
    real multi-split table)."""
    li = parallelize_small_scan(spark, load(spark, sf_dir, "lineitem"))
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net).alias("net_revenue"),
        dround(net * (1 + F.col("l_tax"))).alias("gross_charge"),
        dround(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        dround(net - F.col("l_quantity") * F.lit(100.0)).alias("cm1_amount"),
    )


@query(
    "literal_columns",
    oracle="""
    SELECT
      s_suppkey,
      s_name,
      'SGD'   AS currency,
      'NET30' AS payment_terms,
      CAST(8.0 AS DOUBLE) AS platform_fee,
      ROUND(s_acctbal * 0.029 + 0.30, 2) AS processing_fee
    FROM supplier
    """,
)
def literal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: lit() constant columns — currency, payment terms, fee
    constants (silver_to_gold.py:279-282,331,339-341,401,410-412)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        "s_name",
        F.lit("SGD").alias("currency"),
        F.lit("NET30").alias("payment_terms"),
        F.lit(8.0).alias("platform_fee"),
        F.round(F.col("s_acctbal") * 0.029 + 0.30, 2).alias("processing_fee"),
    )


@query(
    "local_table_constructor",
    oracle="""
    SELECT ch.channel_id, ch.channel_name, ch.channel_type, n.n_name
    FROM (VALUES
      (1, 'wholesale',     'B2B'),
      (2, 'shopify',       'D2C'),
      (3, 'livestreaming', 'social')
    ) AS ch(channel_id, channel_name, channel_type)
    JOIN nation n ON n.n_nationkey = ch.channel_id
    """,
)
def local_table_constructor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: createDataFrame from local rows — the dim_channels /
    empty-fallback construction (silver_to_gold.py:641,671-692,710-715),
    joined back to a scanned table."""
    ch = spark.createDataFrame(
        [(1, "wholesale", "B2B"), (2, "shopify", "D2C"), (3, "livestreaming", "social")],
        "channel_id INT, channel_name STRING, channel_type STRING",
    )
    n = load(spark, sf_dir, "nation")
    return ch.join(n, n.n_nationkey == ch.channel_id).select(
        "channel_id", "channel_name", "channel_type", "n_name"
    )


@query(
    "incremental_watermark",
    oracle="""
    WITH hw AS (SELECT max(ts) - INTERVAL 2 DAY AS checkpoint FROM events)
    SELECT event_id, ts, user_id, event_type, value
    FROM events, hw
    WHERE ts > hw.checkpoint
    """,
)
def incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10+A3: high-watermark incremental scan — global max(ts) as the
    checkpoint, then a pushed-down recency filter
    (bronze_to_silver_all_sources.py:9-17,28,93-94). Expressed without
    collect(): the checkpoint is a broadcast scalar subquery, so the plan
    stays fully distributed."""
    ev = load(spark, sf_dir, "events")
    hw = ev.agg((F.max("ts") - F.expr("INTERVAL 2 DAY")).alias("checkpoint"))
    return (
        ev.join(F.broadcast(hw))
        .filter(F.col("ts") > F.col("checkpoint"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "recency_topn",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 50
    """,
)
def recency_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11+O1+O2: latest-N serving query (fashion_api_server.py:30-31,
    64-65; kafka_fashion_producer.py:24-35). Spark plans this as
    TakeOrderedAndProject — no global sort materialization. Tie-broken
    on event_id for a total, engine-stable order."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "limit_zero_schema",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE FALSE
    """,
)
def limit_zero_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: limit(0) empty-frame — the reference's schema-only trick used
    to force JDBC DDL without moving rows (silver_to_gold.py:59). Spark
    folds this to a LocalRelation <empty> at plan time: zero scan tasks
    are launched, so at 100 TB this still touches no data."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate").limit(0)


@query(
    "latest_snapshot_per_key",
    oracle="""
    SELECT custkey, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate,
           o_totalprice AS last_totalprice
    FROM (
      SELECT o_custkey AS custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def latest_snapshot_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compacted master topics (master-products /
    master-buyers, docker-compose.yml:163-164) materialized: latest row
    per key — the log-compaction semantic as a batch view. Survivor =
    max(struct(date, orderkey, ...)) through a two-phase hash
    aggregate: partial aggregation reduces each mapper's rows per key
    to one candidate before the shuffle, so a hot key (one buyer with
    a billion events in the compacted log) never funnels its copies
    into a single reducer the way a keyed row_number would.
    Deterministic survivor (date then orderkey desc), one shuffle."""
    o = load(spark, sf_dir, "orders")
    packed = F.struct("o_orderdate", "o_orderkey", "o_totalprice")
    return (
        o.groupBy("o_custkey")
        .agg(F.max(packed).alias("__s"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("__s.o_orderkey").alias("last_orderkey"),
            F.col("__s.o_orderdate").alias("last_orderdate"),
            F.col("__s.o_totalprice").alias("last_totalprice"),
        )
    )


_COUNT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLE_NAMES
)


@query("table_counts", oracle=_COUNT_ORACLE)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A6: count(*) per table — the reference's GET /api/stats surface
    (fashion_api_server.py:99-106) as one distributed plan. Each count is
    a parquet-metadata-only scan (no column read); the 10-way UNION ALL
    of 1-row aggregates is driver-trivial at any scale."""
    dfs = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in TABLE_NAMES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


_PYDS_ROWS = 2000


@query(
    "python_datasource_scan",
    oracle=f"""
    SELECT i                        AS order_id,
           CASE {oracle_bucket_sql('i', 3)}
             WHEN 0 THEN 'wholesale'
             WHEN 1 THEN 'shopify'
             ELSE 'livestreaming' END AS channel,
           ({oracle_bucket_sql('i', 10000)}) / 100.0 AS amount
    FROM range({_PYDS_ROWS}) t(i)
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S+ (Spark-4 Python Data Source API): a custom
    ``pyspark.sql.datasource`` connector scanned as a real relation —
    8 InputPartitions generated executor-side, no driver
    materialization. Row content is a pure function of the row id
    (portable Knuth bucket), so the DuckDB oracle reproduces the WHOLE
    connector output value-for-value: the driver row being green
    certifies the connector contract (schema, partitioning, per-row
    generation), not just that it runs. Reference behavior replaced:
    the hand-rolled HTTP→Kafka relay feed (kafka_fashion_producer.py)
    re-expressed as a planner-visible source."""
    from multichannel_commerce_data_pipeline_spark.sources.pydatasource import (
        register,
    )

    register(spark)
    return (
        spark.read.format("synthetic_orders")
        .option("rows", str(_PYDS_ROWS))
        .load()
    )
