"""Scalar function surface — SURVEY.md §2.8 (date / string / math /
json / array functions).

Covers the conformance-layer functions the reference uses (date_format
date_key, round, rlike) and the messiness-normalization surface its
generator implies but its cleaning layer never finished
(api_data_generator.py:66,68,71,134,142,150 — currency variants,
%-suffixed numbers, $-prefixed costs, unit-suffixed weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround, oracle_dround
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


@query(
    "date_dimensions",
    oracle="""
    SELECT
      o_orderkey,
      strftime(o_orderdate, '%Y%m%d')                AS date_key,
      CAST(o_orderdate AS DATE)                      AS order_date,
      CAST(year(o_orderdate) AS INT)                 AS yr,
      CAST(quarter(o_orderdate) AS INT)              AS qtr,
      CAST(month(o_orderdate) AS INT)                AS mo,
      CAST(dayofweek(o_orderdate) + 1 AS INT)        AS dow,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    """,
)
def date_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3: date_format 'yyyyMMdd' date_key (silver_to_gold.py:272)
    plus year/quarter/month/dayofweek — the real dim_date derivation the
    reference imports but never uses (silver_to_gold.py:3,634-641).
    Note: Spark dayofweek is 1=Sunday; DuckDB is 0=Sunday, hence the
    +1 on the oracle side."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyyMMdd").alias("date_key"),
        d.cast("date").alias("order_date"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
    )


@query(
    "string_normalization",
    oracle=r"""
    SELECT
      p_partkey,
      upper(p_brand)                                   AS brand_upper,
      lower(p_type)                                    AS type_lower,
      trim(concat('  ', p_name, ' '))                  AS name_trimmed,
      regexp_replace(p_name, '[aeiou]', '', 'g')       AS name_novowel,
      regexp_extract(p_type, '^(\w+)', 1)              AS type_first_word,
      length(p_name)                                   AS name_len,
      substr(p_name, 1, 5)                             AS name_prefix,
      concat(p_brand, '::', p_type)                    AS brand_type
    FROM part
    """,
)
def string_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: the string-cleaning surface (upper/lower/trim/regexp_replace/
    regexp_extract/length/substring/concat) required by the generator's
    messy values (api_data_generator.py:66-71,134-150)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat("p_brand", F.lit("::"), "p_type").alias("brand_type"),
    )


@query(
    "messy_value_cleaning",
    oracle=rf"""
    SELECT
      event_id,
      CAST(regexp_replace(
        concat('$1,', CAST(event_id % 1000 AS VARCHAR), '.',
               lpad(CAST(event_id % 100 AS VARCHAR), 2, '0')),
        '[$,]', '', 'g') AS DOUBLE) AS price_cleaned,
      {oracle_dround(
        "CAST(regexp_extract(concat(CAST(event_id % 97 AS VARCHAR), '.', "
        "CAST(event_id % 10 AS VARCHAR), '%'), '([0-9.]+)', 1) AS DOUBLE) / 100",
        6,
      )} AS pct_as_fraction,
      {oracle_dround("value / 100.0")} AS cents_to_dollars
    FROM events
    """,
)
def messy_value_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+P7: currency-symbol/thousands-separator stripping, percent-
    string parsing, and cents→dollars conversion — the conformance ops
    the reference's generator requires ('$12.34', '5.1%', price_cents:
    api_data_generator.py:108,134,169,183) with only cents÷100 actually
    handled there (bronze_to_silver_all_sources.py:61). The messy
    strings are built from integer key arithmetic (not double→string
    casts, whose rendering is engine-specific), so both engines clean
    byte-identical inputs."""
    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    price_str = F.concat(
        F.lit("$1,"),
        (eid % 1000).cast("string"),
        F.lit("."),
        F.lpad((eid % 100).cast("string"), 2, "0"),
    )
    pct_str = F.concat(
        (eid % 97).cast("string"), F.lit("."), (eid % 10).cast("string"), F.lit("%")
    )
    return ev.select(
        "event_id",
        F.regexp_replace(price_str, "[$,]", "").cast("double").alias("price_cleaned"),
        dround(
            F.regexp_extract(pct_str, "([0-9.]+)", 1).cast("double") / 100, 6
        ).alias("pct_as_fraction"),
        dround(F.col("value") / 100.0).alias("cents_to_dollars"),
    )


@query(
    "json_extraction",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
      CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
           THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: JSON document access — the reference stores raw API payloads
    as JSONB (api_data_generator.py:42-46) and dot-paths into the
    inferred struct (bronze_to_silver_all_sources.py:27). For string
    JSON columns the engine uses get_json_object."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "array_sheet_promotion",
    oracle="""
    WITH sheet(data) AS (
      VALUES ([['sku', 'qty', 'price'],
               ['A-1', '5',  '$12.00'],
               ['B-2', '3',  '$7.50'],
               ['C-3', '10', '$99.99']])
    ),
    rows_only AS (
      SELECT unnest(data[2:]) AS row FROM sheet
    )
    SELECT
      row[1]                                                          AS sku,
      CAST(row[2] AS INT)                                             AS qty,
      CAST(regexp_replace(row[3], '[$]', '', 'g') AS DOUBLE)          AS price
    FROM rows_only
    ORDER BY sku
    """,
)
def array_sheet_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10+S6: gsheets ragged array-of-arrays with a header row first
    (api_data_generator.py:164-189) — the reference stores it raw
    (bronze_to_silver_all_sources.py:77); we complete the path:
    slice off the header, explode rows, promote cells to typed columns.
    Local-data constructor stands in for the sheet payload."""
    sheet = spark.createDataFrame(
        [
            (
                [
                    ["sku", "qty", "price"],
                    ["A-1", "5", "$12.00"],
                    ["B-2", "3", "$7.50"],
                    ["C-3", "10", "$99.99"],
                ],
            )
        ],
        "data ARRAY<ARRAY<STRING>>",
    )
    rows = sheet.select(
        F.explode(F.slice(F.col("data"), 2, 2147483647)).alias("row")
    )
    return rows.select(
        F.element_at("row", 1).alias("sku"),
        F.element_at("row", 2).cast("int").alias("qty"),
        F.regexp_replace(F.element_at("row", 3), "[$]", "").cast("double").alias("price"),
    ).orderBy("sku")


@query(
    "map_functions",
    oracle="""
    SELECT
      p_partkey,
      array_to_string(map_keys(MAP(['size', 'retail'],
                                   [CAST(p_size AS DOUBLE), p_retailprice])), ',')
        AS attr_keys,
      map_extract(MAP(['size', 'retail'],
                      [CAST(p_size AS DOUBLE), p_retailprice]), 'retail')[1]
        AS retail_attr
    FROM part
    WHERE p_partkey <= 500
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 declared map surface: create_map / map_keys / element_at —
    typed key-value attributes on a row (the shape EAV-style product
    attributes take). Keys render as a joined string because map key
    order is insertion order in both engines."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    m = F.create_map(
        F.lit("size"),
        F.col("p_size").cast("double"),
        F.lit("retail"),
        F.col("p_retailprice"),
    )
    return p.select(
        "p_partkey",
        F.array_join(F.map_keys(m), ",").alias("attr_keys"),
        F.element_at(m, F.lit("retail")).alias("retail_attr"),
    )
