"""Explicit bronze envelope schemas — Spark DDL and the matching DuckDB
``read_json`` column types, side by side so they cannot drift.

The reference infers bronze schemas at read time
(bronze_to_silver_all_sources.py:26); at 100 TB inference is an extra
full pass over the data and a schema-stability hazard, so the new engine
declares them (SURVEY.md §1.2). Envelope shape per
kafka_fashion_consumer.py:60-69, raw payload shapes per
api_data_generator.py:56-191.
"""

from __future__ import annotations

from pathlib import Path

# Default bronze root: the committed deterministic fixtures
# (scripts/make_fixtures.py). Overridable for real deployments.
BRONZE_ROOT = str(Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "bronze")

_KAFKA_META_SPARK = (
    "kafka_metadata STRUCT<topic: STRING, partition: INT, offset: BIGINT, "
    "stream_timestamp: STRING, bronze_timestamp: STRING>"
)
_KAFKA_META_DUCK = (
    'STRUCT(topic VARCHAR, partition INTEGER, "offset" BIGINT, '
    "stream_timestamp VARCHAR, bronze_timestamp VARCHAR)"
)

# source -> (spark raw_api_data struct DDL, duckdb raw_api_data STRUCT type)
_RAW = {
    "joor": (
        "STRUCT<order_id: STRING, customer: STRING, price: STRING, "
        "quantity: INT, sku: STRING, currency: STRING, date: STRING>",
        "STRUCT(order_id VARCHAR, customer VARCHAR, price VARCHAR, "
        'quantity INTEGER, sku VARCHAR, currency VARCHAR, "date" VARCHAR)',
    ),
    "shopify": (
        "STRUCT<id: BIGINT, customer_name: STRING, total_price: STRING, "
        "quantity: INT, sku: STRING, created_at: STRING>",
        "STRUCT(id BIGINT, customer_name VARCHAR, total_price VARCHAR, "
        "quantity INTEGER, sku VARCHAR, created_at VARCHAR)",
    ),
    "tiktok": (
        "STRUCT<order_id: STRING, buyer: STRING, price_cents: BIGINT, "
        "quantity: INT, sku: STRING, live_stream: BOOLEAN, timestamp: BIGINT>",
        "STRUCT(order_id VARCHAR, buyer VARCHAR, price_cents BIGINT, "
        'quantity INTEGER, sku VARCHAR, live_stream BOOLEAN, "timestamp" BIGINT)',
    ),
    "freight": (
        "STRUCT<shipment_id: STRING, order_reference: STRING, cost: STRING, "
        "weight: STRING, carrier: STRING, shipped_at: STRING>",
        "STRUCT(shipment_id VARCHAR, order_reference VARCHAR, cost VARCHAR, "
        "weight VARCHAR, carrier VARCHAR, shipped_at VARCHAR)",
    ),
    "gsheets": (
        "STRUCT<sheet_name: STRING, data: ARRAY<ARRAY<STRING>>>",
        "STRUCT(sheet_name VARCHAR, data VARCHAR[][])",
    ),
}

SOURCES = tuple(_RAW)


def spark_envelope_ddl(source: str) -> str:
    """Full envelope schema for ``spark.read.schema(...)``."""
    return f"raw_api_data {_RAW[source][0]}, {_KAFKA_META_SPARK}"


def bronze_glob(source: str, root: str | None = None) -> str:
    """The reference's 4-level object-store key wildcard
    ({src}/{Y}/{M}/{D}/*.json, kafka_fashion_consumer.py:53-57)."""
    return f"{root or BRONZE_ROOT}/{source}/*/*/*/*.json"


def oracle_bronze_from(source: str, root: str | None = None) -> str:
    """DuckDB FROM-clause fragment reading the same bronze files with
    the same explicit schema (newline-delimited envelope JSON)."""
    return (
        f"read_json('{bronze_glob(source, root)}', format='newline_delimited', "
        f"columns={{'raw_api_data': '{_RAW[source][1]}', "
        f"'kafka_metadata': '{_KAFKA_META_DUCK}'}})"
    )
