"""Kafka source/sink surface (S7/S8) — the Spark-native replacement for
the reference's kafka-python relay (kafka_fashion_producer.py:46-95,
kafka_fashion_consumer.py:22-76).

The spark-sql-kafka connector jar is not bundled in this environment, so
``load()``/``start()`` paths are exercised only when the connector is
present; the *frame shaping* (value JSON encode/decode against the
explicit envelope schemas) is plain DataFrame code and is unit-tested
without a broker. (Sandbox re-checked every round — still no broker or
connector jar as of r10.)

Topology parity with the reference (docker-compose.yml:156-168): five
``raw-*`` topics, message = JSON ``{data, stream_timestamp}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_TOPICS = {
    "joor": "raw-joor",
    "shopify": "raw-shopify",
    "tiktok": "raw-tiktok",
    "freight": "raw-freight",
    "gsheets": "raw-gsheets",
}


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
):
    """S7: configured (not yet loaded) Kafka stream reader for the raw
    topics — ``.load()`` when the connector jar is on the classpath."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )


def decode_kafka_value(kafka_df: DataFrame, raw_schema_ddl: str) -> DataFrame:
    """Kafka record → typed columns: cast the value bytes to string,
    parse with the explicit source schema, and surface the Kafka
    metadata the bronze envelope records (topic/partition/offset —
    kafka_fashion_consumer.py:60-69)."""
    payload_schema = f"data {raw_schema_ddl.split(' ', 1)[1]}, stream_timestamp STRING"
    return kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("msg"),
    ).select("topic", "partition", "offset", "msg.data", "msg.stream_timestamp")


def encode_kafka_value(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """S8 frame shape: serialize every column into a single JSON
    ``value`` (plus optional ``key``) — the
    ``to_json(struct(*))`` idiom replacing the reference's per-row
    ``json.dumps`` producer (kafka_fashion_producer.py:46-48)."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def kafka_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """S8: configured (not yet started) Kafka stream writer; input must
    already be in key/value shape (see encode_kafka_value)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
