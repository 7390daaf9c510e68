"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one table. Filters/projections applied by callers
    are pushed into this scan by Catalyst (PushedFilters / ReadSchema).

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4.x rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos
    as a long and convert to a microsecond timestamp — same truncation
    DuckDB applies when it coerces TIMESTAMP_NS to its microsecond
    TIMESTAMP, so both engines see identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def parallelize_small_scan(
    spark: SparkSession,
    df: DataFrame,
    min_parts: int | None = None,
    by: str | None = None,
) -> DataFrame:
    """Repartition a scan only if it produced fewer partitions than the
    cluster has cores. Single-file tables (the driver's documents/
    embeddings parquet has one row group) scan as ONE partition, which
    serializes compute-heavy per-row work (shingling, hashing, dot
    products). At real scale the scan has thousands of splits and this
    is a no-op — the check keeps the extra shuffle out of plans that
    don't need it.

    ``by``: when the downstream plan aggregates/joins on a key, hash-
    repartition on it instead of round-robin — the fan-out exchange then
    *satisfies* the aggregation's distribution requirement, so Catalyst
    elides the second exchange (one shuffle of the fact rows instead of
    round-robin + hash; verified in exec_daily_kpi's plan)."""
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(by)) if by else df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
