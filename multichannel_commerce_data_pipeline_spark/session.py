"""SparkSession factory with scale-appropriate defaults.

The reference enables only AQE (scripts/ingestion/silver_to_gold.py:647);
we keep AQE plus shuffle-partition sizing, Arrow for the pandas_udf
surface, and a UTC session timezone so timestamp arithmetic is
deterministic across engines (the DuckDB oracle is tz-naive UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mcdp-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    Sized from ``SPARK_GRAFT_CPUS`` (default: all cores). On a real
    cluster these settings transfer: AQE handles shuffle coalescing and
    skew-join splitting at runtime; ``spark.sql.shuffle.partitions`` is
    only the pre-AQE upper bound.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    parts = str(shuffle_partitions or (32 if cpus == "*" else int(cpus)))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Inject a bloom filter from a selective dimension side into the
        # fact-table scan of shuffle joins (Spark 3.3+). Near-free at
        # test scale; at 100 TB it prunes fact rows before the exchange.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("MCDP_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
