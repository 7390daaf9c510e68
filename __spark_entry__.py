"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to the package's query registry
(multichannel_commerce_data_pipeline_spark/queries/): one registered,
oracle-paired query per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multichannel_commerce_data_pipeline_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    exec_daily_kpi view (scripts/sql/.sql:3-26) composed end-to-end."""
    return load_registry()["exec_daily_kpi"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible
    query; non-SQL-expressible ops (approximate ANN, streaming) are
    omitted and get the driver's weaker rows-only check."""
    return {name: q.oracle for name, q in load_registry().items() if q.oracle}
