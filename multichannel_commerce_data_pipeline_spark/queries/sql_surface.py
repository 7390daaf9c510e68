"""spark.sql(...) surface: the engine's queries are DataFrame-built
elsewhere; these run textual ANSI SQL over registered views to cover
the operators only the SQL planner exposes — correlated EXISTS / NOT
EXISTS (planned as semi/anti joins) and scalar subqueries. The oracle
strings are the *same SQL* (both engines speak ANSI), which is the
point: a reference user's hand-written SQL runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import register_views

_EXISTS_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_orderkey <= 5000
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
"""

_NOT_EXISTS_SQL = """
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE o_orderkey <= 5000
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_discount > 0.05)
"""

_SCALAR_SQL = """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > 1.5 * (SELECT AVG(p_retailprice) FROM part)
"""


@query("sql_exists_subquery", oracle=_EXISTS_SQL)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites it to a left semi join on
    the correlation key; the returnflag predicate pushes into the
    lineitem scan."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@query("sql_not_exists_subquery", oracle=_NOT_EXISTS_SQL)
def sql_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — planned as a left anti join."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_EXISTS_SQL)


@query("sql_scalar_subquery", oracle=_SCALAR_SQL)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — the average materializes once and
    broadcasts into the filter (same shape as the engine's checkpoint
    high-watermark scan)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE spine(d) AS (
      SELECT CAST('1995-01-01' AS DATE)
      UNION ALL
      SELECT d + 1 FROM spine WHERE d < CAST('1995-03-01' AS DATE)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= CAST('1995-01-01' AS DATE)
        AND CAST(o_orderdate AS DATE) <= CAST('1995-03-01' AS DATE)
      GROUP BY 1
    )
    SELECT s.d AS day,
           COALESCE(daily.revenue, 0.0) AS revenue,
           COALESCE(daily.n_orders, 0)  AS n_orders
    FROM spine s LEFT JOIN daily ON s.d = daily.d
"""


@query("sql_recursive_date_spine", oracle=_RECURSIVE_SPINE_SQL)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a gap-free daily date
    spine left-joined to daily revenue with zero-filled quiet days —
    the dense-calendar shape every BI trend panel needs (a bare GROUP
    BY silently drops no-order days and breaks moving averages). ONE
    SQL string runs verbatim on both engines. The recursion is
    driver-bounded (60 rows) and the daily rollup is one partial-
    aggregated shuffle with the date filter pushed to the scan; the
    spine side is trivially broadcast. Decimal revenue sums keep the
    join's money column order-independent."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE_SQL)
