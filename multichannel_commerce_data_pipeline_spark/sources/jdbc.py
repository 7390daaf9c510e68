"""JDBC scan and sinks — S3 (table scan), S4 (append sink), S5 (sink
with create-table options), replacing the reference's hand-rolled JDBC
edges (silver_to_gold.py:667-692 full-table reads,
bronze_to_silver_all_sources.py:82-90 append writes,
silver_to_gold.py:249-265,730-742 create+overwrite writes).

Scale notes baked in:

* The reference reads every silver table with a single-connection
  full-table scan — one executor does all the I/O. ``read_jdbc``
  accepts ``partition_column/num_partitions`` so Spark issues N
  range-predicated queries in parallel (the only way a JDBC scan
  spreads across a cluster).
* Filters/projections on the returned DataFrame are pushed into the
  remote SQL by Catalyst (JDBCRelation pushdown) because the scan is
  declared, not collected.
* Writes go through ``foreachBatch``-style batch appends with
  ``batchsize`` tuned; ``truncate=true`` avoids DDL churn on
  overwrite when the schema is unchanged.

Tested against the Derby embedded database that ships with Spark —
the same code path (JdbcRelationProvider) any server-backed JDBC URL
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S3: declared JDBC table scan. With ``partition_column`` bounds,
    Spark runs ``num_partitions`` parallel range queries instead of the
    reference's single-connection full read."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetch_size)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """S4: append sink (bronze_to_silver_all_sources.py:82-90). Each
    task opens one connection and writes its partition in
    ``batch_size`` chunks — parallelism = input partitions."""
    writer = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_jdbc_create(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    create_table_options: str = "",
    overwrite: bool = False,
    truncate: bool = True,
    properties: dict[str, str] | None = None,
) -> None:
    """S5: sink with create-table options (the reference's ClickHouse
    DDL bootstrap, silver_to_gold.py:249-265). ``truncate=true`` keeps
    overwrite from dropping/recreating the table every run."""
    writer = (
        df.write.format("jdbc")
        .mode("overwrite" if overwrite else "append")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
    )
    if driver:
        writer = writer.option("driver", driver)
    if create_table_options:
        writer = writer.option("createTableOptions", create_table_options)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def _table_exists(jconn, table: str) -> bool:
    """JDBC-metadata table-existence probe (Derby folds unquoted
    identifiers to upper case; check both)."""
    md = jconn.getMetaData()
    for name in (table, table.upper(), table.lower()):
        rs = md.getTables(None, None, name, None)
        try:
            if rs.next():
                return True
        finally:
            rs.close()
    return False


def write_jdbc_idempotent(
    df: DataFrame,
    url: str,
    table: str,
    batch_id: int,
    driver: str | None = None,
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Exactly-once JDBC landing for a streaming ``foreachBatch``: rows
    carry their micro-batch id, and the write is delete-then-append on
    that id. A crash between the JDBC commit and the checkpoint commit
    replays the batch — the replay first deletes whatever the dead
    attempt landed, so the append is idempotent per batch id (the
    standard exactly-once recipe for non-transactional sinks; plain
    ``write_jdbc_append`` alone is at-least-once).

    The delete runs on the driver over one JDBC connection — it touches
    only ``__batch_id = batch_id`` rows (index it in production), then
    the distributed append proceeds as usual.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    jvm = spark._jvm  # noqa: SLF001 — py4j JDBC access for the driver-side delete
    jconn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        if _table_exists(jconn, table):
            st = jconn.createStatement()
            try:
                # quoted: Spark's JDBC writer creates the column as the
                # delimited identifier "__batch_id" (leading underscores
                # are invalid unquoted in Derby/ANSI)
                st.executeUpdate(
                    f'DELETE FROM {table} WHERE "__batch_id" = {int(batch_id)}'
                )
            finally:
                st.close()
    finally:
        jconn.close()
    write_jdbc_append(
        df.withColumn("__batch_id", F.lit(int(batch_id))),
        url,
        table,
        driver=driver,
        batch_size=batch_size,
        properties=properties,
    )
