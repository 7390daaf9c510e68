"""Thin serving layer — S12 (the reference's Flask REST read surface,
fashion_api_server.py:21-106) and A6 (per-table stats endpoint),
re-expressed as engine queries a web handler calls.

These are the ONLY deliberate collect() sites in the engine: a serving
endpoint's result is bounded by ``limit`` (TakeOrderedAndProject — no
global sort, no full materialization), so the driver-side collect is
O(limit), not O(table).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.tables import TABLE_NAMES, load


def latest_n(df: DataFrame, order_col: str, n: int = 10) -> list[dict[str, Any]]:
    """GET /api/{src}/raw?limit=N — latest-N rows as JSON-ready dicts
    (fashion_api_server.py:30-31,64-65). Plans as TakeOrderedAndProject."""
    rows = df.orderBy(F.desc(order_col)).limit(n).toJSON().collect()
    return [json.loads(r) for r in rows]


def table_stats(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """GET /api/stats — row count per table (fashion_api_server.py:
    99-106). Counts are parquet-metadata-only scans (no column read)."""
    return {t: load(spark, sf_dir, t).count() for t in TABLE_NAMES}
