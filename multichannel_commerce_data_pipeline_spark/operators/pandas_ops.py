"""X5: the Python-UDF surface done the fast way — Arrow-batched pandas
UDFs (SCALAR, GROUPED_AGG) and the grouped/iterator frame APIs
(applyInPandas, mapInPandas).

The reference needs zero Python UDFs (SURVEY §2.10) — every parity
operator in this engine is built-in Column expressions. This module is
the declared extension surface for logic that genuinely cannot be
expressed in Catalyst: each wrapper documents the scale contract
(vectorized per Arrow batch, never per row; grouped state bounded by
group size, so skewed keys need salting before applyInPandas).

Python evaluation here costs one Arrow serialize/deserialize per batch
(~10-100× cheaper than row-at-a-time pickling) but still loses
whole-stage codegen — keep it off hot paths that built-ins can express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

# Return types are DataType objects, not DDL strings: executors re-import
# this module to unpickle the kernels, and parsing a DDL string requires
# an active SparkSession that workers don't have.


@pandas_udf(IntegerType())
def token_count_pd(text: pd.Series) -> pd.Series:
    """SCALAR pandas_udf: whitespace token count, vectorized over the
    Arrow batch with pandas str ops."""
    return text.fillna("").str.split().str.len().astype("int32")


@pandas_udf(DoubleType())
def weighted_avg_pd(value: pd.Series, weight: pd.Series) -> float:
    """GROUPED_AGG pandas_udf (a real UDAF): Σ(v·w)/Σ(w) per group.
    Spark ships each group's columns as one pandas call; partial
    aggregation does NOT apply, so every group's rows shuffle to one
    task — bound group cardinality accordingly."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else float("nan")


def zscore_schema(key_cols: str) -> str:
    return f"{key_cols}, zscore DOUBLE"


def group_zscore(pdf: pd.DataFrame, value_col: str, out_cols: list[str]) -> pd.DataFrame:
    """applyInPandas kernel: within-group z-score (sample stddev,
    ddof=1 — matches SQL stddev_samp). Whole group materializes in one
    task's memory: correct tool for per-group model-ish logic, wrong
    tool when one group holds the table."""
    x = pdf[value_col]
    std = x.std(ddof=1)
    pdf = pdf.copy()
    pdf["zscore"] = (x - x.mean()) / std if std and std > 0 else 0.0
    return pdf[out_cols]


def double_clicks_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: streaming per-batch transform (filter +
    derive) — never holds more than one Arrow batch, so memory is
    O(batch), independent of partition size."""
    for pdf in batches:
        out = pdf[pdf["event_type"] == "click"].copy()
        out["boosted"] = out["value"] * 2.0
        yield out[["event_id", "user_id", "boosted"]]


__all__ = [
    "F",
    "double_clicks_batches",
    "group_zscore",
    "token_count_pd",
    "weighted_avg_pd",
    "zscore_schema",
]
