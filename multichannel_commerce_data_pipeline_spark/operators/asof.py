"""As-of and range joins — operators Spark has no native form for,
composed from existing DataFrame ops (no UDFs, no per-row Python).

``asof_join`` uses the union-and-window technique: tag both inputs,
union them, and let ``last(payload) IGNORE NULLS`` over a
(keys, ts)-ordered running window carry each right row forward to the
left rows that follow it. Cost is ONE shuffle on the join keys — the
same price as a plain equi-join — versus the naive
join-filter-then-argmax, which shuffles twice and explodes when a left
row matches many right rows. Skewed keys salt exactly like any keyed
window.

``range_join_broadcast`` is the point-in-interval join (value BETWEEN
lo AND hi) for a small interval table: broadcast + nested-loop is the
right physical plan when intervals are few; for large interval tables,
bucket both sides by interval-aligned keys first (classic
interval-bucketing) so the join becomes equi + residual filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Backward inclusive as-of join: each left row gains the payload of
    the most recent right row with the same keys and
    ``right_ts <= left_ts`` (right rows at the exact timestamp win).
    Left rows with no prior right row keep NULL payloads. The right side
    must be unique per (keys, right_ts) — pre-aggregate it otherwise.
    """
    keys = list(keys)
    payload = list(payload)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        *[F.col(c) for c in payload],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    lft = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    merged = r.unionByName(lft)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *keys,
        "__ts",
        "__is_r",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
        F.last(
            F.when(F.col("__is_r") == 1, F.col("__ts")), ignorenulls=True
        ).over(w).alias("matched_ts"),
        *[F.col(f"__l_{c}") for c in left.columns if c not in keys],
    )
    out_left = [c for c in left.columns if c not in keys]
    return carried.filter(F.col("__is_r") == 0).select(
        *keys,
        *[F.col(f"__l_{c}").alias(c) for c in out_left],
        "matched_ts",
        *payload,
    )


def range_join_broadcast(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Point-in-interval join with a broadcast interval table
    (lo inclusive, hi exclusive). Plans as BroadcastNestedLoopJoin —
    correct while intervals fit in a broadcast; see module docstring
    for the large-interval strategy."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(intervals), cond, "left")
