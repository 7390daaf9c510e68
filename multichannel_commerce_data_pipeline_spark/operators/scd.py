"""Slowly-changing-dimension operators — SCD Type 2 history build.

The reference refreshes its dimensions by overwrite (silver_to_gold.py
rebuilds each gold table per loop), which loses attribute history. This
operator derives the Type-2 history — one row per (key, attribute run)
with effective_from / effective_to / is_current — from an observation
stream, the standard warehouse answer to "what was this customer's
segment on March 3rd".

100 TB shape: gaps-and-islands via two windows and one aggregate, ALL
keyed on the dimension key, so the whole history build costs exactly one
hash exchange of the observation stream. HashPartitioning(key)
satisfies ClusteredDistribution for the (key, version) aggregate and
both windows, so EnsureRequirements inserts no further shuffles (sorts
within partitions only). No collect, no driver state; keys process
independently, so the operator scales with the keyspace.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an observation stream into SCD Type 2 history rows.

    Consecutive observations of the same ``attr_col`` value (null-safe
    comparison) per ``key_col`` form one run; each run becomes a history
    row with a 1-based ``version``, ``effective_from`` = its first
    observation time, ``effective_to`` = the next run's start (NULL for
    the open run) and ``is_current``. ``tiebreak_col`` makes the
    observation order total when timestamps can tie.

    Returns (key, version, attr, effective_from, effective_to,
    is_current, n_obs).
    """
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w_obs = Window.partitionBy(key_col).orderBy(*order)
    # The first observation always opens run 1 — tested explicitly:
    # comparing a NULL attribute against the (also NULL) lag of the
    # first row is null-safe-EQUAL, which would leave a leading NULL
    # run at version 0.
    first_obs = F.lag(F.lit(1)).over(w_obs).isNull()
    changed = F.when(
        first_obs | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w_obs)),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = df.withColumn(
        "version",
        F.sum(changed).over(w_obs.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = runs.groupBy(key_col, "version").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("effective_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_ver = Window.partitionBy(key_col).orderBy("version")
    eff_to = F.lead("effective_from").over(w_ver)
    return hist.select(
        key_col,
        F.col("version").cast("long").alias("version"),
        attr_col,
        "effective_from",
        eff_to.alias("effective_to"),
        eff_to.isNull().alias("is_current"),
        F.col("n_obs").cast("long").alias("n_obs"),
    )
