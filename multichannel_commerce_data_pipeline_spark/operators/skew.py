"""Skew mitigation — salted two-phase aggregation.

A single hot key (one viral product, one mega-buyer, the empty-string
default the silver layer coalesces into) concentrates an entire
group-by partition on one task. AQE's skew-join splitting handles
skewed *joins*; for skewed *aggregations* of non-algebraic aggregate
lists (exact distincts, collect-style states) the standard fix is
salting: spread each key over ``n_salts`` sub-keys, partially aggregate
per (key, salt), then combine the partials in a second, now-balanced
group-by.

For purely algebraic aggregates (SUM/COUNT/MIN/MAX/AVG) Spark's
map-side partial aggregation already bounds per-task state, so salting
buys nothing — use it when the partial-combine state per key is large
or the aggregate is position-dependent. The two-phase split below is
restricted to decomposable aggregates, and the result is bit-identical
to the direct group-by (sums combine associatively; counts add), which
is exactly what the paired oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.operators.bucketing import (
    deterministic_bucket,
)


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    salt_col: Column,
    sums: dict[str, Column],
    count_alias: str = "n",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT group-by: phase 1 aggregates per
    (keys, salt), phase 2 combines partials per keys.

    ``salt_col`` derives the salt deterministically from a high-
    cardinality column (e.g. the row's primary key) so the same row
    always lands in the same sub-group — reproducible, unlike rand().
    ``sums`` maps output alias → input expression.
    """
    salt = deterministic_bucket(salt_col, n_salts).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[F.sum(expr).alias(f"__s_{a}") for a, expr in sums.items()],
        F.count(F.lit(1)).alias("__c"),
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"__s_{a}").alias(a) for a in sums],
        F.sum("__c").alias(count_alias),
    )
