"""Market-basket pair counting with a mega-basket guard.

Co-purchase pair generation is an equi self-join on the basket key, so
its cost is Σ_basket |items|² — per-basket quadratic, never
corpus-quadratic. That bound is only safe if no single basket is
pathological: one synthetic-feed glitch producing a 100k-item "order"
turns into 5×10⁹ pairs from a single key, a straggler task that can
stall a 1000-executor job (the same failure mode the shingle-frequency
cap in ``operators/dedup.py:jaccard_pairs`` guards against on the
document side).

``cap_basket_size`` bounds every basket to its ``max_basket_size``
smallest items BEFORE the self-join. The cap is deterministic (ordered
by the item key), so an oracle can reproduce it exactly with
``ROW_NUMBER() OVER (PARTITION BY basket ORDER BY item) <= cap``, and
the row_number window partitions on the SAME key the pair join shuffles
on, so it rides the exchange the join needs anyway.

Reference parity: the reference has no basket analytics at all — this
is part of the X10 commerce-analytics extension surface (the
"customers also bought" primitive behind silver_to_gold.py:748's gold
marts' downstream consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_basket_size(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int,
) -> DataFrame:
    """Keep only the ``max_basket_size`` smallest ``item_col`` values
    per basket (deterministic, oracle-reproducible truncation)."""
    w = Window.partitionBy(basket_col).orderBy(item_col)
    return (
        items.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_basket_size)
        .drop("_rn")
    )


def copurchase_pair_counts(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_baskets: int = 2,
    max_basket_size: int = 64,
) -> DataFrame:
    """Count, for every unordered item pair, the number of baskets
    containing both — the support table of association-rule mining.

    ``items`` may contain duplicates; they are collapsed first so a
    basket contributes each pair at most once. Output columns:
    ``(item_a, item_b, n_baskets)`` with ``item_a < item_b`` and
    ``n_baskets >= min_baskets``.

    Scale shape: distinct → cap → self-join all shuffle on the basket
    key (co-partitioned, one exchange per side); the pair count is a
    partial-aggregated rollup on (item_a, item_b). With the cap, no
    basket emits more than C(max_basket_size, 2) pairs.
    """
    distinct = items.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    capped = cap_basket_size(distinct, "bk", "it", max_basket_size)
    a = capped.select(F.col("bk"), F.col("it").alias("item_a"))
    b = capped.select(F.col("bk"), F.col("it").alias("item_b"))
    return (
        a.join(b, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_baskets)
    )
