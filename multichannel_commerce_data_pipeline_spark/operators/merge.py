"""MERGE / upsert — latest-wins key merge without a table format.

The reference refreshes its serving tables by polling loops that
re-write whole tables (bronze_to_silver_all_sources.py re-reads and
overwrites per cadence). The warehouse-native form is MERGE: a batch of
keyed updates lands on a base snapshot — update rows replace same-key
base rows, new keys insert, flagged keys delete — producing the next
snapshot copy-on-write.

100 TB shape: implemented as UNION ALL + one partial-aggregated keyed
max(struct) — NOT a full outer join (two join shuffles plus
null-fighting over matched/unmatched combinations) and NOT a keyed
row_number window (no map-side combine, so a hot key funnels every
copy into one reducer). One hash exchange of base+updates, skew dying
map-side, and multiple update batches compose by stacking priorities. The updates
side is usually ≪ base; the exchange cost is dominated by re-shuffling
base, which is exactly the copy-on-write floor (every MERGE engine,
Delta/Iceberg included, rewrites the touched base files — here the
"touched set" is everything because the snapshot is re-emitted; with a
bucketed base table the exchange disappears entirely since
HashPartitioning(key) already holds on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``base`` by ``keys``, latest wins.

    ``updates`` must carry the same columns as ``base`` (plus
    ``delete_col``, a boolean, if given — true rows delete the key
    instead of upserting it). Callers with several updates for one key
    in a single batch must pre-reduce them (e.g. keep the newest via a
    window) — within one merge the update side is treated as a set.

    Returns the next snapshot with ``base``'s exact schema.
    """
    cols = base.columns
    if delete_col is not None:
        b = base.select(*cols, F.lit(False).alias(delete_col))
        u = updates.select(*cols, F.col(delete_col).cast("boolean"))
    else:
        delete_col = "__mcdp_delete"
        b = base.select(*cols, F.lit(False).alias(delete_col))
        u = updates.select(*cols, F.lit(False).alias(delete_col))
    unioned = b.withColumn("__prio", F.lit(0)).unionByName(
        u.withColumn("__prio", F.lit(1))
    )
    # Winner = max(struct(prio, ...)) through a two-phase hash
    # aggregate rather than a keyed row_number window: partial
    # aggregation reduces each mapper's rows per key to one candidate
    # before the shuffle, so even a contract-violating hot key (many
    # update rows for one key) collapses map-side instead of funneling
    # into a single reducer.
    others = [c for c in cols if c not in keys] + [delete_col]
    surv = unioned.groupBy(*keys).agg(
        F.max(F.struct("__prio", *others)).alias("__s")
    )
    return surv.filter(~F.col(f"__s.{delete_col}")).select(
        *[
            F.col(c) if c in keys else F.col(f"__s.{c}").alias(c)
            for c in cols
        ]
    )
