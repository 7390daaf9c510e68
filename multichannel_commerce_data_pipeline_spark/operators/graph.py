"""Graph analytics over edge frames — weighted PageRank.

Connected components (operators/dedup.py) answers "which nodes belong
together"; PageRank answers "which nodes matter": influence ranking
over the co-purchase graph (which products anchor baskets), over a
citation/link graph of a web corpus (seed selection for crawling or
curriculum weighting), over user-interaction graphs (abuse hubs).

Execution model: the rank vector is a ``(node, rank)`` frame; one
iteration is one equi-join of ranks onto the (degree-annotated) edge
frame plus one partial-aggregated group-by on the destination — per
round, one shuffle of edge contributions, nothing quadratic. At
100 TB the edges co-partition on ``src`` and stay partitioned across
rounds; AQE handles hub-node skew on the ``dst`` aggregate the same
way it does any skewed group-by.

Plan depth: for a handful of rounds the whole computation stays ONE
lazy plan — Catalyst's ReuseExchange collapses the repeated edge/deg
subtrees, and no driver-side job runs until the caller acts. Past
``checkpoint_every`` rounds the rank frame is ``localCheckpoint``-ed
so the lineage cannot grow superlinearly (the dedup_clusters
plan-growth lesson) — long-horizon runs trade a per-round
materialization for bounded planning cost.

Determinism: floating-point addition does not commute, so a naive
``SUM(double)`` makes ranks partition-order dependent. Every per-edge
contribution is quantized with :func:`functions.dround` (half-up via a
decimal cast) to 9 dp and summed as ``DECIMAL(28,9)`` — exact and
order-independent — then the damping update re-quantizes to 9 dp.
The whole iteration is therefore bit-reproducible AND expressible in
ANSI SQL, so a DuckDB oracle can unroll the rounds and hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround


def pagerank(
    edges: DataFrame,
    n_iters: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over a directed edge frame ``(src, dst, w)``.

    ``rank_{t+1}(v) = (1-d) + d * Σ_{(u,v)} rank_t(u) * w(u,v)/deg(u)``
    with ``deg(u) = Σ_out w`` — the classic damped update, initialized
    at 1.0. Returns ``(node, rank)`` for every node that appears as a
    destination (on a symmetrized graph: every node). Dangling nodes
    (no out-edges) are assumed absent — symmetrize the graph or drop
    them upstream.

    Fully lazy for short horizons; every ``checkpoint_every`` rounds
    the rank lineage is truncated with an eager ``localCheckpoint`` to
    keep planning cost flat on long runs.
    """
    deg = edges.groupBy("src").agg(F.sum("w").cast("double").alias("deg"))
    ed = edges.join(deg, "src")
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for i in range(n_iters):
        contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            dround((F.col("r") * F.col("w")) / F.col("deg"), 9)
            .cast("decimal(28,9)")
            .alias("c"),
        )
        ranks = contrib.groupBy("node").agg(
            dround(
                F.lit(1.0 - damping)
                + F.lit(damping) * F.sum("c").cast("double"),
                9,
            ).alias("r")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
