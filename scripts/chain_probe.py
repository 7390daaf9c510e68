#!/usr/bin/env python
"""Adversarial convergence probe for connected components: planted
LONG-CHAIN graphs, the worst case for min-label propagation (rounds =
graph diameter) and the case the star-contract fallback exists for.

The sf-table probe (scripts/scale_probe.py) measures dedup_clusters on
the real near-dup graph, which is clique-shaped and converges in a few
rounds; this probe plants pathological chains 10x and 100x past the
label-propagation budget and records, per scale:

* that the fallback TRIGGERS (label propagation exhausts max_iter),
* star-contract rounds to fixpoint (should grow ~log^2 of chain
  length, NOT linearly — the property that makes it the 100 TB path),
* wall time end to end,
* correctness: every planted component collapses to exactly one
  cluster labeled by its min id.

Usage: PYTHONPATH=/root/repo python scripts/chain_probe.py
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, chain nodes, n cliques of 5) — components = 1 chain + cliques
SCALES = [
    ("chain 20k + 1k cliques", 20_000, 1_000),
    ("chain 200k + 10k cliques", 200_000, 10_000),
]


def planted_graph(spark, chain_n: int, n_cliques: int):
    """One chain 0-1-2-...-chain_n plus n_cliques disjoint 5-cliques
    starting at id 10M — all built with spark.range, no driver lists."""
    from pyspark.sql import functions as F

    chain = spark.range(chain_n).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    base = F.lit(10_000_000) + F.col("id") * 5
    members = spark.range(n_cliques).select(
        F.explode(
            F.array(*[F.array(base + i, base + j)
                      for i in range(5) for j in range(i + 1, 5)])
        ).alias("e")
    )
    cliques = members.select(
        F.col("e")[0].alias("doc_a"), F.col("e")[1].alias("doc_b")
    )
    return chain.union(cliques)


def main() -> None:
    from pyspark.sql import functions as F

    from multichannel_commerce_data_pipeline_spark.operators.dedup import (
        dedup_clusters,
    )
    from multichannel_commerce_data_pipeline_spark.session import get_spark

    spark = get_spark("mcdp-chain-probe")
    for label, chain_n, n_cliques in SCALES:
        pairs = planted_graph(spark, chain_n, n_cliques).localCheckpoint()
        n_components = 1 + n_cliques
        stats: dict = {}
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            out = dedup_clusters(pairs, stats=stats)
            agg = out.agg(
                F.count_distinct("cluster_id").alias("n_clusters"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum((F.col("cluster_id") == 0).cast("long")).alias("chain_docs"),
            ).first()
        wall = time.perf_counter() - t0
        ok = (
            agg.n_clusters == n_components
            and agg.chain_docs == chain_n + 1
        )
        print(
            f"{label}: wall={wall:.1f}s lp_rounds={stats.get('rounds')} "
            f"fallback={stats.get('fallback')} "
            f"star_rounds={stats.get('star_rounds')} "
            f"clusters={agg.n_clusters}/{n_components} "
            f"correct={'YES' if ok else 'NO'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
