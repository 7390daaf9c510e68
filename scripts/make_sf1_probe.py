#!/usr/bin/env python
"""Deterministic sf1-shaped probe data: 10x key-shifted replication of
/root/testdata/sf0.1 (verdict r16 item #5 — the 8-core-vs-32-core
probe at sf0.1 is overhead-bound; real scaling evidence needs a real
data step).

Each replica shifts every ENTITY key (customer/order/part/supplier/
doc/vec/event/user ids) by replica * STRIDE where STRIDE is a power of
ten >= max(key)+1 across tables (so cross-table references stay
consistent and id-modulus conventions — IVF/PQ stride sampling,
vec_id % 10 holdouts — hold inside every replica). Dimension tables
(region, nation) and all non-key attributes are left as-is. The
result is ten disjoint key shards of identical shape: a plan that
scales linearly in the data grows ~10x from sf0.1, so anything
super-linear in the probe is candidate blowup, not data quirk.

NOT an oracle corpus (text/embeddings duplicate verbatim across
replicas; DuckDB parity is only claimed at the driver SFs). Writes to
/tmp/sf1_probe (regenerable; never under /root/testdata, which is
read-only driver data).

Usage: PYTHONPATH=/root/repo python scripts/make_sf1_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_probe"
N_REP = 10

# table -> entity-key columns to shift (dims and attributes untouched)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def main() -> None:
    from pyspark.sql import functions as F

    from multichannel_commerce_data_pipeline_spark.session import get_spark
    from multichannel_commerce_data_pipeline_spark.tables import load

    spark = get_spark("make-sf1-probe")

    # one STRIDE for every key family: a power of ten above the global
    # max id, so replica r's ids are r*STRIDE + original everywhere
    gmax = 0
    for t, cols in KEYS.items():
        if not cols:
            continue
        row = load(spark, SRC, t).agg(
            *[F.max(c).alias(c) for c in cols]
        ).collect()[0]
        gmax = max(gmax, *[int(row[c]) for c in cols])
    stride = 10
    while stride <= gmax:
        stride *= 10
    print(f"max id {gmax} -> stride {stride}")

    os.makedirs(DST, exist_ok=True)
    for t, cols in KEYS.items():
        src = load(spark, SRC, t)
        if not cols:
            out = src
        else:
            rep = src.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(N_REP - 1))).alias("__r")
            )
            shifted = rep.select(
                *[
                    (F.col(c) + F.col("__r").cast("long") * stride)
                    .cast(src.schema[c].dataType)
                    .alias(c)
                    if c in cols
                    else c
                    for c in src.columns
                ]
            )
            out = shifted
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: {out.count()} rows")
    print("done:", DST)


if __name__ == "__main__":
    main()
