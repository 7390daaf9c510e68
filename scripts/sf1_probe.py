#!/usr/bin/env python
"""Three-decade scaling probe over the top timed queries (r16 verdict
item #5): sf0.01 -> sf0.1 (driver data) -> sf1-shaped probe data
(scripts/make_sf1_probe.py; 10x key-shifted replication, disjoint key
shards). Warm execution = min of 3 reps after one cold pass, per SF,
one session. A scan/shuffle-bound plan should grow <= ~10x per decade
at these sizes (local fixed overhead amortizes); anything well above
the data step is candidate blowup — re-time solo before believing it
(SCALING.md caveat).

Usage:
  PYTHONPATH=/root/repo python scripts/make_sf1_probe.py   # once
  PYTHONPATH=/root/repo python scripts/sf1_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sf1_probe"),
]

PROBES = [
    "pricing_summary",
    "exec_daily_kpi",
    "salted_skew_agg",
    "window_running_sum",
    "bloom_semi_prune",
    "copurchase_pairs",
    "event_heavy_hitters",
    "negative_samples",
    "containment_dupes",
    "passage_dedup_docs",
    "minhash_lsh_dupes",
    "corpus_prepare",
    "corpus_prepare_decontaminated",
    "token_budget_select",
    "keyword_extraction",
    "curation_signal_table",
    "join_size_estimate",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "rec_hitrate_eval",
    "erasure_propagation",
    "tfidf_top_terms",
]


def main() -> None:
    from multichannel_commerce_data_pipeline_spark.queries import load_registry
    from multichannel_commerce_data_pipeline_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe_results.json"
    spark = get_spark("sf1-probe")
    reg = load_registry()
    res: dict[str, dict[str, float]] = {n: {} for n in PROBES}
    for sf_name, sf_dir in SFS:
        for name in PROBES:
            spark.sparkContext.setJobDescription(f"{sf_name}:{name}")
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # cold (builds per-corpus artifacts)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.perf_counter() - t0)
            res[name][sf_name] = round(min(reps), 3)
            print(f"{sf_name:7s} {name:35s} {min(reps):7.3f}", flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("\nquery                                sf0.01   sf0.1     sf1   g01  g1")
    for name in PROBES:
        r = res[name]
        g01 = r["sf0.1"] / r["sf0.01"] if r.get("sf0.01") else float("nan")
        g1 = r["sf1"] / r["sf0.1"] if r.get("sf0.1") else float("nan")
        print(
            f"{name:35s} {r.get('sf0.01', 0):7.3f} {r.get('sf0.1', 0):7.3f} "
            f"{r.get('sf1', 0):7.3f} {g01:5.1f} {g1:5.1f}"
        )


if __name__ == "__main__":
    main()
