#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every registered
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.

Usage: python scripts/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from multichannel_commerce_data_pipeline_spark.queries import load_registry
    from multichannel_commerce_data_pipeline_spark.session import get_spark
    from multichannel_commerce_data_pipeline_spark.testing import (
        compare,
        oracle_connection,
    )

    spark = get_spark("check")
    con = oracle_connection(sf_dir)

    n_pass = n_fail = n_err = n_nooracle = 0
    for name, q in sorted(load_registry().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            if not q.oracle:
                print(f"NOORACLE {name}: rows={sdf.count()} ({time.time()-t0:.1f}s)")
                n_nooracle += 1
                continue
            problems = compare(sdf, con, q.oracle)
        except Exception as e:
            print(f"ERROR  {name}: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        if problems:
            print(f"FAIL   {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass   {name} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_err} error, "
        f"{n_nooracle} no-oracle =="
    )
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
