#!/usr/bin/env python
"""Capture `.explain("formatted")` snapshots for the optimization-round
evidence trail (plans/r{N}/<query>_{before,after}.txt).

Usage:
    PYTHONPATH=/root/repo python scripts/dump_opt_plans.py <suffix> <query ...>
    PYTHONPATH=/root/repo python scripts/dump_opt_plans.py before exec_daily_kpi

Writes plans/r16/<query>_<suffix>.txt for each named query, at the bench
scale factor (sf0.1 unless $SPARK_GRAFT_SF_DIR overrides).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def main() -> None:
    from multichannel_commerce_data_pipeline_spark.queries import load_registry
    from multichannel_commerce_data_pipeline_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("mcdp-plan-dump")
    registry = load_registry()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
