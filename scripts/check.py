#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every registered
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.

Usage: python scripts/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if hasattr(v, "quantize"):  # Decimal
            return f"{float(v):.9g}"
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from multichannel_commerce_data_pipeline_spark.queries import load_registry
    from multichannel_commerce_data_pipeline_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry = load_registry()
    n_pass = n_fail = n_err = n_nooracle = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"ERROR  {name}: spark: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        if not q.oracle:
            print(f"NOORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_nooracle += 1
            continue
        try:
            ores = con.execute(q.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"ERROR  {name}: duckdb: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            cs, co = canon([tuple(r) for r in srows], scols), canon(orows, ocols)
            if cs != co:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(cs, co)) if a != b), None
                )
                problems.append(
                    f"values differ; first diff row {diff}:\n"
                    f"    spark:  {cs[diff] if diff is not None else '?'}\n"
                    f"    oracle: {co[diff] if diff is not None else '?'}"
                )
        if problems:
            print(f"FAIL   {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_err} error, "
        f"{n_nooracle} no-oracle =="
    )
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
