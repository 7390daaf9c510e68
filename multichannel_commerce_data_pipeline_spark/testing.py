"""Shared oracle-comparison helpers: the driver's correctness protocol
(row count + column names + order-insensitive value compare) used by
both scripts/check.py and tests/.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every driver table registered as a view,
    matching the harness setup."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Order-insensitive canonical form: columns sorted by name, values
    normalized (floats to 9 significant digits, Decimals as floats),
    rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v: Any):
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


def compare(sdf, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Run a Spark DataFrame and an oracle SQL; return a list of
    mismatch descriptions (empty = match)."""
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    problems: list[str] = []
    # The driver canonicalizes through pandas, where DuckDB HUGEINT
    # becomes float64 while Spark emits int64 — a guaranteed hash
    # mismatch even when every value is identical. fetchall() hides this
    # (int128 -> Python int), so check the declared types explicitly.
    for c, t in zip(ocols, otypes):
        if t in ("HUGEINT", "UHUGEINT"):
            problems.append(
                f"oracle column {c!r} is {t} (pandas float64 in the driver); "
                f"wrap it in CAST(... AS BIGINT)"
            )
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            diff = next((i for i, (a, b) in enumerate(zip(cs, co)) if a != b), None)
            problems.append(
                f"values differ; first diff row {diff}: "
                f"spark={cs[diff] if diff is not None else '?'} "
                f"oracle={co[diff] if diff is not None else '?'}"
            )
    return problems
