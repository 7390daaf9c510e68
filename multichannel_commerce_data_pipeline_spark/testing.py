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


def driver_representation_problems(schema, ocols, otypes) -> list[str]:
    """Flag output representations the DRIVER's pandas canonicalizer
    handles differently from us (r5 postmortem — local green must imply
    driver green, so these are hard failures here, not normalizations):

    - DuckDB HUGEINT → pandas float64 while Spark emits int64.
    - DECIMAL: DuckDB → pandas float64, Spark → Python Decimal objects —
      identical values, different canon, guaranteed hash mismatch
      (file_format_roundtrip, red r5). Keep DECIMAL internal for
      order-independent sums; CAST(... AS DOUBLE) at the output boundary
      on BOTH sides.
    - ARRAY/MAP/STRUCT cells: pandas sort_values dies on unhashable
      lists/dicts (embedding_pq_codes, err r5). Serialize via
      array_join / array_to_string, or explode to scalar rows.
    """
    from pyspark.sql import types as T

    problems: list[str] = []
    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            problems.append(
                f"spark output column {f.name!r} is {f.dataType.simpleString()} "
                f"(driver hashes Python Decimal != DuckDB float64); cast the "
                f"output boundary to DOUBLE on both sides"
            )
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(
                f"spark output column {f.name!r} is {f.dataType.simpleString()} "
                f"(driver pandas sort crashes on unhashable cells); serialize "
                f"with array_join or explode to scalar rows"
            )
    for c, t in zip(ocols, otypes):
        if t in ("HUGEINT", "UHUGEINT"):
            problems.append(
                f"oracle column {c!r} is {t} (pandas float64 in the driver); "
                f"wrap it in CAST(... AS BIGINT)"
            )
        if t.startswith("DECIMAL"):
            problems.append(
                f"oracle column {c!r} is {t} (pandas float64 in the driver "
                f"while Spark Decimal stays Decimal); CAST(... AS DOUBLE) "
                f"on both sides"
            )
        if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST")):
            problems.append(
                f"oracle column {c!r} is {t} (unhashable in the driver's "
                f"pandas canonicalizer); serialize to a scalar"
            )
    return problems


def compare(sdf, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Run a Spark DataFrame and an oracle SQL; return a list of
    mismatch descriptions (empty = match)."""
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    problems = driver_representation_problems(sdf.schema, ocols, otypes)
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
