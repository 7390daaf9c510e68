"""Engine-portable scalar helpers shared by operators and queries.

These exist because the driver's correctness gate hash-compares Spark
results against a DuckDB oracle: any expression whose result depends on
engine-specific floating-point rounding or hashing must be expressed in
a form both engines evaluate bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dround(col: Column, scale: int = 2) -> Column:
    """Cross-engine deterministic rounding of a DOUBLE expression.

    Spark ``F.round`` on DOUBLE rounds HALF_UP on the decimal rendering
    of the binary value while DuckDB ``ROUND(DOUBLE)`` rounds
    half-to-even, so .5-boundary values (constant in money math like
    ``price/quantity``) diverge. Casting through a DECIMAL first makes
    both engines round the same decimal value HALF_UP:

      Spark:  CAST(ROUND(CAST(x AS DECIMAL(38,scale+4)), scale) AS DOUBLE)
      DuckDB: identical SQL (see :func:`oracle_dround`)

    Validated: both engines agree on the double→decimal cast — both
    quantize the SHORTEST round-trip decimal rendering of the double
    (DuckDB's cast and Java BigDecimal.valueOf both stringify first,
    NOT the exact binary expansion), so a tie at scale+4 digits IS
    possible and resolves HALF_UP identically in both — and on decimal
    ROUND (HALF_UP / away from zero). See :func:`py_dround` for the
    bit-exactness validation of this account.
    """
    return F.round(col.cast(f"decimal(38,{scale + 4})"), scale).cast("double")


def oracle_dround(expr: str, scale: int = 2) -> str:
    """DuckDB SQL string equivalent of :func:`dround`."""
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,{scale + 4})), {scale}) AS DOUBLE)"


def py_dround(x: float, scale: int = 2) -> float:
    """Python twin of :func:`dround` for DRIVER-SIDE constant folding
    (e.g. log-odds weights computed from a collected fitted model and
    injected as literals): must produce bit-identical doubles to the
    DuckDB rendering of :func:`oracle_dround` on the same input.

    Both engines cast DOUBLE→DECIMAL through the SHORTEST round-trip
    decimal rendering (DuckDB's double→decimal cast and Java
    BigDecimal.valueOf both stringify first), NOT the exact binary
    expansion — so a tie at ``scale+4`` digits IS possible and resolves
    HALF_UP. ``Decimal(repr(x))`` reproduces exactly that rendering;
    validated bit-exact against DuckDB on 300k random doubles at
    scales 2/6/9 (a Decimal(x)-based twin diverged on repr-boundary
    ties like -16.84968754049995 at scale 9).
    """
    from decimal import ROUND_HALF_UP, Decimal

    d = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-(scale + 4)), rounding=ROUND_HALF_UP
    )
    return float(d.quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


# Memoized constant Column expression trees. A pyspark Column is an
# immutable wrapper over an UNRESOLVED Catalyst expression — reusable
# across any number of DataFrames (the analyzer re-resolves attribute
# references per plan). Building one, though, costs py4j round trips:
# a higher-order function like zip_with pays ~20 ms (lambda transport
# + invocation), so a 16-slot MinHash signature burns ~0.35 s of pure
# bridge time PER QUERY CONSTRUCTION. Config-keyed memoization builds
# each constant column list once per process; the JVM gateway lives as
# long as the process in local mode, so the cached trees stay valid
# across SparkSession restarts.
_COL_MEMO: dict[tuple, list] = {}


def memo_cols(key: tuple, builder) -> list[Column]:
    """Cache the Column list ``builder()`` under ``key`` (must encode
    every config the expressions depend on, e.g. ``("mh_sig", k)``).
    Only for columns over FIXED input-column names — anything
    parameterized by data or caller-chosen names belongs in the key."""
    if key not in _COL_MEMO:
        _COL_MEMO[key] = list(builder())
    return _COL_MEMO[key]


def stage_filter(df: DataFrame, cond: Column) -> DataFrame:
    """Filter that stays WHERE IT IS WRITTEN instead of being pushed
    down to the scan.

    Catalyst pushes any deterministic predicate through Project and
    Repartition all the way into the parquet scan's DataFilters. For a
    compute-heavy DERIVED predicate (a tokenizer fold, a model scoring
    aggregate) over a single-row-group table, that re-serializes the
    whole corpus into the one scan task — silently defeating
    tables.parallelize_small_scan's fan-out the same way the inferred
    explode filter did in r7 (plan audit r9: corpus_prepare,
    corpus_prepare_curated, text_quality_filter, lm_perplexity_score,
    hybrid_search_rrf all carried their scoring fold in DataFilters).
    OR-ing a never-true NONDETERMINISTIC sentinel pins the filter:
    Catalyst only pushes deterministic predicates, and codegen's
    short-circuit ``||`` skips the sentinel whenever the real
    predicate holds. monotonically_increasing_id() is non-negative by
    construction, so ``< -1`` is statically never true — no rand(),
    no value change, bit-identical results.

    At real multi-split scale the pin costs nothing: the filter still
    runs pipelined inside the scan stage, and a derived expression
    never contributes parquet row-group pruning stats anyway. Use for
    expensive predicates only — cheap column comparisons SHOULD push
    into the scan.
    """
    return df.filter(cond | (F.monotonically_increasing_id() < F.lit(-1)))


def portable_hash64(col: Column, seed: int) -> Column:
    """Portable 60-bit integer hash: leading 15 hex chars of
    md5(seed:value), identical in DuckDB as
    ``CAST(('0x' || substr(md5(concat('seed:', x)), 1, 15)) AS BIGINT)``.

    The JVM fast path for shuffle-key hashing is ``F.xxhash64``; this
    md5 form is for anything whose value must be oracle-reproducible.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def oracle_hash64(expr: str, seed: int) -> str:
    """DuckDB SQL string equivalent of :func:`portable_hash64`."""
    return f"CAST(('0x' || substr(md5(concat('{seed}:', {expr})), 1, 15)) AS BIGINT)"


def portable_hash32(col: Column, seed: int) -> Column:
    """Portable 32-bit hash (leading 8 hex chars of md5) — the second
    hash of a Kirsch-Mitzenmacher double-hashing family
    ``h_j = h1 + j * h2``: keeping h2 at 32 bits guarantees
    ``h1 + j*h2`` never overflows BIGINT (DuckDB errors on overflow
    where the JVM would silently wrap)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("long")


def oracle_hash32(expr: str, seed: int) -> str:
    """DuckDB SQL string equivalent of :func:`portable_hash32`."""
    return f"CAST(('0x' || substr(md5(concat('{seed}:', {expr})), 1, 8)) AS BIGINT)"
