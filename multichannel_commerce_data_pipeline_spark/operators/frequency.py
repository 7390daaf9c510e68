"""Heavy hitters — bounded-state frequent-item estimation (Misra-Gries).

Finding the dominant keys of a 100 TB stream (top domains in a web
corpus, hot SKUs, abusive client ids) with an exact ``GROUP BY key``
shuffles every distinct key; when the key space is huge (URLs, user
agents) that shuffle IS the job. The Misra-Gries summary keeps at most
``k`` counters per partition — memory O(k), strictly map-side — and
ships only ``<= k`` tiny ``(key, est)`` rows per partition into a final
merge, so the shuffle is bounded by ``k x partitions`` rows no matter
how large the data or the key space grows.

Guarantees (the classic MG analysis, preserved by the per-partition +
merge decomposition used here):

* **never overestimates**: each counter only accumulates exact batch
  counts and is decremented, so ``est <= true_count``;
* **bounded undercount**: every decrement round subtracts ``d`` from
  all surviving counters while at least ``k+1`` counters are live, so
  total subtracted count is ``>= (k+1) * d`` per round; with ``N_p``
  rows in partition ``p``, any key's undercount is ``<= N_p/(k+1)``.
  Summing over partitions (a key absent from a partition's summary was
  decremented to 0 there): ``true - N/(k+1) <= sum(est) <= true``;
* hence every key with ``true_count > N/(k+1)`` is guaranteed present
  in the merged summary — the "heavy hitters cannot be missed" bound.

The kernel is an Arrow ``mapInPandas`` on the declared X5 surface: each
batch is first reduced with a vectorized ``value_counts`` (exact batch
partial), then merged into the capped counter dict — per-key Python
work is O(distinct-per-batch), never per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import portable_hash64


def _mg_kernel(key_col: str, k: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[key_col].dropna().astype(str).value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                # batched decrement: subtract the (k+1)-th largest
                # count from everyone; >= k+1 counters shrink, so the
                # N_p/(k+1) undercount bound holds per round.
                d = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - d for key, c in counters.items() if c - d > 0
                }
        yield pd.DataFrame(
            {"key": list(counters), "est": list(counters.values())},
            columns=["key", "est"],
        ).astype({"key": str, "est": "int64"})

    return kernel


def heavy_hitter_estimates(
    df: DataFrame, key: Column, k: int = 24
) -> DataFrame:
    """Merged Misra-Gries frequency estimates: ``(key string, est
    long)`` with ``true - N/(k+1) <= est <= true`` per key.

    One narrow map pass (bounded state) + one tiny merge shuffle of
    ``<= k`` rows per partition — the 100 TB shape. The estimates are
    partition-layout dependent within the bound; callers that need a
    deterministic, driver-checkable surface should assert the BOUND
    against exact counts (see ``event_heavy_hitters``), never the raw
    estimate values.
    """
    keyed = df.select(key.cast("string").alias("key"))
    partials = keyed.mapInPandas(_mg_kernel("key", k), "key string, est long")
    return partials.groupBy("key").agg(F.sum("est").alias("est"))


def cm_sketch(
    df: DataFrame,
    key: Column,
    w: int = 64,
    d: int = 3,
    seed: int = 131,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min sketch build: a ``d x w`` counter grid as a ``(j,
    bucket, cell)`` frame (at most ``d*w`` rows), where row ``j`` of the
    grid counts keys under hash function ``j``.

    The dual of Misra-Gries above: MG NEVER OVERestimates (and may
    undercount by N/(k+1)); Count-Min NEVER UNDERestimates (and may
    overcount by colliding keys, E[over] <= N/w per hash row, so the
    min over d rows is within eps*N, eps = e/w, w.h.p. — Cormode &
    Muthukrishnan 2005). Together they bracket a key's true frequency
    from both sides with O(d*w + k) state.

    Scale shape: each input row emits its d (row, bucket) increments
    map-side and ONE partial-aggregated group-by collapses them — the
    exchange carries at most ``d*w*partitions`` tiny rows no matter the
    key cardinality, and two sketches merge by adding cells (the
    group-by IS the merge), so the operator distributes and streams for
    free. Hashing is the same Kirsch-Mitzenmacher double-hash family as
    the Bloom filter (one md5 per row, split into h1/h2), making every
    bucket position — and therefore the whole sketch — reproducible in
    an external SQL engine, which Spark's xxhash64-based CountMinSketch
    aggregate is not.

    ``weight`` (optional, must be a non-NULL BIGINT column) folds a
    PRE-AGGREGATED input: a row carrying ``(key, weight)`` increments
    the key's d cells by ``weight`` instead of 1, so a sketch built
    from a per-key count histogram is cell-for-cell identical to one
    built from the raw rows (each key hashes to the same buckets; the
    bucket sum groups the same addends) — one shared aggregate instead
    of a second full scan when the caller already has the histogram
    (r16 optimization round, guide §2.3 "aggregate before you
    shuffle").
    """
    from multichannel_commerce_data_pipeline_spark.operators.bloom import _positions

    pos = _positions(key.cast("string"), w, d, seed)
    cols = [] if weight is None else [weight.alias("__w")]
    inc = df.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        p.cast("int").alias("bucket"),
                    )
                    for j, p in enumerate(pos)
                ]
            )
        ).alias("c"),
    )
    cell = (
        F.count(F.lit(1)) if weight is None else F.sum("__w").cast("long")
    )
    return inc.groupBy(
        F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
    ).agg(cell.alias("cell"))


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    w: int = 64,
    d: int = 3,
    seed: int = 131,
) -> DataFrame:
    """Point-query a built Count-Min sketch: for each distinct probe
    key, ``est = min_j sketch[j][h_j(key)]`` — ``(key, est_count)``.

    The probe frame re-derives its d bucket positions map-side and
    left-joins the (broadcastable, <= d*w rows) sketch; a missing cell
    reads as 0 (only possible for keys the sketch never saw). Estimate
    property: est_count >= true count, always.
    """
    from multichannel_commerce_data_pipeline_spark.operators.bloom import _positions

    pos = _positions(F.col(key_col).cast("string"), w, d, seed)
    pp = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        p.cast("int").alias("bucket"),
                    )
                    for j, p in enumerate(pos)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        pp.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0).cast("long"))).alias(
                "est_count"
            )
        )
    )


def minhash_distinct_sketch(
    df: DataFrame, key: Column, m: int = 128, seed: int = 211
) -> DataFrame:
    """Bucketed min-hash distinct-count sketch: ``(bucket, min_h)`` —
    at most ``m`` rows, where ``min_h`` is the MINIMUM portable hash
    among the distinct keys landing in the bucket.

    The third sketch of the X12 family, covering the statistic the
    other two don't: MG/CM estimate per-key FREQUENCY; this estimates
    CARDINALITY. It is the stochastic-averaging construction HLL uses,
    with full min-hash values as registers instead of leading-zero
    ranks: for ``n_b`` distinct uniform hashes in a bucket, ``min_b/R ~
    Beta(1, n_b)`` with mean ``1/(n_b+1)`` (R = hash range), so the SUM
    of normalized register minima ``S = sum(min_b/R)`` has ``E[S] ≈
    m²/(n+m)`` and inverts to the order-statistics estimator ``n̂ =
    m²/S - m`` (Lumbroso 2010). S keeps every register in the
    NUMERATOR — bounded, no heavy tail; the naive per-register
    ``R/min_b`` has infinite expectation (one tiny minimum explodes
    it) and is exactly what this construction avoids. Trading 64-bit
    registers for HLL's 6-bit ones buys an ESTIMATOR THAT IS PURE
    ARITHMETIC on deterministic hashes — reproducible in an external
    SQL engine bit-for-bit, which neither HLL's harmonic-mean bias
    corrections nor Spark's internal HLL++ sketch format is.

    Scale shape: ``MIN`` is partial-aggregated, so each partition
    contributes at most m rows to the exchange no matter how many rows
    or distinct keys it holds — unlike an exact COUNT DISTINCT, whose
    shuffle carries every distinct key. Sketches merge by bucket-wise
    MIN (streams, partitioned tables, cross-day rollups).

    Estimator accuracy is ~1/sqrt(m) relative (same stochastic-
    averaging analysis as HLL without its low-range corrections);
    callers needing the exact count at driver-table sizes keep the
    exact group-by as the validation harness (`kmv_distinct_estimate`).
    """
    h = portable_hash64(key.cast("string"), seed)
    return (
        df.select(h.alias("h"))
        .select((F.col("h") % m).cast("int").alias("bucket"), "h")
        .groupBy("bucket")
        .agg(F.min("h").alias("min_h"))
    )


def cm_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """JOIN-SIZE estimation by sketch inner product (the AMS/Count-Min
    classic, Cormode & Muthukrishnan 2005 §4.2; Alon-Matias-Szegedy
    1996 for the underlying F2 machinery): ``|A ⋈_key B| = Σ_k
    fA(k)·fB(k)``, and row ``j`` of two same-shaped CM grids estimates
    it as ``Σ_b A[j][b]·B[j][b]`` — colliding keys only ADD mass, so
    each row over-estimates and ``est = min_j`` keeps the guarantee
    ``est >= true`` with E[over] <= Na·Nb/w per row. This is the
    statistic a cost-based optimizer wants BEFORE running a many-many
    join (the self-join/skew blowup predictor): both inputs are
    summarized independently (one bounded map-side pass each, grids
    merge by addition across partitions/streams/days), the estimate
    itself costs a join of two <= d*w-row frames — no key ever
    shuffles. Returns a single row ``(est_join_size decimal(38,0))`` —
    DECIMAL because the per-row product sum is ~Na·Nb/w, which blows
    past int64 at exactly the petabyte scale the estimator exists for
    (1e12-row inputs at w=8192 give ~1.2e20): long arithmetic would
    throw under ANSI or wrap silently without it, while the DuckDB
    oracle's HUGEINT stays exact. Callers compare or cast at their own
    scale's boundary."""
    a = sketch_a.select("j", "bucket", F.col("cell").alias("ca"))
    b = sketch_b.select("j", "bucket", F.col("cell").alias("cb"))
    prod = (
        F.col("ca").cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    per_row = (
        a.join(F.broadcast(b), ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(prod).cast("decimal(38,0)").alias("ip"))
    )
    # disjoint key sets share no (j,bucket) cell in ANY row, so the
    # per-row frame is empty and MIN would return NULL — coalesce to 0,
    # the tight valid answer (an empty inner product implies a zero
    # join-size estimate, which still satisfies est >= true = 0)
    return per_row.agg(
        F.coalesce(F.min("ip"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("est_join_size")
    )
