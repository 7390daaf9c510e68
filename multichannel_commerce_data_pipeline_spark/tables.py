"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Catalog-style memo of the lazy table frames, keyed like session_memo
# by (applicationId, sf_dir, table). spark.read.parquet costs ~110 ms
# of py4j reader setup + footer schema read PER CALL, and every one of
# the 215 registered queries re-pays it for each table it touches
# (profiled: 0.56 s of exec_daily_kpi's 1.3 s plan build was five
# load() calls). The driver tables are immutable for a session's
# lifetime, and a DataFrame is an immutable lazy plan — serving the
# same handle is exactly what a catalog's resolved-relation cache
# does. Entries from other sessions/applications are evicted on the
# next call for the same (sf_dir, table); nothing is persisted, so
# eviction is just a dict pop.
#
# Keyed by the SESSION, not just the application (r9 advice #2): both
# the cached DataFrame and the events nanosAsLong conf are
# SparkSession-scoped, so a spark.newSession() sibling (same appId)
# must miss the cache and set its own conf. The cache value holds the
# owning session object, which (a) lets the lookup verify identity and
# (b) pins the id() from reuse while the entry lives.
#
# Same-app entries are bounded (r10 advice #3): a weakref on the
# session cannot work here — every cached DataFrame strongly
# references its owning session internally, so the weakref would never
# die while the entry lives. Instead the cache keeps entries for at
# most _SAME_APP_SESSION_CAP sibling sessions per application,
# evicting the OLDEST sibling's entries (dict insertion order) when a
# newer session pushes past the cap — a caller that churns
# spark.newSession() in a loop now pins at most cap x tables lazy
# frames instead of growing without bound.
_LOAD_CACHE: dict[tuple[str, int, str, str], tuple[SparkSession, DataFrame]] = {}
_SAME_APP_SESSION_CAP = 4


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one table (memoized per session — see
    _LOAD_CACHE). Filters/projections applied by callers are pushed
    into this scan by Catalyst (PushedFilters / ReadSchema).

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4.x rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos
    as a long and convert to a microsecond timestamp — same truncation
    DuckDB applies when it coerces TIMESTAMP_NS to its microsecond
    TIMESTAMP, so both engines see identical values.
    """
    key = (spark.sparkContext.applicationId, id(spark), sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    # Evict only entries from OTHER applications (their context is
    # gone in the one-active-context harness). Same-app sibling
    # sessions keep their own entries: evicting them would make two
    # live sessions thrash the memo on every alternating load, and a
    # sibling's entry dies with the shared context anyway (sessions
    # have no independent stop), so same-app entries stay bounded by
    # live-sessions x tables.
    for stale in [
        k for k in _LOAD_CACHE if k[2:] == key[2:] and k[0] != key[0]
    ]:
        _LOAD_CACHE.pop(stale)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    _LOAD_CACHE[key] = (spark, df)
    # bound same-app sibling sessions (oldest-session eviction, never
    # the session that just inserted)
    sessions = list(
        dict.fromkeys(k[1] for k in _LOAD_CACHE if k[0] == key[0])
    )
    for sid in sessions[: max(0, len(sessions) - _SAME_APP_SESSION_CAP)]:
        if sid == key[1]:
            continue
        for stale in [
            k for k in _LOAD_CACHE if k[0] == key[0] and k[1] == sid
        ]:
            _LOAD_CACHE.pop(stale)
    return df


# Fan-out key preference for parallelize_small_scan (r16 optimization
# round): a KEYLESS repartition(n) is round-robin, and Spark inserts a
# LOCAL SORT of the full input rows before it (sortBeforeRepartition,
# on by default since SPARK-23207, so retried map tasks reproduce the
# same row→partition assignment — guide §2.5). On a single-row-group
# driver table that sort runs inside the one serial scan task, over
# the WIDE pre-projection row; measured on lineitem at sf0.1:
# round-robin fan-out 0.87 s vs hash fan-out 0.58 s bare, and 1.34 s
# vs 0.77 s through the arithmetic_margin projection. Hash
# partitioning needs no such sort (the row→partition map is already a
# deterministic function of the key), is retry-deterministic at scale
# for free, and — when the downstream plan aggregates/joins on the
# same key — doubles as the semantic distribution (the exec_daily_kpi
# `by=` precedent). So when the caller names no key, fan out on the
# first high-cardinality table key present in the frame; fall back to
# round-robin only when none is (derived frames of computed columns).
_FANOUT_KEYS = (
    "l_orderkey",
    "o_orderkey",
    "event_id",
    "doc_id",
    "vec_id",
    "c_custkey",
    "p_partkey",
    "s_suppkey",
)


def parallelize_small_scan(
    spark: SparkSession,
    df: DataFrame,
    min_parts: int | None = None,
    by: str | None = None,
) -> DataFrame:
    """Repartition a scan only if it produced fewer partitions than the
    cluster has cores. Single-file tables (the driver's documents/
    embeddings parquet has one row group) scan as ONE partition, which
    serializes compute-heavy per-row work (shingling, hashing, dot
    products). At real scale the scan has thousands of splits and this
    is a no-op — the check keeps the extra shuffle out of plans that
    don't need it.

    ``by``: when the downstream plan aggregates/joins on a key, hash-
    repartition on it instead of round-robin — the fan-out exchange then
    *satisfies* the aggregation's distribution requirement, so Catalyst
    elides the second exchange (one shuffle of the fact rows instead of
    round-robin + hash; verified in exec_daily_kpi's plan).

    The partition count is ESTIMATED from the scan's file listing
    (Spark's own maxSplitBytes bin-packing formula) instead of
    ``df.rdd.getNumPartitions()``: touching ``.rdd`` forces physical
    planning of the whole frame on the driver (~80 ms per call, and the
    only RDD-API touch in the package). Files that can't be stat'ed
    (non-local filesystems) are treated as a large scan — the at-scale
    case, where this helper must be a no-op anyway."""
    target = min_parts or spark.sparkContext.defaultParallelism
    if _estimate_scan_partitions(spark, df) < target:
        if by is None:
            cols = set(df.columns)
            by = next((k for k in _FANOUT_KEYS if k in cols), None)
        return df.repartition(target, F.col(by)) if by else df.repartition(target)
    return df


def _size_conf(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ("134217728", "134217728b",
    "128m", "128MB") into bytes."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    mult, num = 1, raw
    for suffix in ("kb", "mb", "gb", "k", "m", "g", "b"):
        if raw.endswith(suffix):
            mult, num = units[suffix[0]], raw[: -len(suffix)]
            break
    try:
        return int(num) * mult
    except ValueError:
        return default


def _estimate_scan_partitions(spark: SparkSession, df: DataFrame) -> int:
    """Estimate how many partitions a file scan produces, from the file
    listing alone: Spark packs split chunks of maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, total/parallelism))
    into partitions, so the count is ~ceil(padded-total / split).
    Returns a large number when sizes are unknowable (remote fs) so
    callers treat the scan as already parallel."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1 << 30
    local = [f.removeprefix("file:") for f in files if f.startswith("file:")]
    if not files or len(local) < len(files):
        return 1 << 30
    try:
        sizes = [os.path.getsize(f) for f in local]
    except OSError:
        return 1 << 30
    open_cost = _size_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_bytes = _size_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    total = sum(s + open_cost for s in sizes)
    parallelism = spark.sparkContext.defaultParallelism
    split = min(max_bytes, max(open_cost, total // max(parallelism, 1)))
    return max(1, -(-total // max(split, 1)))


def session_memo(spark: SparkSession, cache: dict, sf_dir: str, build):
    """Memoize a per-``sf_dir`` DataFrame artifact (persisted LSH index,
    cluster labels, co-purchase edges, trained centroids, ...), keyed
    ADDITIONALLY by the owning SparkSession's applicationId.

    A cached/persisted DataFrame is bound to the session that built it:
    if that session is stopped and a new one created in-process
    (multi-session test suites, driver restarts), a plain
    ``dict[sf_dir]`` hands back a frame whose SparkContext is dead and
    every later use fails. Keying by (applicationId, sf_dir) makes a
    fresh session rebuild the artifact; entries from other application
    ids for the same sf_dir are evicted (their session is gone in the
    one-active-session harness, and eviction keeps the dict bounded —
    worst case a live concurrent session rebuilds, costing time, never
    correctness)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in cache:
        for stale in [k for k in cache if k[1] == sf_dir and k != key]:
            evicted = cache.pop(stale)
            # Best-effort release of the evicted artifact's cached
            # blocks: in the common harness case its session is already
            # dead (unpersist raises, nothing to free), but a live
            # concurrent session's artifact would otherwise leak its
            # storage until that session exits. Artifacts are either a
            # DataFrame or a tuple/list that may CONTAIN DataFrames
            # (e.g. (centroids_df, assignments_df)) — unwrap and
            # unpersist each frame explicitly; scalar members
            # (collected constants) have nothing to free.
            members = (
                evicted if isinstance(evicted, (tuple, list)) else (evicted,)
            )
            for member in members:
                if isinstance(member, DataFrame):
                    try:
                        member.unpersist()
                    except Exception:
                        pass  # dead session: nothing to free
        cache[key] = build()
    return cache[key]


# (applicationId, path) -> scan DataFrame for immutable published
# artifacts — see parquet_memo.
_PARQUET_SCANS: dict[tuple[str, str], DataFrame] = {}


def parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` memoized per (session, path) for
    IMMUTABLE-once-published artifact directories (the fingerprinted
    ``ensure_*`` layouts: their path embeds the source digest and they
    publish by atomic rename, so path identity == content identity).

    Every fresh ``spark.read.parquet`` call re-lists the directory and
    re-reads a footer for schema inference — driver-side work a real
    warehouse does once per table via its catalog/manifest (guide §6:
    file-listing cost; Iceberg/Delta's strongest practical argument).
    Reusing the scan node reuses the session's cached FileIndex instead
    of rebuilding it on every query construction. Only the UNEXECUTED
    scan plan is cached — every execution still reads the parquet
    files. Never use this for per-run temp dirs (a fresh path per call
    would just grow the dict) or for dirs rewritten in place (the
    snapshot would go stale)."""
    key = (spark.sparkContext.applicationId, path)
    if key not in _PARQUET_SCANS:
        _PARQUET_SCANS[key] = spark.read.parquet(path)
    return _PARQUET_SCANS[key]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
