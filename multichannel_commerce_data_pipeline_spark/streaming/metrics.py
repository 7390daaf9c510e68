"""Streaming pipeline METRICS sink — the observability surface the
reference declares but never produces (`docker-compose.yml:163-168`
creates `pipeline-metrics` / `data-quality-alerts` topics; nothing in
the repo ever publishes to them). Spark-first, the right mechanism is
a ``StreamingQueryListener``: the engine already computes per-batch
progress (input rows, processing rates, batch duration, state-store
rows) for every structured-streaming query — the listener just lands
it durably, so EVERY stream job in the package gains monitoring
without touching its plan (zero per-batch overhead on the query
itself; progress events arrive on the listener bus thread).

Records land as JSON lines (one per micro-batch progress event,
appended under an exclusive lock — listener callbacks may fire from
multiple bus threads) and read back as a TYPED DataFrame via an
explicit schema (`read_metrics`), so a monitoring rollup is an
ordinary batch query over the landed history: lag detection
(`inputRowsPerSecond > processedRowsPerSecond` sustained), batch-
duration regression bands (the `daily_anomaly_bands` idiom), state
growth audits (`stateRows` should be bounded for every stateful op in
this package — the O(domains)/O(bins) guarantees become CHECKABLE
numbers). At scale the same listener feeds a Kafka topic or a
metrics-system sink; the JSONL landing keeps the sandbox path
dependency-free.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = (
    "query_id string, run_id string, query_name string, batch_id long,"
    " event_ts string, num_input_rows long, input_rps double,"
    " processed_rps double, batch_duration_ms long, n_state_ops long,"
    " state_rows long"
)


class MetricsRecorder(StreamingQueryListener):
    """Land one JSONL row per micro-batch progress event.

    Register with ``spark.streams.addListener(rec)``; remove with
    ``spark.streams.removeListener(rec)`` when done (tests do both).
    The write path is plain-Python file append — listener callbacks
    must never block on Spark actions (a listener that runs jobs can
    deadlock the bus), and an append under a lock is atomic enough for
    the one-file-per-recorder layout."""

    def __init__(self, out_dir: str) -> None:
        self._dir = Path(out_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._path = self._dir / "progress.jsonl"
        self._lock = threading.Lock()

    # -- listener surface -------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state_ops = p.get("stateOperators") or []
        row = {
            "query_id": p.get("id"),
            "run_id": p.get("runId"),
            "query_name": p.get("name"),
            "batch_id": p.get("batchId"),
            "event_ts": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows"),
            "input_rps": p.get("inputRowsPerSecond"),
            "processed_rps": p.get("processedRowsPerSecond"),
            "batch_duration_ms": (p.get("durationMs") or {}).get(
                "triggerExecution"
            ),
            "n_state_ops": len(state_ops),
            "state_rows": sum(
                s.get("numRowsTotal") or 0 for s in state_ops
            ),
        }
        line = json.dumps(row) + "\n"
        with self._lock:
            with open(self._path, "a") as f:
                f.write(line)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The landed metrics history as a typed frame — the input to any
    monitoring rollup (lag flags, duration bands, state growth)."""
    return spark.read.schema(METRICS_SCHEMA).json(
        str(Path(out_dir) / "progress.jsonl")
    )


def metrics_rollup(metrics: DataFrame) -> DataFrame:
    """Per-query monitoring rollup over the landed history: batches
    seen, rows ingested, worst batch duration, whether input rate ever
    sustained above processing rate (the backlog signal), and the max
    state-store footprint (bounded-state operators should show a flat
    number here). One bounded group-by — query count, not batch count,
    is the cardinality."""
    lag = (
        F.col("input_rps").isNotNull()
        & F.col("processed_rps").isNotNull()
        & (F.col("input_rps") > F.col("processed_rps"))
    )
    # coalesce: a query whose batches never carried both rate fields
    # (common for drained file sources) must roll up to a CONCRETE
    # False, not NULL — max over all-NULL ints is NULL, and a NULL
    # boolean silently drops the row from downstream `~ever_lagged`
    # filters (ADVICE r14)
    return metrics.groupBy("query_id", "query_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("rows_in"),
        F.max("batch_duration_ms").cast("long").alias("worst_batch_ms"),
        F.coalesce(F.max(lag.cast("int")).cast("boolean"), F.lit(False)).alias(
            "ever_lagged"
        ),
        F.max("state_rows").cast("long").alias("max_state_rows"),
    )


# Committed deterministic metrics history (tests/fixtures/metrics) —
# the planted-rows idiom: the listener above PRODUCES this shape from
# live streams (asserted in tests/test_streaming.py); the registered
# monitoring rollup CONSUMES a pinned history so the driver can check
# its arithmetic against the DuckDB oracle on identical input.
METRICS_FIXTURE = str(
    Path(__file__).resolve().parents[2]
    / "tests"
    / "fixtures"
    / "metrics"
    / "progress.jsonl"
)


def backlog_report(
    metrics: DataFrame,
    run_threshold: int = 3,
    mad_mult: int = 5,
    slope_threshold: float = 0.5,
) -> DataFrame:
    """The per-query ALARM rollup over a landed metrics history — one
    implementation, two drivers (the stream_boilerplate convention):
    the registered `metrics_backlog_report` query runs it over the
    committed deterministic fixture so the driver oracle-checks the
    arithmetic, and tests run it over LIVE listener output. Three
    alarms: sustained backlog (longest consecutive lag run via the
    gaps-and-islands batch_id - row_number grouping; rate-pair NULLs
    never count as lag), slow-batch anomalies (median + mad_mult*MAD
    robust band per query), and state leak (OLS slope of state rows
    over batch_id from integer-exact sufficient statistics). Cost
    scales with batches observed, not data processed; every window
    and group-by keys on query_name."""
    from pyspark.sql import Window

    from multichannel_commerce_data_pipeline_spark.functions import dround

    base = metrics.groupBy("query_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("rows_in"),
        F.max("batch_duration_ms").cast("long").alias("worst_batch_ms"),
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("batch_id").alias("sx"),
        F.sum("state_rows").alias("sy"),
        F.sum(F.col("batch_id") * F.col("state_rows")).alias("sxy"),
        F.sum(F.col("batch_id") * F.col("batch_id")).alias("sxx"),
    )
    lagrows = metrics.filter(
        F.col("input_rps").isNotNull()
        & F.col("processed_rps").isNotNull()
        & (F.col("input_rps") > F.col("processed_rps"))
    ).select("query_name", "batch_id")
    wr = Window.partitionBy("query_name").orderBy("batch_id")
    runs = lagrows.select(
        "query_name",
        (F.col("batch_id") - F.row_number().over(wr)).alias("grp"),
    )
    maxrun = (
        runs.groupBy("query_name", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("rl"))
        .groupBy("query_name")
        .agg(F.max("rl").alias("max_lag_run"))
    )
    dmed = metrics.groupBy("query_name").agg(
        dround(F.percentile("batch_duration_ms", 0.5), 2).alias("med")
    )
    dmad = (
        metrics.join(F.broadcast(dmed), "query_name")
        .groupBy("query_name", "med")
        .agg(
            dround(
                F.percentile(
                    F.abs(F.col("batch_duration_ms") - F.col("med")), 0.5
                ),
                2,
            ).alias("mad")
        )
    )
    danom = (
        metrics.join(F.broadcast(dmad), "query_name")
        .groupBy("query_name")
        .agg(
            F.sum(
                (
                    F.col("batch_duration_ms")
                    > F.col("med") + F.lit(mad_mult) * F.col("mad")
                ).cast("long")
            )
            .cast("long")
            .alias("n_slow_batches")
        )
    )
    slope = dround(
        (F.col("c") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("c") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
        6,
    )
    mlr = F.coalesce(F.col("max_lag_run"), F.lit(0).cast("long"))
    return (
        base.join(F.broadcast(maxrun), "query_name", "left")
        .join(F.broadcast(danom), "query_name")
        .select(
            "query_name",
            "n_batches",
            "rows_in",
            mlr.alias("max_lag_run"),
            (mlr >= run_threshold).alias("backlog_sustained"),
            "worst_batch_ms",
            "n_slow_batches",
            slope.alias("state_slope"),
            (slope > slope_threshold).alias("state_leaking"),
        )
    )
