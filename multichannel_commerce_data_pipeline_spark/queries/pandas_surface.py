"""X5 query bindings: each pandas-UDF API (SCALAR, GROUPED_AGG,
applyInPandas, mapInPandas) exercised end-to-end against a plain-SQL
DuckDB oracle — proving the Arrow path computes exactly what the
declarative form would."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround, oracle_dround
from multichannel_commerce_data_pipeline_spark.operators.pandas_ops import (
    double_clicks_batches,
    group_zscore,
    token_count_pd,
    weighted_avg_pd,
)
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


@query(
    "pandas_scalar_tokens",
    oracle="""
    SELECT
      doc_id,
      len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
    FROM documents
    WHERE len(trim(text)) > 0
    """,
)
def pandas_scalar_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 SCALAR: vectorized pandas_udf token count over Arrow batches
    (the escape hatch when tokenization outgrows regexp built-ins)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", token_count_pd(F.col("text")).alias("n_tokens")
    )


@query(
    "udtf_sentence_split",
    oracle="""
    WITH parts AS (
      SELECT doc_id,
             regexp_split_to_array(text, '[.!?]+\\s+') AS arr
      FROM documents
      WHERE len(trim(text)) > 0
    )
    SELECT p.doc_id,
           CAST(i AS INTEGER)  AS sent_idx,
           arr[i]              AS sentence
    FROM parts p, UNNEST(generate_series(1, len(arr))) AS t(i)
    WHERE len(trim(arr[i])) > 0
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 UDTF: the table-function Python shape — one document row
    expands to N (sent_idx, sentence) rows through a LATERAL join
    against the registered Python UDTF (Arrow transport, no shuffle;
    operators/udtf_ops.py). The oracle is the equivalent declarative
    regex split, proving the imperative kernel computes exactly what
    explode(split(...)) would — the parity bar any Python escape hatch
    must clear before it earns a place in a pipeline."""
    from multichannel_commerce_data_pipeline_spark.operators.udtf_ops import (
        SplitSentences,
    )

    spark.udtf.register("split_sentences", SplitSentences)
    load(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM udtf_docs_v d, LATERAL split_sentences(d.text) s
        """
    )


@query(
    "pandas_udaf_weighted_avg",
    oracle=f"""
    SELECT
      l_returnflag,
      {oracle_dround("SUM(l_extendedprice * l_quantity) / SUM(l_quantity)", 4)}
        AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 GROUPED_AGG (UDAF): quantity-weighted average price per
    return flag, computed in one pandas call per group.

    A GROUPED_AGG pandas UDF gets NO partial aggregation — the raw
    form ships every fact row through the Arrow boundary into
    |groups| reduce tasks (3 here), so boundary traffic and per-task
    group size both grow with the fact table. Reduce in the JVM
    first: exact partial sums per (flag, deterministic salt), then
    the SAME UDAF combines the ≤3·128 partial rows — the weighted
    mean of partial means, weighted by the partial weights, IS the
    global weighted mean (Σpv/Σpw). The salt is hash-derived, not
    rand(), so retried map tasks reproduce it (SPARK-38388).

    Coverage note (ADVICE r16): with the JVM pre-reduction the UDAF
    only ever sees the ≤3·128 partial rows, so this query no longer
    exercises (or benchmarks) the fact-scale GROUPED_AGG Arrow path —
    it is the X5 surface probe for the UDAF CALL shape; the
    row-volume Arrow boundary is stressed by the mapInPandas /
    applyInPandas queries below."""
    li = load(spark, sf_dir, "lineitem")
    parts = li.groupBy(
        "l_returnflag",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(128)).alias("__salt"),
    ).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("__pv"),
        F.sum("l_quantity").alias("__pw"),
    )
    # ADVICE r16: divide as DOUBLE — the DECIMAL quotient (default
    # allowPrecisionLoss) rounds each partial mean to scale 6 before
    # the UDAF recombines, a latent divergence from SUM(v*w)/SUM(w)
    # near 4th-decimal rounding boundaries; double keeps ~1e-16
    # relative error. A zero-weight bucket (unreachable with positive
    # TPC-H quantities, but latent) would make the quotient NULL and
    # crash the UDAF's value*weight — drop it before the recombine.
    return (
        parts.filter(F.col("__pw") != 0)
        .groupBy("l_returnflag")
        .agg(
            dround(
                weighted_avg_pd(
                    F.col("__pv").cast("double")
                    / F.col("__pw").cast("double"),
                    F.col("__pw"),
                ),
                4,
            ).alias("weighted_avg_price")
        )
    )


@query(
    "pandas_apply_zscore",
    oracle=f"""
    SELECT
      o_orderkey,
      o_orderpriority,
      {oracle_dround(
        "(o_totalprice - AVG(o_totalprice) OVER w) / STDDEV_SAMP(o_totalprice) OVER w",
        6,
      )} AS zscore
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def pandas_apply_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 applyInPandas (grouped map): within-priority z-score of order
    value — per-group logic too stateful for a window expression family,
    verified against its window-SQL equivalent."""
    o = load(spark, sf_dir, "orders")
    out = o.select("o_orderkey", "o_orderpriority", "o_totalprice")
    zs = out.groupBy("o_orderpriority").applyInPandas(
        lambda pdf: group_zscore(
            pdf, "o_totalprice", ["o_orderkey", "o_orderpriority", "zscore"]
        ),
        "o_orderkey LONG, o_orderpriority STRING, zscore DOUBLE",
    )
    return zs.select("o_orderkey", "o_orderpriority", dround(F.col("zscore"), 6).alias("zscore"))


@query(
    "pandas_map_batches",
    oracle="""
    SELECT event_id, user_id, "value" * CAST(2.0 AS DOUBLE) AS boosted
    FROM events
    WHERE event_type = 'click'
    """,
)
def pandas_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 mapInPandas: per-Arrow-batch filter + derive — O(batch)
    memory regardless of partition size (the multimodal decode path
    uses the same iterator shape)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "event_type", "value").mapInPandas(
        double_clicks_batches, "event_id LONG, user_id LONG, boosted DOUBLE"
    )


@query(
    "event_heavy_hitters",
    oracle="""
    WITH exact AS (
      SELECT user_id, COUNT(*) AS n
      FROM events
      GROUP BY user_id
    ), ranked AS (
      SELECT user_id, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
      FROM exact
    )
    SELECT user_id, n, TRUE AS within_bound
    FROM ranked WHERE rk <= 10
    """,
)
def event_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state heavy hitters (Misra-Gries, k=24) over event
    user_ids, merged across partitions. The estimates are layout-
    dependent within the proven bound, so the driver-checkable surface
    is the BOUND, not the estimate: for the exact top-10 users (exact
    group-by = the validation harness, like the approx sketches'), the
    merged estimate must satisfy ``exact - N/(k+1) <= est <= exact`` —
    guaranteed by the MG analysis for ANY partitioning, so the output
    is deterministic and the oracle pins the flag TRUE. The production
    100 TB shape drops the exact harness: one bounded-memory map pass
    plus a ``<= k x partitions``-row merge, no full-key shuffle."""
    from multichannel_commerce_data_pipeline_spark.operators.frequency import (
        heavy_hitter_estimates,
    )
    from multichannel_commerce_data_pipeline_spark.tables import (
        parallelize_small_scan,
    )

    k = 24
    ev = parallelize_small_scan(
        spark, load(spark, sf_dir, "events")
    ).select("user_id")
    est = heavy_hitter_estimates(ev, F.col("user_id"), k=k)

    # The harness's total + top-10 both derive from the per-user
    # aggregate. The old shape computed them with two UNPARTITIONED
    # windows, which moves every distinct user to ONE partition — a
    # single-task sort that grows with the corpus (the real scale
    # hazard at 100 TB, not a cosmetic warning). Materialize the
    # aggregate once per run instead (eager localCheckpoint — it is
    # the same row count the window funneled into one task, kept
    # distributed), then: grand total = 1-row aggregate broadcast to
    # the survivors, top-10 = TakeOrderedAndProject (distributed
    # top-k, no global sort). Values identical: same tie order, total
    # = SUM(n) as before (r16 optimization round, guide §2.4/§5).
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = exact.agg(F.sum("n").alias("total"))
    top = exact.orderBy(F.desc("n"), F.asc("user_id")).limit(10)
    joined = top.crossJoin(F.broadcast(tot)).join(
        est.withColumnRenamed("key", "ukey"),
        F.col("user_id").cast("string") == F.col("ukey"),
        "left",
    )
    est0 = F.coalesce(F.col("est"), F.lit(0))
    bound = F.col("total") / F.lit(k + 1)
    return joined.select(
        "user_id",
        "n",
        ((est0 <= F.col("n")) & ((F.col("n") - est0) <= bound)).alias(
            "within_bound"
        ),
    )
