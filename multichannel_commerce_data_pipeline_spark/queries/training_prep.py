r"""Training-set preparation queries over `documents`, oracle-checked:
sequence packing, dataset split, mixture oversampling, shard layout
(operators/training_prep.py bound to the driver's corpus).

All hashes go through functions.portable_hash64 (md5-derived) so the
DuckDB oracles compute bit-identical buckets/keys/order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import oracle_hash64
from multichannel_commerce_data_pipeline_spark.operators import text as T
from multichannel_commerce_data_pipeline_spark.operators import training_prep as TP
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load, parallelize_small_scan

# oracle fragment: the same 60-bit md5 hash of the doc id each operator
# uses, parameterized by seed (matches portable_hash64(doc_id, seed))
_ID_HASH = lambda seed: oracle_hash64("CAST(doc_id AS VARCHAR)", seed)  # noqa: E731

_PACK_BASE = rf"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tokens,
             {_ID_HASH(7)} % 8 AS shard
      FROM documents
    ),
    cum AS (
      -- CAST: DuckDB's SUM(BIGINT) window yields HUGEINT, which pandas
      -- renders as float64 and breaks the driver hash vs Spark's bigint.
      SELECT doc_id, n_tokens, shard,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS cum_excl
      FROM base
    ),
    packed AS (
      SELECT doc_id, n_tokens, shard,
             CAST(FLOOR(cum_excl / 256) AS BIGINT) AS pack_id,
             cum_excl % 256 AS pack_offset
      FROM cum
    )
"""


@query(
    "pack_sequences",
    oracle=_PACK_BASE + "SELECT doc_id, n_tokens, shard, pack_id, pack_offset FROM packed",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (256-token packs, 8 hash shards):
    each doc's pack and token offset inside it. Greedy one-pass packing
    via a per-shard window cumulative sum — one exchange, no global
    sort, no bin-packing iteration (operators/training_prep.py
    assign_packs)."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return TP.assign_packs(d, F.size(T.tokens(F.col("text"))), budget=256, n_shards=8)


@query(
    "pack_utilization",
    oracle=_PACK_BASE
    + """
    SELECT shard, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY shard, pack_id
    """,
)
def pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack fill rollup over pack_sequences: docs per pack and token
    totals (the number the trainer's throughput depends on — packs much
    under budget waste context length)."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    packs = TP.assign_packs(d, F.size(T.tokens(F.col("text"))), budget=256, n_shards=8)
    return TP.pack_stats(packs, budget=256)


@query(
    "dataset_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_ID_HASH(13)} % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a hash
    bucket — membership is a pure function of (doc_id, seed), so the
    split is stable as the corpus grows and needs no sampling state."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return TP.split_assign(d, train_pct=80, val_pct=10)


# high-value sources repeat; everything unlisted defaults to 1 epoch
_EPOCHS = {"src0": 4, "src1": 3, "src2": 3, "src3": 2, "src17": 2}
_EPOCH_VALUES = ", ".join(f"('{s}', {e})" for s, e in sorted(_EPOCHS.items()))


@query(
    "source_epoch_expand",
    oracle=f"""
    WITH w(source, e) AS (VALUES {_EPOCH_VALUES})
    SELECT d.doc_id, d.source,
           CAST(unnest(generate_series(1, COALESCE(w.e, 1))) AS BIGINT) AS epoch
    FROM documents d LEFT JOIN w USING (source)
    """,
)
def source_epoch_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture oversampling: replicate docs per-source by an integer
    epoch count (curated sources seen 2-4x per training run, the rest
    once). The weights table broadcast-joins and the replication is
    explode(sequence(..)) — rows are generated map-side inside the scan
    stage, zero shuffles."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    out = TP.epoch_expand(d, _EPOCHS)
    return out.select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


@query(
    "training_shard_layout",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_ID_HASH(29)} AS k
      FROM documents
    )
    SELECT doc_id, k % 16 AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY k % 16 ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM b
    """,
)
def training_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle as 16 shard files with
    in-shard positions: hash order key scatters ids uniformly; docs are
    numbered within their shard only (a global row_number would
    serialize the corpus through one reducer — shard + offset is the
    layout data loaders actually read)."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return TP.shard_layout(d, n_shards=16)
