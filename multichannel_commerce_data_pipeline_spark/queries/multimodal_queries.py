"""X4 query bindings: binary payload stats, metadata-only frame
sampling, and the (deterministically faked) decode kernel — each
oracle-checked, including the decode: the fake derives dimensions from
the payload md5, which DuckDB reproduces from the same utf-8 bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multichannel_commerce_data_pipeline_spark.operators.multimodal import (
    binary_stats,
    decode_features,
    frame_sample_plan,
    text_as_media,
)
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import load


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_as_media(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT
      doc_id                      AS media_id,
      octet_length(encode(text))  AS n_bytes,
      md5(text)                   AS content_md5
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: payload byte-size + md5 fingerprint over the binary column —
    pure JVM Column expressions, no Python in the loop."""
    return binary_stats(_media(spark, sf_dir))


@query(
    "multimodal_frame_plan",
    oracle="""
    SELECT
      doc_id                                    AS media_id,
      CAST(length(text) * 10 // 1000 AS INT) + 1 AS n_frames,
      CAST(length(text) * 10 // 1000 AS INT) * 1000 AS last_offset_ms
    FROM documents
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: frame-sampling plan (1 frame/second) computed from metadata
    only — column pruning keeps the payload bytes unread (ReadSchema
    excludes content)."""
    return frame_sample_plan(_media(spark, sf_dir), every_ms=1000)


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT
      doc_id                                                        AS media_id,
      1 + CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 1920     AS width,
      1 + CAST(('0x' || substr(md5(text), 5, 4)) AS INT) % 1080     AS height
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the decode path end-to-end — binary payloads through an
    Arrow-batched mapInPandas kernel (deterministic fake: dimensions
    from the payload digest; a real codec drops into the same kernel
    contract, operators/multimodal.py:decode_image_batches)."""
    return decode_features(_media(spark, sf_dir))
