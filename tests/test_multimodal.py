"""X4 multimodal plumbing: schema convention, decode stub gating, and
the payload-stays-cold column-pruning guarantee."""

from __future__ import annotations

import pytest


def _media(spark, sf_dir):
    from multichannel_commerce_data_pipeline_spark.operators.multimodal import (
        text_as_media,
    )
    from multichannel_commerce_data_pipeline_spark.tables import load

    return text_as_media(load(spark, sf_dir, "documents"), "doc_id", "text")


def test_media_schema_convention(spark, sf_dir):
    media = _media(spark, sf_dir)
    types = dict(media.dtypes)
    assert types["content"] == "binary"
    assert types["media_id"] == "bigint"
    assert "struct<mime:string,width:int,height:int" in types["meta"]


def test_real_decode_is_gated_not_silent(spark, sf_dir):
    from multichannel_commerce_data_pipeline_spark.operators import multimodal

    if multimodal.HAVE_PIL:
        pytest.skip("PIL installed; stub path not applicable")
    with pytest.raises(NotImplementedError, match="PIL"):
        next(multimodal.decode_image_batches(iter([])))


def test_frame_plan_prunes_payload_column(spark, sf_dir, tmp_path):
    """Metadata-only plans over a materialized media table must not
    read the binary payload: the parquet scan's ReadSchema carries
    media_id + meta only, so payload bytes stay cold."""
    from multichannel_commerce_data_pipeline_spark.operators.multimodal import (
        frame_sample_plan,
    )

    _media(spark, sf_dir).write.parquet(str(tmp_path / "media"))
    media = spark.read.parquet(str(tmp_path / "media"))
    plan_df = frame_sample_plan(media, every_ms=1000)
    physical = plan_df._jdf.queryExecution().executedPlan().toString()
    read_schema = physical.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in read_schema
    assert "meta" in read_schema and "media_id" in read_schema


def test_decode_batches_shape(spark, sf_dir):
    from multichannel_commerce_data_pipeline_spark.operators.multimodal import (
        decode_features,
        fake_decode_kernel,
    )

    feats = decode_features(_media(spark, sf_dir)).collect()
    assert len(feats) == 500
    assert all(1 <= r.width <= 1920 and 1 <= r.height <= 1080 for r in feats)
    # kernel is deterministic
    assert fake_decode_kernel(b"abc") == fake_decode_kernel(b"abc")
    assert fake_decode_kernel(None) == (0, 0)


def test_resize_plan_scale_factors(spark):
    from pyspark.sql import functions as F

    from multichannel_commerce_data_pipeline_spark.operators.multimodal import (
        resize_plan,
    )

    feats = spark.createDataFrame(
        [(1, 200, 100), (2, 4000, 1000), (3, 512, 512)],
        "media_id INT, width INT, height INT",
    )
    got = {
        r.media_id: r.scale
        for r in feats.select(
            "media_id", resize_plan(feats, 512).alias("scale")
        ).collect()
    }
    assert got[1] == 1.0          # already fits
    assert got[2] == 512 / 4000   # long side drives the factor
    assert got[3] == 1.0          # boundary: equal is a fit
