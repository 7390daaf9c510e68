"""T7 DQ metrics: observe-based counters on batch and streaming paths,
and alert evaluation — no extra scans (observe rides the action)."""

from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FIXTURES = REPO / "tests" / "fixtures" / "bronze"


def test_batch_observe_metrics(spark):
    from multichannel_commerce_data_pipeline_spark.pipeline.bronze import (
        flatten_envelope,
        read_bronze,
    )
    from multichannel_commerce_data_pipeline_spark.pipeline.quality import (
        alerts,
        observe_batch,
    )
    from multichannel_commerce_data_pipeline_spark.pipeline.silver import conform_joor

    silver = conform_joor(flatten_envelope(read_bronze(spark, "joor")))
    observed, obs = observe_batch(
        silver, ["order_id", "unit_price", "order_ts"], ts_col="bronze_timestamp"
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["rows"] == 90
    assert m["nulls_order_id"] == 0 and m["nulls_unit_price"] == 0
    assert m["high_watermark"].startswith("2025-06-03")
    assert alerts(m) == []
    # alert fires on injected nulls
    assert alerts({"rows": 10, "nulls_buyer": 3}) != []
    assert alerts({"rows": 0}) == ["empty batch"]


def test_stream_observe_metrics(spark, tmp_path):
    from multichannel_commerce_data_pipeline_spark.pipeline.quality import (
        observe_stream,
    )
    from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
        conform_stream,
        read_bronze_stream,
    )

    stream = observe_stream(
        conform_stream(read_bronze_stream(spark, "joor", str(FIXTURES)), "joor"),
        ["order_id", "unit_price"],
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = q.recentProgress
    dq = [
        p["observedMetrics"]["dq"]
        for p in progresses
        if p.get("observedMetrics", {}).get("dq")
    ]
    assert dq, "no dq metrics in stream progress"
    assert sum(m["rows"] for m in dq) == 90
    assert all(m["nulls_order_id"] == 0 for m in dq)
