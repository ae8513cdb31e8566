"""Structured Streaming extraction path + multimodal binary plumbing."""

import pytest
from pyspark.sql import functions as F


def test_streaming_extraction_available_now(spark, tmp_path):
    from readability_1_spark.streaming import (
        run_stream_to_parquet,
        stream_transcripts_from_dir,
        streaming_extractions,
    )
    from readability_1_spark.transcripts import smoke_transcripts

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    smoke_transcripts(spark).write.mode("overwrite").parquet(in_dir)

    stream = stream_transcripts_from_dir(spark, in_dir, max_files_per_trigger=4)
    assert stream.isStreaming
    ex = streaming_extractions(stream, num_parts=16)
    q = run_stream_to_parquet(ex, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    result = spark.read.parquet(out_dir)
    assert result.count() >= 103
    ok = result.filter(F.col("status") == "ok").count()
    assert ok >= 100
    # Restart with no new data: exactly-once — no duplicate rows appended.
    stream2 = stream_transcripts_from_dir(spark, in_dir)
    q2 = run_stream_to_parquet(
        streaming_extractions(stream2, num_parts=16), out_dir, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == result.count()


def test_streaming_windowed_metrics(spark, tmp_path):
    from readability_1_spark.streaming import (
        stream_transcripts_from_dir,
        streaming_quality_metrics,
    )
    from readability_1_spark.transcripts import smoke_transcripts

    in_dir = str(tmp_path / "in")
    smoke_transcripts(spark).write.mode("overwrite").parquet(in_dir)
    stream = stream_transcripts_from_dir(spark, in_dir)
    metrics = streaming_quality_metrics(stream, window="10 minutes")
    q = (
        metrics.writeStream.format("memory")
        .queryName("metrics_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM metrics_test").collect()
    assert sum(r["n_turns"] for r in rows) > 0
    assert all(r["html_turns"] <= r["n_turns"] for r in rows)


def test_multimodal_binary_plumbing(spark):
    from readability_1_spark.multimodal import media_features, synthetic_media

    media = synthetic_media(spark, 128)
    feats = media_features(media, fake_decode=True).collect()
    assert len(feats) == 128
    by_kind = {}
    for r in feats:
        by_kind.setdefault(r["kind"], []).append(r)
    assert set(by_kind) == {"image", "audio", "video"}
    for r in by_kind["image"]:
        assert r["decode_status"] == "ok"
        assert 64 <= r["decoded_width"] <= 319
        assert len(r["channel_means"]) == 3
    for r in by_kind["audio"]:
        assert r["decode_status"] == "skipped"
    # Deterministic: same payload → same hash across runs.
    feats2 = media_features(synthetic_media(spark, 128), fake_decode=True).collect()
    assert sorted(r["sha256"] for r in feats) == sorted(r["sha256"] for r in feats2)


def test_real_decode_is_stubbed():
    from readability_1_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", fake=False)
