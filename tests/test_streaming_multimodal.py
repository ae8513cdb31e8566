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


def _make_bmp(width, height, rgb_rows):
    """Minimal 24-bit BI_RGB BMP from rows of (r, g, b) tuples."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    pixel_bytes = bytearray()
    for row in rgb_rows:  # bottom-up, like a baseline BMP
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        pixel_bytes += line
    offset = 14 + 40
    size = offset + len(pixel_bytes)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, offset)
    header += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(pixel_bytes), 2835, 2835, 0, 0)
    return bytes(header + pixel_bytes)


def _make_png(width, height, rgb_rows):
    """Minimal 8-bit RGB PNG (filter 0 scanlines)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for row in rgb_rows:  # top-down
        raw.append(0)
        for r, g, b in row:
            raw += bytes((r, g, b))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_real_bmp_decode():
    from readability_1_spark.multimodal import decode_image

    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    out = decode_image(_make_bmp(2, 2, rows))
    assert (out["width"], out["height"]) == (2, 2)
    # means over 4 px: R=(255+0+0+255)/4, G=(0+255+0+255)/4, B=(0+0+255+255)/4
    assert [round(m, 6) for m in out["channel_means"]] == [
        round(510 / 4 / 255, 6), round(510 / 4 / 255, 6), round(510 / 4 / 255, 6)
    ]


def test_real_png_decode_roundtrip():
    from readability_1_spark.multimodal import decode_image

    rows = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    out = decode_image(_make_png(2, 2, rows))
    assert (out["width"], out["height"]) == (2, 2)
    exp = [sum(px[c] for row in rows for px in row) / 4 / 255.0 for c in range(3)]
    assert [round(m, 9) for m in out["channel_means"]] == [round(e, 9) for e in exp]


def test_real_decode_in_pipeline(spark):
    """decode_status='ok' is reachable WITHOUT fake mode: real BMP/PNG
    payloads decode distributed; unknown formats degrade gracefully."""
    from readability_1_spark.multimodal import FEATURES_SCHEMA_DDL  # noqa: F401
    from readability_1_spark.multimodal import media_features

    bmp = _make_bmp(2, 1, [[(9, 9, 9), (9, 9, 9)]])
    png = _make_png(1, 2, [[(1, 2, 3)], [(5, 6, 7)]])
    rows = [
        (0, "image", bytearray(bmp), None),
        (1, "image", bytearray(png), None),
        (2, "image", bytearray(b"GIF89a notsupported"), None),
        (3, "image", bytearray(b"BM truncated"), None),
        (4, "audio", bytearray(b"riff..."), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id LONG, kind STRING, payload BINARY, "
        "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>",
    )
    feats = {r.media_id: r for r in media_features(media, fake_decode=False).collect()}
    assert feats[0].decode_status == "ok" and feats[0].decoded_width == 2
    assert feats[1].decode_status == "ok" and feats[1].decoded_height == 2
    assert round(feats[1].channel_means[0], 9) == round((1 + 5) / 2 / 255.0, 9)
    assert feats[2].decode_status == "decoder_unavailable"
    assert feats[3].decode_status == "decode_error"
    assert feats[4].decode_status == "skipped"


def test_unsupported_format_raises():
    from readability_1_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a...", fake=False)


def test_streaming_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState gap sessionization: a >gap pause inside the
    stream closes and emits the previous session; open sessions stay in
    state (flushed later by timeout)."""
    import datetime

    from readability_1_spark.streaming import (
        stream_transcripts_from_dir,
        streaming_conversation_sessions,
    )
    from readability_1_spark.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def turn(conv, idx, offset_s, text):
        return (conv, idx, "tool", text, None, t0 + datetime.timedelta(seconds=offset_s))

    rows = [
        # conv-a: two sessions separated by a 2-hour gap; only the first
        # (closed) session should be emitted by the availableNow run.
        turn("conv-a", 0, 0, "<html><body><p>x</p></body></html>"),
        turn("conv-a", 1, 30, "plain chatter"),
        turn("conv-a", 2, 7200, "<html>late</html>"),
        # conv-b: one open session -> no emission.
        turn("conv-b", 0, 0, "hello"),
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "batch0"), mode="overwrite"
    )

    # Few state-store partitions: the stateful op builds one store per
    # shuffle partition and 32 of them dominate this tiny test's runtime.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    stream = stream_transcripts_from_dir(spark, str(in_dir / "batch0"))
    sessions = streaming_conversation_sessions(stream, gap_seconds=1800)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    got = {r.conv_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {"conv-a"}
    a = got["conv-a"]
    assert a.session_idx == 0
    assert a.n_turns == 2
    assert a.html_turns == 1
    assert (a.session_end - a.session_start).total_seconds() == 30


def test_media_resize_distributed(spark):
    """Real nearest-neighbor resize through the mapInPandas kernel: image
    payloads come back as decodable BMPs at the target size with updated
    typed metadata; non-images and garbage pass through with explicit
    status."""
    from readability_1_spark.multimodal import decode_pixels, media_resized

    bmp = _make_bmp(4, 4, [[(x * 60, y * 60, 128) for x in range(4)] for y in range(4)])
    png = _make_png(3, 5, [[(1, 2, 3)] * 3] * 5)
    rows = [
        (0, "image", bytearray(bmp), None),
        (1, "image", bytearray(png), None),
        (2, "image", bytearray(b"JFIF nope"), None),
        (3, "audio", bytearray(b"riff"), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id LONG, kind STRING, payload BINARY, "
        "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>",
    )
    out = {r.media_id: r for r in media_resized(media, 2, 2).collect()}
    for mid in (0, 1):
        assert out[mid].resize_status == "ok"
        w, h, _px = decode_pixels(bytes(out[mid].payload))
        assert (w, h) == (2, 2)
        assert out[mid].meta.mime == "image/bmp" and out[mid].meta.width == 2
    assert out[2].resize_status == "decoder_unavailable"
    assert bytes(out[2].payload) == b"JFIF nope"
    assert out[3].resize_status == "skipped"


def test_frame_sampling_plumbing(spark):
    """Frame sampling: one row per sampled frame for videos only, uniform
    offsets over duration, frames consumable by the image feature kernel
    (fake decode: no codec in this container — plumbing is real)."""
    from readability_1_spark.multimodal import (
        decode_pixels,
        media_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 60)
    frames = media_frames(media, n_frames=3).collect()
    vids = {r.media_id for r in frames}
    assert vids and all(mid % 3 == 2 for mid in vids)  # only kind=video ids
    per = {}
    for r in frames:
        per.setdefault(r.media_id, []).append(r)
        assert r.frame_status == "ok"
        w, h, _ = decode_pixels(bytes(r.frame_payload))
        assert (w, h) == (2, 2)
    for rows in per.values():
        assert sorted(r.frame_idx for r in rows) == [0, 1, 2]
    # determinism
    again = media_frames(spark.createDataFrame(media.collect(), media.schema),
                         n_frames=3).collect()
    assert {(r.media_id, r.frame_idx, bytes(r.frame_payload)) for r in frames} == {
        (r.media_id, r.frame_idx, bytes(r.frame_payload)) for r in again
    }
    # non-fake path degrades explicitly
    from readability_1_spark.multimodal import sample_frame
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        sample_frame(b"vid", 0, fake=False)
