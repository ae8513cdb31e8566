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
        (2, "image", bytearray(b"II*\x00 a tiff, no stdlib decoder"), None),
        (3, "image", bytearray(b"BM truncated"), None),
        (4, "audio", bytearray(b"riff..."), None),
        (5, "image", bytearray(b"GIF89a garbage after the magic"), None),
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
    assert feats[5].decode_status == "decode_error"


def test_unsupported_format_raises():
    from readability_1_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00 tiff bytes", fake=False)
    # malformed GIF is a decode ERROR (the format itself is supported now)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a...", fake=False)


def _rgb_rows(pixels):
    """[[(r,g,b), ...], ...] → top-down RGB row bytearrays."""
    return [bytearray(b for px in row for b in px) for row in pixels]


def test_real_gif_multiframe_roundtrip():
    """Known-pixel multi-frame GIF: encode_gif_rgb → _gif_frames must
    return every frame's exact pixels and delays."""
    from readability_1_spark.multimodal import _gif_frames, encode_gif_rgb

    f0 = _rgb_rows([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (7, 8, 9)]])
    f1 = _rgb_rows([[(1, 2, 3), (4, 5, 6)], [(10, 20, 30), (40, 50, 60)]])
    gif = encode_gif_rgb(2, 2, [f0, f1], delays_ms=[40, 200])
    w, h, frames = _gif_frames(gif)
    assert (w, h) == (2, 2)
    assert [d for d, _ in frames] == [40, 200]
    assert [bytes(r) for r in frames[0][1]] == [bytes(r) for r in f0]
    assert [bytes(r) for r in frames[1][1]] == [bytes(r) for r in f1]


def test_real_gif_decode_image_and_pixels():
    """decode_image / decode_pixels accept GIF (first frame)."""
    from readability_1_spark.multimodal import (
        decode_image,
        decode_pixels,
        encode_gif_rgb,
    )

    f0 = _rgb_rows([[(100, 0, 0)], [(0, 100, 0)]])
    gif = encode_gif_rgb(1, 2, [f0])
    out = decode_image(gif)
    assert (out["width"], out["height"]) == (1, 2)
    assert [round(m, 9) for m in out["channel_means"]] == [
        round(100 / 2 / 255.0, 9), round(100 / 2 / 255.0, 9), 0.0,
    ]
    w, h, rows = decode_pixels(gif)
    assert (w, h, [bytes(r) for r in rows]) == (1, 2, [bytes(r) for r in f0])


def test_real_gif_frame_sampling():
    """sample_frame(fake=False) over real animated GIF bytes: the frame
    whose delay window covers the offset comes back as a BMP with that
    frame's exact pixels; offsets past the total loop like a player."""
    from readability_1_spark.multimodal import (
        decode_pixels,
        encode_gif_rgb,
        sample_frame,
    )

    f0 = _rgb_rows([[(255, 0, 0)]])
    f1 = _rgb_rows([[(0, 255, 0)]])
    f2 = _rgb_rows([[(0, 0, 255)]])
    gif = encode_gif_rgb(1, 1, [f0, f1, f2], delays_ms=[100, 100, 200])
    def px(offset_ms):
        _, _, rows = decode_pixels(sample_frame(gif, offset_ms, fake=False))
        return bytes(rows[0])
    assert px(0) == bytes(f0[0])
    assert px(99) == bytes(f0[0])
    assert px(100) == bytes(f1[0])
    assert px(250) == bytes(f2[0])
    assert px(400) == bytes(f0[0])   # wraps around (400 % 400 = 0)
    assert px(550) == bytes(f1[0])   # 550 % 400 = 150 → second frame's window


def _gif_code_stream(indices, min_code=2):
    """LSB-first LZW stream using the always-CLEAR trick at 2-bit min code
    (palette ≤ 4): CLEAR idx CLEAR idx ... END, all 3-bit codes."""
    clear, end, code_size = 1 << min_code, (1 << min_code) + 1, min_code + 1
    acc = acc_bits = 0
    out = bytearray()
    def put(code):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF); acc >>= 8; acc_bits -= 8
    for i in indices:
        put(clear); put(i)
    put(end)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes([min_code, len(out)]) + bytes(out) + b"\x00"


def test_gif_transparency_disposal_and_interlace():
    """Hand-crafted GIF89a exercising decoder paths the repo encoder never
    emits: transparency, disposal=2 (restore-background between frames),
    and 4-pass interlacing."""
    import struct as _struct

    from readability_1_spark.multimodal import _gif_frames

    RED, GREEN, BLUE, WHITE = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    pal = bytes(b for c in (RED, GREEN, BLUE, WHITE) for b in c)
    head = b"GIF89a" + _struct.pack("<HHBBB", 2, 2, 0x80 | 1, 3, 0) + pal
    # frame 1: full 2x2 [[red,green],[blue,red]], disposal=2, delay 10ms
    gce1 = b"\x21\xf9\x04" + bytes([(2 << 2), 1, 0, 0]) + b"\x00"
    img1 = b"\x2c" + _struct.pack("<HHHHB", 0, 0, 2, 2, 0) + _gif_code_stream([0, 1, 2, 0])
    # frame 2: 1x2 sub-rect at x=1 [transparent, green], transparent idx=2
    gce2 = b"\x21\xf9\x04" + bytes([0x01, 2, 0, 2]) + b"\x00"
    img2 = b"\x2c" + _struct.pack("<HHHHB", 1, 0, 1, 2, 0) + _gif_code_stream([2, 1])
    gif = head + gce1 + img1 + gce2 + img2 + b"\x3b"
    w, h, frames = _gif_frames(gif)
    assert (w, h) == (2, 2) and [d for d, _ in frames] == [10, 20]
    f1, f2 = frames[0][1], frames[1][1]
    assert [bytes(r) for r in f1] == [bytes(bytearray(RED + GREEN)),
                                      bytes(bytearray(BLUE + RED))]
    # disposal=2 wiped frame 1 to background white; transparent px stays white
    assert [bytes(r) for r in f2] == [bytes(bytearray(WHITE + WHITE)),
                                      bytes(bytearray(WHITE + GREEN))]

    # interlaced 1x4: stored row order [0,2,1,3] must land on y [0,1,2,3]
    head2 = b"GIF89a" + _struct.pack("<HHBBB", 1, 4, 0x80 | 1, 0, 0) + pal
    img = b"\x2c" + _struct.pack("<HHHHB", 0, 0, 1, 4, 0x40) + _gif_code_stream([0, 1, 2, 3])
    w2, h2, fr = _gif_frames(head2 + img + b"\x3b")
    assert (w2, h2) == (1, 4)
    # stored ri 0,1,2,3 → y 0,2,1,3: canvas y rows are pal[0],pal[2],pal[1],pal[3]
    assert [bytes(r) for r in fr[0][1]] == [
        bytes(bytearray(RED)), bytes(bytearray(BLUE)),
        bytes(bytearray(GREEN)), bytes(bytearray(WHITE)),
    ]


def test_real_gif_frame_sampling_distributed(spark):
    """media_frames(fake_decode=False) over real GIF video payloads: all
    sampled frames decode to the planted per-frame colors; a non-GIF video
    payload degrades to decoder_unavailable."""
    from readability_1_spark.multimodal import (
        decode_pixels,
        encode_gif_rgb,
        media_frames,
    )

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    frames_rgb = [_rgb_rows([[c]]) for c in colors]
    gif = encode_gif_rgb(1, 1, frames_rgb, delays_ms=[100] * 4)
    rows = [
        (0, "video", bytearray(gif),
         {"mime": "image/gif", "width": 1, "height": 1, "duration_ms": 400}),
        (1, "video", bytearray(b"mp4 bytes"), None),
        (2, "image", bytearray(gif), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id LONG, kind STRING, payload BINARY, "
        "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>",
    )
    out = media_frames(media, n_frames=4, fake_decode=False).collect()
    got = {(r.media_id, r.frame_idx): r for r in out}
    # only videos produce rows
    assert {mid for mid, _ in got} == {0, 1}
    for i, c in enumerate(colors):
        r = got[(0, i)]
        assert r.frame_status == "ok" and r.frame_offset_ms == i * 100
        _, _, px = decode_pixels(bytes(r.frame_payload))
        assert bytes(px[0]) == bytes(bytearray(c))
    for i in range(4):
        assert got[(1, i)].frame_status == "decoder_unavailable"


def test_streaming_dedup_exact(spark, tmp_path):
    """Stateful streaming dedup: first occurrence of each payload survives,
    duplicates within a micro-batch, across micro-batches, and across
    RESTARTS (checkpointed state) are dropped."""
    import datetime

    from readability_1_spark.streaming import (
        stream_transcripts_from_dir,
        streaming_dedup_exact,
    )
    from readability_1_spark.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def turn(conv, idx, text):
        return (conv, idx, "tool", text, None, t0)

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    p1, p2, p3, p4 = (f"<html><body><p>page {i}</p></body></html>" for i in range(4))
    # NULL-text turns carry no payload: they must ALL pass through (they are
    # not duplicates of each other), with a NULL content_hash.
    spark.createDataFrame(
        [turn("c0", 0, p1), turn("c0", 1, p2), turn("c1", 0, p1),
         turn("c0", 2, None)],
        TRANSCRIPT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [turn("c2", 0, p2), turn("c2", 1, p3), turn("c2", 2, None)],
        TRANSCRIPT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(in_dir)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        def run():
            deduped = streaming_dedup_exact(
                stream_transcripts_from_dir(spark, in_dir, max_files_per_trigger=1)
            )
            q = (
                deduped.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        run()
        rows = spark.read.parquet(out_dir).collect()
        texts = [r.text for r in rows if r.text is not None]
        assert sorted(texts) == sorted([p1, p2, p3])
        nulls = [r for r in rows if r.text is None]
        assert len(nulls) == 2 and all(r.content_hash is None for r in nulls)

        # restart with one already-seen and one new payload: only p4 appends
        spark.createDataFrame(
            [turn("c3", 0, p1), turn("c3", 1, p4)], TRANSCRIPT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(in_dir)
        run()
        texts = [
            r.text for r in spark.read.parquet(out_dir).collect()
            if r.text is not None
        ]
        assert sorted(texts) == sorted([p1, p2, p3, p4])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


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
