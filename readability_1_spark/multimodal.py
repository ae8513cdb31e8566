"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched kernels over ``mapInPandas``.

`decode_image` REALLY decodes two formats with the stdlib alone (no image
library exists in this container):
  * BMP — uncompressed BI_RGB 24/32-bit (header parse + pixel scan);
  * PNG — 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced (IHDR parse,
    zlib IDAT inflate, scanline de-filter for all five filter types).
Unsupported formats raise NotImplementedError → decode_status
"decoder_unavailable"; `fake=True` retains the deterministic fake decoder
for plumbing tests with arbitrary payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

MEDIA_SCHEMA_DDL = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>"
)

FEATURES_SCHEMA_DDL = (
    "media_id BIGINT, kind STRING, n_bytes INT, sha256 STRING, "
    "decoded_width INT, decoded_height INT, channel_means ARRAY<DOUBLE>, "
    "decode_status STRING"
)


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed BI_RGB 24/32-bit BMP → width/height/per-channel means
    (RGB order; 32-bit alpha is ignored for the means)."""
    if len(payload) < 54:
        raise ValueError("BMP too short")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    n_rows = abs(height)
    n_px = width * n_rows
    if width <= 0 or n_rows == 0 or n_px == 0:
        raise ValueError("BMP with empty pixel grid")
    bytes_pp = bpp // 8
    stride = ((width * bytes_pp + 3) // 4) * 4
    sums = [0, 0, 0]  # B, G, R accumulation order
    for r in range(n_rows):
        base = pixel_offset + r * stride
        row = payload[base : base + width * bytes_pp]
        if len(row) < width * bytes_pp:
            raise ValueError("BMP pixel data truncated")
        for c in range(3):
            sums[c] += sum(row[c::bytes_pp])
    return {
        "width": width,
        "height": n_rows,
        # report RGB order
        "channel_means": [sums[2] / n_px / 255.0, sums[1] / n_px / 255.0,
                          sums[0] / n_px / 255.0],
    }


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_scanlines(payload: bytes):
    """8-bit non-interlaced PNG → (width, height, channels, defiltered
    scanline bytearrays)."""
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", data, 0)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} interlace={interlace}"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    lines: list[bytearray] = []
    prev = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype}")
        lines.append(line)
        prev = line
    return width, height, channels, lines


def _decode_png(payload: bytes) -> dict:
    """8-bit non-interlaced PNG: per-channel means via the scanline
    decoder."""
    width, height, channels, lines = _png_scanlines(payload)
    sums = [0] * channels
    for line in lines:
        for ch in range(channels):
            sums[ch] += sum(line[ch::channels])
    n_px = width * height
    return {
        "width": width,
        "height": height,
        "channel_means": [s / n_px / 255.0 for s in sums],
    }


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Real stdlib decode for BMP and PNG (see module docstring); other
    formats raise NotImplementedError.  fake=True returns a deterministic
    result derived from the payload hash so arbitrary synthetic bytes can
    exercise the distributed plumbing end-to-end."""
    if fake:
        digest = hashlib.sha256(payload).digest()
        width = 64 + digest[0]
        height = 64 + digest[1]
        channel_means = [digest[i] / 255.0 for i in (2, 3, 4)]
        return {"width": width, "height": height, "channel_means": channel_means}
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise NotImplementedError(
        "unsupported image format (stdlib decoders cover BMP and 8-bit PNG)"
    )


def make_media_feature_kernel(fake_decode: bool = True):
    """mapInPandas kernel: MEDIA_SCHEMA_DDL batches → FEATURES_SCHEMA_DDL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                    "decoded_width": None,
                    "decoded_height": None,
                    "channel_means": None,
                    "decode_status": "skipped",
                }
                if kind == "image":
                    try:
                        dec = decode_image(payload, fake=fake_decode)
                        row.update(
                            decoded_width=dec["width"],
                            decoded_height=dec["height"],
                            channel_means=dec["channel_means"],
                            decode_status="ok",
                        )
                    except NotImplementedError:
                        row["decode_status"] = "decoder_unavailable"
                    except (ValueError, zlib.error, struct.error, IndexError):
                        row["decode_status"] = "decode_error"
                rows.append(row)
            yield pd.DataFrame(rows)

    return kernel


def synthetic_media(spark, n: int = 256):
    """Deterministic fake media table exercising binary columns at scale:
    payload bytes derived JVM-side from the id (no driver loops)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.encode(
                F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)),
                "UTF-8",
            ).alias("payload"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        )
    )


def media_features(media_df, fake_decode: bool = True):
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(media_df.sparkSession)
    return media_df.mapInPandas(
        make_media_feature_kernel(fake_decode), FEATURES_SCHEMA_DDL
    )

def decode_pixels(payload: bytes) -> tuple[int, int, list[bytearray]]:
    """Full pixel decode to RGB rows (top-down, 3 bytes per pixel) for the
    formats decode_image supports; gray/alpha PNGs expand to RGB."""
    if payload[:2] == b"BM":
        pixel_offset = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        n_rows = abs(height)
        bytes_pp = bpp // 8
        stride = ((width * bytes_pp + 3) // 4) * 4
        rows = []
        row_order = range(n_rows - 1, -1, -1) if height > 0 else range(n_rows)
        for r in row_order:  # emit top-down
            base = pixel_offset + r * stride
            src = payload[base : base + width * bytes_pp]
            if len(src) < width * bytes_pp:
                raise ValueError("BMP pixel data truncated")
            line = bytearray(width * 3)
            for x in range(width):
                o = x * bytes_pp
                line[x * 3] = src[o + 2]      # R (BMP stores BGR)
                line[x * 3 + 1] = src[o + 1]  # G
                line[x * 3 + 2] = src[o]      # B
            rows.append(line)
        return width, n_rows, rows
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        width, height, channels, lines = _png_scanlines(payload)
        rows = []
        for line in lines:
            out = bytearray(width * 3)
            for x in range(width):
                if channels == 1:
                    v = line[x]
                    out[x * 3] = out[x * 3 + 1] = out[x * 3 + 2] = v
                elif channels == 2:  # gray + alpha
                    v = line[x * 2]
                    out[x * 3] = out[x * 3 + 1] = out[x * 3 + 2] = v
                else:  # 3 or 4 channels, RGB(A)
                    o = x * channels
                    out[x * 3 : x * 3 + 3] = line[o : o + 3]
            rows.append(out)
        return width, height, rows
    raise NotImplementedError(
        "unsupported image format (stdlib decoders cover BMP and 8-bit PNG)"
    )


def encode_bmp_rgb(width: int, height: int, rows: list[bytearray]) -> bytes:
    """Top-down RGB rows → 24-bit BI_RGB BMP bytes (the canonical resized-
    payload format: stdlib-writable and round-trippable by decode_pixels)."""
    stride = ((width * 3 + 3) // 4) * 4
    pixel_bytes = bytearray()
    for r in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = rows[r]
        line = bytearray(stride)
        for x in range(width):
            line[x * 3] = row[x * 3 + 2]      # B
            line[x * 3 + 1] = row[x * 3 + 1]  # G
            line[x * 3 + 2] = row[x * 3]      # R
        pixel_bytes += line
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(pixel_bytes), 0, 0, offset)
    header += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes),
        2835, 2835, 0, 0,
    )
    return bytes(header + pixel_bytes)


def resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a decodable image; returns a 24-bit BMP."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    w, h, rows = decode_pixels(payload)
    out_rows = []
    for y in range(out_h):
        sy = min(h - 1, (y * h) // out_h)
        src = rows[sy]
        line = bytearray(out_w * 3)
        for x in range(out_w):
            sx = min(w - 1, (x * w) // out_w)
            line[x * 3 : x * 3 + 3] = src[sx * 3 : sx * 3 + 3]
        out_rows.append(line)
    return encode_bmp_rgb(out_w, out_h, out_rows)


RESIZED_SCHEMA_DDL = (
    "media_id BIGINT, kind STRING, payload BINARY, resize_status STRING, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>"
)


def make_media_resize_kernel(out_w: int, out_h: int):
    """mapInPandas kernel: MEDIA_SCHEMA_DDL batches → same rows with image
    payloads replaced by a nearest-neighbor-resized 24-bit BMP (typed meta
    updated); non-images and undecodable payloads pass through with an
    explicit resize_status."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads, statuses, metas = [], [], []
            for kind, payload in zip(batch["kind"], batch["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if kind != "image":
                    payloads.append(raw)
                    statuses.append("skipped")
                    metas.append(None)
                    continue
                try:
                    out = resize_image(raw, out_w, out_h)
                    payloads.append(out)
                    statuses.append("ok")
                    metas.append(
                        {"mime": "image/bmp", "width": out_w, "height": out_h,
                         "duration_ms": None}
                    )
                except NotImplementedError:
                    payloads.append(raw)
                    statuses.append("decoder_unavailable")
                    metas.append(None)
                except (ValueError, zlib.error, struct.error, IndexError):
                    payloads.append(raw)
                    statuses.append("decode_error")
                    metas.append(None)
            out_df = pd.DataFrame(
                {
                    "media_id": batch["media_id"].tolist(),
                    "kind": batch["kind"].tolist(),
                    "payload": payloads,
                    "resize_status": statuses,
                    "meta": [
                        m if m is not None else om
                        for m, om in zip(metas, batch["meta"].tolist())
                    ],
                }
            )
            yield out_df

    return kernel


def media_resized(media_df, out_w: int = 64, out_h: int = 64):
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(media_df.sparkSession)
    return media_df.mapInPandas(
        make_media_resize_kernel(out_w, out_h), RESIZED_SCHEMA_DDL
    )



FRAMES_SCHEMA_DDL = (
    "media_id BIGINT, frame_idx INT, frame_offset_ms INT, "
    "frame_payload BINARY, frame_status STRING"
)


def sample_frame(payload: bytes, offset_ms: int, fake: bool = False) -> bytes:
    """Extract one video frame as an image payload.  A real implementation
    needs a video codec (absent in this container) — the Spark-side
    plumbing (schema, per-frame explode, batch shape) is real and tested;
    fake=True returns a deterministic 2x2 BMP derived from
    (payload, offset) so the downstream image kernels can consume it."""
    if not fake:
        raise NotImplementedError(
            "video frame decode requires a codec; run with fake=True or "
            "install one at deployment"
        )
    digest = hashlib.sha256(payload + offset_ms.to_bytes(8, "little")).digest()
    rows = [
        bytearray(digest[0:6]),
        bytearray(digest[6:12]),
    ]
    return encode_bmp_rgb(2, 2, rows)


def make_frame_sample_kernel(n_frames: int = 4, fake_decode: bool = True):
    """mapInPandas kernel: MEDIA_SCHEMA_DDL batches → one row per sampled
    frame for video payloads (uniform offsets over duration_ms, defaulting
    to 1s spacing when metadata is absent); non-videos emit nothing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_offset_ms",
                                   "frame_payload", "frame_status")}
            for media_id, kind, payload, meta in zip(
                batch["media_id"], batch["kind"], batch["payload"], batch["meta"]
            ):
                if kind != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                duration = None
                if meta is not None:
                    duration = meta.get("duration_ms") if isinstance(meta, dict) \
                        else getattr(meta, "duration_ms", None)
                span = duration if duration else n_frames * 1000
                for i in range(n_frames):
                    offset = (i * span) // n_frames
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_offset_ms"].append(offset)
                    try:
                        frame = sample_frame(raw, offset, fake=fake_decode)
                        out["frame_payload"].append(frame)
                        out["frame_status"].append("ok")
                    except NotImplementedError:
                        out["frame_payload"].append(b"")
                        out["frame_status"].append("decoder_unavailable")
            yield pd.DataFrame(out)

    return kernel


def media_frames(media_df, n_frames: int = 4, fake_decode: bool = True):
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(media_df.sparkSession)
    return media_df.mapInPandas(
        make_frame_sample_kernel(n_frames, fake_decode), FRAMES_SCHEMA_DDL
    )
