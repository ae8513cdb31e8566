"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched kernels over ``mapInPandas``.  The actual media decode is
STUBBED (no image/audio libraries in this environment): `decode_image`
raises NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (derived from the payload hash) exercises the full Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — for real.
"""

from __future__ import annotations

import hashlib
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


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Stub decode: real implementation needs an image library (absent in
    this container).  fake=True returns a deterministic result derived from
    the payload so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; run with fake=True "
            "or install one at deployment"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    channel_means = [digest[i] / 255.0 for i in (2, 3, 4)]
    return {"width": width, "height": height, "channel_means": channel_means}


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
