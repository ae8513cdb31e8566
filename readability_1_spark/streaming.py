"""Structured Streaming extraction path.

The north rule's pipeline is batch-with-resume, but the same kernel runs
under Structured Streaming unchanged: `readStream` → HTML gate →
`mapInPandas(kernel)` → `writeStream` with checkpointLocation.  Streaming
checkpoints give exactly-once sink semantics per micro-batch, replacing the
batch pipeline's per-partition manifest.

Typical use: tail an append-only transcripts table (files/Iceberg/Kafka) and
maintain a continuously-updated extractions table plus a windowed
quality-metrics stream with watermarked late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernel import OUT_SCHEMA_DDL, make_extraction_kernel
from .pipeline import HTML_GATE
from .transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts_from_dir(spark: SparkSession, input_dir: str,
                                max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_extractions(transcripts: DataFrame, num_parts: int = 64,
                          opts: dict | None = None) -> DataFrame:
    """Gate + extract on a streaming DataFrame (same kernel as batch)."""
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(transcripts.sparkSession)
    gated = transcripts.filter(
        F.col("text").isNotNull() & F.col("text").rlike(HTML_GATE)
    ).withColumn(
        "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(num_parts)).cast("int")
    )
    slim = gated.select("conv_id", "turn_idx", "text", "part_id")
    return slim.mapInArrow(make_extraction_kernel(opts=opts), OUT_SCHEMA_DDL)


def streaming_quality_metrics(transcripts: DataFrame,
                              window: str = "10 minutes",
                              watermark: str = "30 minutes") -> DataFrame:
    """Watermarked windowed aggregation over the turn stream: per-window
    turn counts and HTML share — the late-data-tolerant metrics feed."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(
                F.when(
                    F.col("text").isNotNull() & F.col("text").rlike(HTML_GATE), 1
                ).otherwise(0)
            ).alias("html_turns"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role", "n_turns", "html_turns",
        )
    )


def run_stream_to_parquet(extractions: DataFrame, out_dir: str,
                          checkpoint_dir: str, available_now: bool = True):
    """Start the extraction sink; availableNow processes the current backlog
    then stops (used by tests and backfills)."""
    writer = (
        extractions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
