"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship extraction over transcripts derived from the sf0.001
               documents table (HTML-wrapped Spark-side, JVM-vectorized),
               run through the full salted/partitioned pipeline.
queries()    — one entry per implemented operator (SURVEY.md §2 Layer-P +
               training-data-pipeline ops); extraction queries are checked
               against committed reference-derived goldens.
oracle_sql() — DuckDB-runnable SQL producing identical rows per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the documents table into the transcripts input shape
    (conv_id, turn_idx, role, text, tool, ts) with each document's text
    embedded in a minimal HTML page.  All JVM-side expressions."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    esc = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;",
    )
    html = F.concat(
        F.lit("<html><head><title>Document "),
        F.col("doc_id").cast("string"),
        F.lit(" from "),
        F.col("source"),
        F.lit("</title></head><body><div id=\"main\"><p>"),
        esc,
        F.lit("</p></div></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("conv-"), F.pmod(F.col("doc_id"), F.lit(97)).cast("string"))
        .alias("conv_id"),
        (F.col("doc_id") / 97).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        html.alias("text"),
        F.lit("browser").alias("tool"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001-derived transcripts."""
    from readability_1_spark.pipeline import extract_transcripts

    transcripts = _documents_as_transcripts(spark, "/root/testdata/sf0.001")
    return extract_transcripts(transcripts, num_parts=16).select(
        "conv_id", "turn_idx", "part_id", "status", "title", "text_content",
        "length", "candidate_count", "top_score", "attempts",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from readability_1_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from readability_1_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
