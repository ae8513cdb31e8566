"""The distributed extraction pipeline (SURVEY.md §3.1, §4.4).

Physical plan:

    scan(transcripts)                      Catalyst prunes to needed columns
    → filter(text likely-HTML)            pushed to the scan
    → project(+ part_id, salt)            deterministic lineage partition id
    → repartition(N, salt)                explicit shuffle: skew-spreading
    → mapInArrow(extraction kernel)       Arrow batches, JVM↔Python boundary
    → (a) extractions sink
      (b) groupBy(part_id) lineage/metrics rollup    partial agg map-side
      (c) checkpoint manifest per part_id            idempotent resume

Skew handling: HTML size and retry-ladder cost vary ~2000× per document
(reference bench _dev/bench1.csv: 84…15284 op/s), and conv_id row counts are
skewed.  The salt is a hash of (conv_id, turn_idx) — NOT conv_id alone — so
one huge conversation spreads across all partitions while part_id stays
deterministic for resume.  At 10^12 turns the same plan holds: the shuffle
is pure hash-scatter (no co-location requirement downstream), so partition
count scales with cluster size, and AQE coalesces the post-kernel stage.

Storage: Iceberg `writeTo(...).append()` when a catalog is configured (the
sandbox ships no iceberg runtime jar), else directory-per-table parquet
appends — both give atomic per-partition visibility for resume.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernel import OUT_SCHEMA_DDL, make_extraction_kernel, make_readerable_kernel

# A cheap, pushdown-friendly gate for "this turn might carry an HTML
# document".  Full validation (errorState etc.) happens in the kernel.
HTML_GATE = "(?i)<html"

_SHIPPED: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers no matter
    where the driver was launched from: build the --py-files zip lazily and
    ship it via addPyFile (idempotent per SparkContext)."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    try:
        import tempfile
        import zipfile

        import readability_1_spark as pkg

        pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
        if not os.path.isdir(pkg_dir):  # already running from a zip
            _SHIPPED.add(key)
            return
        zip_path = os.path.join(tempfile.gettempdir(), "readability_1_spark_pyfiles.zip")
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    if "__pycache__" in root:
                        continue
                    for fn in sorted(files):
                        if fn.endswith(".py"):
                            full = os.path.join(root, fn)
                            rel = os.path.join(
                                "readability_1_spark",
                                os.path.relpath(full, pkg_dir),
                            )
                            zf.write(full, rel)
        sc.addPyFile(zip_path)
    except Exception:
        # Already registered in this context — workers can import already.
        pass
    _SHIPPED.add(key)


def gate_html_turns(df: DataFrame) -> DataFrame:
    """Filter to HTML-bearing turns; predicate pushes into the scan."""
    return df.filter(F.col("text").isNotNull() & F.col("text").rlike(HTML_GATE))


def with_partitioning(df: DataFrame, num_parts: int) -> DataFrame:
    """Deterministic lineage partition id + per-turn salt.

    part_id = pmod(xxhash64(conv_id), P): stable across runs → resume key.
    salt    = pmod(xxhash64(conv_id, turn_idx), P): spreads hot conv_ids.
    """
    return (
        df.withColumn(
            "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(num_parts)).cast("int")
        )
        .withColumn(
            "salt", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(num_parts)).cast("int")
        )
    )


def extract_transcripts(
    df: DataFrame,
    num_parts: int = 64,
    opts: dict | None = None,
    url: str = "http://fakehost/test/page.html",
    readerable_gate: bool = False,
    repartition: bool = True,
    dedup_payloads: bool = False,
) -> DataFrame:
    """transcripts → extractions DataFrame (no sink).

    dedup_payloads: agent transcripts re-fetch the same pages constantly; at
    10^12 turns running the kernel once per DISTINCT payload and joining the
    result back to turns is the dominant cost saving.  Per-turn output is
    identical (the kernel is a pure function of the payload); only parse_ms
    becomes the shared per-payload cost.
    """
    ensure_worker_imports(df.sparkSession)
    gated = gate_html_turns(df)
    parted = with_partitioning(gated, num_parts)
    cols = ["conv_id", "turn_idx", "text", "part_id"]
    if dedup_payloads:
        keyed = parted.withColumn("payload_hash", F.md5("text"))
        uniq = (
            keyed.groupBy("payload_hash")
            .agg(F.first("text").alias("text"))
            .withColumn("conv_id", F.col("payload_hash"))
            .withColumn("turn_idx", F.lit(0))
            .withColumn(
                "part_id",
                F.pmod(F.xxhash64("payload_hash"), F.lit(num_parts)).cast("int"),
            )
        )
        if repartition:
            uniq = uniq.repartition(num_parts, "part_id")
        per_payload = uniq.select(*cols).mapInArrow(
            make_extraction_kernel(url=url, opts=opts), OUT_SCHEMA_DDL
        )
        result_cols = [
            c for c in per_payload.columns
            if c not in ("conv_id", "turn_idx", "part_id")
        ]
        return keyed.select("conv_id", "turn_idx", "part_id", "payload_hash").join(
            per_payload.withColumnRenamed("conv_id", "payload_hash").select(
                "payload_hash", *result_cols
            ),
            "payload_hash",
        ).select("conv_id", "turn_idx", "part_id", *result_cols)
    slim = parted.select(*cols, "salt")
    if repartition:
        slim = slim.repartition(num_parts, "salt")
    slim = slim.select(*cols)
    if readerable_gate:
        gate_schema = "conv_id STRING, turn_idx INT, text STRING, part_id INT, readerable BOOLEAN"
        slim = (
            slim.mapInPandas(make_readerable_kernel(url), gate_schema)
            .filter(F.col("readerable"))
            .select(*cols)
        )
    return slim.mapInArrow(make_extraction_kernel(url=url, opts=opts), OUT_SCHEMA_DDL)


def lineage_rollup(extractions: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage/metrics (FIXTURES.md §4): map-side partial agg
    then one small shuffle keyed by part_id."""
    return extractions.groupBy("part_id").agg(
        F.lit(run_id).alias("run_id"),
        F.count(F.lit(1)).alias("input_rows"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok_rows"),
        F.sum(F.when(F.col("status") == "null_result", 1).otherwise(0)).alias("null_rows"),
        F.sum(
            F.when(~F.col("status").isin("ok", "null_result"), 1).otherwise(0)
        ).alias("error_rows"),
        F.sum("parse_ms").alias("sum_parse_ms"),
        F.max("parse_ms").alias("max_parse_ms"),
        F.avg("candidate_count").alias("avg_candidates"),
        F.avg("top_score").alias("avg_top_score"),
        F.current_timestamp().alias("completed_at"),
    )


class Storage:
    """Iceberg writer with parquet-directory fallback (SURVEY.md §4.3)."""

    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog

    def _table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def append(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            df.writeTo(f"{self.catalog}.{name}").append()
        else:
            df.write.mode("append").parquet(self._table_path(name))

    def read(self, name: str) -> DataFrame | None:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        path = self._table_path(name)
        if not os.path.exists(path):
            return None
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    storage: Storage,
    run_id: str | None = None,
    num_parts: int = 64,
    opts: dict | None = None,
    readerable_gate: bool = False,
) -> dict:
    """Checkpointed, idempotently-resumable extraction job.

    Partition-at-a-time commit protocol:
      1. todo = all part_ids ∖ checkpointed part_ids (left-anti join)
      2. extract only rows whose part_id ∈ todo
      3. append extractions, lineage, then the checkpoint manifest rows
    A re-run after failure repeats only un-checkpointed partitions; rows of a
    partially-written partition are superseded because readers must filter
    extractions by checkpointed part_ids (see `read_consistent`).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    gated = with_partitioning(gate_html_turns(transcripts), num_parts)

    checkpoints = storage.read("checkpoints")
    if checkpoints is not None:
        done = checkpoints.filter(F.col("run_id") == run_id).select("part_id").distinct()
        all_parts = gated.select("part_id").distinct()
        todo_parts = all_parts.join(F.broadcast(done), "part_id", "left_anti")
    else:
        todo_parts = gated.select("part_id").distinct()

    todo = gated.join(F.broadcast(todo_parts), "part_id", "left_semi")
    extractions = extract_transcripts(
        todo, num_parts=num_parts, opts=opts, readerable_gate=readerable_gate,
        repartition=True,
    )
    # One pass: cache the kernel output so extraction cost is paid once for
    # the three sinks.
    extractions = extractions.persist()
    try:
        n_rows = extractions.count()
        storage.append(extractions, "extractions")
        lineage = lineage_rollup(extractions, run_id)
        storage.append(lineage, "lineage")
        manifest = (
            extractions.groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("rows_written"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("committed_at", F.current_timestamp())
            .select("run_id", "part_id", "rows_written", "committed_at")
        )
        storage.append(manifest, "checkpoints")
    finally:
        extractions.unpersist()
    return {"run_id": run_id, "rows": n_rows}


def read_consistent(storage: Storage, run_id: str) -> DataFrame | None:
    """Extractions restricted to checkpointed partitions + de-duplicated per
    (conv_id, turn_idx): the consistent view after any number of resumes."""
    from pyspark.sql import Window

    extractions = storage.read("extractions")
    checkpoints = storage.read("checkpoints")
    if extractions is None or checkpoints is None:
        return None
    done = checkpoints.filter(F.col("run_id") == run_id).select("part_id").distinct()
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("parse_ms").desc())
    return (
        extractions.join(F.broadcast(done), "part_id", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
