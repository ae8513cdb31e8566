"""SparkSession construction with the configs this engine relies on.

Tuned for correctness-at-scale defaults: AQE on (runtime coalescing + skew
join splitting), Arrow exchange for the pandas kernel, bounded Arrow batch
sizes so one batch of large HTML documents stays comfortably in worker
memory (fixture pages are 12-244 KB; 256 rows/batch ≈ ≤64 MB worst case).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256


def get_spark(app_name: str = "readability_1_spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None
              ) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES (floor 1 MB), so
        # CPU-dense-per-byte stages (16 md5-minhashes per shingle row) can
        # run 4 tasks on 32 cores.  A smaller floor was A/B-swept in-session
        # (64k/256k/1m over the 10 hottest mixed queries): it helps the
        # md5/fold-dense few (minhash_lsh 3.3->2.7) but costs every
        # latency-bound iterative query more (pagerank 4.1->5.4, packing
        # 2.2->2.9) — net zero to negative, so the Spark default stays;
        # the env knob remains for clusters where the trade differs.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Catalyst constraint propagation is quadratic-to-exponential in
        # (join width x expression size) and re-runs per AQE stage: the
        # 16-minhash-column audit join towers spent 10+ s per query in
        # the OPTIMIZER with all jobs summing to <1 s (measured: the same
        # materialized 256-row join tower ran 10.76 s with the rule on,
        # 0.31 s with it off).  It only INFERS extra filters — results
        # are identical by construction — and every scan-pruning filter
        # in this engine is written explicitly (BENCH/PLANS.md gates
        # check PushedFilters directly), so inference adds nothing here.
        # Spark's own docs recommend disabling it for large plans.
        .config("spark.sql.constraintPropagation.enabled",
                os.environ.get("SPARK_GRAFT_CONSTRAINT_PROP", "false"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
