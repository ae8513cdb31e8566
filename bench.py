"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

The headline workload is the north-star metric: per-turn Readability
extraction over a skewed synthetic transcripts table whose HTML payloads are
the reference fixture corpus (equality-gated by the test suite), through the
full salted/partitioned mapInPandas pipeline.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    from pyspark.sql import functions as F

    from readability_1_spark.pipeline import extract_transcripts
    from readability_1_spark.queries import QUERIES
    from readability_1_spark.session import get_spark
    from readability_1_spark.transcripts import scaled_transcripts

    sf = infer_sf(SF_DIR)
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict = {"cpus": CPUS}

    # ---- headline: extraction over skewed fixture-HTML transcripts --------
    # capped so the whole bench stays inside a few minutes; best-of-2 because
    # this VM's effective CPU capacity fluctuates over minutes
    n_turns = max(3000, min(int(600_000 * sf), 15_000))
    transcripts = scaled_transcripts(spark, n_turns).persist()
    n_html = transcripts.filter(
        F.col("text").isNotNull() & F.col("text").rlike("(?i)<html")
    ).count()  # materializes the persist before timing the kernel

    best_dt, agg = None, None
    for _attempt in range(2):
        t0 = time.time()
        extracted = extract_transcripts(transcripts, num_parts=max(CPUS * 2, 64))
        agg = extracted.groupBy("status").count().collect()
        dt = time.time() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    timings["extract_transcripts"] = round(best_dt, 3)
    extra["extract_html_turns"] = n_html
    extra["turns_per_sec"] = round(n_html / best_dt, 2)
    extra["status_counts"] = {r["status"]: r["count"] for r in agg}

    # Payload-dedup path: agent transcripts repeat fetched pages, so the
    # kernel runs once per DISTINCT page and joins back (same per-turn
    # output, tested) — the dominant saving on real transcript corpora.
    t0 = time.time()
    extract_transcripts(
        transcripts, num_parts=max(CPUS * 2, 64), dedup_payloads=True
    ).groupBy("status").count().collect()
    dt = time.time() - t0
    timings["extract_transcripts_dedup"] = round(dt, 3)
    extra["turns_per_sec_dedup"] = round(n_html / dt, 2)
    transcripts.unpersist()

    # ---- secondary headliners over the sf tables ---------------------------
    for name in (
        "q1_pricing_summary",
        "top_revenue_orders",
        "events_sessionize",
        "dedup_minhash_lsh",
        "dedup_minhash_clusters",
        "dedup_ngram_jaccard",
        "text_quality",
        "doc_fingerprint",
        "ann_cosine_topk",
        "ann_ivf_probe",
        "dedup_embedding_lsh",
    ):
        fn, _sql = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
