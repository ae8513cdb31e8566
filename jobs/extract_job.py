"""spark-submit entry point: checkpointed extraction over a transcripts
table.

  spark-submit --py-files dist/readability_1_spark.zip jobs/extract_job.py \
      --input /path/to/transcripts_parquet_or_table \
      --output /path/to/warehouse [--catalog cat.db] [--run-id RUN] \
      [--num-parts 2048] [--readerable-gate]

Re-running with the same --run-id resumes from the per-partition checkpoint
manifest (idempotent).  With --catalog, tables are Iceberg
(`writeTo(...).append()`); otherwise parquet directories under --output.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--catalog", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--num-parts", type=int, default=2048)
    ap.add_argument("--readerable-gate", action="store_true")
    args = ap.parse_args()

    from readability_1_spark.pipeline import Storage, run_extraction_job

    spark = SparkSession.builder.appName("readability_extract").getOrCreate()
    transcripts = (
        spark.read.table(args.input)
        if args.catalog or "/" not in args.input
        else spark.read.parquet(args.input)
    )
    storage = Storage(spark, args.output, catalog=args.catalog)
    result = run_extraction_job(
        spark, transcripts, storage,
        run_id=args.run_id, num_parts=args.num_parts,
        readerable_gate=args.readerable_gate,
    )
    print(f"run_id={result['run_id']} rows={result['rows']}")
    spark.stop()


if __name__ == "__main__":
    main()
