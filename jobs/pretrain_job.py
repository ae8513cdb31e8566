"""spark-submit entry point: pretraining-data curation over transcripts.

  spark-submit --py-files dist/readability_1_spark.zip jobs/pretrain_job.py \
      --input /path/to/transcripts_parquet --output /path/to/out \
      [--num-parts 2048] [--min-chars 500] [--min-tokens 80] \
      [--pack-budget 2048] [--pack-shards 2048] \
      [--pack-strategy ffd|greedy] [--paragraph-dedup] [--cc-max-iter 25] \
      [--gopher-gate] [--c4-gate] [--repetition-gate] [--model-score]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-parts", type=int, default=2048)
    ap.add_argument("--min-chars", type=int, default=500)
    ap.add_argument("--min-tokens", type=int, default=80)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-shards", type=int, default=2048)
    ap.add_argument("--pack-strategy", choices=("ffd", "greedy"), default="ffd")
    ap.add_argument("--paragraph-dedup", action="store_true")
    ap.add_argument("--cc-max-iter", type=int, default=25)
    ap.add_argument("--gopher-gate", action="store_true")
    ap.add_argument("--c4-gate", action="store_true")
    ap.add_argument("--repetition-gate", action="store_true")
    ap.add_argument("--model-score", action="store_true")
    ap.add_argument("--conversation-cap", type=int, default=None)
    ap.add_argument("--ppl-tail-drop", action="store_true")
    args = ap.parse_args()

    from readability_1_spark.pretrain import run_pretrain_job

    spark = SparkSession.builder.appName("readability_pretrain").getOrCreate()
    transcripts = spark.read.parquet(args.input)
    stats = run_pretrain_job(
        spark, transcripts, args.output, num_parts=args.num_parts,
        pack_budget=args.pack_budget, pack_shards=args.pack_shards,
        pack_strategy=args.pack_strategy,
        min_chars=args.min_chars, min_tokens=args.min_tokens,
        paragraph_dedup=args.paragraph_dedup, cc_max_iter=args.cc_max_iter,
        gopher_gate=args.gopher_gate, c4_gate=args.c4_gate,
        repetition_gate=args.repetition_gate, model_score=args.model_score,
        conversation_cap=args.conversation_cap,
        ppl_tail_drop=args.ppl_tail_drop,
    )
    print(
        f"curated={stats['n_docs']} tokens={stats['total_tokens']} "
        f"train/val/test={stats['n_train']}/{stats['n_val']}/{stats['n_test']} "
        f"packs={stats['n_packs']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
