"""spark-submit entry point: tokenize a document corpus with the learned
BPE merge table and write fixed-length token-id training shards — the
terminal artifact of the pretraining pipeline.

  spark-submit --py-files dist/readability_1_spark.zip jobs/tokenize_job.py \
      --sf-dir /path/with/documents.parquet --output /path/to/out \
      [--seq-len 2048] [--n-ranges 2048] [--shards 64]

Writes:
  <output>/token_ids/    per-doc id sequences (doc_id, n_tokens, token_ids)
  <output>/sequences/    packed fixed-length sequences
                         (seq_id, n_tokens, token_ids) — every row but the
                         final remainder is exactly --seq-len ids, document
                         boundaries marked by the EOS id (vocab size)
  <output>/vocab/        (sym, id) vocabulary table + the EOS id row
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--n-ranges", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=64)
    args = ap.parse_args()

    from readability_1_spark.pretrain import pack_token_sequences
    from readability_1_spark.queries import _bpe_vocab, _doc_token_ids

    spark = SparkSession.builder.appName("readability_tokenize").getOrCreate()

    vocab, n_base, n_merges, _state = _bpe_vocab(spark, args.sf_dir)
    eos_id = n_base + n_merges
    vocab_rows = sorted(vocab.items(), key=lambda kv: (kv[1], kv[0]))
    vocab_df = spark.createDataFrame(
        [(s, i) for s, i in vocab_rows] + [("<EOS>", eos_id)],
        "sym string, id int",
    )
    vocab_df.coalesce(1).write.mode("overwrite").parquet(
        args.output + "/vocab"
    )

    per_doc, eos_id2 = _doc_token_ids(spark, args.sf_dir)
    assert eos_id2 == eos_id
    per_doc = per_doc.localCheckpoint()  # tokenization feeds both sinks once
    per_doc.select(
        "doc_id",
        F.size("ids").cast("bigint").alias("n_tokens"),
        F.col("ids").alias("token_ids"),
    ).repartition(args.shards).write.mode("overwrite").parquet(
        args.output + "/token_ids"
    )

    seqs = pack_token_sequences(
        per_doc, args.seq_len, eos_id, n_ranges=args.n_ranges
    )
    seqs.repartition(args.shards).write.mode("overwrite").parquet(
        args.output + "/sequences"
    )
    n_docs = per_doc.count()
    stats = seqs.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_tokens").alias("n_ids"),
    ).collect()[0]
    print(
        f"tokenize_job: docs={n_docs} vocab={len(vocab_rows) + 1} "
        f"eos_id={eos_id} sequences={stats.n_seqs} total_ids={stats.n_ids} "
        f"seq_len={args.seq_len}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
