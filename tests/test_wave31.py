"""Wave 31: conversation-level split assignment + BPE roundtrip
attestation.

Independent evidence beyond the DuckDB oracles: the md5 base-31 bucket
polynomial replayed in pure Python over the smoke transcripts (every
row), the no-straddle invariant (all turns of a conversation share a
split), and the corpus-wide roundtrip/occurrence reconciliation against
a Counter replica.
"""

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    SPLIT_BUCKETS,
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    TRANSCRIPTS_PQ,
    q_bpe_roundtrip_check,
    q_conversation_split_assign,
)

SF = "/root/testdata/sf0.001"

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _bucket(key: str) -> int:
    h = hashlib.md5(key.encode()).hexdigest()[:8]
    acc = 0
    for ch in h:
        acc = acc * 31 + ord(ch)
    return acc % SPLIT_BUCKETS


def test_conversation_split_matches_polynomial_and_never_straddles(spark):
    t = pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    out = {(r.conv_id, r.turn_idx): r
           for r in q_conversation_split_assign(spark, SF).collect()}
    assert len(out) == len(t)
    per_conv = {}
    for r in t:
        x = out[(r["conv_id"], r["turn_idx"])]
        b = _bucket(r["conv_id"])
        assert x.split_bucket == b
        expect = ("train" if b < SPLIT_TRAIN_LT
                  else "val" if b < SPLIT_VAL_LT else "test")
        assert x.split == expect
        per_conv.setdefault(r["conv_id"], set()).add(x.split)
    # the no-straddle invariant: one split per conversation
    assert all(len(s) == 1 for s in per_conv.values())
    # 98/1/1 on the conversation key: train dominates
    splits = Counter(next(iter(s)) for s in per_conv.values())
    assert splits["train"] >= 0.9 * len(per_conv)


def test_bpe_roundtrip_holds_corpus_wide(spark):
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    counts = Counter()
    for d in docs:
        counts.update(w for w in _TOKEN_RE.split(d["text"].lower()) if w)

    rows = q_bpe_roundtrip_check(spark, SF).collect()
    # one row per distinct word, occurrences reconcile with the corpus
    assert {r.tok for r in rows} == set(counts)
    for r in rows:
        assert r.roundtrip_ok, r.tok  # lossless segmentation everywhere
        assert 1 <= r.n_sub <= len(r.tok)
        assert r.n_occurrences == counts[r.tok]
