"""Semantic tests for the corpus-assembly operators (splits, domain mixing,
sequence packing) and sketches.  Oracle parity is checked separately by
tools/verify_oracle.py / the driver gate; these assert the properties a
pipeline user relies on."""

import pytest
from pyspark.sql import functions as F

from readability_1_spark.queries import (
    MIX_WEIGHTS,
    PACK_BUDGET,
    SPLIT_BUCKETS,
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    hll_estimate,
    q_data_split_assign,
    q_domain_mix_resample,
    q_sequence_packing,
)

SF_DIR = "/root/testdata/sf0.01"


def test_split_fractions_and_determinism(spark):
    rows = q_data_split_assign(spark, SF_DIR).collect()
    n = len(rows)
    assert n == 500
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
        assert 0 <= r.split_bucket < SPLIT_BUCKETS
        expected = (
            "train"
            if r.split_bucket < SPLIT_TRAIN_LT
            else ("val" if r.split_bucket < SPLIT_VAL_LT else "test")
        )
        assert r.split == expected
    # 98/1/1 target: with 500 docs the binomial spread is wide, but train
    # must dominate and both held-out splits must stay tiny.
    assert counts["train"] >= 0.95 * n
    assert counts.get("val", 0) + counts.get("test", 0) <= 0.05 * n
    # determinism: same assignment on a re-run (content-stable hash)
    again = {r.doc_id: r.split for r in q_data_split_assign(spark, SF_DIR).collect()}
    assert all(again[r.doc_id] == r.split for r in rows)


def test_domain_mix_copy_counts(spark):
    rows = q_domain_mix_resample(spark, SF_DIR).collect()
    weights = dict(MIX_WEIGHTS)
    per_doc = {}
    for r in rows:
        assert r.copies == weights[r.source]
        assert 1 <= r.copy_idx <= r.copies
        per_doc.setdefault((r.doc_id, r.source), set()).add(r.copy_idx)
    # every doc appears exactly `copies` times with distinct copy_idx 1..copies
    for (doc_id, source), idxs in per_doc.items():
        assert idxs == set(range(1, weights[source] + 1))
    # total = sum of per-source doc counts x weight (25 docs per source at sf0.01)
    assert len(rows) == sum(25 * w for _, w in MIX_WEIGHTS)


def test_sequence_packing_budget_and_order(spark):
    rows = q_sequence_packing(spark, SF_DIR).collect()
    assert len(rows) == 500
    packs = {}
    for r in rows:
        packs.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pack_id), members in packs.items():
        total = sum(m.tokens for m in members)
        # budget respected unless a single oversized doc owns the pack
        assert total <= PACK_BUDGET or len(members) == 1
    # within a shard, pack_id is non-decreasing in doc order and contiguous
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        ids = [m.pack_id for m in members]
        assert ids[0] == 0
        for a, b in zip(ids, ids[1:]):
            assert b in (a, a + 1)
    # greedy invariant: independently replay the greedy scan and assert the
    # operator produced exactly those pack ids
    for shard, members in by_shard.items():
        cur, pid = 0, 0
        for m in members:
            if cur > 0 and cur + m.tokens > PACK_BUDGET:
                pid += 1
                cur = m.tokens
            else:
                cur += m.tokens
            assert m.pack_id == pid, (shard, m.doc_id, m.pack_id, pid)


def test_hll_high_cardinality_raw_branch(spark):
    """At n >> 2.5*m the raw harmonic-mean branch is used (the sf corpus's
    31-token vocab only exercises linear counting); a p=6 (64-register)
    sketch must land within ~3 standard errors (3 * 1.04/sqrt(64) ~ 39%)."""
    n = 5000
    df = spark.range(n).select(
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("v")
    )
    row = hll_estimate(df, "v", p=6).collect()[0]
    # all 64 registers hit at n=5000 -> linear counting is impossible here,
    # so this value comes from the raw-HLL branch
    assert row.n_registers_hit == 64
    assert abs(row.hll_estimate - n) / n < 0.39, row.hll_estimate


def test_hll_default_p_raw_branch_accuracy(spark):
    """The production default (p=11, 2048 registers) on a cardinality well
    above 2.5*m = 5120: raw-branch estimate within ~3 standard errors
    (3 * 1.04/sqrt(2048) ~ 6.9%)."""
    n = 50_000
    df = spark.range(n).select(
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("v")
    )
    row = hll_estimate(df, "v").collect()[0]
    assert row.n_registers_hit > 2048 * 0.9  # nearly all registers hit
    assert abs(row.hll_estimate - n) / n < 0.069, row.hll_estimate


def test_hll_exact_duplicates_collapse(spark):
    """Duplicates of the same value never change the sketch: 8 copies of
    200 values estimate the same as 1 copy."""
    base = spark.range(200).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v")
    )
    dup = base
    for _ in range(3):
        dup = dup.unionAll(dup)  # 8 copies
    one = hll_estimate(base, "v").collect()[0]
    many = hll_estimate(dup, "v").collect()[0]
    assert one.hll_estimate == many.hll_estimate
    assert one.n_registers_hit == many.n_registers_hit


def test_hll_merge_equals_direct_sketch(spark):
    """Mergeability: max-ing per-source registers reproduces EXACTLY the
    estimate of sketching all (token, doc) pairs directly — and the pair
    cardinality (~14k > 2.5*m = 5120 at p=11) forces the RAW branch."""
    from readability_1_spark.queries import TOKEN_SPLIT, q_hll_merge_by_source

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    ws = F.filter(F.split(F.lower(F.col("text")), TOKEN_SPLIT), lambda x: x != "")
    pairs = docs.select("doc_id", F.explode(ws).alias("tok")).select(
        F.concat(F.col("tok"), F.lit("#"), F.col("doc_id").cast("string")).alias(
            "term"
        )
    )
    direct = hll_estimate(pairs, "term").collect()[0]
    merged = {
        r.source: r for r in q_hll_merge_by_source(spark, SF_DIR).collect()
    }["__merged__"]
    assert merged.hll_estimate == direct.hll_estimate
    assert merged.n_registers_hit == direct.n_registers_hit
    # high cardinality -> nearly every register hit and the estimate above
    # the 2.5*m linear-counting cutoff -> raw branch, cross-checked against
    # the DuckDB oracle by verify_oracle / the driver gate
    assert merged.n_registers_hit > 2048 * 0.9
    assert merged.hll_estimate > 2.5 * 2048


def test_topn_sample_nests(spark):
    """Fixed-size samples nest: the top-50 draw is a subset of the top-100
    draw (same hash order), and both are deterministic across runs."""
    from readability_1_spark.queries import q_corpus_sample_topn

    top100 = {r.doc_id for r in q_corpus_sample_topn(spark, SF_DIR).collect()}
    assert len(top100) == 100
    again = {r.doc_id for r in q_corpus_sample_topn(spark, SF_DIR).collect()}
    assert again == top100
    # reconstruct the top-50 with the same ordering expression
    from readability_1_spark.queries import _md5_bucket

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    h = _md5_bucket(F.col("doc_id").cast("string"), 1000000007)
    top50 = {
        r.doc_id
        for r in docs.select("doc_id", h.alias("k"))
        .orderBy(F.col("k").asc(), F.col("doc_id").asc())
        .limit(50)
        .collect()
    }
    assert top50 < top100


def test_bpe_early_stop_and_learned_merges(spark, tmp_path):
    """The trainer stops when the best pair's weighted count < 2 (not at
    the BPE_MERGES cap), and sub-2 pairs are never merged.  Corpus: 'ab'
    twice (pair weight 2 -> merged), 'xy' once (weight 1 -> left split)."""
    from readability_1_spark.queries import _bpe_train

    docs = spark.createDataFrame(
        [(1, "ab ab", "s"), (2, "xy", "s")], "doc_id long, text string, source string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    merges, state = _bpe_train(spark, str(tmp_path))
    rows = merges.collect()
    assert [(r.merge_rank, r.merged, r.pair_count) for r in rows] == [(1, "ab", 2)]
    seg = {r.tok: r.s for r in state.collect()}
    assert seg == {"ab": " ab ", "xy": " x  y "}


def test_bpe_full_depth_on_sf_corpus(spark):
    """At sf0.01 the 31-word vocab supports the full 50-merge depth (no
    early stop), ranks are consecutive, counts non-increasing within the
    greedy guarantee domain, and the tokenize stats reflect the merges
    (fertility above 1 char/subword means merges actually applied)."""
    from readability_1_spark.queries import (
        BPE_MERGES,
        q_bpe_learn_merges,
        q_bpe_tokenize_stats,
    )

    rows = q_bpe_learn_merges(spark, SF_DIR).orderBy("merge_rank").collect()
    assert len(rows) == BPE_MERGES == 50
    assert [r.merge_rank for r in rows] == list(range(1, 51))
    assert all(r.pair_count >= 2 for r in rows)
    stats = q_bpe_tokenize_stats(spark, SF_DIR).collect()
    assert len(stats) == 500
    assert all(s.chars_per_subword > 1.0 for s in stats)


def test_ffd_fill_beats_greedy_on_skewed_corpus(spark, tmp_path):
    """FFD must pack at least as tightly as the order-preserving greedy
    scan on a skewed length distribution (big docs early strand capacity
    that only later small docs could fill), and the registered stats query
    must agree on the sf corpus."""
    from readability_1_spark.queries import (
        PACK_BUDGET,
        ffd_pack_ids,
        greedy_pack_ids,
        q_sequence_packing_stats,
    )

    # Skewed: 129/127 pairs just over/under half the budget.  FFD pairs
    # every 129 with a 127 (20 exact-fit packs); the order-preserving scan
    # strands the first 129 alone and needs 21.
    sizes = [129, 129, 127, 127] * 10
    greedy_packs = max(greedy_pack_ids(sizes, 256)) + 1
    ffd_sorted = sorted(sizes, reverse=True)
    ffd_packs = max(ffd_pack_ids(ffd_sorted, 256)) + 1
    assert ffd_packs < greedy_packs  # strictly better on this corpus
    assert sum(sizes) <= ffd_packs * 256

    stats = {r.variant: r for r in q_sequence_packing_stats(spark, SF_DIR).collect()}
    assert stats["ffd"].n_packs <= stats["greedy"].n_packs
    assert stats["ffd"].mean_fill >= stats["greedy"].mean_fill
    assert stats["ffd"].total_tokens == stats["greedy"].total_tokens
    assert 0 < stats["ffd"].mean_fill <= 1.0 + 500 / PACK_BUDGET


def test_pack_sequences_ffd_respects_budget(spark):
    """pretrain.pack_sequences(strategy='ffd') keeps the budget invariant
    (single-doc packs exempt) and covers every row exactly once."""
    from readability_1_spark.pretrain import pack_sequences

    curated = spark.createDataFrame(
        [(f"c{i}", 0, t) for i, t in enumerate([150, 50] * 10 + [300, 7])],
        "conv_id string, turn_idx int, n_tokens long",
    )
    packs = pack_sequences(curated, budget=256, n_shards=2).collect()
    assert len(packs) == 22
    by_pack = {}
    for p in packs:
        by_pack.setdefault((p.shard, p.pack_id), []).append(p)
    for members in by_pack.values():
        total = sum(m.n_tokens for m in members)
        assert total <= 256 or len(members) == 1


def test_pack_token_sequences_exact_chunks(spark):
    """pack_token_sequences = concat-and-chunk: with known per-doc id
    arrays the packed sequences must be exactly the EOS-joined global
    stream cut every seq_len tokens, across multiple range partitions."""
    from readability_1_spark.pretrain import pack_token_sequences

    per_doc = spark.createDataFrame(
        [(i, list(range(10 * i, 10 * i + 3 + (i % 4)))) for i in range(20)],
        "doc_id int, ids array<int>",
    )
    eos, seq_len = 999, 5
    stream = []
    for i in range(20):
        stream.extend(range(10 * i, 10 * i + 3 + (i % 4)))
        stream.append(eos)
    expected = {
        s: stream[s * seq_len : (s + 1) * seq_len]
        for s in range((len(stream) + seq_len - 1) // seq_len)
    }
    got = {
        r.seq_id: list(r.token_ids)
        for r in pack_token_sequences(
            per_doc, seq_len, eos, n_ranges=7
        ).collect()
    }
    assert got == expected
    for s, ids in got.items():
        assert len(ids) == (seq_len if s < max(got) else len(stream) % seq_len or seq_len)


def test_pack_token_ids_reassembles_corpus(spark):
    """Round-4 verdict ask #1 'done' criterion: concatenating the packed
    sequences in seq_id order reproduces the tokenized corpus exactly —
    every document's id sequence plus its EOS boundary marker, in doc_id
    order, nothing lost or reordered at the chunk cuts."""
    from readability_1_spark.queries import (
        PACK_IDS_SEQ_LEN,
        _doc_token_ids,
        q_bpe_tokenize_ids,
        q_pack_token_ids,
    )

    sf = "/root/testdata/sf0.001"
    per_doc, eos_id = _doc_token_ids(spark, sf)
    doc_rows = sorted(
        (r.doc_id, list(r.ids)) for r in per_doc.collect()
    )
    corpus_stream = []
    for _doc, ids in doc_rows:
        corpus_stream.extend(ids)
        corpus_stream.append(eos_id)

    packs = sorted(
        (r.seq_id, r.token_ids.split(" "))
        for r in q_pack_token_ids(spark, sf).collect()
    )
    packed_stream = [int(t) for _s, ids in packs for t in ids]
    assert packed_stream == corpus_stream
    # fixed-length contract: every sequence but the last is full
    for s, ids in packs[:-1]:
        assert len(ids) == PACK_IDS_SEQ_LEN
    # and the per-doc tokenize query agrees with the stream it feeds
    tok = {r.doc_id: r.n_tokens for r in q_bpe_tokenize_ids(spark, sf).collect()}
    assert sum(tok.values()) + len(tok) == len(corpus_stream)


def test_doc_quality_classifier_agrees_with_rule_gates(spark):
    """Round-4 verdict ask #5 'done' criterion: the trained linear
    classifier must rank documents consistently with the rule-gate labels
    it was trained on (AUC well above chance) and agree on most hard
    predictions.  A linear model cannot express the AND-of-thresholds gate
    exactly, so the bars are deliberately below 1.0."""
    import bisect

    from readability_1_spark.queries import q_doc_quality_classifier

    rows = q_doc_quality_classifier(spark, SF_DIR).collect()
    assert len(rows) == 500
    acc = sum((r.pred == r.label) for r in rows) / len(rows)
    pos = sorted(r.score for r in rows if r.label == 1)
    neg = sorted(r.score for r in rows if r.label == 0)
    assert pos and neg  # both classes present in the corpus
    auc = sum(
        bisect.bisect_left(neg, p)
        + 0.5 * (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
        for p in pos
    ) / (len(pos) * len(neg))
    assert auc >= 0.80, f"AUC {auc:.3f} below bar"
    assert acc >= 0.70, f"accuracy {acc:.3f} below bar"
    # determinism: a second invocation returns identical scores
    again = {r.doc_id: r.score for r in q_doc_quality_classifier(spark, SF_DIR).collect()}
    assert all(again[r.doc_id] == r.score for r in rows)


def test_pack_token_sequences_property(spark):
    """Property check over randomized corpora: for any doc-id/ids shape,
    seq_len, and range-partition count, packing equals the reference
    concat-and-chunk of (ids + EOS) in doc order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from readability_1_spark.pretrain import pack_token_sequences

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.integers(0, 90), min_size=0, max_size=17),
            min_size=1,
            max_size=12,
        ),
        seq_len=st.integers(1, 9),
        n_ranges=st.integers(1, 5),
    )
    def inner(docs, seq_len, n_ranges):
        eos = 99
        per_doc = spark.createDataFrame(
            [(i, ids) for i, ids in enumerate(docs)],
            "doc_id int, ids array<int>",
        )
        stream = [t for ids in docs for t in list(ids) + [eos]]
        expected = {
            s: stream[s * seq_len : (s + 1) * seq_len]
            for s in range(-(-len(stream) // seq_len))
        }
        got = {
            r.seq_id: list(r.token_ids)
            for r in pack_token_sequences(
                per_doc, seq_len, eos, n_ranges=n_ranges
            ).collect()
        }
        assert got == expected

    inner()


def test_exact_substring_dedup_keep_first(spark, tmp_path):
    """Keep-first semantics of the duplicated-span strip: a K=8-token span
    shared across docs survives only at its globally first (doc_id, pos)
    occurrence; a span repeated WITHIN a doc keeps its first copy; docs
    shorter than K and docs with no duplicated window pass untouched."""
    from readability_1_spark.queries import q_dedup_exact_substring

    d1 = "a b c d e f g h x y"                # owns the span at pos 1
    d2 = "q r a b c d e f g h"                # same span again at pos 3
    d3 = "a b c"                              # shorter than K: no windows
    d4 = "t u v w m n o k t u v w m n o k"    # internal repeat at pos 9
    docs = spark.createDataFrame(
        [(1, d1, "s", len(d1)), (2, d2, "s", len(d2)),
         (3, d3, "s", len(d3)), (4, d4, "s", len(d4))],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           q_dedup_exact_substring(spark, str(tmp_path)).collect()}
    assert out[1].n_dup_windows == 0 and out[1].kept_text == d1
    assert out[2].n_dup_windows == 1
    assert out[2].n_dup_tokens == 8
    assert out[2].dup_ratio == 0.8
    assert out[2].kept_text == "q r"
    assert out[3].n_dup_windows == 0 and out[3].kept_text == d3
    assert out[4].n_dup_windows == 1
    assert out[4].kept_text == "t u v w m n o k"


def test_minhash_keep_best_prefers_longest(spark, tmp_path):
    """Canonical selection keeps the LONGEST doc of a near-dup cluster
    (ties: min doc_id), not the min doc_id — and singletons keep
    themselves."""
    from readability_1_spark.queries import q_dedup_minhash_keep_best

    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely different content with no shared shingles at all"
    docs = spark.createDataFrame(
        [(1, dup, "s", 10), (2, dup, "s", 50), (3, uniq, "s", 30)],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           q_dedup_minhash_keep_best(spark, str(tmp_path)).collect()}
    assert out[1].cluster_id == out[2].cluster_id
    assert out[1].cluster_size == 2
    assert not out[1].is_kept and out[2].is_kept  # longest wins, not min id
    assert out[3].is_kept and out[3].cluster_size == 1


def test_inverted_index_counts_and_cap(spark, tmp_path, monkeypatch):
    """df counts distinct docs, total_tf counts occurrences, postings are
    ascending doc_ids, and the posting-list prefix cap truncates (rank
    filter BEFORE collection)."""
    from readability_1_spark import queries

    docs = spark.createDataFrame(
        [(1, "foo bar foo", "s", 11), (2, "foo baz", "s", 7),
         (3, "foo", "s", 3)],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.tok: r for r in
           queries.q_inverted_index_postings(spark, str(tmp_path)).collect()}
    assert (out["foo"].df, out["foo"].total_tf, out["foo"].postings) == (3, 4, "1,2,3")
    assert (out["bar"].df, out["bar"].total_tf, out["bar"].postings) == (1, 1, "1")
    assert out["baz"].postings == "2"
    monkeypatch.setattr(queries, "POSTINGS_CAP", 2)
    capped = {r.tok: r for r in
              queries.q_inverted_index_postings(spark, str(tmp_path)).collect()}
    assert capped["foo"].postings == "1,2"       # prefix, not arbitrary 2
    assert capped["foo"].df == 3                 # df still from full stream


def test_bm25_ranking_and_topk_cap(spark, tmp_path, monkeypatch):
    """Query terms are the top-df pairs (ties lexicographic), a higher-tf
    doc outranks a lower-tf doc of the same length for the same query,
    rnk is gapless from 1, and BM25_TOPK caps each query's list."""
    from readability_1_spark import queries

    # dfs: t1..t8 appear in 8,7,...,1 docs -> queries (t1,t2) (t3,t4) ...
    toks = [f"t{i}" for i in range(1, 9)]
    rows = []
    for d in range(1, 9):
        body = " ".join(toks[: 9 - d])          # doc d holds t1..t_{9-d}
        rows.append((d, body, "s", len(body)))
    # two extra same-length docs where only tf of t8 differs
    rows.append((20, "t8 t8 t8 zz", "s", 11))
    rows.append((21, "t8 zz zz zz", "s", 11))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_bm25_search_topk(spark, str(tmp_path)).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    assert by_q[0][0].query_terms == "t1,t2"
    # df ties at 3 (t6, t8) break lexicographically, so ranks 7-8 are t8, t7
    assert by_q[3][0].query_terms == "t8,t7"
    for q, rs in by_q.items():
        assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
            range(1, len(rs) + 1)
        )
    # query 3 contains t8: doc 20 (tf=3) must outrank doc 21 (tf=1)
    q3 = {r.doc_id: r for r in by_q[3]}
    assert q3[20].score > q3[21].score
    monkeypatch.setattr(queries, "BM25_TOPK", 2)
    capped = queries.q_bm25_search_topk(spark, str(tmp_path)).collect()
    for q in (0, 1, 2, 3):
        assert len([r for r in capped if r.query_id == q]) == 2


def test_bloom_membership_no_false_negatives(spark, tmp_path, monkeypatch):
    """Exact duplicates of prior-snapshot docs are always bloom hits (no
    false negatives); with the full-width filter a unique doc misses; with
    a tiny monkeypatched filter the planted false positive (verified
    against an independent hashlib mini-oracle) is flagged bloom_hit but
    not actual_dup."""
    import hashlib

    from readability_1_spark import queries

    def positions(text, bits):
        h = hashlib.md5(text.encode()).hexdigest()
        return {int(h[4 * i : 4 * i + 4], 16) % bits for i in range(4)}

    t_prior = "shared prior snapshot text"
    t_uniq = "completely fresh new text"
    rows = [
        (4, t_prior, "s", len(t_prior)),      # prior slice (doc_id % 4 == 0)
        (5, t_prior, "s", len(t_prior)),      # new, exact dup of prior
        (6, t_uniq, "s", len(t_uniq)),        # new, unique
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           queries.q_dedup_bloom_membership(spark, str(tmp_path)).collect()}
    assert out[5].actual_dup and out[5].bloom_hit
    assert not out[6].actual_dup
    # independent mini-oracle agrees with the full-width verdict for doc 6
    full_set = positions(t_prior, queries.BLOOM_BITS)
    assert out[6].bloom_hit == (positions(t_uniq, queries.BLOOM_BITS) <= full_set)
    assert not out[6].bloom_hit
    monkeypatch.setattr(queries, "BLOOM_BITS", 2)
    tiny = {r.doc_id: r for r in
            queries.q_dedup_bloom_membership(spark, str(tmp_path)).collect()}
    assert tiny[5].bloom_hit                  # still no false negative
    expect_fp = positions(t_uniq, 2) <= positions(t_prior, 2)
    assert tiny[6].bloom_hit == expect_fp and not tiny[6].actual_dup


def test_gopher_filters_rule_battery(spark, tmp_path):
    """Each Gopher rule trips on a doc crafted to violate exactly that
    dimension; a normal prose doc passes; a whitespace-only doc fails via
    the null-ratio guard instead of erroring."""
    from readability_1_spark import queries

    prose = "the quick brown fox jumps over that lazy dog with great energy today"
    good = " ".join([prose] * 5)                      # 65 words, all rules met
    short = "the cat sat with that"                   # 5 words < 50
    symbols = good + " " + " ".join(["#"] * 10)       # 10/75 hashes > 0.1
    bullets = "\n".join(["- item alpha beta"] * 60)   # bullet_frac 1.0 > 0.9
    ellipsis = "\n".join(
        [prose + "..."] * 4 + [prose] * 6             # 0.4 of lines > 0.3
    )
    numeric = " ".join(str(1000 + i) for i in range(60))  # alpha_frac 0.0
    blank = "   \n  "                                 # zero words
    rows = [
        (1, good, "en", "s", len(good)),
        (2, short, "en", "s", len(short)),
        (3, symbols, "en", "s", len(symbols)),
        (4, bullets, "en", "s", len(bullets)),
        (5, ellipsis, "en", "s", len(ellipsis)),
        (6, numeric, "en", "s", len(numeric)),
        (7, blank, "en", "s", len(blank)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           queries.q_gopher_quality_filters(spark, str(tmp_path)).collect()}
    assert out[1].passes_gopher
    assert out[1].n_words == 65 and out[1].stop_hits >= 2
    assert 3.0 <= out[1].mean_word_len <= 10.0
    assert not out[2].passes_gopher and out[2].n_words == 5
    assert not out[3].passes_gopher
    assert out[3].symbol_ratio == round(10 / 75, 6)
    assert not out[4].passes_gopher and out[4].bullet_frac == 1.0
    assert not out[5].passes_gopher and out[5].ellipsis_frac == 0.4
    assert not out[6].passes_gopher and out[6].alpha_frac == 0.0
    assert not out[7].passes_gopher and out[7].n_words == 0
    assert out[7].mean_word_len is None


def test_dsir_weights_favor_target_lang(spark, tmp_path):
    """Docs drawn from the target-language distribution score a higher
    importance log-ratio than out-of-target docs; the feature count is
    unigrams + adjacent bigrams; token-free docs get n_feats 0 and a null
    weight instead of dropping out."""
    from readability_1_spark import queries

    rows = [
        (1, "the cat sat", "en", "s", 11),
        (2, "the cat ran", "en", "s", 11),
        (3, "the dog sat", "en", "s", 11),
        (4, "der hund lief schnell", "de", "s", 21),
        (5, "der hund kam heim", "de", "s", 17),
        (6, "!!!", "zh", "s", 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           queries.q_dsir_importance_weights(spark, str(tmp_path)).collect()}
    assert len(out) == 6
    assert out[1].n_feats == 3 + 2                    # unigrams + bigrams
    assert out[4].n_feats == 4 + 3
    assert out[6].n_feats == 0 and out[6].logratio_per_feat is None
    en_w = [out[d].logratio_per_feat for d in (1, 2, 3)]
    de_w = [out[d].logratio_per_feat for d in (4, 5)]
    assert min(en_w) > max(de_w)


def test_containment_dedup_finds_subset_pair(spark, tmp_path):
    """A short doc fully contained in a longer one is reported with
    contain_a = 1.0 even though its Jaccard is low; an unrelated doc pairs
    with nothing; a pair sharing ONLY a hot shingle (df > CONTAIN_DF_CAP)
    is deliberately not a candidate."""
    from readability_1_spark import queries

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    filler = " ".join(f"pad{i} fill{i} extra{i}" for i in range(40))
    hot = "common shared phrase here"
    rows = [
        (1, base, "en", "s", len(base)),                  # the contained doc
        (2, base + " " + filler, "en", "s", 1),           # superset of doc 1
        (3, "totally different content stream words", "en", "s", 1),
    ]
    # 10 docs sharing ONLY the hot shingle -> df(hot shingles) > cap
    for d in range(10, 20):
        t = f"{hot} unique{d}a unique{d}b unique{d}c"
        rows.append((d, t, "en", "s", len(t)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_dedup_containment(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.contain_a == 1.0                    # doc 1 fully inside doc 2
    assert r.contain_b < 0.2                     # far from symmetric-dup
    sz_a = len(base.split()) - 2                 # 3-shingle count of doc 1
    assert r.n_common == sz_a
    # Jaccard for this pair is small: minhash at J>=0.5 would miss it
    assert r.n_common / (sz_a + (r.n_common / r.contain_b) - r.n_common) < 0.2
    assert all(a == 1 and b == 2 for (a, b) in pairs)   # nothing else pairs


def test_pmi_collocations_rank_and_thresholds(spark, tmp_path, monkeypatch):
    """A pair whose words appear ONLY together outranks a pair of
    promiscuous words; bigrams under PMI_MIN_COUNT are excluded; PMI_TOPK
    caps the result; the PMI value matches a hand computation."""
    import math

    from readability_1_spark import queries

    # "zig zag" 5x: zig/zag never appear apart.  "the end" 5x: the/end
    # also appear in many other contexts.  "rare pair" 4x: under MIN_COUNT.
    text = " ".join(
        ["zig zag"] * 5
        + ["the end"] * 5
        + ["the start", "the middle", "end game", "end zone"] * 3
        + ["rare pair"] * 4
    )
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_pmi_collocations(spark, str(tmp_path)).collect()
    by_pair = {(r.w1, r.w2): r for r in out}
    assert ("rare", "pair") not in by_pair          # 4 < PMI_MIN_COUNT
    assert ("zig", "zag") in by_pair and ("the", "end") in by_pair
    zz, te = by_pair[("zig", "zag")], by_pair[("the", "end")]
    assert zz.pmi > te.pmi
    assert zz.n_pair == 5 and zz.n_w1 == 5 and zz.n_w2 == 5
    # hand-check: all tokens N, bigram positions M (one doc: N-1)
    toks = text.split()
    N, M = len(toks), len(toks) - 1
    expect = round(math.log((5 / M) / ((5 / N) * (5 / N))), 6)
    assert zz.pmi == expect
    monkeypatch.setattr(queries, "PMI_TOPK", 2)
    assert len(queries.q_pmi_collocations(spark, str(tmp_path)).collect()) == 2


def test_source_overlap_minhash_tracks_exact_jaccard(spark, tmp_path):
    """Controlled shingle sets: srcA = shingles 0..99, srcB = 50..149
    (exact Jaccard 1/3), srcC disjoint.  Each doc is exactly 3 tokens, so
    it contributes exactly one shingle and the source shingle sets are
    known by construction.  The 64-hash estimate must land within
    binomial noise of the truth, be exactly n_match/64, report disjoint
    pairs as 0, and emit every source pair."""
    from readability_1_spark import queries

    rows, did = [], 0
    for i in range(100):                                     # srcA: s0..s99
        did += 1
        rows.append((did, f"w{i}a w{i}b w{i}c", "en", "srcA", 1))
    for i in range(50, 150):                                 # srcB: s50..s149
        did += 1
        rows.append((did, f"w{i}a w{i}b w{i}c", "en", "srcB", 1))
    for i in range(50):                                      # srcC: disjoint
        did += 1
        rows.append((did, f"c{i}a c{i}b c{i}c", "en", "srcC", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_source_overlap_minhash(spark, str(tmp_path)).collect()
    pairs = {(r.source_a, r.source_b): r for r in out}
    assert set(pairs) == {("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")}
    ab = pairs[("srcA", "srcB")]
    # truth 1/3; stderr = sqrt(J(1-J)/64) ~ 0.059 -> +/-3.5 sigma band
    assert 0.13 <= ab.est_jaccard <= 0.54
    assert ab.est_jaccard == round(ab.n_match / queries.N_SRC_MINHASH, 6)
    assert pairs[("srcA", "srcC")].n_match == 0
    assert pairs[("srcB", "srcC")].n_match == 0


def test_ccnet_perplexity_buckets_orders_by_lm_score(spark, tmp_path):
    """Three docs of a corpus-dominant repeated bigram (high LM score) and
    three of corpus-unique gibberish (low score), one source: ntile(3)
    must put repeated-bigram docs in the head, gibberish in the tail,
    2/2/2 sizes, and exclude the unscorable 1-token doc entirely."""
    from readability_1_spark import queries

    rows = [(i, "x y " * 20, "en", "s", 80) for i in (1, 2, 3)]
    rows += [
        (4, "q1 q2 q3 q4 q5", "en", "s", 14),
        (5, "r1 r2 r3 r4 r5", "en", "s", 14),
        (6, "t1 t2 t3 t4 t5", "en", "s", 14),
        (7, "solo", "en", "s", 4),  # < 2 tokens -> null score -> excluded
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_ccnet_perplexity_buckets(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5, 6}
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.ppl_bucket, set()).add(r.doc_id)
    assert {len(v) for v in by_bucket.values()} == {2}
    assert by_bucket["head"] <= {1, 2, 3}          # repeated-bigram docs
    assert by_bucket["tail"] <= {4, 5, 6}          # gibberish docs
    # identical scores tie-break by doc_id: head must be the two LOWEST ids
    assert by_bucket["head"] == {1, 2}


def test_source_token_kl_exact_and_flags_divergence(spark, tmp_path):
    """srcSame1/srcSame2 share one token distribution; srcWeird uses
    disjoint vocabulary.  KL(weird||corpus) must dominate both, and the
    reported value must equal a from-first-principles replication of the
    round-6 recipe (MLE source dist vs Laplace-smoothed corpus dist)."""
    import math
    from collections import Counter

    from readability_1_spark import queries

    texts = {
        "srcSame1": "a b c d " * 10,
        "srcSame2": "a b c d " * 10,
        "srcWeird": "zz yy xx " * 10,
    }
    rows = [
        (i, txt, "en", src, len(txt))
        for i, (src, txt) in enumerate(sorted(texts.items()))
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in
           queries.q_source_token_kl(spark, str(tmp_path)).collect()}
    assert set(out) == set(texts)
    assert out["srcWeird"].kl_nats > out["srcSame1"].kl_nats
    assert out["srcSame1"].kl_nats == out["srcSame2"].kl_nats

    # from-first-principles replication for every source
    corpus = Counter()
    per_src = {s: Counter(t.split()) for s, t in texts.items()}
    for c in per_src.values():
        corpus.update(c)
    tot, vsz = sum(corpus.values()), len(corpus)
    for src, cnt in per_src.items():
        n_src = sum(cnt.values())
        acc = sum(
            k * round(math.log((k / n_src) / ((corpus[w] + 1) / (tot + vsz))), 6)
            for w, k in cnt.items()
        )
        assert out[src].n_tokens == n_src
        assert out[src].kl_nats == round(acc / n_src, 6)


def test_domain_cap_sample_keeps_longest_per_source(spark, tmp_path):
    """15-doc source must truncate to DOMAIN_CAP longest docs (n_chars
    DESC, doc_id ASC on ties); a 3-doc source survives whole; ranks are
    1..kept within each source."""
    from readability_1_spark import queries

    rows = [(i, "t", "en", "big", 1000 - i) for i in range(15)]
    rows += [(100, "t", "en", "tiny", 5), (101, "t", "en", "tiny", 5),
             (102, "t", "en", "tiny", 7)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = queries.q_domain_cap_sample(spark, str(tmp_path)).collect()
    big = sorted([r for r in out if r.source == "big"], key=lambda r: r.src_rank)
    tiny = sorted([r for r in out if r.source == "tiny"], key=lambda r: r.src_rank)
    assert len(big) == queries.DOMAIN_CAP
    # n_chars = 1000 - doc_id, so longest-first == doc_id 0..9
    assert [r.doc_id for r in big] == list(range(queries.DOMAIN_CAP))
    assert [r.src_rank for r in big] == list(range(1, queries.DOMAIN_CAP + 1))
    # tie on n_chars=5: doc 100 outranks 101; 102 (7 chars) is rank 1
    assert [r.doc_id for r in tiny] == [102, 100, 101]


def test_doclen_quantile_sketch_bucket_exact(spark, tmp_path):
    """Point mass reads back its own bucket lower bound; a 1..100 ramp
    reads the hand-computed quarter-octave bucket bounds (50 -> 48,
    90 -> 80, 99 -> 96); zero-length docs are excluded entirely."""
    from readability_1_spark import queries

    rows = [(i, "t", "en", "pm", 100) for i in range(10)]
    rows += [(100 + n, "t", "en", "ramp", n) for n in range(1, 101)]
    rows += [(999, "", "en", "zero", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in
           queries.q_doclen_quantile_sketch(spark, str(tmp_path)).collect()}
    assert set(out) == {"pm", "ramp"}
    pm = out["pm"]
    # 100 = 0b1100100: blen 7, high2 2 -> lower (4+2)<<4 = 96 for all three
    assert (pm.n_docs, pm.p50_lo, pm.p90_lo, pm.p99_lo) == (10, 96, 96, 96)
    rp = out["ramp"]
    assert rp.n_docs == 100
    assert (rp.p50_lo, rp.p90_lo, rp.p99_lo) == (48, 80, 96)
    # bucket relative width bound: lower <= true < 1.25 * lower
    for lo, true in ((48, 50), (80, 90), (96, 99)):
        assert lo <= true < lo * 1.25


def test_semdedup_keeps_farthest_duplicate_per_cluster(spark, tmp_path):
    """SemDeDup keep rule: within a kmeans cluster, a τ-cosine duplicate
    group keeps ONLY the member farthest from the centroid (the paper's
    lowest-centroid-similarity rule); singleton clusters keep themselves.
    Vectors 0..7 sit on ±axis corners (kmeans init = first 8 vec_ids, so
    each founds its own cluster); 8 and 9 are colinear with vector 0
    (pairwise cosine 1.0), so cluster 0 = {0, 8, 9} with centroid 10.33·u
    and distances 0.33 / 2.67 / 2.33 — only vec 8 (farthest) survives."""
    from readability_1_spark.queries import q_semdedup

    corners = []
    for axis in range(4):
        for sign in (10.0, -10.0):
            v = [0.0] * 4
            v[axis] = sign
            corners.append(v)
    rows = [(i, corners[i], 0) for i in range(8)]
    rows += [(8, [13.0, 0.0, 0.0, 0.0], 0), (9, [8.0, 0.0, 0.0, 0.0], 0)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r for r in q_semdedup(spark, str(tmp_path)).collect()}
    assert len(out) == 10
    assert out[0].centroid_id == out[8].centroid_id == out[9].centroid_id
    assert out[8].is_kept
    assert not out[0].is_kept and not out[9].is_kept
    for i in range(1, 8):  # singleton clusters all keep themselves
        assert out[i].is_kept
    # the keep choice is the max-distance member, deterministically
    assert out[8].dist > out[9].dist > out[0].dist


def test_doc_ngram_novelty_first_occurrence_owns_shingle(spark, tmp_path):
    """A shingle is novel only in the min-doc_id doc that first used it;
    repeated shingles inside one doc count once (distinct); docs with <3
    tokens have no shingles (counts 0, novelty NULL)."""
    from readability_1_spark.queries import q_doc_ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "s", 9),     # abc bcd cde -> all novel
            (2, "a b c d x", "s", 9),     # abc bcd seen; cdx novel
            (3, "a b", "s", 3),           # too short: no shingles
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           q_doc_ngram_novelty(spark, str(tmp_path)).collect()}
    assert (out[1].n_shingles, out[1].n_novel, out[1].novelty) == (3, 3, 1.0)
    assert (out[2].n_shingles, out[2].n_novel, out[2].novelty) == (3, 1, 0.333333)
    assert (out[3].n_shingles, out[3].n_novel, out[3].novelty) == (0, 0, None)


def test_split_leakage_check_fractions(spark, tmp_path):
    """Every eval (val/test) doc gets a row; leak_frac is the fraction of
    its distinct shingles present in ANY train doc: 1.0 for text copied
    from train, 0.0 for disjoint vocabulary, 0.5 for half-overlap, NULL
    for shingle-less docs.  Split membership is replicated in pure Python
    from the same md5 polynomial the engines share."""
    import hashlib

    from readability_1_spark.queries import (
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        q_split_leakage_check,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        v = 0
        for c in h[:8]:
            v = v * 31 + ord(c)
        return v % SPLIT_BUCKETS

    train_ids = [i for i in range(3000) if bucket(i) < SPLIT_TRAIN_LT][:2]
    eval_ids = [i for i in range(3000) if bucket(i) >= SPLIT_TRAIN_LT][:4]
    assert len(train_ids) == 2 and len(eval_ids) == 4
    shared = "alpha beta gamma delta"
    e1, e2, e3, e4 = eval_ids
    rows = [(t, shared, "s", len(shared)) for t in train_ids]
    rows += [
        (e1, shared, "s", len(shared)),              # fully leaked
        (e2, "uniq1 uniq2 uniq3 uniq4", "s", 23),    # disjoint vocab
        (e3, "alpha beta gamma uniqx", "s", 22),     # half leaked
        (e4, "a b", "s", 3),                         # no shingles
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           q_split_leakage_check(spark, str(tmp_path)).collect()}
    assert set(out) == set(eval_ids)      # every eval doc audited
    assert all(out[t] is not None for t in eval_ids)
    assert (out[e1].n_shingles, out[e1].n_leaked, out[e1].leak_frac) == (2, 2, 1.0)
    assert (out[e2].n_shingles, out[e2].n_leaked, out[e2].leak_frac) == (2, 0, 0.0)
    assert (out[e3].n_shingles, out[e3].n_leaked, out[e3].leak_frac) == (2, 1, 0.5)
    assert (out[e4].n_shingles, out[e4].n_leaked, out[e4].leak_frac) == (0, 0, None)


def test_ann_pq_copy_has_same_codes_and_tops_adc(spark, tmp_path):
    """PQ invariants on a crafted 64-dim corpus: an exact copy of vector 0
    (vec 8) gets identical per-subspace codes and identical round-6
    quantization error, and for query 0 the copy is the rank-1 ADC
    neighbor with adc_d2 exactly equal to vector 0's own qerr (the
    query's distance to its own codewords — the defining ADC identity)."""
    from readability_1_spark.queries import (
        PQ_M,
        q_ann_pq_adc_topk,
        q_ann_pq_codes,
    )

    rows = []
    for i in range(8):
        rows.append((i, [float(i + 1) if j % 8 == i else 0.0
                         for j in range(64)], 0))
    rows.append((8, [1.0 if j % 8 == 0 else 0.0 for j in range(64)], 0))
    rows.append((9, [1.0] * 64, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))

    codes = {r.vec_id: r for r in q_ann_pq_codes(spark, str(tmp_path)).collect()}
    assert len(codes) == 10
    for s in range(PQ_M):
        assert codes[8][f"code_{s}"] == codes[0][f"code_{s}"]
    assert codes[8].qerr == codes[0].qerr
    assert all(r.qerr >= 0 for r in codes.values())

    per_q = {}
    for r in q_ann_pq_adc_topk(spark, str(tmp_path)).collect():
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(5))
    assert all(len(v) == 9 for v in per_q.values())  # 10 vecs minus self
    q0 = sorted(per_q[0], key=lambda r: r.rank)
    assert q0[0].vec_id == 8
    assert q0[0].adc_d2 == codes[0].qerr


def test_ann_ivf_pq_probes_prune_candidates(spark, tmp_path):
    """IVF-PQ on the crafted PQ corpus: query 0's two probed coarse lists
    are centroid 0 (exact match) and centroid 1 (next nearest by the
    hand-computed L2), so its candidates are exactly {8, 9} (list 0 minus
    self) ∪ {1} (list 1) — vectors in unprobed lists can never appear —
    and the exact copy (vec 8) ranks 1 by ADC."""
    from readability_1_spark.queries import IVFPQ_TOPK, q_ann_ivf_pq_topk

    rows = []
    for i in range(8):
        rows.append((i, [float(i + 1) if j % 8 == i else 0.0
                         for j in range(64)], 0))
    rows.append((8, [1.0 if j % 8 == 0 else 0.0 for j in range(64)], 0))
    rows.append((9, [1.0] * 64, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))

    per_q = {}
    for r in q_ann_ivf_pq_topk(spark, str(tmp_path)).collect():
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(5))
    assert all(len(v) <= IVFPQ_TOPK for v in per_q.values())
    q0 = sorted(per_q[0], key=lambda r: r.rank)
    # v9 (all-ones) lands in list 0 (d² = 8i²+56 minimized at i=0); list 1
    # holds only its founder; every other list is unprobed for query 0.
    assert {r.vec_id for r in q0} == {8, 9, 1}
    assert q0[0].vec_id == 8


def test_unimax_caps_tail_and_waterfills_head(spark, tmp_path):
    """UniMax waterfill on a crafted 3-language corpus (fr=10, de=20,
    en=300 tokens; budget = 3/2 x 330 = 495): both tail languages hit the
    2-epoch cap exactly (alloc 20 / 40), the head takes the entire
    remainder (435 -> epochs 1.45), and the full budget is spent."""
    from readability_1_spark.queries import q_unimax_allocation

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows = [(i, words(100, "e"), "en", "s", 1) for i in range(3)]
    rows += [(10, words(10, "f"), "fr", "s", 1), (11, words(20, "d"), "de", "s", 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in q_unimax_allocation(spark, str(tmp_path)).collect()}
    assert set(out) == {"en", "fr", "de"}
    assert (out["fr"].n_tokens, out["fr"].alloc_tokens, out["fr"].epochs) == (10, 20, 2.0)
    assert (out["de"].n_tokens, out["de"].alloc_tokens, out["de"].epochs) == (20, 40, 2.0)
    assert (out["en"].n_tokens, out["en"].alloc_tokens, out["en"].epochs) == (300, 435, 1.45)
    assert sum(r.alloc_tokens for r in out.values()) == 495  # budget spent


def test_random_projection_matches_numpy_and_preserves_distances(spark):
    """The projection equals an independent numpy replica (same md5-parity
    sign matrix, same round-6) exactly, and JL holds on the real sf0.001
    embeddings: the median pairwise squared-distance ratio (projected vs
    original) stays near 1 with ~1/sqrt(16) spread."""
    import hashlib

    import numpy as np

    from readability_1_spark.queries import (
        EMB_DIM,
        RP_OUT_DIMS,
        q_embedding_random_projection,
    )

    sf = "/root/testdata/sf0.001"
    out = q_embedding_random_projection(spark, sf).collect()
    proj = {}
    for r in out:
        proj.setdefault(r.vec_id, {})[r.dim] = r.val
    P = np.array([[proj[v][d] for d in range(RP_OUT_DIMS)]
                  for v in sorted(proj)])

    import duckdb
    X = np.array(duckdb.connect().execute(
        f"SELECT embedding FROM read_parquet('{sf}/embeddings.parquet') "
        "ORDER BY vec_id").df()["embedding"].tolist(), dtype=np.float64)
    W = np.empty((RP_OUT_DIMS, EMB_DIM))
    for j in range(RP_OUT_DIMS):
        for i in range(EMB_DIM):
            h = hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0]
            W[j, i] = 1.0 if h in "89abcdef" else -1.0
    expected = np.round(X @ W.T / np.sqrt(RP_OUT_DIMS), 6)
    assert np.array_equal(P, expected)

    rng = np.random.default_rng(3)
    idx = rng.choice(len(X), size=(200, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_orig = ((X[idx[:, 0]] - X[idx[:, 1]]) ** 2).sum(1)
    d_proj = ((P[idx[:, 0]] - P[idx[:, 1]]) ** 2).sum(1)
    ratio = d_proj / d_orig
    assert 0.8 < np.median(ratio) < 1.2
    assert (np.abs(ratio - 1) < 0.9).mean() > 0.95


def test_ccnet_keep_policy_head_middle_tail(spark):
    """Policy semantics over the real sf0.001 buckets: head always kept,
    tail never, middle kept iff the SALTED ('ccnet:' prefix) md5 bucket —
    replicated here in pure Python — is below the keep percentage; the
    salt makes middle-keep independent of the train/val/test split hash."""
    import hashlib

    from readability_1_spark.queries import (
        CCNET_MIDDLE_KEEP_PCT,
        q_ccnet_keep_policy,
    )

    def salted_bucket(doc_id):
        h = hashlib.md5(f"ccnet:{doc_id}".encode()).hexdigest()
        v = 0
        for c in h[:8]:
            v = v * 31 + ord(c)
        return v % 100

    rows = q_ccnet_keep_policy(spark, "/root/testdata/sf0.001").collect()
    assert {r.ppl_bucket for r in rows} == {"head", "middle", "tail"}
    for r in rows:
        if r.ppl_bucket == "head":
            assert r.is_kept
        elif r.ppl_bucket == "tail":
            assert not r.is_kept
        else:
            assert r.is_kept == (salted_bucket(r.doc_id) < CCNET_MIDDLE_KEEP_PCT)
    mids = [r for r in rows if r.ppl_bucket == "middle"]
    kept = sum(r.is_kept for r in mids)
    assert 0 < kept < len(mids)  # the sample actually splits the middle


def test_c4_stat_columns_line_and_page_rules(spark):
    """Each published C4 rule exercised on crafted multi-line text: lines
    survive only with terminal punctuation AND >= 5 words AND no
    'javascript'; the page verdict needs >= 3 sentences in the KEPT text
    and no lorem-ipsum / brace / bad-word-token signals."""
    from readability_1_spark.queries import c4_passes_cond, c4_stat_columns

    good = "This line has plenty of words and ends properly."
    docs = spark.createDataFrame(
        [
            # 3 good sentences -> passes
            (1, "\n".join([good, "  Another fine sentence is here! ",
                           "Does this one also qualify as kept?"])),
            # line rules: too short / no terminal punct / javascript
            (2, "\n".join([good, "Too short.",
                           "this line has no terminal punctuation at all",
                           "Please enable javascript to view this page."])),
            # page rules: enough sentences but lorem ipsum
            (3, "\n".join([good, good.replace("plenty", "lots"),
                           "Lorem Ipsum dolor sit amet filler text here."])),
            # page rules: brace
            (4, "\n".join([good, "Another fine sentence is here!",
                           "A config value { appears } in this sentence."])),
            # page rules: bad-word token
            (5, "\n".join([good, "Another fine sentence is here!",
                           "This casino advertisement sentence still parses."])),
            # only 2 kept sentences -> fails the >=3 gate
            (6, "\n".join([good, "Another fine sentence is here!"])),
        ],
        "doc_id long, text_content string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", *c4_stat_columns("text_content")
        ).withColumn("passes_c4", c4_passes_cond()).collect()
    }
    assert (out[1].n_lines, out[1].n_kept_lines, out[1].n_sentences) == (3, 3, 3)
    assert out[1].passes_c4
    # doc 2: only the good line survives its three broken siblings
    assert (out[2].n_lines, out[2].n_kept_lines) == (4, 1)
    assert not out[2].passes_c4
    assert out[3].n_kept_lines == 3 and out[3].has_lorem_ipsum and not out[3].passes_c4
    assert out[4].has_brace and not out[4].passes_c4
    assert out[5].bad_word_hits == 1 and not out[5].passes_c4
    assert (out[6].n_sentences, out[6].passes_c4) == (2, False)
    # kept_chars counts only surviving lines (trimmed)
    assert out[2].kept_chars == len(good)


def test_tfidf_top_terms_hand_computed(spark, tmp_path):
    """tf-idf on a 3-doc corpus, checked against the by-hand values:
    corpus-wide terms get idf 0 (never top-ranked over distinctive ones),
    and ranking breaks score ties on term ASC."""
    import math

    from readability_1_spark.queries import q_tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common", "s", 25),
            (2, "banana cherry common", "s", 20),
            (3, "common common common", "s", 20),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_tfidf_top_terms(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    idf = lambda df: round(math.log(3 / df), 6)
    # doc 1: apple tf=2/4, df=1 -> top term
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert d1[0].term == "apple"
    assert d1[0].tfidf == round(2 / 4 * idf(1), 6)
    assert d1[1].term == "banana"
    assert d1[1].tfidf == round(1 / 4 * idf(2), 6)
    # 'common' appears in all docs -> idf 0 -> tfidf 0, ranked last
    assert d1[2].term == "common" and d1[2].tfidf == 0.0
    # doc 3 has only one term; tie-free single row
    assert [r.term for r in by_doc[3]] == ["common"]
    assert by_doc[3][0].tfidf == 0.0


def test_token_zipf_fit_exact_replica(spark, tmp_path):
    """The slope/intercept equal a pure-Python replica of the integer
    micro-unit least-squares recipe on a crafted frequency spectrum."""
    import math

    from readability_1_spark.queries import q_token_zipf_fit

    # frequencies: a 8x, b 4x, c 2x, d 1x -> clean geometric spectrum
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame(
        [(1, text, "s", len(text))],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    row = q_token_zipf_fit(spark, str(tmp_path)).collect()[0]
    freqs = [8, 4, 2, 1]  # rank order (freq DESC, tok ASC)
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(f) * 1e6))
        for i, f in enumerate(freqs)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    intercept = round((sy / 1e6 - slope * sx / 1e6) / n, 6)
    assert (row.n_types, row.n_tokens) == (4, 15)
    assert row.zipf_slope == slope
    assert row.zipf_intercept == intercept
    # geometric halving over ranks 1..4 is steeper than true Zipf (-1)
    assert row.zipf_slope < -1.0


def test_doc_unigram_entropy_edge_cases(spark, tmp_path):
    """Uniform 4-type doc hits ln(4) with norm 1.0; single-type doc has
    entropy 0 and NULL normalization; zero-token docs keep a NULL row."""
    import math

    from readability_1_spark.queries import q_doc_unigram_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s", 7),
            (2, "x x x x", "s", 7),
            (3, "!!! ???", "s", 7),  # tokenizer drops everything
            (4, "a a b", "s", 5),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           q_doc_unigram_entropy(spark, str(tmp_path)).collect()}
    assert out[1].entropy_nats == round(round(math.log(4) * 1e6 / 4) * 4 / 1e6, 6)
    assert out[1].norm_entropy == pytest.approx(1.0, abs=1e-5)
    assert (out[2].n_tokens, out[2].n_types, out[2].entropy_nats,
            out[2].norm_entropy) == (4, 1, 0.0, None)
    assert (out[3].n_tokens, out[3].n_types, out[3].entropy_nats) == (0, 0, None)
    # 2/3-1/3 doc: exact integer-micro replica
    t1 = round(-(2 / 3) * math.log(2 / 3) * 1e6)
    t2 = round(-(1 / 3) * math.log(1 / 3) * 1e6)
    assert out[4].entropy_nats == round((t1 + t2) / 1e6, 6)


def test_kmeans_silhouette_tight_clusters(spark, tmp_path):
    """Eight well-separated two-point clusters: every vector's silhouette
    is near 1, b_dist >= a_dist by ranking, companions share their
    center's cluster, and s always equals round((b-a)/max(a,b), 6)."""
    from readability_1_spark.queries import q_kmeans_silhouette

    rows = []
    for i in range(8):
        center = [0.0] * 4
        center[i % 4] = 30.0 * (1 + i // 4)
        rows.append((i, [float(x) for x in center], 0))
        comp = list(center)
        comp[(i + 1) % 4] += 0.5
        rows.append((8 + i, [float(x) for x in comp], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r for r in
           q_kmeans_silhouette(spark, str(tmp_path)).collect()}
    assert len(out) == 16
    for r in out.values():
        assert r.b_dist >= r.a_dist
        mx = max(r.a_dist, r.b_dist)
        expect = round((r.b_dist - r.a_dist) / mx, 6) if mx > 0 else 0.0
        assert r.silhouette == expect
        assert r.silhouette > 0.9
    for i in range(8):  # companion lands in its center's cluster
        assert out[i].centroid_id == out[8 + i].centroid_id


def test_lm_perplexity_heldout_exact_replica(spark, tmp_path):
    """Train on the train split only; a val-split copy of the train text
    scores the train distribution (OOV 0), a test-split doc with disjoint
    vocabulary is all-OOV and strictly higher perplexity; every emitted
    number matches a pure-Python replica of the Laplace bigram model."""
    import hashlib
    import math

    from readability_1_spark.queries import (
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        q_lm_perplexity_heldout,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        v = 0
        for c in h[:8]:
            v = v * 31 + ord(c)
        return v % SPLIT_BUCKETS

    train_ids = [i for i in range(5000) if bucket(i) < SPLIT_TRAIN_LT][:3]
    val_ids = [i for i in range(5000)
               if SPLIT_TRAIN_LT <= bucket(i) < SPLIT_VAL_LT][:1]
    test_ids = [i for i in range(5000) if bucket(i) >= SPLIT_VAL_LT][:1]
    assert len(train_ids) == 3 and len(val_ids) == 1 and len(test_ids) == 1
    t = "a b c a b"  # bigrams: ab x2, bc, ca
    rows = [(d, t, "s", len(t)) for d in train_ids + val_ids]
    rows.append((test_ids[0], "x y x y", "s", 7))  # fully unseen
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.split: r for r in
           q_lm_perplexity_heldout(spark, str(tmp_path)).collect()}

    # python replica: c2 over 3 train docs, V = 3
    c2 = {"a b": 6, "b c": 3, "c a": 3}
    c1 = {"a": 6, "b": 3, "c": 3}
    V = 3

    def logp(bg):
        w1 = bg.split(" ")[0]
        return math.log((c2.get(bg, 0) + 1) / (c1.get(w1, 0) + V))

    avg_t = round((2 * logp("a b") + logp("b c") + logp("c a")) / 4, 6)
    assert out["train"].n_scored_docs == 3
    assert out["train"].avg_logprob == out["val"].avg_logprob == avg_t
    assert out["train"].oov_bigram_frac == out["val"].oov_bigram_frac == 0.0
    assert out["val"].perplexity == round(math.exp(-avg_t), 6)
    avg_x = round((2 * logp("x y") + logp("y x")) / 3, 6)
    assert out["test"].avg_logprob == avg_x
    assert out["test"].oov_bigram_frac == 1.0
    assert out["test"].perplexity == round(math.exp(-avg_x), 6)
    assert out["test"].perplexity > out["val"].perplexity


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition battery on crafted docs: repeated-line fractions,
    the top-2-gram character fraction (count ties break on gram ASC), the
    duplicated-5-gram character fraction, and the pass verdict."""
    from readability_1_spark.queries import repetition_stats_frame

    line = "alpha beta gamma"
    docs = spark.createDataFrame(
        [
            # 3 identical lines: 2 of 3 occurrences are repeats
            (1, "\n".join([line, line, line])),
            # "x y" occurs 3x (chars 3*3=9 of 11 total)
            (2, "x y x y x y"),
            # unique text, no repeats anywhere -> passes (long enough that
            # the inevitable count-1 top bigram stays under the threshold)
            (3, "aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll mmm nnn"),
            # 5-gram "a b c d e" occurs twice (2*9=18 chars of 21)
            (4, "a b c d e a b c d e f"),
        ],
        "doc_id long, text_content string",
    )
    out = {r.doc_id: r for r in
           repetition_stats_frame(docs, keys=("doc_id",)).collect()}
    assert out[1].n_lines == 3
    assert out[1].dup_line_frac == round(2 / 3, 6)
    assert out[1].dup_line_char_frac == round(2 / 3, 6)
    assert not out[1].passes_repetition  # 0.667 > 0.30 line threshold
    assert out[2].top_2gram_char_frac == round(9 / 11, 6)
    assert not out[2].passes_repetition
    assert out[3].dup_line_frac == 0.0
    # all bigrams tie at count 1 -> gram-ASC tiebreak picks "aaa bbb" (7ch)
    assert out[3].top_2gram_char_frac == round(7 / 55, 6)
    assert out[3].dup_5gram_char_frac == 0.0
    assert out[3].passes_repetition
    assert out[4].dup_5gram_char_frac == round(18 / 21, 6)
    assert not out[4].passes_repetition


def test_ann_ivfpq_rerank_is_exact_order_of_candidates(spark):
    """The re-rank stage keeps a subset of the IVF-PQ shortlist and orders
    it by exact round-6 distance (vec_id tiebreak), never resurrecting a
    non-candidate."""
    from readability_1_spark.queries import (
        IVFPQ_RERANK_K,
        q_ann_ivf_pq_topk,
        q_ann_ivfpq_rerank_topk,
    )

    sf = "/root/testdata/sf0.001"
    shortlist = {}
    for r in q_ann_ivf_pq_topk(spark, sf).collect():
        shortlist.setdefault(r.query_id, set()).add(r.vec_id)
    rer = {}
    for r in q_ann_ivfpq_rerank_topk(spark, sf).collect():
        rer.setdefault(r.query_id, []).append(r)
    assert set(rer) == set(shortlist)
    for qid, rows in rer.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == min(IVFPQ_RERANK_K, len(shortlist[qid]))
        assert all(r.vec_id in shortlist[qid] for r in rows)
        keys = [(r.exact_dist, r.vec_id) for r in rows]
        assert keys == sorted(keys)


def test_transcript_conversation_stats_shape(spark):
    from readability_1_spark.queries import q_transcript_conversation_stats

    rows = q_transcript_conversation_stats(spark, "unused").collect()
    assert len(rows) == 105
    for r in rows:
        assert r.n_turns == 3
        assert r.n_roles == 3          # user / assistant / tool
        assert r.n_tool_turns == 1
        assert 0 <= r.n_html_turns <= r.n_turns
        assert r.duration_sec >= 0
        assert r.total_chars > 0
    assert sum(r.n_html_turns for r in rows) > 0


def test_repetition_stats_random_replica(spark):
    """repetition_stats_frame equals a from-scratch pure-Python replica on
    30 seeded random multi-line docs (repeated lines and n-grams arise
    naturally from the tiny vocabulary)."""
    import random
    import re as _re
    from collections import Counter

    from readability_1_spark.queries import (
        REP_DUP_5GRAM_CHAR_FRAC_MAX,
        REP_DUP_LINE_CHAR_FRAC_MAX,
        REP_DUP_LINE_FRAC_MAX,
        REP_TOP_2GRAM_CHAR_FRAC_MAX,
        repetition_stats_frame,
    )

    rng = random.Random(260818)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(30):
        lines = []
        for _ in range(rng.randint(1, 6)):
            lines.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randint(0, 9))))
        docs.append((i, "\n".join(lines)))

    def replica(text):
        lines = [_re.sub(r"^[ \t\r\f]+|[ \t\r\f]+$", "", x)
                 for x in text.split("\n")]
        lines = [x for x in lines if x != ""]
        ws = [w for w in _re.split(r"[^a-z0-9]+", text.lower()) if w != ""]
        total = len(text)
        lk = Counter(lines)
        n_lines = len(lines)
        dup_line = round((n_lines - len(lk)) / n_lines, 6) if n_lines else 0.0
        lchars = sum(k * len(l) for l, k in lk.items())
        dup_lchar = (round(sum((k - 1) * len(l) for l, k in lk.items())
                           / lchars, 6) if lchars else 0.0)
        g2 = Counter(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
        top2 = 0
        if g2:
            g, k = sorted(g2.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            top2 = k * len(g)
        g5 = Counter(" ".join(ws[i:i + 5]) for i in range(len(ws) - 4))
        dup5 = sum(k * len(g) for g, k in g5.items() if k > 1)
        t2f = round(top2 / total, 6) if total else 0.0
        d5f = round(dup5 / total, 6) if total else 0.0
        ok = (dup_line <= REP_DUP_LINE_FRAC_MAX
              and dup_lchar <= REP_DUP_LINE_CHAR_FRAC_MAX
              and t2f <= REP_TOP_2GRAM_CHAR_FRAC_MAX
              and d5f <= REP_DUP_5GRAM_CHAR_FRAC_MAX)
        return (n_lines, dup_line, dup_lchar, t2f, d5f, ok)

    frame = spark.createDataFrame(docs, "doc_id long, text_content string")
    got = {r.doc_id: r for r in
           repetition_stats_frame(frame, keys=("doc_id",)).collect()}
    assert len(got) == 30
    mismatches = []
    for i, text in docs:
        r = got[i]
        exp = replica(text)
        val = (r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
               r.top_2gram_char_frac, r.dup_5gram_char_frac,
               r.passes_repetition)
        if val != exp:
            mismatches.append((i, val, exp))
    assert not mismatches, mismatches[:3]


def test_dedup_cluster_stats_consistent_with_clusters(spark):
    """The histogram reconciles exactly with the cluster table: docs sum
    to the corpus, removal count equals non-keepers, size-1 row covers
    all singletons."""
    from readability_1_spark.queries import (
        q_dedup_cluster_stats,
        q_dedup_minhash_clusters,
    )

    sf = "/root/testdata/sf0.001"
    cl = q_dedup_minhash_clusters(spark, sf).collect()
    hist = {r.cluster_size: r for r in
            q_dedup_cluster_stats(spark, sf).collect()}
    n_docs = len(cl)
    assert sum(r.n_docs for r in hist.values()) == n_docs
    assert sum(r.docs_removed for r in hist.values()) == sum(
        0 if r.is_keeper else 1 for r in cl
    )
    from collections import Counter

    sizes = Counter(r.cluster_size for r in cl)  # doc-weighted sizes
    for size, row in hist.items():
        assert sizes[size] == row.n_docs
        assert row.docs_removed == (size - 1) * row.n_clusters


def test_corpus_datacard_replicates_from_raw(spark, tmp_path):
    """Datacard values replicate from a crafted corpus: counts, token
    totals, distinct tokens, dominant language with ties broken lang ASC,
    and the interpolated median."""
    from readability_1_spark.queries import q_corpus_datacard

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "a a d", "de", "s1", 5),
            (3, "e f", "en", "s1", 21),
            (4, "x", "fr", "s2", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in
           q_corpus_datacard(spark, str(tmp_path)).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.total_tokens, s1.distinct_tokens) == (3, 8, 6)
    assert s1.p50_chars == 5.0  # interpolated median of (5, 5, 21)
    # en (2 docs) beats de/fr (1); 2/3 share
    assert (s1.top_lang, s1.top_lang_frac) == ("en", round(2 / 3, 6))
    s2 = out["s2"]
    assert (s2.n_docs, s2.total_tokens, s2.distinct_tokens) == (1, 1, 1)
    assert (s2.top_lang, s2.top_lang_frac) == ("fr", 1.0)
