"""Wave 41: k-means cluster purity + block-diagonal attention spans over
packed sequences + output shard sizing.

Independent evidence beyond the DuckDB oracles: cross-operator
consistency against the already-attested ann_ivf_kmeans assignment and
pack_token_ids output, a pure-Python shard-plan replica, and invariant
batteries (spans tile every sequence; purity bounds; ceil-div
adherence)."""

from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    PACK_IDS_SEQ_LEN,
    SHARD_TARGET_CHARS,
    q_ann_ivf_kmeans,
    q_kmeans_cluster_purity,
    q_pack_token_ids,
    q_packing_attention_spans,
    q_shard_size_plan,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ purity

def test_kmeans_purity_consistent_with_attested_assignment(spark):
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in q_ann_ivf_kmeans(spark, SF).collect()
    }
    labels = {
        r["vec_id"]: r["label"]
        for r in pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
        ).to_pylist()
    }
    counts = defaultdict(lambda: defaultdict(int))
    for vid, cid in assign.items():
        counts[cid][labels[vid]] += 1
    want = {}
    for cid, by_label in counts.items():
        total = sum(by_label.values())
        maj_label = min(
            (lbl for lbl in by_label),
            key=lambda lbl: (-by_label[lbl], lbl),
        )
        want[cid] = (
            total, len(by_label), maj_label, by_label[maj_label],
            round(by_label[maj_label] / total, 6),
        )
    got = {
        r["centroid_id"]: (
            r["cluster_n"], r["n_labels"], r["majority_label"],
            r["majority_n"], r["purity"],
        )
        for r in q_kmeans_cluster_purity(spark, SF).collect()
    }
    assert got == want and want
    # partition property: cluster sizes sum to the corpus
    assert sum(v[0] for v in got.values()) == len(labels)
    for total, n_labels, _ml, maj, purity in got.values():
        assert 1 <= maj <= total and 1 <= n_labels
        assert 0.0 < purity <= 1.0


# ------------------------------------------------------------------- spans

def test_packing_spans_tile_and_terminate(spark):
    packs = {
        r["seq_id"]: [int(x) for x in r["token_ids"].split(" ")]
        for r in q_pack_token_ids(spark, SF).collect()
    }
    eos = max(max(ids) for ids in packs.values())
    spans = defaultdict(list)
    for r in q_packing_attention_spans(spark, SF).collect():
        spans[r["seq_id"]].append(
            (r["block_idx"], r["span_start"], r["span_end"],
             r["block_len"], r["eos_terminated"])
        )
    assert set(spans) == set(packs)
    for sid, blocks in spans.items():
        ids = packs[sid]
        blocks.sort()
        # blocks tile 1..len(ids) contiguously
        prev_end = 0
        for bi, (b, s, e, ln, term) in enumerate(blocks):
            assert b == bi
            assert s == prev_end + 1
            assert ln == e - s + 1
            prev_end = e
            # terminated iff the block's last token IS the EOS marker
            assert term == (ids[e - 1] == eos)
            # eos appears ONLY as a block terminator, never mid-block
            assert all(t != eos for t in ids[s - 1:e - 1])
        assert prev_end == len(ids)
        # every block except possibly the sequence tail is terminated
        assert all(t for _, _, _, _, t in blocks[:-1])
    # at least one unterminated tail must exist (docs straddle chunks)
    assert any(not blocks[-1][4] for blocks in spans.values())
    # block-mass conservation: Σ block_len == Σ sequence lengths
    assert (
        sum(ln for blocks in spans.values() for _, _, _, ln, _ in blocks)
        == sum(len(ids) for ids in packs.values())
    )
    # all full sequences have PACK_IDS_SEQ_LEN tokens
    full = [ids for ids in packs.values() if len(ids) == PACK_IDS_SEQ_LEN]
    assert len(full) >= len(packs) - 1


# ------------------------------------------------------------------ shards

def test_shard_plan_replica_and_adherence(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pylist()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(r["text"])
    want = {}
    for src, (n, chars) in agg.items():
        shards = max((chars + SHARD_TARGET_CHARS - 1) // SHARD_TARGET_CHARS, 1)
        want[src] = (
            n, chars, shards, (n + shards - 1) // shards,
            chars < SHARD_TARGET_CHARS / 2,
        )
    got = {
        r["source"]: (
            r["n_docs"], r["total_chars"], r["n_shards"],
            r["docs_per_shard"], r["merge_candidate"],
        )
        for r in q_shard_size_plan(spark, SF).collect()
    }
    assert got == want and want
    for n, chars, shards, dps, _merge in got.values():
        assert shards >= 1
        assert dps * shards >= n          # the plan covers every doc
        assert chars <= shards * SHARD_TARGET_CHARS  # ceil adherence
