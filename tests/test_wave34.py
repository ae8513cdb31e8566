"""Wave 34: incremental LSH index probe + quality-battery agreement
matrix + partition-skew audit.

Independent evidence beyond the DuckDB oracles: a hashlib replica of the
full index-probe path (shingles -> 16 minhashes -> bands -> split ->
candidates -> signature-estimated Jaccard), a reconciliation of the
agreement matrix against the three source batteries' own outputs, and a
pure-Python replay of the skew-audit bucket polynomial + integer shares.
"""

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    INDEX_SPLIT_MOD,
    MICRO,
    N_BANDS,
    N_MINHASH,
    SKEW_BUCKETS,
    TRANSCRIPTS_PQ,
    q_dedup_index_lookup,
    q_doc_quality_classifier,
    q_doc_quality_rank,
    q_filter_agreement_matrix,
    q_gopher_quality_filters,
    q_partition_skew_audit,
)

SF = "/root/testdata/sf0.001"

_SPLIT = re.compile(r"[^a-z0-9]+")


def _replica_index_lookup():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    sigs, bands = {}, defaultdict(list)
    per_band = N_MINHASH // N_BANDS
    for r in docs:
        ws = [w for w in _SPLIT.split(r["text"].lower()) if w]
        sh = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        if not sh:
            continue
        mh = [
            min(hashlib.md5(f"{s}:{x}".encode()).hexdigest() for x in sh)
            for s in range(N_MINHASH)
        ]
        sigs[r["doc_id"]] = mh
        for b in range(N_BANDS):
            sig = hashlib.md5(
                ",".join(mh[b * per_band:(b + 1) * per_band]).encode()
            ).hexdigest()
            bands[(b, sig)].append(r["doc_id"])
    hits = defaultdict(int)
    for ids in bands.values():
        for q in ids:
            if q % INDEX_SPLIT_MOD != 0:
                continue
            for i in ids:
                if i % INDEX_SPLIT_MOD != 0:
                    hits[(q, i)] += 1
    want = {}
    for (q, i), n in hits.items():
        n_eq = sum(1 for s in range(N_MINHASH) if sigs[q][s] == sigs[i][s])
        est = n_eq * (MICRO // N_MINHASH)
        want[(q, i)] = (n, est, est >= MICRO // 2)
    return want


def test_index_lookup_matches_hashlib_replica(spark):
    got = {
        (r.query_doc, r.index_doc): (r.n_bands_hit, r.est_micro, r.is_dup)
        for r in q_dedup_index_lookup(spark, SF).collect()
    }
    want = _replica_index_lookup()
    assert got == want
    assert len(got) > 0
    # the probe NEVER pairs batch x batch or index x index
    assert all(
        q % INDEX_SPLIT_MOD == 0 and i % INDEX_SPLIT_MOD != 0
        for q, i in got
    )
    # the corpus's planted duplicates cross the split: some probe hits
    # are full-signature matches, and the verdict matches the bar
    assert any(v[1] == MICRO for v in got.values())
    assert all((v[1] >= MICRO // 2) == v[2] for v in got.values())


def test_agreement_matrix_reconciles_with_source_batteries(spark):
    g = {r.doc_id: (int(r.passes_gopher), r.n_words)
         for r in q_gopher_quality_filters(spark, SF).collect()}
    c = {r.doc_id: int(r.pred)
         for r in q_doc_quality_classifier(spark, SF).collect()}
    lm = {r.doc_id: int(r.low_quality)
          for r in q_doc_quality_rank(spark, SF).collect()}
    cells = defaultdict(lambda: [0, 0])
    for d, (gp, nw) in g.items():
        key = (gp, c[d], lm.get(d))
        cells[key][0] += 1
        cells[key][1] += nw
    got = {
        (r.gopher_pass, r.clf_pred, r.lm_low_quality): (r.n_docs, r.mean_words)
        for r in q_filter_agreement_matrix(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, (n, tot) in cells.items():
        gn, gm = got[key]
        assert gn == n
        assert abs(gm - round(tot / n, 6)) < 1e-9
    # the cells partition the scored corpus exactly
    assert sum(v[0] for v in got.values()) == len(g)


def test_partition_skew_audit_replays_polynomial(spark):
    rows = pq.read_table(TRANSCRIPTS_PQ, columns=["conv_id"]).to_pylist()
    per_conv = defaultdict(int)
    for r in rows:
        per_conv[r["conv_id"]] += 1

    def bucket(key: str) -> int:
        h = hashlib.md5(key.encode()).hexdigest()[:8]
        acc = 0
        for ch in h:
            acc = acc * 31 + ord(ch)
        return acc % SKEW_BUCKETS

    agg = defaultdict(lambda: [0, 0, 0])
    for conv, n in per_conv.items():
        a = agg[bucket(conv)]
        a[0] += n
        a[1] += 1
        a[2] = max(a[2], n)
    total = sum(a[0] for a in agg.values())
    got = {r.bucket: r for r in q_partition_skew_audit(spark, SF).collect()}
    assert set(got) == set(range(SKEW_BUCKETS))  # empty buckets kept
    for b in range(SKEW_BUCKETS):
        a = agg.get(b, [0, 0, 0])
        r = got[b]
        assert (r.n_turns, r.n_convs, r.max_conv_turns) == tuple(a)
        assert r.turns_share_micro == a[0] * MICRO // total
        assert r.skew_ratio_micro == a[0] * SKEW_BUCKETS * MICRO // total
    assert sum(r.n_turns for r in got.values()) == len(rows)
    # shares sum to MICRO up to per-bucket floor loss
    s = sum(r.turns_share_micro for r in got.values())
    assert MICRO - SKEW_BUCKETS <= s <= MICRO
