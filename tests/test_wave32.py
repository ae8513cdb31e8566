"""Wave 32: LSH banding-parameter planner + exact duplicated-passage
mining.

Independent evidence beyond the DuckDB oracles: the integer micro-unit
S-curve replayed in pure Python (grid AND corpus halves, signatures
recomputed from raw text with hashlib), analytic spot checks of the
curve, and a full Counter replay of the duplicated-5-gram top-K.
"""

import hashlib
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    DUP_NGRAM_N,
    DUP_NGRAM_TOPK,
    LSH_GRID_STEP_MICRO,
    LSH_PLAN_CONFIGS,
    MICRO,
    N_MINHASH,
    q_dup_ngram_topk,
    q_minhash_lsh_param_plan,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"

_SPLIT = re.compile(r"[^a-z0-9]+")


def _words(text):
    return [w for w in _SPLIT.split(text.lower()) if w]


def _pow_micro(x, k):
    acc = MICRO
    for _ in range(k):
        acc = (acc * x) // MICRO
    return acc


def _collision_micro(j, b, r):
    return MICRO - _pow_micro(MICRO - _pow_micro(j, r), b)


def _corpus_est_micros():
    """Recompute the candidate pairs' estimated-Jaccard micro values from
    raw text with hashlib — independent of the Spark path end to end."""
    rows = pq.read_table(DOCS, columns=["doc_id", "text"]).to_pylist()
    sigs = {}
    for row in rows:
        ws = _words(row["text"])
        sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if not sh:
            sigs[row["doc_id"]] = None
            continue
        sigs[row["doc_id"]] = [
            min(
                hashlib.md5(f"{seed}:{s}".encode()).hexdigest() for s in sh
            )
            for seed in range(N_MINHASH)
        ]
    per_band = N_MINHASH // 4
    buckets = defaultdict(list)
    for doc_id, mh in sigs.items():
        if mh is None:
            continue
        for band in range(4):
            sig = hashlib.md5(
                ",".join(mh[band * per_band : (band + 1) * per_band]).encode()
            ).hexdigest()
            buckets[(band, sig)].append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    est = []
    for a, b in pairs:
        n_eq = sum(1 for s in range(N_MINHASH) if sigs[a][s] == sigs[b][s])
        est.append(n_eq * (MICRO // N_MINHASH))
    return est


def test_param_plan_matches_pure_python_replay(spark):
    out = {
        (r.n_bands, r.rows_per_band): r
        for r in q_minhash_lsh_param_plan(spark, SF).collect()
    }
    assert set(out) == set(LSH_PLAN_CONFIGS)
    est = _corpus_est_micros()
    assert est, "smoke corpus must produce candidate pairs"
    half = MICRO // 2
    for b, r in LSH_PLAN_CONFIGS:
        row = out[(b, r)]
        colls = {
            g * LSH_GRID_STEP_MICRO: _collision_micro(
                g * LSH_GRID_STEP_MICRO, b, r
            )
            for g in range(1, 100)
        }
        assert row.s_mid_micro == min(j for j, c in colls.items() if c >= half)
        assert row.p_at_j50_micro == colls[half]
        true = [e for e in est if e >= half]
        near = [e for e in est if e < half]
        assert row.n_true_pairs == len(true)
        assert row.n_near_pairs == len(near)
        exp_recall = (
            sum(_collision_micro(e, b, r) for e in true) // len(true)
            if true
            else 0
        )
        exp_near = (
            sum(_collision_micro(e, b, r) for e in near) // len(near)
            if near
            else 0
        )
        assert row.exp_recall_micro == exp_recall
        assert row.exp_nearmiss_micro == exp_near


def test_param_plan_analytic_spot_values(spark):
    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in q_minhash_lsh_param_plan(spark, SF).collect()
    }
    # (16,1): 1-(1-j)^16 — already over 1/2 at tiny j; integer replay of
    # j=0.05: 1 - 0.95^16.
    acc = MICRO
    for _ in range(16):
        acc = (acc * 950_000) // MICRO
    assert rows[(16, 1)].s_mid_micro <= 50_000
    # (1,16): j^16 needs a near-1 Jaccard to reach 1/2.
    assert rows[(1, 16)].s_mid_micro >= 900_000
    # More bands => collision prob at any fixed j is monotone
    # non-decreasing, so the midpoint moves left.
    mids = [rows[cfg].s_mid_micro for cfg in LSH_PLAN_CONFIGS]
    assert mids == sorted(mids, reverse=True) or mids == sorted(mids)
    # production config (4,4) present with sane midpoint ordering
    assert (
        rows[(16, 1)].s_mid_micro
        < rows[(4, 4)].s_mid_micro
        < rows[(1, 16)].s_mid_micro
    )


def test_dup_ngram_topk_matches_counter_replay(spark):
    rows = pq.read_table(DOCS, columns=["doc_id", "text"]).to_pylist()
    n_occ = Counter()
    docs_of = defaultdict(set)
    for row in rows:
        ws = _words(row["text"])
        for i in range(len(ws) - (DUP_NGRAM_N - 1)):
            g = " ".join(ws[i : i + DUP_NGRAM_N])
            n_occ[g] += 1
            docs_of[g].add(row["doc_id"])
    dup = [
        (g, c, len(docs_of[g])) for g, c in n_occ.items() if len(docs_of[g]) >= 2
    ]
    dup.sort(key=lambda t: (-t[1], -t[2], t[0]))
    expect = dup[:DUP_NGRAM_TOPK]
    got = [
        (r.ngram, r.n_occ, r.n_docs)
        for r in q_dup_ngram_topk(spark, SF).collect()
    ]
    got.sort(key=lambda t: (-t[1], -t[2], t[0]))
    assert got == expect
    assert len(got) == DUP_NGRAM_TOPK
    for g, _occ, nd in got:
        assert len(g.split(" ")) == DUP_NGRAM_N
        assert nd >= 2
