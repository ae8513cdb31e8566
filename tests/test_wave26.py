"""Wave 26: tokenizer fertility, MinHash estimator-quality audit,
incremental snapshot delta.

Independent evidence beyond the DuckDB oracles: fertility reconciled
against the per-doc bpe_tokenize_stats rollup, exact Jaccard recomputed
in pure Python from the parquet text, a crafted duplicate-pair corpus
pinning est == exact == 1, and a pure-Python replay of the snapshot
digest diff.
"""

import hashlib
import re

import pyarrow as pa
import pyarrow.parquet as pq

from readability_1_spark.queries import (
    N_MINHASH,
    SNAP_REV_SUFFIX,
    q_bpe_tokenize_stats,
    q_corpus_snapshot_delta,
    q_dedup_minhash_lsh,
    q_minhash_estimate_error,
    q_tokenizer_fertility,
)

SF = "/root/testdata/sf0.001"

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pylist()


def _shingle_set(text):
    ws = [w for w in _TOKEN_RE.split(text.lower()) if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def test_fertility_reconciles_with_per_doc_stats(spark):
    src_of = {d["doc_id"]: d["source"] for d in _docs()}
    per_doc = q_bpe_tokenize_stats(spark, SF).collect()
    agg = {}
    for r in per_doc:
        s = src_of[r.doc_id]
        nd, nw, ns = agg.get(s, (0, 0, 0))
        agg[s] = (nd + 1, nw + r.n_words, ns + r.n_subwords)

    out = {r.source: r for r in q_tokenizer_fertility(spark, SF).collect()}
    assert set(out) == set(agg)
    for s, (nd, nw, ns) in agg.items():
        r = out[s]
        assert (r.n_docs, r.n_words, r.n_subwords) == (nd, nw, ns)
        assert abs(r.tokens_per_word - round(ns / nw, 6)) < 1e-9
        # BPE merges can only shorten: 1 <= fertility <= chars per word
        assert 1.0 <= r.tokens_per_word


# ---------------------------------------------------------------------------
# minhash_estimate_error
# ---------------------------------------------------------------------------

def test_estimate_error_exact_side_matches_python(spark):
    docs = {d["doc_id"]: d["text"] for d in _docs()}
    cand = {(r.doc_a, r.doc_b) for r in q_dedup_minhash_lsh(spark, SF).collect()}
    out = {(r.doc_a, r.doc_b): r for r in q_minhash_estimate_error(spark, SF).collect()}
    # one audited row per LSH candidate pair, none invented
    assert set(out) == cand
    for (a, b), r in out.items():
        sa, sb = _shingle_set(docs[a]), _shingle_set(docs[b])
        inter = len(sa & sb)
        exact = round(inter / (len(sa) + len(sb) - inter), 6)
        assert abs(r.exact_jaccard - exact) < 1e-9, (a, b)
        assert 0.0 <= r.est_jaccard <= 1.0
        # est is a multiple of 1/N_MINHASH
        assert abs(r.est_jaccard * N_MINHASH - round(r.est_jaccard * N_MINHASH)) < 1e-4
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 6)) < 1e-9


def test_estimate_error_exact_copy_pair(spark, tmp_path):
    text_dup = "alpha beta gamma delta epsilon zeta eta theta " * 6
    text_other = "one two three four five six seven eight nine ten " * 6
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text_dup, text_dup, text_other]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([len(text_dup), len(text_dup), len(text_other)], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = {(r.doc_a, r.doc_b): r for r in q_minhash_estimate_error(spark, str(tmp_path)).collect()}
    # identical docs collide in every band and audit to est == exact == 1
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0 and r.abs_err == 0.0
    # the disjoint doc never pairs with anything
    assert all(3 not in pair for pair in rows)


# ---------------------------------------------------------------------------
# corpus_snapshot_delta
# ---------------------------------------------------------------------------

def test_snapshot_delta_matches_python_replay(spark):
    docs = _docs()
    expect = {}
    for d in docs:
        i, txt = d["doc_id"], d["text"]
        da = hashlib.md5(txt.encode()).hexdigest() if i % 10 != 9 else None
        tb = txt + SNAP_REV_SUFFIX if i % 7 == 3 else txt
        db = hashlib.md5(tb.encode()).hexdigest() if i % 10 != 0 else None
        if da is None and db is None:
            continue
        if da is None:
            status = "added"
        elif db is None:
            status = "removed"
        elif da == db:
            status = "unchanged"
        else:
            status = "changed"
        expect[i] = (da, db, status)

    out = {r.doc_id: (r.digest_a, r.digest_b, r.status)
           for r in q_corpus_snapshot_delta(spark, SF).collect()}
    assert out == expect
    # the synthetic snapshots exercise every verdict on the real corpus
    statuses = {v[2] for v in out.values()}
    assert statuses == {"added", "removed", "changed", "unchanged"}
