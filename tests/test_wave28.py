"""Wave 28: pre-kernel HTML triage, transcript integrity gate, vocab
coverage planning.

Independent evidence beyond the DuckDB oracles: pure-Python re/Counter
replicas over the committed smoke transcripts and the real corpus, plus
crafted conversations that violate each integrity invariant (index gap,
duplicate index, non-monotone timestamps, unknown role, NULL text)
through the factored frame functions.
"""

import re
from collections import Counter
from datetime import datetime, timedelta

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    HTML_MIN_P,
    HTML_MIN_TEXT_RATIO,
    TRANSCRIPTS_PQ,
    VOCAB_SIZES,
    html_stats_frame,
    integrity_frame,
    q_token_coverage_vocab_size,
    q_transcript_integrity_check,
    q_turn_html_stats,
)

SF = "/root/testdata/sf0.001"

_GATE = re.compile(r"(?i)<html|<!doctype\s+html")
_TAG = re.compile(r"<[A-Za-z!/][^>]*>")
_SCRIPT = re.compile(r"(?i)<script")
_P = re.compile(r"(?i)<p[ >]")
_TOKEN_RE = re.compile(r"[^a-z0-9]+")

COLS = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
T0 = datetime(2026, 1, 1)


# ---------------------------------------------------------------------------
# turn_html_stats
# ---------------------------------------------------------------------------

def test_html_stats_matches_python_replica(spark):
    t = pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    gated = [r for r in t if r["text"] and _GATE.search(r["text"])]
    out = {(r.conv_id, r.turn_idx): r for r in q_turn_html_stats(spark, SF).collect()}
    assert set(out) == {(r["conv_id"], r["turn_idx"]) for r in gated}
    n_article = 0
    for r in gated:
        x = out[(r["conv_id"], r["turn_idx"])]
        txt = r["text"]
        assert x.n_chars == len(txt)
        assert x.n_tags == len(_TAG.findall(txt))
        assert x.n_script == len(_SCRIPT.findall(txt))
        assert x.n_p == len(_P.findall(txt))
        ratio = round(len(_TAG.sub("", txt)) / len(txt), 6)
        assert abs(x.text_ratio - ratio) < 1e-9
        expect = x.n_p >= HTML_MIN_P and x.text_ratio >= HTML_MIN_TEXT_RATIO
        assert x.likely_article == expect
        n_article += int(x.likely_article)
    # the verdict separates the corpus (both routing outcomes occur)
    assert 0 < n_article < len(gated)


# ---------------------------------------------------------------------------
# transcript_integrity_check
# ---------------------------------------------------------------------------

def test_integrity_real_corpus_is_clean(spark):
    out = q_transcript_integrity_check(spark, SF).collect()
    t = pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    n_null = Counter()
    for r in t:
        if r["text"] is None:
            n_null[r["conv_id"]] += 1
    assert len(out) == len({r["conv_id"] for r in t})
    for r in out:
        assert r.idx_contiguous and r.ts_monotone and r.roles_valid
        assert r.n_null_text == n_null.get(r.conv_id, 0)


def test_integrity_crafted_violations(spark):
    def ts(i):
        return T0 + timedelta(seconds=i)

    rows = [
        # clean conversation
        ("ok", 0, "user", "hi", None, ts(0)),
        ("ok", 1, "assistant", "hello", None, ts(1)),
        # index gap (0, 2)
        ("gap", 0, "user", "a", None, ts(0)),
        ("gap", 2, "assistant", "b", None, ts(1)),
        # duplicate index
        ("dup", 0, "user", "a", None, ts(0)),
        ("dup", 0, "assistant", "b", None, ts(1)),
        # non-monotone timestamps
        ("time", 0, "user", "a", None, ts(5)),
        ("time", 1, "assistant", "b", None, ts(2)),
        # unknown role + NULL text
        ("role", 0, "system", None, None, ts(0)),
        ("role", 1, "assistant", "b", None, ts(1)),
    ]
    out = {r.conv_id: r for r in integrity_frame(
        spark.createDataFrame(rows, COLS)).collect()}
    ok = out["ok"]
    assert ok.idx_contiguous and ok.ts_monotone and ok.roles_valid
    assert ok.n_null_text == 0
    assert not out["gap"].idx_contiguous
    assert not out["dup"].idx_contiguous
    assert out["dup"].n_turns == 2
    assert not out["time"].ts_monotone and out["time"].idx_contiguous
    assert not out["role"].roles_valid
    assert out["role"].n_null_text == 1


# ---------------------------------------------------------------------------
# token_coverage_vocab_size
# ---------------------------------------------------------------------------

def test_vocab_coverage_matches_counter_replica(spark):
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    counts = Counter()
    for d in docs:
        counts.update(w for w in _TOKEN_RE.split(d["text"].lower()) if w)
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))

    out = {r.vocab_k: r for r in q_token_coverage_vocab_size(spark, SF).collect()}
    assert set(out) == set(VOCAB_SIZES)
    prev_cov = 0.0
    for k in sorted(VOCAB_SIZES):
        top = ranked[:k]
        covered = sum(c for _, c in top)
        r = out[k]
        assert r.n_types == len(top)
        assert r.covered_occurrences == covered
        assert r.total_occurrences == total
        assert abs(r.coverage - round(covered / total, 6)) < 1e-9
        assert prev_cov <= r.coverage <= 1.0  # monotone in K
        prev_cov = r.coverage
