"""Wave 22: URL blocklist filter + RAG chunk windows + SFT context windows.

Independent evidence beyond the DuckDB oracles: pure-Python replicas of
the chunking math (including crafted boundary documents through a temp
parquet corpus), the SFT budget-suffix selection over the committed
transcripts, and the per-URL blocklist verdict logic.
"""

import hashlib
import re

import pyarrow as pa
import pyarrow.parquet as pq

from readability_1_spark.queries import (
    BLOCKED_HOST_SUFFIXES,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    SFT_BUDGET,
    TOKEN_SPLIT,
    TRANSCRIPTS_PQ,
    URL_BADWORDS,
    q_doc_chunk_windows,
    q_sft_context_windows,
    q_url_blocklist_filter,
)

SF = "/root/testdata/sf0.001"


def _expected_chunks(text):
    toks = [t for t in re.split(TOKEN_SPLIT, text.lower()) if t]
    n = len(toks)
    if n <= 0:
        n_chunks = 0
    elif n <= CHUNK_SIZE:
        n_chunks = 1
    else:
        n_chunks = (n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
    rows = []
    for ci in range(n_chunks):
        start = ci * CHUNK_STRIDE  # 0-based
        chunk = toks[start : start + CHUNK_SIZE]
        rows.append(
            (
                n,
                n_chunks,
                ci,
                start + 1,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
        )
    if not rows:  # coverage row for zero-token docs
        rows.append((n, 0, None, None, None, None))
    return toks, rows


def test_doc_chunk_windows_matches_pure_python_replica(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(SF + "/documents.parquet").to_pylist()
    }
    expected = set()
    multi = single = 0
    for doc_id, text in docs.items():
        toks, rows = _expected_chunks(text)
        covered = set()
        for n, n_chunks, ci, start, clen, dig in rows:
            expected.add((doc_id, n, n_chunks, ci, start, clen, dig))
            if ci is not None:
                covered.update(range(start - 1, start - 1 + clen))
        # full-coverage property: every token index lands in some chunk
        assert covered == set(range(len(toks)))
        if rows[0][1] > 1:
            multi += 1
        elif rows[0][1] == 1:
            single += 1
    got = {
        (
            r["doc_id"], r["n_toks"], r["n_chunks"], r["chunk_idx"],
            r["start_tok"], r["chunk_len"], r["chunk_digest"],
        )
        for r in q_doc_chunk_windows(spark, SF).collect()
    }
    assert got == expected
    # the corpus exercises both the 1-chunk and the multi-chunk branch
    assert multi > 0 and single > 0


def test_doc_chunk_windows_boundary_docs(spark, tmp_path):
    texts = {
        "d-empty": " .,; ",                      # zero tokens
        "d-one": "alpha",                        # 1 token
        "d-size": " ".join(f"t{i}" for i in range(CHUNK_SIZE)),
        "d-size1": " ".join(f"t{i}" for i in range(CHUNK_SIZE + 1)),
        "d-long": " ".join(f"t{i}" for i in range(CHUNK_SIZE * 3 + 7)),
        # last chunk start beyond a full window: clamps short
        "d-clamp": " ".join(f"t{i}" for i in range(CHUNK_STRIDE + 3)),
    }
    pq.write_table(
        pa.table(
            {"doc_id": list(texts.keys()), "text": list(texts.values())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    expected = set()
    for doc_id, text in texts.items():
        for row in _expected_chunks(text)[1]:
            expected.add((doc_id,) + row)
    got = {
        (
            r["doc_id"], r["n_toks"], r["n_chunks"], r["chunk_idx"],
            r["start_tok"], r["chunk_len"], r["chunk_digest"],
        )
        for r in q_doc_chunk_windows(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # the zero-token doc keeps a NULL-chunk coverage row
    assert ("d-empty", 0, 0, None, None, None, None) in got
    # exact-size doc is ONE chunk; size+1 is two, the second clamped
    assert ("d-size", CHUNK_SIZE, 1) == next(
        t[:3] for t in got if t[0] == "d-size"
    )
    assert {t[2] for t in got if t[0] == "d-size1"} == {2}


def test_sft_context_windows_matches_pure_python_replica(spark):
    convs = {}
    for r in pq.read_table(TRANSCRIPTS_PQ).to_pylist():
        # Java/RE2 \s is ASCII-only (Python's is Unicode-aware — the
        # hukumusume fixture's U+3000 ideographic spaces are NOT token
        # separators in either engine)
        n_tok = len([
            t for t in re.split(r"[ \t\n\x0b\f\r]+", r["text"] or "") if t
        ])
        convs.setdefault(r["conv_id"], []).append(
            (r["turn_idx"], r["role"], n_tok)
        )
    expected = {}
    for conv_id, turns in convs.items():
        turns.sort()
        cum = 0
        prefix = []  # (turn_idx, n_tok, cum_excl)
        for turn_idx, role, n_tok in turns:
            if role == "assistant":
                ctx = [
                    (ti, nt) for ti, nt, ce in prefix
                    if cum - ce <= SFT_BUDGET
                ]
                expected[(conv_id, turn_idx)] = (
                    len(prefix),
                    len(ctx),
                    sum(nt for _, nt in ctx),
                    min((ti for ti, _ in ctx), default=None),
                    n_tok,
                    len(prefix) > len(ctx),
                )
            prefix.append((turn_idx, n_tok, cum))
            cum += n_tok
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_prev_turns"], r["ctx_turns"], r["ctx_tokens"],
            r["ctx_start_turn"], r["target_tokens"], r["truncated"],
        )
        for r in q_sft_context_windows(spark, SF).collect()
    }
    assert got == expected
    # the corpus exercises BOTH branches: some contexts truncate (the
    # giant tool turn drops out), some keep the full history
    assert any(v[5] for v in expected.values())
    assert any(not v[5] for v in expected.values())
    # suffix property: a truncated context never skips the immediately
    # preceding turn unless it keeps NO turns at all
    for (conv_id, ti), v in expected.items():
        if v[1] > 0:
            kept_from = v[3]
            all_prev = [t for t in convs[conv_id] if t[0] < ti]
            assert len([t for t in all_prev if t[0] >= kept_from]) == v[1]


def test_url_blocklist_filter_verdicts(spark):
    rows = q_url_blocklist_filter(spark, SF).collect()
    assert rows
    tok_re = re.compile("[^a-z0-9]+")
    bad = set(URL_BADWORDS)
    n_host = n_words = n_ok = 0
    for r in rows:
        # per-row replica of the verdict logic from the URL string alone
        blocked_host = any(
            r["host"] == s or r["host"].endswith("." + s)
            for s in BLOCKED_HOST_SUFFIXES
        )
        n_bad = sum(
            1 for t in tok_re.split(r["url"].lower()) if t and t in bad
        )
        assert r["blocked_host"] == blocked_host
        assert r["n_badwords"] == n_bad
        verdict = (
            "blocked_host" if blocked_host
            else "blocked_words" if n_bad >= 1 else "ok"
        )
        assert r["verdict"] == verdict
        n_host += verdict == "blocked_host"
        n_words += verdict == "blocked_words"
        n_ok += verdict == "ok"
    # the corpus exercises all three verdicts (go.redirectingat.com is a
    # real affiliate redirector in the fixture corpus)
    assert n_host > 0 and n_words > 0 and n_ok > 0
    assert any(
        r["host"] == "go.redirectingat.com"
        and r["verdict"] == "blocked_host"
        for r in rows
    )
