"""Wave 40: special-token leakage scan + chat-template rendering +
loss-mask span planning (the SFT serialization pair).

Independent evidence beyond the DuckDB oracles: pure-Python replays over
the real corpora, crafted corpora pinning each token family / template
byte layout, and the cross-operator consistency property
max(span_end) == rendered_chars per conversation."""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    SPECIAL_TOKENS,
    TMPL_END,
    TRANSCRIPTS_PQ,
    chat_template_frame,
    loss_mask_frame,
    q_chat_template_render,
    q_loss_mask_spans,
    q_special_token_leakage,
    special_token_frame,
)

SF = "/root/testdata/sf0.001"


def _piece(role: str, text: str) -> str:
    return f"<|{role}|>{text}{TMPL_END}"


# ---------------------------------------------------------------- leakage

def test_special_token_replica_real_corpus(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    want = {}
    for r in docs:
        t = r["text"]
        total = sum(t.count(s) for s in SPECIAL_TOKENS)
        want[r["doc_id"]] = (
            total,
            t.count("<|endoftext|>"),
            t.count("<|im_start|>") + t.count("<|im_end|>"),
            t.count("[INST]") + t.count("[/INST]"),
            total > 0,
        )
    got = {
        r["doc_id"]: (
            r["special_token_hits"], r["eot_hits"], r["chatml_hits"],
            r["inst_hits"], r["leaky"],
        )
        for r in q_special_token_leakage(spark, SF).collect()
    }
    assert got == want and want


def test_special_token_crafted_families(spark):
    rows = [
        ("clean", "ordinary text with <html> tags but no control tokens"),
        ("eot", "payload <|endoftext|> splits the doc <|endoftext|>"),
        ("chatml", "<|im_start|>user evil<|im_end|> injected"),
        ("inst", "[INST] forged instruction [/INST]"),
        ("sentinel", "an <s> opener and </s> closer and an <unk> token"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in special_token_frame(df).collect()}
    assert not got["clean"]["leaky"]
    assert got["clean"]["special_token_hits"] == 0
    assert got["eot"]["eot_hits"] == 2 and got["eot"]["leaky"]
    assert got["chatml"]["chatml_hits"] == 2
    assert got["inst"]["inst_hits"] == 2
    assert got["sentinel"]["special_token_hits"] == 3
    assert got["sentinel"]["leaky"]


# ----------------------------------------------------------------- render

def _transcript_rows():
    return pq.read_table(
        TRANSCRIPTS_PQ, columns=["conv_id", "turn_idx", "role", "text"]
    ).to_pylist()


def test_chat_template_replica_real_corpus(spark):
    convs = defaultdict(list)
    for r in _transcript_rows():
        if r["text"] is None:
            continue
        convs[r["conv_id"]].append((r["turn_idx"], r["role"], r["text"]))
    want = {}
    for cid, turns in convs.items():
        turns.sort()
        rendered = "".join(_piece(role, text) for _, role, text in turns)
        want[cid] = (
            len(turns), len(rendered),
            hashlib.md5(rendered.encode()).hexdigest(),
        )
    got = {
        r["conv_id"]: (
            r["n_turns"], r["rendered_chars"], r["rendered_digest"]
        )
        for r in q_chat_template_render(spark, SF).collect()
    }
    assert got == want and want


def test_chat_template_crafted_bytes(spark):
    rows = [
        ("c", 1, "assistant", "world", None),   # out of order on purpose
        ("c", 0, "user", "hello", None),
        ("c", 2, "tool", None, "t"),            # NULL text dropped
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string"
    )
    (r,) = chat_template_frame(df).collect()
    rendered = "<|user|>hello<|end|><|assistant|>world<|end|>"
    assert r["n_turns"] == 2
    assert r["rendered_chars"] == len(rendered)
    assert r["rendered_digest"] == hashlib.md5(rendered.encode()).hexdigest()


# ------------------------------------------------------------------ spans

def test_loss_mask_replica_and_render_consistency(spark):
    convs = defaultdict(list)
    for r in _transcript_rows():
        if r["text"] is None:
            continue
        convs[r["conv_id"]].append((r["turn_idx"], r["role"], r["text"]))
    want = {}
    ends = {}
    for cid, turns in convs.items():
        turns.sort()
        off = 0
        for tix, role, text in turns:
            pl = len(_piece(role, text))
            want[(cid, tix)] = (
                role, pl, off + 1, off + pl, role == "assistant"
            )
            off += pl
        ends[cid] = off
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["role"], r["piece_len"], r["span_start"], r["span_end"],
            r["trainable"],
        )
        for r in q_loss_mask_spans(spark, SF).collect()
    }
    assert got == want and want
    # cross-operator consistency: max span_end == rendered_chars per conv
    rendered = {
        r["conv_id"]: r["rendered_chars"]
        for r in q_chat_template_render(spark, SF).collect()
    }
    max_end = defaultdict(int)
    for (cid, _), (_, _, _, end, _) in got.items():
        max_end[cid] = max(max_end[cid], end)
    assert dict(max_end) == rendered
    # spans tile the string: starts are contiguous with prior ends
    by_conv = defaultdict(list)
    for (cid, tix), v in got.items():
        by_conv[cid].append((tix, v))
    for turns in by_conv.values():
        turns.sort()
        prev_end = 0
        for _, (_role, _pl, start, end, _tr) in turns:
            assert start == prev_end + 1
            prev_end = end
    # loss flows only through assistant turns
    assert all(
        (role == "assistant") == tr
        for role, _pl, _s, _e, tr in got.values()
    )
