"""Wave 24: transcript-corpus analytics on the north-rule input shape.

Independent evidence beyond the DuckDB oracles: pure-Python md5/window
replicas over the real smoke corpus, plus crafted in-memory conversations
that exercise the branches the corpus cannot (actual duplicate
conversations, unanswered user turns, stuck-agent loops, NULL-vs-empty
text) through the factored frame functions.
"""

import hashlib
from datetime import datetime, timedelta

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    LOOP_REPEATS,
    TRANSCRIPTS_PQ,
    agent_loop_frame,
    conversation_digest_frame,
    q_agent_loop_detect,
    q_conversation_dedup,
    q_role_transition_stats,
    q_turn_reply_latency,
    reply_latency_frame,
)

SF = "/root/testdata/sf0.001"

COLS = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
T0 = datetime(2026, 1, 1)


def _rows():
    return sorted(
        pq.read_table(TRANSCRIPTS_PQ).to_pylist(),
        key=lambda r: (r["conv_id"], r["turn_idx"]),
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _turn_digest(r) -> str:
    parts = [
        r["role"] if r["role"] is not None else "\x01",
        r["text"] if r["text"] is not None else "\x01",
        r["tool"] if r["tool"] is not None else "\x01",
    ]
    return _md5("\x1f".join(parts))


def _mk(spark, rows):
    """rows: (conv_id, turn_idx, role, text, tool, ts_offset_sec)."""
    return spark.createDataFrame(
        [
            (c, i, role, text, tool, T0 + timedelta(seconds=off))
            for c, i, role, text, tool, off in rows
        ],
        COLS,
    )


def test_conversation_dedup_matches_md5_replica(spark):
    convs = {}
    for r in _rows():
        convs.setdefault(r["conv_id"], []).append(_turn_digest(r))
    digest = {cid: _md5("".join(tds)) for cid, tds in convs.items()}
    groups = {}
    for cid, d in digest.items():
        groups.setdefault(d, []).append(cid)
    expected = {}
    for d, cids in groups.items():
        canon = min(cids)
        for cid in cids:
            expected[cid] = (
                d, len(convs[cid]), canon, len(cids), cid == canon
            )
    got = {
        r["conv_id"]: (
            r["conv_digest"], r["n_turns"], r["canonical_conv_id"],
            r["group_size"], r["is_canonical"],
        )
        for r in q_conversation_dedup(spark, SF).collect()
    }
    assert got == expected
    # the smoke fixtures are all distinct conversations
    assert all(v[4] for v in got.values())


def test_conversation_dedup_collapses_crafted_duplicates(spark):
    base = [
        ("c-b", 0, "user", "hi", None, 0),
        ("c-b", 1, "assistant", "hello", None, 10),
        # exact re-log of c-b under a later id, different timestamps
        # (ts is NOT part of the content digest)
        ("c-z", 0, "user", "hi", None, 500),
        ("c-z", 1, "assistant", "hello", None, 510),
        # same texts, different role layout -> NOT a duplicate
        ("c-r", 0, "assistant", "hi", None, 0),
        ("c-r", 1, "user", "hello", None, 10),
        # NULL text vs empty text -> NOT a duplicate
        ("c-n", 0, "user", None, None, 0),
        ("c-e", 0, "user", "", None, 0),
    ]
    got = {
        r["conv_id"]: (
            r["canonical_conv_id"], r["group_size"], r["is_canonical"]
        )
        for r in conversation_digest_frame(_mk(spark, base)).collect()
    }
    assert got["c-b"] == ("c-b", 2, True)
    assert got["c-z"] == ("c-b", 2, False)
    assert got["c-r"] == ("c-r", 1, True)
    assert got["c-n"] == ("c-n", 1, True)
    assert got["c-e"] == ("c-e", 1, True)


def test_role_transition_stats_matches_replica(spark):
    convs = {}
    for r in _rows():
        convs.setdefault(r["conv_id"], []).append(r["role"])
    counts = {}
    for roles in convs.values():
        prev = "START"
        for role in roles:
            counts[(prev, role)] = counts.get((prev, role), 0) + 1
            prev = role
    prev_totals = {}
    for (p, _), n in counts.items():
        prev_totals[p] = prev_totals.get(p, 0) + n
    expected = {
        (p, role): (n, prev_totals[p], round(n / prev_totals[p], 6))
        for (p, role), n in counts.items()
    }
    got = {
        (r["prev_role"], r["role"]): (
            r["n_transitions"], r["prev_total"], r["p_transition"]
        )
        for r in q_role_transition_stats(spark, SF).collect()
    }
    assert got == expected
    # the smoke corpus is strictly user -> tool -> assistant
    assert set(got) == {
        ("START", "user"), ("user", "tool"), ("tool", "assistant")
    }
    assert all(v[2] == 1.0 for v in got.values())


def test_turn_reply_latency_matches_replica(spark):
    convs = {}
    for r in _rows():
        convs.setdefault(r["conv_id"], []).append(r)
    expected = {}
    for cid, turns in convs.items():
        for i, r in enumerate(turns):
            if r["role"] != "user":
                continue
            nxt = [
                t["ts"] for t in turns[i + 1:] if t["role"] == "assistant"
            ]
            lat = (
                int((min(nxt) - r["ts"]).total_seconds()) if nxt else None
            )
            expected[(cid, r["turn_idx"])] = (lat, bool(nxt))
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["reply_latency_sec"], r["answered"]
        )
        for r in q_turn_reply_latency(spark, SF).collect()
    }
    assert got == expected
    assert all(v[1] for v in got.values())  # smoke corpus: all answered


def test_turn_reply_latency_crafted_branches(spark):
    rows = [
        # tool turn intervenes: reply is the ASSISTANT turn at +60
        ("c-1", 0, "user", "q", None, 0),
        ("c-1", 1, "tool", "result", "browser", 30),
        ("c-1", 2, "assistant", "a", None, 60),
        # second user turn answered by a later assistant at +40
        ("c-1", 3, "user", "q2", None, 70),
        ("c-1", 4, "assistant", "a2", None, 110),
        # trailing unanswered user turn
        ("c-1", 5, "user", "q3", None, 120),
        # conversation with NO assistant at all
        ("c-2", 0, "user", "hello?", None, 0),
    ]
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["reply_latency_sec"], r["answered"]
        )
        for r in reply_latency_frame(_mk(spark, rows)).collect()
    }
    assert got == {
        ("c-1", 0): (60, True),
        ("c-1", 3): (40, True),
        ("c-1", 5): (None, False),
        ("c-2", 0): (None, False),
    }


def test_agent_loop_detect_real_corpus_clean(spark):
    rows = q_agent_loop_detect(spark, SF).collect()
    n_conv = len({r["conv_id"] for r in _rows()})
    assert len(rows) == n_conv  # coverage: one row per conversation
    # each smoke conversation has exactly one distinct assistant turn
    assert all(
        r["n_assistant_turns"] == 1
        and r["n_distinct_outputs"] == 1
        and r["max_repeat"] == 1
        and not r["has_loop"]
        for r in rows
    )


def test_agent_loop_detect_crafted_branches(spark):
    rows = []
    # c-loop: LOOP_REPEATS identical assistant outputs -> flagged
    for i in range(LOOP_REPEATS):
        rows.append(("c-loop", 2 * i, "user", f"q{i}", None, 10 * i))
        rows.append(("c-loop", 2 * i + 1, "assistant", "same", None, 10 * i + 5))
    # c-edge: LOOP_REPEATS - 1 repeats -> below threshold, not flagged
    for i in range(LOOP_REPEATS - 1):
        rows.append(("c-edge", i, "assistant", "dup", None, i))
    rows.append(("c-edge", 99, "assistant", "other", None, 990))
    # c-none: no assistant turns at all -> zeros, coverage row kept
    rows.append(("c-none", 0, "user", "hi", None, 0))
    # c-null: NULL text and empty text are DISTINCT outputs
    rows.append(("c-null", 0, "assistant", None, None, 0))
    rows.append(("c-null", 1, "assistant", "", None, 1))
    got = {
        r["conv_id"]: (
            r["n_assistant_turns"], r["n_distinct_outputs"],
            r["max_repeat"], r["has_loop"],
        )
        for r in agent_loop_frame(_mk(spark, rows)).collect()
    }
    assert got == {
        "c-loop": (LOOP_REPEATS, 1, LOOP_REPEATS, True),
        "c-edge": (LOOP_REPEATS, 2, LOOP_REPEATS - 1, False),
        "c-none": (0, 0, 0, False),
        "c-null": (2, 2, 1, False),
    }
