"""Wave 30: near-repeat retry-loop detection (the paraphrase-loop
complement to agent_loop_detect's exact digests).

Independent evidence beyond the DuckDB oracle: a pure-Python Levenshtein
replay over the smoke corpus, and crafted conversations pinning each
branch (identical reply, one-token drift inside the band, same-length
rewrite outside the band, length-prefilter skip, NULL outputs,
non-adjacent repeats, assistant-free coverage rows).
"""

from datetime import datetime, timedelta

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    NEAR_LOOP_BAND,
    NEAR_LOOP_REPEATS,
    TRANSCRIPTS_PQ,
    near_loop_frame,
    q_agent_loop_neardup,
)

SF = "/root/testdata/sf0.001"

COLS = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
T0 = datetime(2026, 1, 1)


def _lev(a, b):
    if abs(len(a) - len(b)) > NEAR_LOOP_BAND:
        return NEAR_LOOP_BAND + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_near_loop_matches_python_replay(spark):
    rows = sorted(
        pq.read_table(TRANSCRIPTS_PQ).to_pylist(),
        key=lambda r: (r["conv_id"], r["turn_idx"]),
    )
    per = {}
    last = {}
    for r in rows:
        per.setdefault(r["conv_id"], [0, 0])
        if r["role"] != "assistant":
            continue
        per[r["conv_id"]][0] += 1
        prev = last.get(r["conv_id"])
        if (
            r["text"] is not None
            and prev is not None
            and _lev(r["text"], prev) <= NEAR_LOOP_BAND
        ):
            per[r["conv_id"]][1] += 1
        last[r["conv_id"]] = r["text"]

    out = {r.conv_id: r for r in q_agent_loop_neardup(spark, SF).collect()}
    assert set(out) == set(per)
    for cid, (n_a, n_near) in per.items():
        r = out[cid]
        assert r.n_assistant_turns == n_a
        assert r.n_near_repeats == n_near, cid
        assert r.has_near_loop == (n_near >= NEAR_LOOP_REPEATS)


def test_near_loop_crafted_branches(spark):
    def ts(i):
        return T0 + timedelta(seconds=i)

    base = "the deploy failed with error code 500, retrying now"
    rows = [
        # exact + one-char drift: two near-repeats -> flagged
        ("loop", 0, "assistant", base, None, ts(0)),
        ("loop", 1, "assistant", base, None, ts(1)),
        ("loop", 2, "assistant", base.replace("500", "503"), None, ts(2)),
        # same length but a full rewrite: outside the band, not near
        ("far", 0, "assistant", "a" * 40, None, ts(0)),
        ("far", 1, "assistant", "b" * 40, None, ts(1)),
        # length prefilter: 100 extra chars can never be within the band
        ("len", 0, "assistant", base, None, ts(0)),
        ("len", 1, "assistant", base + "x" * 100, None, ts(1)),
        # NULL outputs never match (even two NULLs in a row)
        ("null", 0, "assistant", None, None, ts(0)),
        ("null", 1, "assistant", None, None, ts(1)),
        # an intervening user turn does NOT break assistant adjacency
        ("gap", 0, "assistant", base, None, ts(0)),
        ("gap", 1, "user", "try again", None, ts(1)),
        ("gap", 2, "assistant", base, None, ts(2)),
        # no assistant turns at all: coverage row with zeros
        ("cov", 0, "user", "hello", None, ts(0)),
    ]
    out = {r.conv_id: r for r in near_loop_frame(
        spark.createDataFrame(rows, COLS)).collect()}
    assert out["loop"].n_near_repeats == 2 and out["loop"].has_near_loop
    assert out["far"].n_near_repeats == 0 and not out["far"].has_near_loop
    assert out["len"].n_near_repeats == 0
    assert out["null"].n_near_repeats == 0
    assert out["gap"].n_near_repeats == 1 and not out["gap"].has_near_loop
    assert out["cov"].n_assistant_turns == 0 and not out["cov"].has_near_loop
