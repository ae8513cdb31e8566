"""Wave 57: tool-chain mining, agent error recovery, citation grounding.

Independent evidence beyond the DuckDB oracles: pure-Python replicas over
the smoke corpus + the shared AGENT_FIXTURE, crafted corpora pinning the
chain cap, the same-tool-only recovery rule, and the strictly-earlier
citation rule."""

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    AGENT_FIXTURE,
    CHAIN_CAP,
    CHAIN_TOPK,
    CITE_URL_RE,
    TRAJ_ERROR_MARKERS,
    TRAJ_STATUS_RE,
    citation_frame,
    error_recovery_frame,
    q_agent_error_recovery,
    q_citation_url_check,
    q_tool_chain_topk,
    tool_chain_frame,
)

SF = "/root/testdata/sf0.001"
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string"
)


def _corpus():
    rows = pq.read_table(
        "tests/goldens/transcripts_smoke.parquet"
    ).to_pylist()
    rows = [
        {k: r[k] for k in ("conv_id", "turn_idx", "role", "text", "tool")}
        for r in rows
    ]
    for c, i, r, x, t in AGENT_FIXTURE:
        rows.append(
            {"conv_id": c, "turn_idx": i, "role": r, "text": x, "tool": t}
        )
    return rows


def _is_err(text: str) -> bool:
    low = text.lower()
    return bool(re.search(TRAJ_STATUS_RE, low)) or any(
        m in low for m in TRAJ_ERROR_MARKERS
    )


# ---------------------------------------------------- tool chain top-k


def test_tool_chain_topk_replica(spark):
    per = defaultdict(list)
    for r in sorted(_corpus(), key=lambda r: (r["conv_id"], r["turn_idx"])):
        if r["role"] == "tool" and r["tool"] is not None:
            per[r["conv_id"]].append(r["tool"])
    chains = Counter()
    trunc = Counter()
    for seq in per.values():
        ch = ">".join(seq[:CHAIN_CAP])
        chains[ch] += 1
        if len(seq) > CHAIN_CAP:
            trunc[ch] += 1
    want = sorted(
        ((c, n, trunc[c]) for c, n in chains.items()),
        key=lambda x: (-x[1], x[0]),
    )[:CHAIN_TOPK]
    got = [
        (r["chain"], r["n_convs"], r["n_truncated"])
        for r in q_tool_chain_topk(spark, SF).collect()
    ]
    assert sorted(got, key=lambda x: (-x[1], x[0])) == want
    # the fixture's multi-tool chains are present alongside the smoke
    # corpus's dominant single-call chain
    by_chain = {c: n for c, n, _ in got}
    assert by_chain["browser"] == 106  # 105 smoke + agent-fix-4
    assert by_chain["py>sh>py"] == 1 and by_chain["sh>sh"] == 1


def test_tool_chain_cap(spark):
    rows = [("c1", i, "tool", "ok", f"t{i}") for i in range(CHAIN_CAP + 2)]
    rows.append(("c2", 0, "tool", None, "lone"))  # NULL text still a call
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["chain"]: (r["n_convs"], r["n_truncated"])
        for r in tool_chain_frame(df).collect()
    }
    capped = ">".join(f"t{i}" for i in range(CHAIN_CAP))
    assert got == {capped: (1, 1), "lone": (1, 0)}


# ------------------------------------------------- agent error recovery


def test_agent_error_recovery_replica(spark):
    per = defaultdict(list)
    convs = set()
    for r in sorted(_corpus(), key=lambda r: (r["conv_id"], r["turn_idx"])):
        convs.add(r["conv_id"])
        if (
            r["role"] == "tool"
            and r["tool"] is not None
            and r["text"] is not None
        ):
            per[r["conv_id"]].append((r["tool"], _is_err(r["text"])))
    want = {}
    for c in convs:
        calls = per.get(c, [])
        n_err = sum(1 for _, e in calls if e)
        n_rec = sum(
            1
            for i, (t, e) in enumerate(calls)
            if e and any(t2 == t and not e2 for t2, e2 in calls[i + 1:])
        )
        verdict = (
            "clean"
            if n_err == 0
            else ("recovered" if n_rec == n_err else "unresolved")
        )
        want[c] = (len(calls), n_err, n_rec, verdict)
    got = {
        r["conv_id"]: (
            r["n_tool_calls"],
            r["n_errors"],
            r["n_recovered"],
            r["verdict"],
        )
        for r in q_agent_error_recovery(spark, SF).collect()
    }
    assert got == want
    # fixture branches land where designed
    assert got["agent-fix-1"][3] == "recovered"
    assert got["agent-fix-2"][3] == "unresolved"  # different-tool success
    assert got["agent-fix-3"][3] == "clean"
    assert got["agent-fix-5"] == (1, 1, 0, "unresolved")  # NULL text drops


def test_error_recovery_same_tool_rule(spark):
    rows = [
        # error then same-tool success with an intervening other-tool error
        ("c1", 0, "tool", "fatal: broke", "git"),
        ("c1", 1, "tool", "command not found", "sh"),
        ("c1", 2, "tool", "clean checkout", "git"),
        # success BEFORE the error does not recover it
        ("c2", 0, "tool", "ok", "py"),
        ("c2", 1, "tool", "Traceback (most recent call last): x", "py"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["conv_id"]: (r["n_errors"], r["n_recovered"], r["verdict"])
        for r in error_recovery_frame(df).collect()
    }
    assert got == {
        "c1": (2, 1, "unresolved"),  # git recovered, sh not
        "c2": (1, 0, "unresolved"),  # earlier success does not count
    }


# --------------------------------------------------- citation grounding


def test_citation_url_check_replica(spark):
    url_re = re.compile(CITE_URL_RE)
    seen = defaultdict(dict)  # conv -> url -> first tool idx
    convs = set()
    rows = sorted(_corpus(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    for r in rows:
        convs.add(r["conv_id"])
        if r["role"] == "tool" and r["text"] is not None:
            for u in set(url_re.findall(r["text"])):
                d = seen[r["conv_id"]]
                if u not in d or r["turn_idx"] < d[u]:
                    d[u] = r["turn_idx"]
    want = {c: (0, 0) for c in convs}
    for r in rows:
        if r["role"] == "assistant" and r["text"] is not None:
            for u in set(url_re.findall(r["text"])):
                n, g = want[r["conv_id"]]
                first = seen[r["conv_id"]].get(u)
                want[r["conv_id"]] = (
                    n + 1,
                    g + (1 if first is not None and first < r["turn_idx"]
                         else 0),
                )
    got = {
        r["conv_id"]: (r["n_citations"], r["n_grounded"])
        for r in q_citation_url_check(spark, SF).collect()
    }
    assert got == want
    # fixture branches: grounded, unsupported, later-echo, dup-collapse
    assert got["agent-fix-3"] == (1, 1)
    assert got["agent-fix-1"] == (2, 0)
    assert got["agent-fix-4"] == (1, 0)  # echoed later + dup collapsed
    full = {
        r["conv_id"]: r
        for r in q_citation_url_check(spark, SF).collect()
    }
    assert full["agent-fix-3"]["unsupported_citation"] is False
    assert full["agent-fix-2"]["unsupported_citation"] is True
    assert full["agent-fix-5"]["n_citations"] == 0


def test_citation_strictly_earlier(spark):
    rows = [
        # same turn_idx would be impossible (one row per turn), so pin
        # tool-at-same-conv-later vs earlier explicitly
        ("c1", 0, "tool", "see https://x.example/a", "browser"),
        ("c1", 1, "assistant", "cites https://x.example/a", None),
        ("c2", 0, "assistant", "cites https://x.example/b", None),
        ("c2", 1, "tool", "see https://x.example/b", "browser"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["conv_id"]: (r["n_citations"], r["n_grounded"])
        for r in citation_frame(df).collect()
    }
    assert got == {"c1": (1, 1), "c2": (1, 0)}
