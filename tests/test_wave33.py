"""Wave 33: hybrid RRF retrieval fusion + DPO preference-pair mining +
tool-output context-compression audit.

Independent evidence beyond the DuckDB oracles: a full pure-Python
replica of the hybrid pipeline (df-capped token sets, exact integer
Jaccard, sequential-fold cosine with HALF-UP round-6, integer RRF) over
the real sf corpus; a replay of the preference heuristic over the smoke
corpus + shared fixture; and Counter/hashlib replays plus crafted-corpus
branch coverage for the collapse audit.
"""

import hashlib
import math
import re
from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    HYBRID_DF_CAP,
    HYBRID_N_QUERIES,
    HYBRID_TOPK,
    MICRO,
    PREF_FIXTURE,
    RRF_K,
    TRANSCRIPTS_PQ,
    preference_pair_frame,
    q_hybrid_rrf_fusion,
    q_preference_pair_mining,
    q_tool_output_collapse,
    tool_output_collapse_frame,
)

SF = "/root/testdata/sf0.001"

_SPLIT = re.compile(r"[^a-z0-9]+")


def _round6_half_up(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _replica_hybrid():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    embs = pq.read_table(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).to_pylist()
    tsets = {
        r["doc_id"]: {t for t in _SPLIT.split(r["text"].lower()) if t}
        for r in docs
    }
    df = defaultdict(int)
    for s in tsets.values():
        for t in s:
            df[t] += 1
    capped = {d: {t for t in s if df[t] <= HYBRID_DF_CAP}
              for d, s in tsets.items()}

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embs}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):  # sequential fold, like F.aggregate
            acc += x * y
        return acc

    out = {}
    for q in range(HYBRID_N_QUERIES):
        lex = []
        for d, s in capped.items():
            if d == q:
                continue
            inter = len(capped[q] & s)
            union = len(capped[q]) + len(s) - inter
            if inter == 0:
                continue  # no shared token -> never a candidate
            lex.append(((inter * MICRO) // union, d))
        lex.sort(key=lambda t: (-t[0], t[1]))
        lex_rank = {d: i + 1 for i, (_, d) in enumerate(lex[:HYBRID_TOPK])}

        qv = vecs[q]
        qn = math.sqrt(dot(qv, qv))
        sem = []
        for d, v in vecs.items():
            if d == q:
                continue
            c = _round6_half_up(dot(qv, v) / (qn * math.sqrt(dot(v, v))))
            sem.append((c, d))
        sem.sort(key=lambda t: (-t[0], t[1]))
        sem_rank = {d: i + 1 for i, (_, d) in enumerate(sem[:HYBRID_TOPK])}

        fused = []
        for d in set(lex_rank) | set(sem_rank):
            s = (MICRO // (RRF_K + lex_rank[d]) if d in lex_rank else 0) + (
                MICRO // (RRF_K + sem_rank[d]) if d in sem_rank else 0
            )
            fused.append((s, d))
        fused.sort(key=lambda t: (-t[0], t[1]))
        for i, (s, d) in enumerate(fused[:HYBRID_TOPK]):
            out[(q, i + 1)] = (d, s, lex_rank.get(d), sem_rank.get(d))
    return out


def test_hybrid_rrf_matches_pure_python_replica(spark):
    got = {
        (r.query_id, r.fused_rank): (
            r.doc_id,
            r.rrf_micro,
            r.lex_rank,
            r.sem_rank,
        )
        for r in q_hybrid_rrf_fusion(spark, SF).collect()
    }
    want = _replica_hybrid()
    assert got == want
    # every query produced a full fused top-K and both legs contribute
    assert len(got) == HYBRID_N_QUERIES * HYBRID_TOPK
    assert any(v[2] is not None for v in got.values())
    assert any(v[3] is not None for v in got.values())


def test_preference_pairs_replay_smoke_plus_fixture(spark):
    rows = pq.read_table(
        TRANSCRIPTS_PQ, columns=["conv_id", "turn_idx", "role", "text"]
    ).to_pylist()
    rows += [
        {"conv_id": c, "turn_idx": i, "role": r, "text": x}
        for c, i, r, x in PREF_FIXTURE
    ]
    byconv = defaultdict(list)
    for r in rows:
        byconv[r["conv_id"]].append(r)
    want = {}
    for conv, ts in byconv.items():
        ts.sort(key=lambda r: r["turn_idx"])
        a_idx = [r["turn_idx"] for r in ts if r["role"] == "assistant"]
        u_idx = [r["turn_idx"] for r in ts if r["role"] == "user"]
        if not a_idx:
            continue
        fin = max(a_idx)
        chosen = next(r for r in ts if r["turn_idx"] == fin)
        for r in ts:
            if (
                r["role"] == "assistant"
                and r["turn_idx"] < fin
                and u_idx
                and max(u_idx) > r["turn_idx"]
            ):
                want[(conv, r["turn_idx"])] = (
                    fin,
                    len(r["text"] or ""),
                    len(chosen["text"] or ""),
                    r["text"] is not None
                    and chosen["text"] is not None
                    and r["text"] != chosen["text"],
                )
    got = {
        (r.conv_id, r.rejected_turn_idx): (
            r.chosen_turn_idx,
            r.rejected_chars,
            r.chosen_chars,
            r.usable,
        )
        for r in q_preference_pair_mining(spark, SF).collect()
    }
    assert got == want
    # the single-exchange smoke corpus yields nothing; every fixture
    # branch is present: usable retry, identical final, NULL rejected,
    # and no pair when no user turn follows the attempt
    assert all(c.startswith("pref-retry") for c, _ in got)
    assert got[("pref-retry-1", 1)] == (3, 17, 17, True)
    assert got[("pref-retry-2", 1)] == (3, 11, 11, False)
    assert got[("pref-retry-3", 1)] == (4, 0, 5, False)
    assert ("pref-retry-4", 1) not in got


def test_tool_collapse_replays_smoke_corpus(spark):
    rows = pq.read_table(
        TRANSCRIPTS_PQ, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    ).to_pylist()
    convs = {r["conv_id"] for r in rows}
    seen = defaultdict(set)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        if r["role"] != "tool":
            continue
        key = (
            r["conv_id"],
            r["tool"] if r["tool"] is not None else "\x01",
            hashlib.md5(
                (r["text"] if r["text"] is not None else "\x01").encode()
            ).hexdigest(),
        )
        a = agg[r["conv_id"]]
        n = len(r["text"] or "")
        a[0] += 1
        a[3] += n
        if key in seen[r["conv_id"]]:
            a[2] += 1
            a[4] += n
        else:
            seen[r["conv_id"]].add(key)
            a[1] += 1
    got = {r.conv_id: r for r in q_tool_output_collapse(spark, SF).collect()}
    assert set(got) == convs
    for conv in convs:
        a = agg.get(conv, [0, 0, 0, 0, 0])
        g = got[conv]
        assert (
            g.n_tool_turns,
            g.n_distinct_outputs,
            g.n_collapsible,
            g.tool_chars,
            g.chars_saved,
        ) == tuple(a)
        if a[3] > 0:
            assert abs(g.saved_frac - round(a[4] / a[3], 6)) < 1e-9
        else:
            assert g.saved_frac is None


def test_tool_collapse_crafted_branches(spark):
    data = [
        # conv A: same tool, outputs x, x, y -> 1 collapsible, saves 1 char
        ("A", 0, "tool", "x", "search"),
        ("A", 1, "tool", "x", "search"),
        ("A", 2, "tool", "y", "search"),
        # same text under a DIFFERENT tool does not collapse
        ("A", 3, "tool", "x", "browse"),
        # conv B: no tool turns at all -> zero coverage row, NULL frac
        ("B", 0, "user", "hi", None),
        # conv C: NULL text repeats -> collapsible but zero chars saved
        ("C", 0, "tool", None, "search"),
        ("C", 1, "tool", None, "search"),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {r.conv_id: r for r in tool_output_collapse_frame(df).collect()}
    a, b, c = got["A"], got["B"], got["C"]
    assert (a.n_tool_turns, a.n_distinct_outputs, a.n_collapsible) == (4, 3, 1)
    assert (a.tool_chars, a.chars_saved) == (4, 1)
    assert abs(a.saved_frac - 0.25) < 1e-9
    assert (b.n_tool_turns, b.n_collapsible, b.tool_chars) == (0, 0, 0)
    assert b.saved_frac is None
    assert (c.n_tool_turns, c.n_distinct_outputs, c.n_collapsible) == (2, 1, 1)
    assert (c.tool_chars, c.chars_saved) == (0, 0)
    assert c.saved_frac is None
