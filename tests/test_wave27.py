"""Wave 27: boilerplate line removal, tool-call triage, length-grouped
inference batching.

Independent evidence beyond the DuckDB oracles: pure-Python replicas of
the full boilerplate df/digest pipeline over the committed goldens, the
tool rollup over the smoke transcripts, and the batching assignment over
the real corpus; a crafted corpus pins the BOILER_MIN_DF threshold edge
and the every-occurrence-dropped (no canonical owner) contract.
"""

import hashlib
import re

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    BOILER_MIN_DF,
    GOLDENS_PQ,
    LB_BATCH,
    LB_SHARDS,
    TRANSCRIPTS_PQ,
    boilerplate_frame,
    q_boilerplate_line_filter,
    q_length_group_batching,
    q_tool_call_stats,
)

SF = "/root/testdata/sf0.001"

_TRIM = re.compile(r"^[ \t\r\f]+|[ \t\r\f]+$")
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _lines_of(text):
    out = []
    for ln in text.split("\n"):
        ln = _TRIM.sub("", ln)
        if ln:
            out.append(ln)
    return out


# ---------------------------------------------------------------------------
# boilerplate_line_filter
# ---------------------------------------------------------------------------

def test_boilerplate_matches_python_replica(spark):
    g = [
        r
        for r in pq.read_table(GOLDENS_PQ).to_pylist()
        if r["status"] == "ok"
    ]
    per_turn = {(r["conv_id"], r["turn_idx"]): _lines_of(r["text_content"]) for r in g}
    df_count = {}
    for key, lines in per_turn.items():
        for ld in {_md5(ln) for ln in lines}:
            df_count[ld] = df_count.get(ld, 0) + 1

    out = {(r.conv_id, r.turn_idx): r for r in q_boilerplate_line_filter(spark, SF).collect()}
    assert set(out) == set(per_turn)
    total_boiler = 0
    for key, lines in per_turn.items():
        kept = [ln for ln in lines if df_count[_md5(ln)] < BOILER_MIN_DF]
        n_boiler = len(lines) - len(kept)
        r = out[key]
        assert r.n_lines == len(lines)
        assert r.n_boiler_lines == n_boiler
        assert r.chars_removed == sum(
            len(ln) for ln in lines if df_count[_md5(ln)] >= BOILER_MIN_DF
        )
        assert r.kept_digest == _md5("\n".join(kept)), key
        total_boiler += n_boiler
    # the corpus contains real repeated payloads - the operator must do work
    assert total_boiler > 0


def test_boilerplate_threshold_edge_and_no_owner(spark):
    # 'tpl' appears in exactly BOILER_MIN_DF turns (threshold hit, ALL
    # occurrences dropped); 'rare' in BOILER_MIN_DF - 1 (kept everywhere).
    rows = []
    for i in range(BOILER_MIN_DF):
        body = "tpl line here.\nunique %d content." % i
        if i < BOILER_MIN_DF - 1:
            body += "\nrare shared line."
        rows.append(("c%d" % i, 0, body))
    ex = spark.createDataFrame(rows, "conv_id string, turn_idx int, text_content string")
    out = {(r.conv_id, r.turn_idx): r for r in boilerplate_frame(ex).collect()}
    for i in range(BOILER_MIN_DF):
        r = out[("c%d" % i, 0)]
        assert r.n_boiler_lines == 1  # tpl dropped in EVERY turn, incl. first
        kept = ["unique %d content." % i]
        if i < BOILER_MIN_DF - 1:
            kept.append("rare shared line.")
        assert r.kept_digest == _md5("\n".join(kept))
    # a turn with only whitespace lines keeps a coverage row
    ex2 = spark.createDataFrame(
        [("w", 0, " \n\t\n ")], "conv_id string, turn_idx int, text_content string"
    )
    r2 = boilerplate_frame(ex2).collect()[0]
    assert r2.n_lines == 0 and r2.kept_digest == _md5("")


# ---------------------------------------------------------------------------
# tool_call_stats
# ---------------------------------------------------------------------------

def test_tool_call_stats_matches_python(spark):
    t = [r for r in pq.read_table(TRANSCRIPTS_PQ).to_pylist() if r["role"] == "tool"]
    agg = {}
    for r in t:
        tool = r["tool"]
        n, convs, chars = agg.get(tool, (0, set(), 0))
        convs = convs | {r["conv_id"]}
        agg[tool] = (n + 1, convs, chars + len(r["text"] or ""))
    total = sum(v[0] for v in agg.values())

    out = {r.tool: r for r in q_tool_call_stats(spark, SF).collect()}
    assert set(out) == set(agg)
    for tool, (n, convs, chars) in agg.items():
        r = out[tool]
        assert (r.n_calls, r.n_convs) == (n, len(convs))
        assert abs(r.mean_chars - round(chars / n, 6)) < 1e-9
        assert abs(r.share - round(n / total, 6)) < 1e-9
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# length_group_batching
# ---------------------------------------------------------------------------

def test_length_batching_matches_python(spark):
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    per = []
    for d in docs:
        nt = len([w for w in _TOKEN_RE.split(d["text"].lower()) if w])
        if nt >= 1:
            per.append((d["doc_id"], nt, nt.bit_length(), d["doc_id"] % LB_SHARDS))
    groups = {}
    for doc_id, nt, bucket, shard in per:
        groups.setdefault((bucket, shard), []).append((nt, doc_id))
    expect = {}
    for (bucket, shard), members in groups.items():
        members.sort(key=lambda x: (-x[0], x[1]))
        for i in range(0, len(members), LB_BATCH):
            batch = members[i : i + LB_BATCH]
            toks = [nt for nt, _ in batch]
            expect[(bucket, shard, i // LB_BATCH)] = (
                len(batch),
                max(toks),
                sum(toks),
            )

    out = {(r.bucket, r.shard, r.batch_idx): r
           for r in q_length_group_batching(spark, SF).collect()}
    assert set(out) == set(expect)
    for k, (n, mx, sm) in expect.items():
        r = out[k]
        assert (r.n_docs, r.max_tokens, r.sum_tokens) == (n, mx, sm)
        assert r.n_docs <= LB_BATCH
        waste = round(1.0 - sm / (n * mx), 6)
        assert abs(r.padding_waste - waste) < 1e-9
        assert 0.0 <= r.padding_waste < 1.0
