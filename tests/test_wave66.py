"""Wave 66: embedding hard-negative mining, per-tool output-size stats.

Independent evidence beyond the DuckDB oracles: a value-exact Python
replica of the hard-negative selection over the real corpus (cosine in
the same left-to-right double arithmetic, Spark-repr round-6, rank
tiebreaks) seeded by the ALREADY-ORACLE-VERIFIED kmeans assignment, a
fully hand-pinned crafted-geometry corpus where every rank / tie /
same-cluster exclusion is computed on paper, and an integer-exact
replica of the tool output-size rollup."""

from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    AGENT_FIXTURE,
    HARDNEG_N_QUERIES,
    HARDNEG_TOPK,
    TRANSCRIPTS_PQ,
    q_ann_ivf_kmeans,
    q_embedding_hard_negatives,
    q_tool_output_stats,
)

SF = "/root/testdata/sf0.001"


def _round6_spark(x: float) -> float:
    # F.round on DOUBLE rounds the shortest-repr decimal (CLAUDE.md)
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _dot(a, b):
    # left-to-right accumulation, double ops — same order as F.aggregate
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cosine(a, b):
    return _round6_spark(_dot(a, b) / (_dot(a, a) ** 0.5 * _dot(b, b) ** 0.5))


# ------------------------------------------------ hard negatives


def test_hard_negatives_replica_real_corpus(spark):
    emb = {
        r["vec_id"]: r["embedding"]
        for r in pq.read_table(f"{SF}/embeddings.parquet").to_pylist()
    }
    # cluster assignment from the oracle-verified sibling operator
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in q_ann_ivf_kmeans(spark, SF).collect()
    }
    want = []
    for qid in range(HARDNEG_N_QUERIES):
        cands = sorted(
            (
                (-_cosine(emb[qid], emb[v]), v)
                for v in emb
                if assign[v] != assign[qid]
            ),
        )[:HARDNEG_TOPK]
        for rank, (negc, v) in enumerate(cands, 1):
            want.append((qid, assign[qid], rank, v, assign[v], -negc))
    rows = q_embedding_hard_negatives(spark, SF).collect()
    got = [
        (
            r["query_id"],
            r["q_centroid"],
            r["rank"],
            r["neg_id"],
            r["neg_centroid"],
            r["cosine"],
        )
        for r in rows
    ]
    assert sorted(got) == sorted(want)
    assert len(got) == HARDNEG_N_QUERIES * HARDNEG_TOPK


def test_hard_negatives_crafted_geometry(spark, tmp_path):
    """Hand-computed 2-D geometry: vecs 0..7 on the 8 compass corners
    (the first-K kmeans init), vec 8 = 2x vec 0 joins cluster 0, vec 9 =
    2x vec 1 joins cluster 1.  Every cross-cluster cosine from a query
    is 0.707107, 0, or negative, so every rank and vec_id tiebreak is
    checkable on paper; vec 8 (cosine 1.0 with query 0 but SAME cluster)
    must be excluded — the defining hard-negative property."""
    pts = [
        (0, [10.0, 0.0]),
        (1, [7.0, 7.0]),
        (2, [0.0, 10.0]),
        (3, [-7.0, 7.0]),
        (4, [-10.0, 0.0]),
        (5, [-7.0, -7.0]),
        (6, [0.0, -10.0]),
        (7, [7.0, -7.0]),
        (8, [20.0, 0.0]),   # same direction as query 0, cluster 0
        (9, [14.0, 14.0]),  # same direction as query 1, cluster 1
    ]
    spark.createDataFrame(
        pts, "vec_id long, embedding array<float>"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    rows = q_embedding_hard_negatives(spark, str(tmp_path)).collect()
    got = {
        (r["query_id"], r["rank"]): (
            r["neg_id"],
            r["cosine"],
            r["neg_centroid"],
            r["q_centroid"],
        )
        for r in rows
    }
    assert len(got) == 15
    C = 0.707107  # round-6 of 1/sqrt(2), every 45-degree cosine here
    # query 0 (cluster 0): three-way 0.707107 tie -> vec_id asc 1, 7, 9;
    # vec 8 (cosine 1.0, same cluster) absent
    assert got[(0, 1)] == (1, C, 1, 0)
    assert got[(0, 2)] == (7, C, 7, 0)
    assert got[(0, 3)] == (9, C, 1, 0)
    assert all(r["neg_id"] != 8 for r in rows if r["query_id"] == 0)
    # query 1 (cluster 1, which also owns vec 9): tie -> 0, 2, 8
    assert got[(1, 1)] == (0, C, 0, 1)
    assert got[(1, 2)] == (2, C, 2, 1)
    assert got[(1, 3)] == (8, C, 0, 1)
    assert all(r["neg_id"] != 9 for r in rows if r["query_id"] == 1)
    # query 2: tie -> 1, 3, 9
    assert got[(2, 1)] == (1, C, 1, 2)
    assert got[(2, 2)] == (3, C, 3, 2)
    assert got[(2, 3)] == (9, C, 1, 2)
    # query 3: 0.707107 at 2 and 4, then the cosine-0 tie breaks to id 1
    assert got[(3, 1)] == (2, C, 2, 3)
    assert got[(3, 2)] == (4, C, 4, 3)
    assert got[(3, 3)] == (1, 0.0, 1, 3)
    # query 4: 0.707107 at 3 and 5, then cosine-0 tie breaks to id 2
    assert got[(4, 1)] == (3, C, 3, 4)
    assert got[(4, 2)] == (5, C, 5, 4)
    assert got[(4, 3)] == (2, 0.0, 2, 4)
    # every negative sits in a different cluster than its query
    assert all(r["neg_centroid"] != r["q_centroid"] for r in rows)


# ------------------------------------------------ tool output stats


def test_tool_output_stats_replica(spark):
    turns = [
        (r["role"], r["tool"], r["text"])
        for r in pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    ] + [(role, tool, text) for _, _, role, text, tool in AGENT_FIXTURE]
    agg = {}
    convs = {}
    i = 0
    rows_src = [
        (r["conv_id"], r["role"], r["tool"], r["text"])
        for r in pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    ] + [(c, role, tool, text) for c, _, role, text, tool in AGENT_FIXTURE]
    for conv, role, tool, text in rows_src:
        if role != "tool":
            continue
        a = agg.setdefault(tool, [0, 0, 0, 0])  # calls, nulls, total, max
        convs.setdefault(tool, set()).add(conv)
        a[0] += 1
        if text is None:
            a[1] += 1
        n = len(text) if text is not None else 0
        a[2] += n
        a[3] = max(a[3], n)
        i += 1
    assert i > 0
    rows = q_tool_output_stats(spark, SF).collect()
    got = {
        r["tool"]: (
            r["n_calls"],
            r["n_convs"],
            r["n_null_outputs"],
            r["total_chars"],
            r["max_chars"],
            r["mean_chars"],
        )
        for r in rows
    }
    want = {
        tool: (
            a[0],
            len(convs[tool]),
            a[1],
            a[2],
            a[3],
            (2 * a[2] + a[0]) // (2 * a[0]),  # half-up integer mean
        )
        for tool, a in agg.items()
    }
    assert got == want
    # the corpus exercises more than one tool and a non-trivial mean
    assert len(got) >= 2
    assert any(v[5] > 0 for v in got.values())
