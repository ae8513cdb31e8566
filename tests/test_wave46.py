"""Wave 46: top-PC power iteration (embedding-space health), context-
window budget planning, crawl-truncation artifact triage.

Independent evidence beyond the DuckDB oracles: a code-exact pure-Python
replica of the integer-quantized covariance + power iteration over the
real sf embeddings, a crafted anisotropic corpus whose known top PC the
operator must recover, and full per-row replicas / crafted branch pins
for the two scan operators."""

import decimal
import math
import re
from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    CTX_BUDGET_TOKENS,
    CTX_TURN_OVERHEAD,
    EMB_DIM,
    PCA_ITERS,
    READMORE_MARKERS,
    TOKEN_SPLIT,
    TRANSCRIPTS_PQ,
    _round6_half_up,
    context_budget_frame,
    pca_power_frame,
    q_context_budget_plan,
    q_embedding_pca_power,
    q_truncation_artifact_detect,
    truncation_frame,
)

SF = "/root/testdata/sf0.001"


def _int_hu(x: float) -> int:
    return int(
        decimal.Decimal(x).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _round6_repr(x: float) -> float:
    """Twin of Spark F.round(x, 6) on DoubleType: Catalyst goes through
    BigDecimal.valueOf(double) == Double.toString's SHORTEST decimal repr
    (Python repr matches), not the exact binary expansion — they differ
    when the shortest repr terminates in a 5 exactly at the target digit
    (seen live: 192750/(1e6*500) → repr '0.0003855' rounds to 0.000386
    while the binary value 0.000385499… rounds to 0.000385)."""
    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


# ------------------------------------------------- PCA power iteration

def _pca_replica(vecs):
    """Code-exact replay of the operator's integer-quantized pipeline."""
    n = len(vecs)
    mu = {}
    for i in range(1, EMB_DIM + 1):
        m_int = sum(_int_hu(float(v[i - 1]) * 1e6) for v in vecs)
        mu[i] = _round6_repr(m_int / (1e6 * n))
    c = {}
    for i in range(1, EMB_DIM + 1):
        for j in range(1, EMB_DIM + 1):
            s_int = sum(
                _int_hu(
                    (float(v[i - 1]) - mu[i]) * (float(v[j - 1]) - mu[j]) * 1e6
                )
                for v in vecs
            )
            # mu/c are Spark-side F.round results (repr-based); the
            # driver-stage arithmetic below is exact-binary (_int_hu),
            # matching the operator's own code path.
            c[(i, j)] = _round6_repr(s_int / (1e6 * n))

    def matvec(vv):
        return {
            i: _round6_half_up(
                sum(_int_hu(c[(i, j)] * vv[j] * 1e6) for j in range(1, EMB_DIM + 1))
                / 1e6
            )
            for i in range(1, EMB_DIM + 1)
        }

    v = {i: 0.125 for i in range(1, EMB_DIM + 1)}
    for _ in range(PCA_ITERS):
        w = matvec(v)
        nrm = _round6_half_up(
            math.sqrt(sum(_int_hu(w[i] * w[i] * 1e6) for i in w) / 1e6)
        )
        v = {i: _round6_half_up(w[i] / nrm) for i in w}
    wf = matvec(v)
    eigenvalue = _round6_half_up(
        sum(_int_hu(v[i] * wf[i] * 1e6) for i in v) / 1e6
    )
    trace = _round6_half_up(
        sum(_int_hu(c[(i, i)] * 1e6) for i in range(1, EMB_DIM + 1)) / 1e6
    )
    evr = _round6_half_up(eigenvalue / trace)
    return mu, v, eigenvalue, evr


def test_pca_replica_on_corpus(spark):
    vecs = [
        r["embedding"]
        for r in pq.read_table(
            f"{SF}/embeddings.parquet", columns=["embedding"]
        ).to_pylist()
    ]
    mu, v, eigenvalue, evr = _pca_replica(vecs)
    rows = q_embedding_pca_power(spark, SF).collect()
    assert len(rows) == EMB_DIM
    for r in rows:
        assert r["mean_v"] == mu[r["dim"]]
        assert r["loading"] == v[r["dim"]]
        assert r["eigenvalue"] == eigenvalue
        assert r["explained_variance_ratio"] == evr
    # sanity: unit-norm loading, positive eigenvalue, evr in (0, 1]
    norm = math.sqrt(sum(r["loading"] ** 2 for r in rows))
    assert abs(norm - 1.0) < 5e-3  # loadings are round-6 quantized
    assert eigenvalue > 0
    assert 0 < evr <= 1


def test_pca_recovers_dominant_direction(spark):
    # crafted anisotropic corpus: variance concentrated in dim 1 —
    # the operator must put nearly all loading mass there and report a
    # near-1 explained-variance ratio.
    rows = []
    for k in range(40):
        vec = [((k * 31 + d) % 5 - 2) * 0.001 for d in range(EMB_DIM)]
        vec[0] = float((k % 7) - 3) * 2.0
        rows.append((k, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in pca_power_frame(df).collect()}
    assert abs(out[1]["loading"]) > 0.99
    assert out[1]["explained_variance_ratio"] > 0.95
    # all rows replicate the same scalar eigenvalue
    assert len({r["eigenvalue"] for r in out.values()}) == 1


# ------------------------------------------------- context budget plan

def _toks(text: str) -> int:
    return len([w for w in re.split(TOKEN_SPLIT, text.lower()) if w != ""])


def test_context_budget_replica_on_corpus(spark):
    turns = pq.read_table(
        TRANSCRIPTS_PQ, columns=["conv_id", "turn_idx", "text"]
    ).to_pylist()
    by_conv = defaultdict(list)
    for t in turns:
        if t["text"] is not None:
            by_conv[t["conv_id"]].append(
                (t["turn_idx"], _toks(t["text"]) + CTX_TURN_OVERHEAD)
            )
    want = {}
    for cid, ts in by_conv.items():
        ts.sort(key=lambda p: -p[0])
        cum = 0
        fit_idx, fit_tok = [], 0
        for idx, y in ts:
            cum += y
            if cum <= CTX_BUDGET_TOKENS:
                fit_idx.append(idx)
                fit_tok += y
        total = sum(y for _, y in ts)
        want[cid] = (
            len(ts), total, len(fit_idx), fit_tok,
            min(fit_idx) if fit_idx else None, total > CTX_BUDGET_TOKENS,
        )
    rows = q_context_budget_plan(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (
            r["n_turns"], r["total_tokens"], r["n_turns_fit"],
            r["tokens_fit"], r["first_kept_turn_idx"], r["truncated"],
        ) == want[r["conv_id"]]


def test_context_budget_crafted(spark):
    df = spark.createDataFrame(
        [
            # c1: suffix 317 fits (turns 1-3), turn 0 pushes past budget
            ("c1", 0, "w " * 600),
            ("c1", 1, "x " * 300),
            ("c1", 2, "a b c"),
            ("c1", 3, "d e"),
            # c2: exactly at the budget — fits, not truncated
            ("c2", 0, "t " * (CTX_BUDGET_TOKENS - CTX_TURN_OVERHEAD)),
            # c3: NULL turn contributes nothing
            ("c3", 0, "hello world"),
            ("c3", 1, None),
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["conv_id"]: r for r in context_budget_frame(df).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["total_tokens"]) == (4, 921)
    assert (c1["n_turns_fit"], c1["tokens_fit"]) == (3, 317)
    assert c1["first_kept_turn_idx"] == 1 and c1["truncated"]
    c2 = out["c2"]
    assert c2["total_tokens"] == CTX_BUDGET_TOKENS
    assert c2["n_turns_fit"] == 1 and not c2["truncated"]
    c3 = out["c3"]
    assert (c3["n_turns"], c3["total_tokens"]) == (1, 2 + CTX_TURN_OVERHEAD)
    assert c3["first_kept_turn_idx"] == 0 and not c3["truncated"]


# --------------------------------------------- truncation artifact scan

def _trunc_replica(text: str) -> tuple:
    t = re.sub(r"[ \t\r\n\f]+$", "", text)
    low = text.lower()
    n_open = text.count("(")
    n_close = text.count(")")
    odd_dq = text.count('"') % 2 == 1
    readmore = any(m in low for m in READMORE_MARKERS)
    ends_alnum = re.search(r"[A-Za-z0-9]$", t) is not None
    ends_ellipsis = t.endswith("...") or t.endswith("…")
    unclosed = n_open - n_close
    suspect = ends_ellipsis or readmore or (ends_alnum and unclosed > 0)
    return (
        len(t), ends_alnum, ends_ellipsis, unclosed, odd_dq, readmore, suspect
    )


def test_truncation_replica_on_corpus(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    want = {d["doc_id"]: _trunc_replica(d["text"]) for d in docs}
    rows = q_truncation_artifact_detect(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (
            r["n_chars_trimmed"], r["ends_alnum"], r["ends_ellipsis"],
            r["unclosed_paren"], r["odd_dquotes"], r["readmore_hit"],
            r["truncation_suspect"],
        ) == want[r["doc_id"]]


def test_truncation_crafted(spark):
    cases = [
        (0, "Complete sentence.", False),
        (1, "Cut off mid senten", False),          # alnum end alone: no
        (2, "He said (this is important", True),   # alnum end + unclosed (
        (3, "Story continues...   ", True),        # trailing ws trimmed
        (4, "Ends with unicode…", True),
        (5, "Click to Read More below.", True),
        (6, 'She said "hello.', False),            # odd quotes: signal only
        (7, "Balanced (parens) end mid wor", False),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in truncation_frame(df).collect()}
    for i, text, suspect in cases:
        assert out[i]["truncation_suspect"] == suspect, (i, text)
    assert out[3]["n_chars_trimmed"] == len("Story continues...")
    assert out[6]["odd_dquotes"] and not out[6]["truncation_suspect"]
    assert out[2]["unclosed_paren"] == 1
