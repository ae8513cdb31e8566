"""Wave 25: SQ8 scalar quantization, ANN recall self-eval, classifier
calibration bins.

Independent evidence beyond the DuckDB oracles: a numpy replica of the
full SQ8 encode over the real sf embeddings (code-exact), a crafted
degenerate-dimension corpus through a temp parquet, recall recomputed
from the two top-k operators' own outputs, and calibration bins
reconciled against the scored frame they summarize.
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from readability_1_spark.queries import (
    EMB_DIM,
    SQ_LEVELS,
    q_ann_cosine_topk,
    q_ann_lsh_topk,
    q_ann_recall_eval,
    q_doc_quality_classifier,
    q_embedding_scalar_quantize,
    q_quality_calibration_bins,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# embedding_scalar_quantize
# ---------------------------------------------------------------------------

def test_scalar_quantize_matches_numpy_replica(spark):
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_pylist()
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mn = mat.min(axis=0)
    mx = mat.max(axis=0)

    out = q_embedding_scalar_quantize(spark, SF).collect()
    assert len(out) == len(vec_ids) * EMB_DIM

    by_vec = {v: i for i, v in enumerate(vec_ids)}
    for r in out:
        i, j = by_vec[r.vec_id], r.dim
        v = mat[i, j]
        if mx[j] == mn[j]:
            expect = 0
        else:
            expect = int(
                min(SQ_LEVELS, math.floor((v - mn[j]) * SQ_LEVELS / (mx[j] - mn[j])))
            )
        assert r.code == expect, (r.vec_id, j, r.code, expect)
        # reconstruction error is bounded by one quantization step
        step = (mx[j] - mn[j]) / SQ_LEVELS
        assert r.abs_err <= step + 1e-6  # abs_err is round-6 on the engine side
        assert abs(r.recon - (mn[j] + r.code * (mx[j] - mn[j]) / SQ_LEVELS)) < 1e-6


def test_scalar_quantize_degenerate_and_extremes(spark, tmp_path):
    # dim 0 is constant (degenerate range); dim 1 spans [-2, 2] exactly.
    vecs = [
        [7.0, -2.0] + [0.0] * (EMB_DIM - 2),
        [7.0, 0.0] + [0.0] * (EMB_DIM - 2),
        [7.0, 2.0] + [0.0] * (EMB_DIM - 2),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    rows = {
        (r.vec_id, r.dim): r
        for r in q_embedding_scalar_quantize(spark, str(tmp_path)).collect()
    }
    # degenerate dimension: every code 0, zero reconstruction error
    for v in range(3):
        r = rows[(v, 0)]
        assert r.code == 0 and r.abs_err == 0.0 and r.recon == 7.0
    # corpus minimum -> code 0; corpus maximum -> clamped top code
    assert rows[(0, 1)].code == 0 and rows[(0, 1)].abs_err == 0.0
    assert rows[(2, 1)].code in (SQ_LEVELS - 1, SQ_LEVELS)
    # midpoint lands in the middle of the range
    assert abs(rows[(1, 1)].code - SQ_LEVELS / 2) <= 1


# ---------------------------------------------------------------------------
# ann_recall_eval
# ---------------------------------------------------------------------------

def test_ann_recall_eval_matches_recomputation(spark):
    exact = {}
    for r in q_ann_cosine_topk(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in q_ann_lsh_topk(spark, SF).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)

    out = {r.query_id: r for r in q_ann_recall_eval(spark, SF).collect()}
    assert set(out) == set(exact)
    for qid, ex in exact.items():
        r = out[qid]
        hits = len(ex & approx.get(qid, set()))
        assert r.n_exact == len(ex) == 10
        assert r.n_hits == hits
        assert abs(r.recall_at_10 - round(hits / len(ex), 6)) < 1e-9
        assert 0.0 <= r.recall_at_10 <= 1.0


# ---------------------------------------------------------------------------
# quality_calibration_bins
# ---------------------------------------------------------------------------

def test_calibration_bins_reconcile_with_scored_frame(spark):
    scored = q_doc_quality_classifier(spark, SF).collect()
    out = {r.bin: r for r in q_quality_calibration_bins(spark, SF).collect()}

    # python replica of the fixed-width binning
    bins = {}
    for r in scored:
        b = min(9, math.floor(r.score * 10))
        n, p, s = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, p + r.label, s + round(r.score * 1000000))
    assert set(out) == set(bins)
    for b, (n, p, s) in bins.items():
        r = out[b]
        assert r.n_docs == n and r.n_pos == p
        assert abs(r.pos_rate - round(p / n, 6)) < 1e-9
        assert abs(r.mean_score - round(s / n / 1000000.0, 6)) < 2e-6
        # the bin's mean score lies inside the bin's score range
        assert b / 10 - 1e-6 <= r.mean_score <= (b + 1) / 10 + 1e-6
    # full coverage: bins partition the scored corpus
    assert sum(r.n_docs for r in out.values()) == len(scored)
    assert sum(r.n_pos for r in out.values()) == sum(r.label for r in scored)
