"""Wave 23: prefix-filter exact similarity join + edit-distance verifier.

Independent evidence beyond the DuckDB oracles (which share the prefix /
band constructions): a BRUTE-FORCE all-pairs Jaccard ground truth over the
real corpus — proving the prefix filter's recall-1.0 claim against an
implementation that has no prefix at all — and a pure-Python Levenshtein
DP replica, exercised both on the real corpus output and on a crafted
temp-parquet corpus that pins every branch (exact copy, one-word edit,
over-band same-length edit, length-prefilter drop, non-candidate).
"""

import re

import pyarrow as pa
import pyarrow.parquet as pq

from readability_1_spark.queries import (
    EDIT_MAX,
    PREFIX_JACC_DEN,
    PREFIX_JACC_NUM,
    TOKEN_SPLIT,
    q_dedup_editdistance_pairs,
    q_dedup_prefixfilter_pairs,
)

SF = "/root/testdata/sf0.001"


def _shingle_set(text):
    toks = [t for t in re.split(TOKEN_SPLIT, text.lower()) if t]
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }


def _levenshtein(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_prefixfilter_pairs_match_allpairs_bruteforce(spark):
    """The ground truth here is quadratic and prefix-free: every one of the
    C(500,2) doc pairs scored directly on its shingle sets."""
    docs = {
        r["doc_id"]: _shingle_set(r["text"])
        for r in pq.read_table(SF + "/documents.parquet").to_pylist()
    }
    thresh = PREFIX_JACC_NUM / PREFIX_JACC_DEN
    ids = sorted(docs)
    expected = {}
    for i, da in enumerate(ids):
        sa = docs[da]
        if not sa:
            continue
        for db in ids[i + 1 :]:
            sb = docs[db]
            if not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = round(inter / (len(sa) + len(sb) - inter), 6)
            if j >= thresh:
                expected[(da, db)] = (inter, len(sa), len(sb), j)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_inter"], r["sz_a"], r["sz_b"], r["jaccard"]
        )
        for r in q_dedup_prefixfilter_pairs(spark, SF).collect()
    }
    assert got == expected
    # the corpus actually exercises the operator
    assert len(expected) > 0


def test_editdistance_pairs_match_pure_python_dp(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(SF + "/documents.parquet").to_pylist()
    }
    rows = q_dedup_editdistance_pairs(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        ta, tb = texts[r["doc_a"]], texts[r["doc_b"]]
        lev = _levenshtein(ta, tb)
        assert r["len_a"] == len(ta) and r["len_b"] == len(tb)
        assert abs(r["len_a"] - r["len_b"]) <= EDIT_MAX
        assert r["lev"] == lev <= EDIT_MAX
        assert r["edit_sim"] == round(1 - lev / max(len(ta), len(tb)), 6)


def test_editdistance_pairs_crafted_branches(spark, tmp_path):
    base = " ".join(f"word{i:03d}" for i in range(120))
    long_a = "a" * 70
    long_b = "b" * 70
    texts = {
        # exact copy: identical band signatures, lev 0
        "d-base": base,
        "d-copy": base,
        # one trailing word substituted: near-exact dup, small lev
        "d-onesub": base[: -len("word119")] + "zzzzzzz",
        # same-length 70-char word swap mid-doc: still an LSH candidate
        # (3 of ~188 shingles change) but lev 70 > EDIT_MAX — the banded
        # levenshtein(-1) branch must drop it
        "d-midA": base + " " + long_a + " tail one two three",
        "d-midB": base + " " + long_b + " tail one two three",
        # shares all shingles with d-base but 100 chars longer: the
        # |len_a-len_b| <= EDIT_MAX prefilter must drop it before any DP
        "d-longtail": base + " " + "x" * 99,
        # disjoint vocabulary: never an LSH candidate
        "d-far": " ".join(f"other{i:03d}" for i in range(120)),
    }
    pq.write_table(
        pa.table(
            {"doc_id": list(texts.keys()), "text": list(texts.values())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["lev"], r["edit_sim"])
        for r in q_dedup_editdistance_pairs(spark, str(tmp_path)).collect()
    }
    lev_onesub = _levenshtein(base, texts["d-onesub"])
    assert 0 < lev_onesub <= EDIT_MAX
    assert got[("d-base", "d-copy")] == (0, 1.0)
    assert got[("d-base", "d-onesub")] == (
        lev_onesub,
        round(1 - lev_onesub / len(base), 6),
    )
    assert got[("d-copy", "d-onesub")] == got[("d-base", "d-onesub")]
    # over-band, length-prefilter, and non-candidate docs pair with nothing
    flat = {d for pair in got for d in pair}
    assert _levenshtein(texts["d-midA"], texts["d-midB"]) > EDIT_MAX
    assert "d-midA" not in flat and "d-midB" not in flat
    assert "d-longtail" not in flat
    assert "d-far" not in flat


def test_prefixfilter_threshold_branches(spark, tmp_path):
    """One pair deterministically ABOVE the Jaccard threshold (a document
    and its 3-extra-token extension: 38 of 41 shingles shared, J ≈ 0.927)
    must be the only surviving pair; a pair sharing only half its token
    stream (18 of 58 shingles, J ≈ 0.310 < 0.5) must be verified away even
    though its shared shingles put it in the candidate set."""
    core = [f"c{i:02d}" for i in range(40)]
    texts = {
        "p-core": " ".join(core),
        "p-ext": " ".join(core + ["d0", "d1", "d2"]),
        "p-half": " ".join([f"h{i:02d}" for i in range(20)] + core[:20]),
    }
    pq.write_table(
        pa.table(
            {"doc_id": list(texts.keys()), "text": list(texts.values())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    sets = {d: _shingle_set(t) for d, t in texts.items()}
    inter = len(sets["p-core"] & sets["p-ext"])
    union = len(sets["p-core"] | sets["p-ext"])
    j = round(inter / union, 6)
    assert j >= PREFIX_JACC_NUM / PREFIX_JACC_DEN
    # the rejected pair really is a candidate-shape pair (shares shingles)
    low = sets["p-core"] & sets["p-half"]
    assert low
    rows = q_dedup_prefixfilter_pairs(spark, str(tmp_path)).collect()
    assert [
        (r["doc_a"], r["doc_b"], r["n_inter"], r["jaccard"]) for r in rows
    ] == [("p-core", "p-ext", inter, j)]
