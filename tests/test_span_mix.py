"""Wave 21: C4 three-sentence-span dedup + temperature source mixing.

Independent evidence beyond the DuckDB oracles: a pure-Python (re module)
replica of the span dedup over the committed goldens, and an exact
integer replica of the sqrt-mass temperature weights from the raw
parquet.
"""

import math
import re

from readability_1_spark.queries import (
    GOLDENS_PQ,
    SENT_RE,
    SPAN_SENTS,
    TOKEN_SPLIT,
    q_dedup_sentence_spans,
    q_mix_temperature_weights,
)

SF = "/root/testdata/sf0.001"


def test_sentence_span_dedup_matches_pure_python_replica(spark):
    import pyarrow.parquet as pq

    rows = [
        r for r in pq.read_table(GOLDENS_PQ).to_pylist()
        if r["status"] == "ok"
    ]
    # deterministic global order = (conv_id, turn_idx, span_idx)
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    seen = set()
    expected = {}
    rx = re.compile(SENT_RE)
    for r in rows:
        sents = [
            re.sub(r"^ +| +$", "", re.sub(r"\s+", " ", s))
            for s in rx.findall(r["text_content"])
        ]
        sents = [s for s in sents if s]
        spans = [
            " ".join(sents[i : i + SPAN_SENTS])
            for i in range(len(sents) - SPAN_SENTS + 1)
        ]
        owned = dups = 0
        for sp in spans:  # span_idx order inside the turn
            if sp in seen:
                dups += 1
            else:
                seen.add(sp)
                owned += 1
        expected[(r["conv_id"], r["turn_idx"])] = (
            len(sents), len(spans), owned, dups,
        )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_sentences"], r["n_spans"], r["n_owned_spans"],
            r["n_dup_spans"],
        )
        for r in q_dedup_sentence_spans(spark, SF).collect()
    }
    assert got == expected
    # the corpus exercises the operator: real duplicate spans exist
    # (fixture page variants share sentences), and short docs produce rows
    assert sum(v[3] for v in expected.values()) > 0
    assert any(v[1] == 0 for v in expected.values())


def test_mix_temperature_weights_exact_replica(spark):
    import pyarrow.parquet as pq

    tok = re.compile(TOKEN_SPLIT)
    n_tokens = {}
    for r in pq.read_table(SF + "/documents.parquet").to_pylist():
        n = sum(1 for t in tok.split(r["text"].lower()) if t)
        n_tokens[r["source"]] = n_tokens.get(r["source"], 0) + n
    w_int = {
        s: int(round(math.sqrt(float(n)) * 1_000_000))
        for s, n in n_tokens.items()
    }
    tot_toks, tot_w = sum(n_tokens.values()), sum(w_int.values())
    expected = {
        s: (
            n_tokens[s],
            round(n_tokens[s] / tot_toks, 6),
            round(w_int[s] / tot_w, 6),
            round((w_int[s] / tot_w) / (n_tokens[s] / tot_toks), 6),
        )
        for s in n_tokens
    }
    got = {
        r["source"]: (
            r["n_tokens"], r["raw_share"], r["temp_weight"], r["boost"]
        )
        for r in q_mix_temperature_weights(spark, SF).collect()
    }
    assert got == expected
    # flattening property: the smallest source is boosted, the largest
    # damped, and temperature weights still sum to ~1
    smallest = min(n_tokens, key=n_tokens.get)
    largest = max(n_tokens, key=n_tokens.get)
    assert got[smallest][3] > 1.0 > got[largest][3]
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-4
