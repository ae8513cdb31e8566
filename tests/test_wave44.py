"""Wave 44: Flesch readability scores + Luhn credit-card scan + toxicity
word-list triage.

Independent evidence beyond the DuckDB oracles: pure-Python replays of
each metric over the real sf0.001 documents corpus, a known-card Luhn
vector set, and crafted corpora pinning boundary semantics (sentence
clamp, run-length windows, word boundaries)."""

import re

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    TOXICITY_PER_1K_FLAG,
    TOXICITY_TERMS,
    TOKEN_SPLIT,
    pii_luhn_frame,
    q_pii_luhn_scan,
    q_readability_scores,
    q_toxicity_wordlist_scan,
    readability_frame,
    toxicity_frame,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ readability

def _py_readability(text: str) -> dict:
    words = re.findall(r"[a-z]+", text.lower())
    n_words = len(words)
    n_sents = len(re.findall(r"[.!?]+", text))
    n_syll = sum(
        max(1, len(re.findall(r"[aeiouy]+", w))) for w in words
    )
    out = {"n_words": n_words, "n_sentences": n_sents, "n_syllables": n_syll}
    if n_words == 0:
        out.update(
            words_per_sentence=0.0, syllables_per_word=0.0,
            flesch_reading_ease=0.0, fk_grade=0.0,
        )
        return out
    wps = round(n_words / max(1, n_sents), 6)
    spw = round(n_syll / n_words, 6)
    out.update(
        words_per_sentence=wps,
        syllables_per_word=spw,
        flesch_reading_ease=round(206.835 - 1.015 * wps - 84.6 * spw, 6),
        fk_grade=round(0.39 * wps + 11.8 * spw - 15.59, 6),
    )
    return out


def test_readability_replica_on_corpus(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    got = {
        r["doc_id"]: r.asDict()
        for r in q_readability_scores(spark, SF).collect()
    }
    assert len(got) == len(docs)
    for d in docs:
        want = _py_readability(d["text"])
        r = got[d["doc_id"]]
        for k, v in want.items():
            assert r[k] == v, (d["doc_id"], k, r[k], v)


def test_readability_edges(spark):
    df = spark.createDataFrame(
        [
            (1, ""),                        # no words -> all zeros
            (2, "no sentence punctuation"), # S clamps to 1
            (3, "Cat sat. Dog ran!"),       # monosyllables, 2 sentences
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in readability_frame(df).collect()}
    assert got[1]["flesch_reading_ease"] == 0.0
    assert got[2]["n_sentences"] == 0
    assert got[2]["words_per_sentence"] == 3.0   # clamped divisor
    r = got[3]
    assert r["n_words"] == 4 and r["n_sentences"] == 2
    assert r["n_syllables"] == 4
    assert r["words_per_sentence"] == 2.0
    assert r["syllables_per_word"] == 1.0
    # simple prose scores "easy": monosyllabic 2-word sentences ~ 120.2
    assert r["flesch_reading_ease"] == round(
        206.835 - 1.015 * 2.0 - 84.6 * 1.0, 6
    )


# ------------------------------------------------------------------ luhn

def _py_luhn_ok(s: str) -> bool:
    total = 0
    n = len(s)
    for i, ch in enumerate(s, start=1):
        d = int(ch)
        if (n - i) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _py_luhn_scan(text: str) -> dict:
    runs = re.findall(r"[0-9][0-9 -]*[0-9]", text)
    digits = [re.sub(r"[^0-9]", "", r) for r in runs]
    cands = [d for d in digits if 13 <= len(d) <= 19]
    valid = [d for d in cands if _py_luhn_ok(d)]
    return {
        "n_candidates": len(cands),
        "n_luhn_valid": len(valid),
        "has_cc_suspect": len(valid) > 0,
    }


def test_luhn_known_vectors():
    # classic test PANs
    assert _py_luhn_ok("4111111111111111")
    assert _py_luhn_ok("5500005555555559")
    assert _py_luhn_ok("378282246310005")       # 15-digit Amex
    assert not _py_luhn_ok("4111111111111112")


def test_pii_luhn_replica_on_corpus(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    got = {
        r["doc_id"]: r.asDict() for r in q_pii_luhn_scan(spark, SF).collect()
    }
    assert len(got) == len(docs)
    for d in docs:
        want = _py_luhn_scan(d["text"])
        r = got[d["doc_id"]]
        for k, v in want.items():
            assert r[k] == v, (d["doc_id"], k, r[k], v)


def test_pii_luhn_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "card 4111111111111111 on file"),          # valid, plain
            (2, "card 4111 1111 1111 1111 on file"),       # valid, spaced
            (3, "card 4111-1111-1111-1112 expired"),       # luhn-invalid
            (4, "call 555-867-5309 ext 12"),               # too short
            (5, "id 41111111111111111111 overflow"),       # 20-digit run
            (6, "amex 378282246310005 works"),             # 15-digit valid
            (7, "no numbers at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in pii_luhn_frame(df).collect()}
    assert got[1]["n_luhn_valid"] == 1 and got[1]["has_cc_suspect"]
    assert got[2]["n_luhn_valid"] == 1       # separators stripped
    assert got[3]["n_candidates"] == 1 and got[3]["n_luhn_valid"] == 0
    assert got[4]["n_candidates"] == 0       # short runs never candidates
    assert got[5]["n_candidates"] == 0       # maximal 20-digit run excluded
    assert got[6]["n_luhn_valid"] == 1
    assert got[7]["n_candidates"] == 0 and not got[7]["has_cc_suspect"]


# -------------------------------------------------------------- toxicity

def test_toxicity_replica_on_corpus(spark):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    got = {
        r["doc_id"]: r.asDict()
        for r in q_toxicity_wordlist_scan(spark, SF).collect()
    }
    assert len(got) == len(docs)
    for d in docs:
        low = d["text"].lower()
        per = [len(re.findall(rf"\b{t}\b", low)) for t in TOXICITY_TERMS]
        hits = sum(per)
        n_tok = len([w for w in re.split(TOKEN_SPLIT, low) if w != ""])
        r = got[d["doc_id"]]
        assert r["tox_hits"] == hits
        assert r["tox_terms_hit"] == sum(1 for c in per if c > 0)
        assert r["n_tokens"] == n_tok
        rate = round(hits * 1000 / n_tok, 6) if n_tok else 0.0
        assert r["tox_per_1k_tokens"] == rate
        assert r["tox_flagged"] == (
            n_tok > 0 and rate >= TOXICITY_PER_1K_FLAG
        )


def test_toxicity_boundaries_and_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "I hate this stupid broken thing, what an idiot move."),
            (2, "whitehateboard skillfull hateful stupidity"),  # no \b hits
            (3, " ".join(["fine"] * 2000) + " hate"),  # 1/2001 -> unflagged
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in toxicity_frame(df).collect()}
    assert got[1]["tox_hits"] == 3 and got[1]["tox_terms_hit"] == 3
    assert got[1]["tox_flagged"]                 # 3 hits / 10 tokens
    assert got[2]["tox_hits"] == 0               # substrings don't count
    assert got[3]["tox_hits"] == 1 and not got[3]["tox_flagged"]
    assert got[4]["tox_hits"] == 0 and not got[4]["tox_flagged"]
