"""Wave 68: robots.txt frontier politeness, truncated-digest birthday
audit, confident-learning label-noise flags.

Independent evidence beyond the DuckDB oracles: a pure-Python REP
replica (group cut, rule extraction, longest-match with Google tie
semantics) adjudicating every real frontier URL; a hashlib birthday
replica with exact expectation arithmetic; and an integer-micro-unit
threshold replica recomputed from the flag table itself."""

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    COLLISION_PREFIX_LENS,
    ROBOTS_TXT_FIXTURE,
    q_digest_collision_audit,
    q_label_noise_flags,
    q_robots_txt_frontier_filter,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- robots.txt


def _robots_rules(txt):
    m = re.search(
        r"(?is)user-agent:[ \t]*\*[ \t]*\n(.*?)(?:user-agent:|$)", txt
    )
    if not m:
        return []
    return [
        (t.lower(), p)
        for t, p in re.findall(
            r"(?im)^[ \t]*(allow|disallow):[ \t]*([^ \t\r\n#]*)", m.group(1)
        )
        if p
    ]


def _adjudicate(host, path, rules_by_host):
    cands = [
        (t, p)
        for t, p in rules_by_host.get(host, [])
        if path.startswith(p)
    ]
    if not cands:
        return ("allowed", None, None)
    # longest prefix wins; allow beats disallow on ties; path asc last
    t, p = sorted(cands, key=lambda r: (-len(r[1]), r[0], r[1]))[0]
    return ("disallowed" if t == "disallow" else "allowed", t, p)


def test_robots_txt_replica_real_frontier(spark):
    rules_by_host = {h: _robots_rules(t) for h, t in ROBOTS_TXT_FIXTURE}
    rows = q_robots_txt_frontier_filter(spark, SF).collect()
    assert len(rows) > 1000
    for r in rows:
        path = re.sub(r"^[a-z]+://[^/]*", "", r["url"])
        assert (
            r["verdict"],
            r["rule_type"],
            r["rule_path"],
        ) == _adjudicate(r["host"], path, rules_by_host), r["url"]
    got = Counter((r["rule_type"], r["rule_path"]) for r in rows)
    # every fixture branch fires on real URLs:
    assert got[("disallow", "/")] > 0           # youtube: block-all
    assert got[("disallow", "/web/2013")] > 0   # archive 2013 snapshot
    assert got[("disallow", "/en/1966/")] > 0   # teara group rule
    assert got[("allow", "/en/1966/trade")] > 0  # longer Allow wins
    assert got[("allow", "/album/photo/")] > 0  # pixnet Allow override
    # unlisted hosts default to allowed with NULL rule
    listed = {h for h, _ in ROBOTS_TXT_FIXTURE}
    unlisted = [r for r in rows if r["host"] not in listed]
    assert unlisted and all(
        r["verdict"] == "allowed" and r["rule_type"] is None
        for r in unlisted
    )
    # the non-star 'archiver' group's Disallow: / must NOT leak: teara
    # URLs outside /en/1966/ and /private stay allowed
    teara_ok = [
        r
        for r in rows
        if r["host"] == "www.teara.govt.nz" and r["verdict"] == "allowed"
    ]
    assert teara_ok


def test_robots_txt_tie_and_group_parsing():
    # Google tie semantics: equal-length Allow beats Disallow
    rules = {"h": [("disallow", "/i/"), ("allow", "/i/")]}
    assert _adjudicate("h", "/i/x", rules)[0] == "allowed"
    # parser: only the star group is honored, comments/empties dropped
    got = _robots_rules(ROBOTS_TXT_FIXTURE[0][1])
    assert got == [
        ("disallow", "/en/1966/"),
        ("allow", "/en/1966/trade"),
        ("disallow", "/private"),
    ]


# --------------------------------------------------- digest collisions


def test_digest_collision_replica(spark):
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    digests = [hashlib.md5(r["text"].encode()).hexdigest() for r in docs]
    n = len(digests)
    rows = {r["prefix_hex"]: r for r in
            q_digest_collision_audit(spark, SF).collect()}
    assert set(rows) == set(COLLISION_PREFIX_LENS)
    for k in COLLISION_PREFIX_LENS:
        r = rows[k]
        nd = len({d[:k] for d in digests})
        assert r["bits"] == 4 * k
        assert r["n_docs"] == n
        assert r["n_distinct"] == nd
        assert r["n_collisions"] == n - nd
        assert r["expected_collisions"] == round(
            n * (n - 1) / (2.0 * 16.0**k), 6
        )
    # pigeonhole: 500 docs into 256 2-hex buckets MUST collide; full
    # 32-hex digests must not
    assert rows[2]["n_collisions"] >= n - 256
    assert rows[32]["n_collisions"] == 0


# --------------------------------------------------- label noise


def test_label_noise_replica(spark):
    rows = q_label_noise_flags(spark, SF).collect()
    s1 = [r["s_mu"] for r in rows if r["label"] == 1]
    s0 = [r["s_mu"] for r in rows if r["label"] == 0]
    t1 = (2 * sum(s1) + len(s1)) // (2 * len(s1))
    t0 = (2 * sum(s0) + len(s0)) // (2 * len(s0))
    for r in rows:
        assert (r["t1_mu"], r["t0_mu"]) == (t1, t0)
        assert r["s_mu"] == round(r["score"] * 1_000_000)
        if r["label"] == 0 and r["s_mu"] >= t1:
            want = "noise_to_1"
        elif r["label"] == 1 and r["s_mu"] <= t0:
            want = "noise_to_0"
        else:
            want = "ok"
        assert r["flag"] == want
    # the confident-joint off-diagonal is non-empty on the real corpus:
    # rule-gate labels and the linear model disagree confidently somewhere
    flags = Counter(r["flag"] for r in rows)
    assert flags["noise_to_1"] + flags["noise_to_0"] > 0
    assert flags["ok"] > 0
    # flags partition the corpus
    assert sum(flags.values()) == len(rows) == 500
