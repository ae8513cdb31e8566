"""Link-graph family (wave 19): outlink extraction, host indegree,
integer-exact PageRank, URL canonicalization.

The DuckDB oracles (tools/verify_oracle.py) already attest cross-engine
equality on the real corpus; these tests add INDEPENDENT evidence — a
pure-Python (re module) replica of the link stats over the committed
goldens, a hand-replicated integer PageRank on a crafted graph, and
crafted URL cases run through BOTH engines' canonicalizers.
"""

import re

import pytest

from readability_1_spark.queries import (
    BASE_HOST,
    GOLDENS_PQ,
    HREF_RE,
    PAGERANK_SCALE,
    _canon_url_expr,
    _sql_canon_url,
    pagerank_frame,
    q_extract_outlinks,
    q_outlink_host_pagerank,
)

SF = "/root/testdata/sf0.001"


def _py_hrefs(content: str) -> list[str]:
    raw = re.findall(r'<a[ \t][^>]*href="([^"]*)"', content)
    out = []
    for x in raw:
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
            ("&amp;", "&"),
        ):
            x = x.replace(ent, ch)
        if x:
            out.append(x)
    return out


def _py_scheme(x: str) -> str:
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", x)
    return m.group(1).lower() if m else ""


def _py_host(x: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", x)
    if not m:
        return ""
    hp = re.sub(r"^[^@]*@", "", m.group(1), count=1)
    return re.sub(r":[0-9]+$", "", hp, count=1).lower()


def test_extract_outlinks_matches_pure_python_replica(spark):
    """Per-turn link stats == a re-module replica over the committed
    goldens (third implementation, independent of both engines)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(GOLDENS_PQ).to_pylist()
    expected = {}
    for row in tbl:
        if row["status"] != "ok":
            continue
        hrefs = _py_hrefs(row["content"])
        webs = [x for x in hrefs if _py_scheme(x) in ("http", "https")]
        hosts = [_py_host(x) for x in webs]
        internal = sum(1 for h in hosts if h == BASE_HOST)
        expected[(row["conv_id"], row["turn_idx"])] = (
            len(hrefs),
            len(webs),
            internal,
            len(webs) - internal,
            len({h for h in hosts if h != BASE_HOST}),
            len(hrefs) - len(webs),
        )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_links"], r["n_web"], r["n_internal"], r["n_external"],
            r["n_ext_hosts"], r["n_nonweb"],
        )
        for r in (x.asDict() for x in q_extract_outlinks(spark, SF).collect())
    }
    assert got == expected
    # the corpus exercises the operator: real links, both classes present
    assert sum(v[0] for v in expected.values()) > 3000
    assert any(v[3] > 0 for v in expected.values())  # external links exist
    assert any(v[2] > 0 for v in expected.values())  # internal links exist


def _py_pagerank(nodes, edges, iters=10, scale=PAGERANK_SCALE):
    """Pure-Python integer replica of pagerank_frame's contract."""
    n = len(nodes)
    outdeg = {h: 0 for h in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    base = (15 * scale) // (100 * n)
    pr = {h: scale // n for h in nodes}
    for _ in range(iters):
        dang = sum(pr[h] for h in nodes if outdeg[h] == 0)
        contrib = {h: 0 for h in nodes}
        for s, d in edges:
            contrib[d] += pr[s] // outdeg[s]
        pr = {
            h: base + (85 * (contrib[h] + dang // n)) // 100 for h in nodes
        }
    return pr


def test_pagerank_frame_matches_integer_replica(spark):
    """Crafted 5-node graph (hub + chain + dangling + isolated) through
    pagerank_frame == the pure-Python integer replica, value-exact."""
    from pyspark.sql import functions as F

    nodes = ["hub", "a", "b", "c", "iso"]
    # a,b,c all cite hub; hub cites a; c -> b chain; iso has no edges
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
             ("c", "b")]
    outdeg = {h: 0 for h in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    nd = spark.createDataFrame(
        [(h, outdeg[h]) for h in nodes], "host string, outdeg long"
    ).localCheckpoint(eager=True)
    edf = spark.createDataFrame(
        edges, "src string, dst string"
    ).localCheckpoint(eager=True)
    got = {
        r["host"]: r["pr"]
        for r in pagerank_frame(nd, edf, len(nodes), iters=10).collect()
    }
    exp = _py_pagerank(nodes, edges, iters=10)
    assert got == exp
    # structure sanity: the co-cited hub dominates; isolated node stays at
    # the dangling-redistribution floor below every cited node
    assert got["hub"] == max(got.values())
    assert got["iso"] == min(got.values())
    # integer floor losses only: total mass stays within 1% of scale
    assert 0.99 * PAGERANK_SCALE < sum(got.values()) <= PAGERANK_SCALE


def test_pagerank_query_runs_on_real_corpus(spark):
    """End-to-end over the kernel's real outlinks: every external host gets
    a positive rank and co-citation hubs outrank the dangling floor."""
    rows = q_outlink_host_pagerank(spark, SF).collect()
    assert len(rows) > 100  # the fixture corpus links 200+ external hosts
    assert all(r["pr_units"] > 0 for r in rows)
    ranked = sorted(rows, key=lambda r: -r["pr_units"])
    assert ranked[0]["outdeg"] > 0  # the top host is co-cited, not dangling
    assert sum(r["pr_units"] for r in rows) <= PAGERANK_SCALE


CANON_CASES = [
    # (raw, expected)
    ("http://Example.COM/Path?q=1#frag", "http://example.com/Path?q=1"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com", "https://example.com/"),
    (
        "https://a.com/p?utm_source=x&utm_medium=y&id=3",
        "https://a.com/p?id=3",
    ),
    ("https://a.com/p?utm_source=x", "https://a.com/p"),
    ("https://a.com/p?id=3&utm_source=x", "https://a.com/p?id=3"),
    ("http://a.com?x=1", "http://a.com/?x=1"),
    ("http://User@b.com/z#a#b", "http://user@b.com/z"),
]


def test_canon_url_crafted_cases_both_engines(spark):
    """Crafted canonicalization cases (the corpus has few ports/utm links,
    so the contract's edges need explicit coverage) — Spark expression and
    DuckDB twin both produce the expected string."""
    import duckdb

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(x,) for x, _ in CANON_CASES], "u string")
    got_spark = [
        r["c"] for r in
        df.select(_canon_url_expr(F.col("u")).alias("c")).collect()
    ]
    assert got_spark == [e for _, e in CANON_CASES]

    con = duckdb.connect()
    vals = ", ".join(f"('{x}')" for x, _ in CANON_CASES)
    got_duck = [
        r[0] for r in con.execute(
            f"SELECT {_sql_canon_url('x')} FROM (VALUES {vals}) t(x)"
        ).fetchall()
    ]
    assert got_duck == [e for _, e in CANON_CASES]


def test_anchor_text_terms_matches_pure_python_replica(spark):
    """Top anchor terms per host == a re-module replica over the committed
    goldens (independent of both engines)."""
    import pyarrow.parquet as pq

    from readability_1_spark.queries import (
        ANCHOR_TOPK,
        STOPWORDS,
        q_anchor_text_terms,
    )

    tbl = pq.read_table(GOLDENS_PQ).to_pylist()
    counts = {}
    ent = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
           ("&amp;", "&"))
    for row in tbl:
        if row["status"] != "ok":
            continue
        for href, atext in re.findall(
            r'<a[ \t][^>]*href="([^"]*)"[^>]*>([^<]+)</a>', row["content"]
        ):
            for e, c in ent:
                href = href.replace(e, c)
                atext = atext.replace(e, c)
            if _py_scheme(href) not in ("http", "https"):
                continue
            host = _py_host(href)
            if host in (BASE_HOST, ""):
                continue
            for t in re.split(r"[^a-z0-9]+", atext.lower()):
                if t and t not in STOPWORDS:
                    counts[(host, t)] = counts.get((host, t), 0) + 1
    expected = set()
    by_host = {}
    for (host, t), n in counts.items():
        by_host.setdefault(host, []).append((t, n))
    for host, terms in by_host.items():
        terms.sort(key=lambda x: (-x[1], x[0]))
        for rk, (t, n) in enumerate(terms[:ANCHOR_TOPK], start=1):
            expected.add((host, rk, t, n))
    got = {
        (r["host"], r["rk"], r["term"], r["n"])
        for r in q_anchor_text_terms(spark, SF).collect()
    }
    assert got == expected
    assert len(got) > 100  # the corpus exercises the operator


def test_crawl_frontier_is_canonical_and_rank_ordered(spark):
    from readability_1_spark.queries import (
        FRONTIER_TOPK,
        q_crawl_frontier_topk,
    )

    rows = q_crawl_frontier_topk(spark, SF).collect()
    assert len(rows) == FRONTIER_TOPK
    prs = [r["pr_units"] for r in rows]
    assert prs == sorted(prs, reverse=True)  # priority order held
    for r in rows:
        u = r["url"]
        assert "#" not in u and "utm_" not in u  # canonicalized
        assert _py_host(u) == r["host"] and r["host"] != BASE_HOST
        assert not re.search(r"^[a-zA-Z]+://[^/?#]*[A-Z]", u)  # host lowered
    # the frontier's floor pr is still a real rank value (> 0)
    assert prs[-1] > 0
