"""URL resolution parity: every (uri, base) pair occurring in the reference
fixture corpus, with expected values produced by node's WHATWG `URL`
(regenerate via the harvest snippet in tools/gen_goldens.mjs history)."""

import gzip
import json
import os

from readability_1_spark.whatwg_url import URLError, url_resolve

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def test_url_corpus_parity():
    with gzip.open(os.path.join(GOLDENS, "url_pairs.json.gz"), "rt") as f:
        data = json.load(f)
    assert len(data) > 13000
    bad = []
    for uri, base, expected in data:
        try:
            got = url_resolve(uri, base)
        except Exception:
            got = None
        if got != expected:
            bad.append((uri, base, got, expected))
    assert not bad, bad[:5]


def test_url_edge_semantics():
    # Probed directly against node's URL.
    assert url_resolve("", "http://a/b?q#f") == "http://a/b?q"
    assert url_resolve("#x", "http://a/b?q#f") == "http://a/b?q#x"
    assert url_resolve("?y", "http://a/b?q#f") == "http://a/b?y"
    assert url_resolve("http:foo", "http://a/dir/page") == "http://a/dir/foo"
    assert url_resolve("http:foo") == "http://foo/"
    assert url_resolve("//h/p", "https://a/b") == "https://h/p"
    assert url_resolve("a//b", "http://h/dir/page") == "http://h/dir/a//b"
    assert url_resolve("%2e/a", "http://h/dir/page") == "http://h/dir/a"
    assert url_resolve("..%2F..", "http://h/d1/d2/page") == "http://h/d1/d2/..%2F.."
    assert url_resolve("x/../../..", "http://h/d1/d2/page") == "http://h/"
    assert url_resolve("file:///C|/x") == "file:///C:/x"
    assert url_resolve("hTTp://H.Com:80/A?b#C") == "http://h.com/A?b#C"
    assert url_resolve("http://h:0081/x") == "http://h:81/x"
    assert url_resolve(" spa ce ", "http://h/d/p") == "http://h/d/spa%20ce"
    assert url_resolve("a?", "http://h/d/p?old") == "http://h/d/a?"
    assert url_resolve("p#", "http://h/d/x#old") == "http://h/d/p#"
    try:
        url_resolve("relative", None)
        raise AssertionError("should have raised")
    except URLError:
        pass
