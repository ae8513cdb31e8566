"""Single-document extraction entry point with the status contract used by
the goldens, the Arrow kernel, and the pipeline.

Mirrors the harness semantics (test/test-readability.js:271-280 plus
generate-testcase.js): JSDOMParser errorState → unusable document; a missing
documentElement → constructor throw; a null parse() → no usable article.
"""

from __future__ import annotations

import sys

from .dom import JSDOMParser, ParseFatal
from .readability import NoDocumentError, Readability, TooManyElemsError

RESULT_FIELDS = (
    "title", "byline", "dir", "content", "text_content", "length",
    "excerpt", "site_name",
)

_JS_KEY = {
    "title": "title", "byline": "byline", "dir": "dir", "content": "content",
    "text_content": "textContent", "length": "length", "excerpt": "excerpt",
    "site_name": "siteName",
}


def _ensure_recursion_headroom() -> None:
    # The parser/serializer recurse with DOM depth; htmltidy'd fixture pages
    # nest a few hundred levels, real pages can go deeper.
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
        # Each document allocates 10^4-10^5 cyclically-linked DOM nodes;
        # default gen0 thresholds make the cyclic GC rescan them constantly
        # (~35% of kernel wall time).  Raise thresholds once per worker.
        import gc

        gc.set_threshold(200_000, 100, 100)


def extract_one(html: str, url: str = "http://fakehost/test/page.html",
                opts: dict | None = None) -> dict:
    """Run the full extraction on one HTML string.

    Returns ``{"status": ..., **result-fields}`` where status is one of
    ok / parse_error / no_document / null_result / too_large / error.
    """
    _ensure_recursion_headroom()
    out: dict = dict.fromkeys(RESULT_FIELDS)
    out["status"] = "error"
    if opts is None:
        opts = {"classesToPreserve": ["caption"]}

    parser = JSDOMParser()
    try:
        doc = parser.parse(html, url)
    except (ParseFatal, RecursionError) as exc:
        out["status"] = "parse_error"
        out["error"] = str(exc)[:500]
        return out
    if parser.error_state:
        out["status"] = "parse_error"
        out["error"] = parser.error_state[:500]
        return out
    return _extract_from_doc(doc, opts, out)


def extract_one_gated(html: str, url: str = "http://fakehost/test/page.html",
                      opts: dict | None = None) -> dict | None:
    """Readerable-gated extraction with a SINGLE parse: returns None when
    the document fails the isProbablyReaderable pre-check (or the parse
    itself fails — exactly the rows the two-pass gate kernel dropped), else
    the same dict extract_one returns, reusing the one parsed DOM.

    isProbablyReaderable is read-only on the DOM, and parsing is
    deterministic, so reuse is output-identical to gate-then-reparse."""
    _ensure_recursion_headroom()
    from .readerable import is_probably_readerable

    if opts is None:
        opts = {"classesToPreserve": ["caption"]}
    parser = JSDOMParser()
    try:
        doc = parser.parse(html, url)
    except (ParseFatal, RecursionError):
        return None
    if parser.error_state:
        return None
    if not is_probably_readerable(doc):
        return None
    out: dict = dict.fromkeys(RESULT_FIELDS)
    out["status"] = "error"
    return _extract_from_doc(doc, opts, out)


def _extract_from_doc(doc, opts: dict, out: dict) -> dict:
    try:
        reader = Readability(doc, opts)
    except NoDocumentError as exc:
        out["status"] = "no_document"
        out["error"] = str(exc)
        return out

    try:
        result = reader.parse()
    except TooManyElemsError as exc:
        out["status"] = "too_large"
        out["error"] = str(exc)
        return out
    except Exception as exc:  # mirrors an uncaught JS throw in the harness
        out["status"] = "error"
        out["error"] = f"{type(exc).__name__}: {exc}"[:500]
        return out

    if result is None:
        out["status"] = "null_result"
        return out
    out["status"] = "ok"
    for k in RESULT_FIELDS:
        out[k] = result[_JS_KEY[k]]
    out["metrics"] = reader.metrics
    # For span derivation (pipeline-only; avoids re-parsing `content`).
    out["paragraph_texts"] = result.get("paragraphTexts", [])
    return out
