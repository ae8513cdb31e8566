"""Cheap pre-classifier deciding whether a document is worth running the
full extraction on — /root/reference/Readability-readerable.js:46-90.

Used by the pipeline as an optional vectorized gate between the HTML filter
and the extraction kernel.  Note the reference evaluates this under jsdom
(test/generate-testcase.js:129-135); we evaluate it on our JSDOMParser-
equivalent DOM, which parses the same fixture corpus identically.
"""

from __future__ import annotations

from .dom import Document, Element
from .jsquirks import js_trim
from .regexps import OK_MAYBE_ITS_A_CANDIDATE, UNLIKELY_CANDIDATES


def _is_node_visible(node: Element) -> bool:
    # Readability-readerable.js:33-39
    display = node.style_get("display")
    c_n = node.className
    return (
        display != "none"
        and not node.hasAttribute("hidden")
        and (
            not node.hasAttribute("aria-hidden")
            or node.getAttribute("aria-hidden") != "true"
            or (bool(c_n) and "fallback-image" in c_n)
        )
    )


def _matches_li_p(node: Element) -> bool:
    # `node.matches("li p")` — a <p> with an <li> ancestor.
    if node.localName != "p":
        return False
    anc = node.parentNode
    while anc is not None:
        if anc.localName == "li":
            return True
        anc = anc.parentNode
    return False


def is_probably_readerable(doc: Document, is_visible=None) -> bool:
    # Readability-readerable.js:46-90
    if is_visible is None:
        is_visible = _is_node_visible

    # querySelectorAll("p, pre") and querySelectorAll("div > br") in ONE
    # pre-order walk (each list keeps its document order, identical to two
    # separate getElementsByTagName("*") passes).
    nodes: list[Element] = []
    br_parents: list[Element] = []

    def _walk(children):
        for el in children:
            ln = el.localName
            if ln == "p" or ln == "pre":
                nodes.append(el)
            elif (
                ln == "br"
                and el.parentNode is not None
                and el.parentNode.localName == "div"
            ):
                br_parents.append(el.parentNode)
            kids = el.children
            if kids:
                _walk(kids)

    _walk(doc.children)
    if br_parents:
        seen = dict.fromkeys(nodes)
        for parent in br_parents:
            seen.setdefault(parent, None)
        nodes = list(seen)

    score = 0.0
    for node in nodes:
        if not is_visible(node):
            continue
        match_string = node.className + " " + node.id
        if UNLIKELY_CANDIDATES.search(match_string) and not OK_MAYBE_ITS_A_CANDIDATE.search(
            match_string
        ):
            continue
        if _matches_li_p(node):
            continue
        text_content_length = len(js_trim(node.textContent))
        if text_content_length < 140:
            continue
        score += (text_content_length - 140) ** 0.5
        if score > 20:
            return True
    return False
