"""Differential fuzzer: random/adversarial HTML through BOTH engines — the
reference via node (tools/ref_extract.mjs) and this engine — asserting
status + all result fields match.  Any divergence is appended to
tests/goldens/fuzz_regressions.json so pytest keeps covering it offline.

Usage: python3 tools/fuzz_vs_reference.py [n_cases] [seed]
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RUNNER = os.path.join(REPO, "tools", "ref_extract.mjs")

TAGS = ["div", "p", "span", "a", "br", "img", "table", "tr", "td", "ul", "li",
        "h1", "h2", "section", "pre", "blockquote", "font", "em", "b",
        "script", "noscript", "style", "meta", "title", "base", "figure",
        "input", "form", "iframe", "svg", "foo:bar", "DIV", "Custom-El"]
ATTRS = ["class", "id", "href", "src", "style", "hidden", "aria-hidden",
         "rel", "itemprop", "dir", "rowspan", "colspan", "datatable", "role",
         "summary", "data-src", "srcset", "content", "name", "property"]
ATTR_VALUES = [
    "comment", "article", "main-content", "sidebar share", "hid", "x y z",
    "display:none", "display: none;", "true", "false", "author", "byline",
    "#frag", "/rel/path", "http://other.example/x?q=1#f", "javascript:void(0)",
    "//cdn.example/img.jpg", "a.jpg 2x", "lazy-load.png", "presentation",
    "0", "3", "-2", "zz", "&amp;x", "&#65;&#x41;", 'with "quote', "with 'apo",
    "日本語", "", " spaced ", "a\tb", "fallback-image x",
]
WORDS = ("the quick brown fox, jumps over the lazy dog, and keeps running. "
         "Content sentences are important, with commas, and periods. ").split()
ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&#65;", "&#x41;",
            "&#xzz;", "&#9999;", "&bogus;", "&", "&&amp;;"]
SNIPPETS = ["<!-- comment -->", "<!-- unterminated", "<![CDATA[raw < text]]>",
            "<![cdata[lower]]>", "<!doctype html>", "<?php echo 1 ?>",
            "</orphan>", "<>", "< div>", "<div/>", "<img/>", "<br>"]


def rand_text(rng: random.Random) -> str:
    n = rng.randint(1, 30)
    parts = [rng.choice(WORDS) for _ in range(n)]
    if rng.random() < 0.3:
        parts.insert(rng.randrange(len(parts)), rng.choice(ENTITIES))
    return " ".join(parts)


def rand_element(rng: random.Random, depth: int) -> str:
    tag = rng.choice(TAGS)
    attrs = []
    for _ in range(rng.randint(0, 3)):
        name = rng.choice(ATTRS)
        if rng.random() < 0.15:
            attrs.append(f" {name}")  # valueless attribute (quirk path)
        else:
            val = rng.choice(ATTR_VALUES)
            quote = "'" if rng.random() < 0.3 else '"'
            attrs.append(f" {name}={quote}{val}{quote}")
    open_tag = f"<{tag}{''.join(attrs)}>"
    if rng.random() < 0.12:
        return f"<{tag}{''.join(attrs)}/>"
    body = rand_content(rng, depth + 1)
    close = tag if rng.random() < 0.9 else rng.choice(TAGS)
    if rng.random() < 0.08:
        return open_tag + body  # unclosed
    return f"{open_tag}{body}</{close}>"


def rand_content(rng: random.Random, depth: int) -> str:
    if depth > 5:
        return rand_text(rng)
    out = []
    for _ in range(rng.randint(0, 4)):
        r = rng.random()
        if r < 0.45:
            out.append(rand_text(rng))
        elif r < 0.85:
            out.append(rand_element(rng, depth))
        else:
            out.append(rng.choice(SNIPPETS))
    return "".join(out)


_FIXTURE_SRCS: list[str] | None = None


def _fixture_sources() -> list[str]:
    global _FIXTURE_SRCS
    if _FIXTURE_SRCS is None:
        fix = "/root/reference/test/test-pages"
        _FIXTURE_SRCS = []
        for slug in sorted(os.listdir(fix)):
            with open(os.path.join(fix, slug, "source.html")) as f:
                _FIXTURE_SRCS.append(f.read().strip())
    return _FIXTURE_SRCS


def mutate_fixture(rng: random.Random) -> str:
    """A real fixture page with 1-4 random corruptions: slice deletion,
    slice duplication, snippet insertion, char flips — exercises recovery
    paths on realistic markup."""
    src = rng.choice(_fixture_sources())
    for _ in range(rng.randint(1, 4)):
        kind = rng.random()
        n = len(src)
        if n < 100:
            break
        i = rng.randrange(n - 50)
        if kind < 0.3:  # delete a slice
            j = min(n, i + rng.randint(1, 2000))
            src = src[:i] + src[j:]
        elif kind < 0.55:  # duplicate a slice
            j = min(n, i + rng.randint(1, 500))
            src = src[:j] + src[i:j] + src[j:]
        elif kind < 0.8:  # insert an adversarial snippet
            src = src[:i] + rng.choice(SNIPPETS + ENTITIES) + src[i:]
        else:  # flip a character to a structural one
            src = src[:i] + rng.choice("<>\"'&/=") + src[i + 1 :]
    return src


def rand_document(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.1:
        return rand_content(rng, 0)  # fragment, no <html>
    head = ""
    if rng.random() < 0.8:
        title = rand_text(rng)[:80]
        metas = "".join(
            f'<meta name="{rng.choice(["description", "author", "og:title"])}" '
            f'content="{rand_text(rng)[:40]}">'
            for _ in range(rng.randint(0, 2))
        )
        base = (
            f'<base href="{rng.choice(ATTR_VALUES)}">' if rng.random() < 0.2 else ""
        )
        head = f"<head>{base}<title>{title}</title>{metas}</head>"
    body = f"<body>{rand_content(rng, 0)}</body>" if rng.random() < 0.9 else ""
    return f"<html>{head}{body}</html>"


def rand_opts(rng: random.Random) -> dict:
    """Random point on the reference's full option surface
    (Readability.js:113-118 maxElemsToParse/nbTopCandidates/charThreshold/
    classesToPreserve, :293 keepClasses).  charThreshold=0 and absent keys
    exercise the JS `||`-falsy default paths on both engines."""
    opts: dict = {}
    if rng.random() < 0.8:
        opts["charThreshold"] = rng.choice([0, 1, 25, 140, 250, 500, 1000])
    if rng.random() < 0.7:
        opts["nbTopCandidates"] = rng.choice([1, 2, 3, 5, 10])
    if rng.random() < 0.5:
        opts["keepClasses"] = rng.random() < 0.5
    if rng.random() < 0.6:
        opts["classesToPreserve"] = rng.sample(
            ["caption", "comment", "article", "hid", "page", "x"],
            rng.randint(0, 3),
        )
    if rng.random() < 0.25:
        opts["maxElemsToParse"] = rng.choice([0, 50, 500, 5000])
    return opts


def run_reference(cases: list[str]) -> list[dict]:
    proc = subprocess.run(
        ["node", REF_RUNNER],
        input=json.dumps(cases),
        capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.splitlines()[-1])


def compare_one(html: str, ref: dict, mine: dict) -> list[str]:
    diffs = []
    if mine["status"] != ref["status"]:
        return [f"status: {mine['status']} vs {ref['status']}"]
    if ref["status"] == "ok":
        for field in ("title", "byline", "dir", "content", "text_content",
                      "length", "excerpt", "site_name"):
            if mine[field] != ref["result"][field]:
                diffs.append(field)
    return diffs


def main() -> None:
    from readability_1_spark import extract_one

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    mode = sys.argv[3] if len(sys.argv) > 3 else "random"
    rng = random.Random(seed)
    if mode == "options":
        # Option-surface fuzz (round-4 verdict ask #8): random opts per doc
        # against the node reference, over both random documents and
        # mutated real fixtures.
        cases = [
            (mutate_fixture(rng) if rng.random() < 0.5 else rand_document(rng))
            for _ in range(n)
        ]
        opts_list = [rand_opts(rng) for _ in range(n)]
        mine_all = [
            extract_one(html, opts=dict(opts)) if opts else extract_one(html, opts={})
            for html, opts in zip(cases, opts_list)
        ]
    else:
        gen = mutate_fixture if mode == "mutate" else rand_document
        cases = [gen(rng) for _ in range(n)]
        opts_list = None
        mine_all = [extract_one(html) for html in cases]
    # The reference's discardTo never terminates on unterminated comments
    # (JSDOMParser.js:1027-1032 jumps BACKWARD on not-found): our engine
    # detects non-advancing input and returns parse_error instead.  Such
    # inputs would hang/abort node, so they are excluded from comparison.
    comparable = [
        i for i, m in enumerate(mine_all)
        if not (m["status"] == "parse_error" and "stuck" in (m.get("error") or ""))
    ]
    skipped = n - len(comparable)
    if opts_list is not None:
        refs = run_reference(
            [{"html": cases[i], "opts": opts_list[i]} for i in comparable]
        )
    else:
        refs = run_reference([cases[i] for i in comparable])
    failures = []
    for idx, ref in zip(comparable, refs):
        diffs = compare_one(cases[idx], ref, mine_all[idx])
        if diffs:
            failures.append(
                {"html": cases[idx], "diffs": diffs, "ref_status": ref["status"],
                 **({"opts": opts_list[idx]} if opts_list is not None else {})}
            )
    print(
        f"{len(comparable) - len(failures)}/{len(comparable)} match "
        f"(seed={seed}, {skipped} ref-nonterminating skipped)"
    )
    for f in failures[:5]:
        print("DIVERGENCE:", f["diffs"], "html:", f["html"][:300])
    if failures:
        reg_path = os.path.join(REPO, "tests", "goldens", "fuzz_regressions.json")
        existing = []
        if os.path.exists(reg_path):
            with open(reg_path) as fh:
                existing = json.load(fh)
        known = {e["html"] for e in existing}
        for f in failures:
            if f["html"] not in known:
                existing.append(f)
        with open(reg_path, "w") as fh:
            json.dump(existing, fh)
        sys.exit(1)


if __name__ == "__main__":
    main()
