"""Python ports of the reference's DOM/parser unit tests
(/root/reference/test/test-jsdomparser.js)."""

from readability_1_spark.dom import JSDOMParser

BASE = (
    '<html><body><p>Some text and <a class="someclass" href="#">a link</a></p>'
    '<div id="foo">With a <script>With &lt; fancy " characters in it because'
    "</script> that is fun.<span>And another node to make it harder</span></div>"
    "<form><input type=\"text\"/><input type=\"number\"/>Here's a form</form>"
    "</body></html>"
)


def parse(html, url=None):
    return JSDOMParser().parse(html, url)


def test_basic_hierarchy_and_inner_html():
    doc = parse(BASE, "http://fakehost/")
    assert len(doc.childNodes) == 1
    assert len(doc.getElementsByTagName("*")) == 10
    foo = doc.getElementById("foo")
    assert foo.parentNode.localName == "body"
    assert doc.body is foo.parentNode
    assert doc.body.parentNode is doc.documentElement
    assert len(doc.body.childNodes) == 3
    p = doc.getElementsByTagName("p")[0]
    assert p.innerHTML == 'Some text and <a class="someclass" href="#">a link</a>'
    script = doc.getElementsByTagName("script")[0]
    assert script.innerHTML == 'With &lt; fancy " characters in it because'
    assert script.textContent == 'With < fancy " characters in it because'


def test_remove_append_child():
    doc = parse(BASE, "http://fakehost/")
    foo = doc.getElementById("foo")
    before, after = foo.previousSibling, foo.nextSibling
    removed = foo.parentNode.removeChild(foo)
    assert removed is foo
    assert foo.parentNode is None
    assert foo.previousSibling is None and foo.nextSibling is None
    assert foo.previousElementSibling is None and foo.nextElementSibling is None
    assert before.nextSibling is after
    assert after.previousSibling is before
    assert before.nextElementSibling is after
    assert len(doc.body.childNodes) == 2
    doc.body.appendChild(foo)
    assert len(doc.body.childNodes) == 3
    assert after.nextSibling is foo
    assert foo.previousSibling is after


def test_replace_child_all_positions():
    doc = parse(BASE, "http://fakehost/")
    parent = doc.getElementsByTagName("div")[0]
    p = doc.createElement("p")
    p.setAttribute("id", "my-replaced-kid")
    child_count = len(parent.childNodes)
    child_el_count = len(parent.children)
    for i in range(len(parent.childNodes)):
        replaced = parent.childNodes[i]
        was_element = replaced.node_type == 1
        old_next, old_prev = replaced.nextSibling, replaced.previousSibling
        old_next_el = replaced.nextElementSibling
        old_prev_el = replaced.previousElementSibling
        parent.replaceChild(p, replaced)
        assert p.nextSibling is old_next
        assert p.previousSibling is old_prev
        assert p.parentNode is parent
        assert replaced.parentNode is None
        assert parent.childNodes[i] is p
        assert p in parent.children
        assert len(parent.childNodes) == child_count
        assert len(parent.children) == (child_el_count if was_element else child_el_count + 1)
        parent.replaceChild(replaced, p)
        assert replaced.nextSibling is old_next
        assert replaced.previousSibling is old_prev
        assert replaced.nextElementSibling is old_next_el
        assert replaced.previousElementSibling is old_prev_el


def test_html_escaping_roundtrip():
    base_str = (
        "<p>Hello, everyone &amp; all their friends, &lt;this&gt; is a &quot; "
        "test with &apos; quotes.</p>"
    )
    doc = parse(base_str)
    p = doc.getElementsByTagName("p")[0]
    txt = p.firstChild
    assert "<p>" + p.innerHTML + "</p>" == base_str
    assert "<p>" + txt.innerHTML + "</p>" == base_str
    decoded = "Hello, everyone & all their friends, <this> is a \" test with ' quotes."
    assert p.textContent == decoded
    assert txt.textContent == decoded
    # Updates via textContent re-encode with the minimal entity set only.
    txt.textContent = txt.textContent + " "
    txt.textContent = txt.textContent.strip()
    expected = base_str.replace("&quot;", '"').replace("&apos;", "'")
    assert "<p>" + txt.innerHTML + "</p>" == expected
    assert "<p>" + p.innerHTML + "</p>" == expected


def test_decimal_hex_escapes():
    doc = parse("<p>&#32;&#x20;</p>")
    assert doc.getElementsByTagName("p")[0].textContent == "  "


def test_script_qmark_comment_stripped():
    doc = parse('<script><?Silly test <img src="test"></script>')
    assert doc.firstChild.tagName == "SCRIPT"
    assert doc.firstChild.textContent == ""
    assert len(doc.firstChild.childNodes) == 0


def test_script_bang_comment_stripped():
    doc = parse('<script><!--Silly test > <script src="foo.js"></script>--></script>')
    assert doc.firstChild.tagName == "SCRIPT"
    assert doc.firstChild.textContent == ""
    assert len(doc.firstChild.childNodes) == 0


def test_script_entity_escaped_content():
    doc = parse("<script>&lt;div>Hello, I'm not really in a &lt;/div></script>")
    assert doc.firstChild.textContent == "<div>Hello, I'm not really in a </div>"
    assert len(doc.firstChild.childNodes) == 1
    doc = parse('<script>&lt;script src="foo.js">&lt;/script></script>')
    assert doc.firstChild.textContent == '<script src="foo.js"></script>'
    doc = parse("<script>var x = '&lt;script>Hi&lt;' + '/script>';</script>")
    assert doc.firstChild.textContent == "var x = '<script>Hi<' + '/script>';"


def test_script_with_raw_lt_sets_error_state():
    # SURVEY §2.9.2: no raw-text mode — a literal '<' inside a script derails
    # the parse.
    parser = JSDOMParser()
    parser.parse("<html><body><script>if(x<4){}</script></body></html>")
    assert parser.error_state != ""


def test_tag_case():
    doc = parse("<DIV><svG><clippath/></svG></DIV>")
    assert doc.firstChild.tagName == "DIV"
    assert doc.firstChild.localName == "div"
    assert doc.firstChild.firstChild.localName == "svg"
    assert doc.firstChild.firstChild.firstChild.localName == "clippath"


def test_delayed_closing_of_void_tag():
    doc = parse("<div><input><p>I'm in an input</p></input></div>")
    assert doc.firstChild.localName == "div"
    assert len(doc.firstChild.childNodes) == 1
    assert doc.firstChild.firstChild.localName == "input"
    assert doc.firstChild.firstChild.firstChild.localName == "p"


def test_base_uri():
    def check(base, expected):
        html = "<html><head><base href='" + base + "'></base></head><body/></html>"
        doc = parse(html, "http://fakehost/some/dir/")
        assert doc.baseURI == expected, base

    check("relative/path", "http://fakehost/some/dir/relative/path")
    check("/path", "http://fakehost/path")
    check("http://absolute/", "http://absolute/")
    check("//absolute/path", "http://absolute/path")


def test_namespace_prefix_stripping():
    doc = parse(
        "<a0:html><a0:body><a0:DIV><a0:svG><a0:clippath/></a0:svG></a0:DIV>"
        "</a0:body></a0:html>"
    )
    div = doc.getElementsByTagName("div")[0]
    assert div.tagName == "DIV" and div.localName == "div"
    assert div.firstChild.localName == "svg"
    assert doc.documentElement is doc.firstChild
    assert doc.body is doc.documentElement.firstChild


def test_first_title_wins_and_root_pruning():
    doc = parse("<p>x</p><html><head><title> T1 </title><title>T2</title></head></html>")
    assert doc.title == "T1"
    # Root-level non-<html> children pruned when a documentElement exists.
    assert len(doc.childNodes) == 1
    assert doc.childNodes[0] is doc.documentElement


def test_duplicate_attributes_last_wins():
    doc = parse('<div id="a" id="b">x</div>')
    el = doc.firstChild
    assert el.getAttribute("id") == "b"
    # The serializer prints both, like the reference.
    assert el.innerHTML == "x"
    outer = []
    from readability_1_spark.dom import _serialize_children

    _serialize_children(doc, outer)
    assert "".join(outer) == '<div id="a" id="b">x</div>'


def test_discarded_subtree_root_has_detached_semantics():
    # Regression: a mismatched-ancestor document (<div> around <body> with the
    # div's closing tag missing) discards the div subtree in the unwind loop.
    # The fast-path constructor defers parentNode/previousSibling writes to the
    # append block, which never runs for a discarded root — those attributes
    # must still read None (JS undefined in the reference), not raise
    # AttributeError, because doc.body can live inside the discarded subtree
    # and direct Readability(parse(html)) use walks its ancestors.
    from readability_1_spark.readability import Readability

    html = (
        "<html><head><title>Mismatched ancestor</title></head><div><body>"
        + "".join(
            f"<p>Paragraph {i} with some, commas, and enough length to score"
            " well in the readability algorithm, yes indeed it keeps going.</p>"
            for i in range(30)
        )
        + "</body></html>"
    )
    parser = JSDOMParser()
    doc = parser.parse(html, "http://fakehost/test/page.html")
    assert parser.error_state  # the pipeline still classifies this parse_error
    assert doc.body is not None
    div = doc.body.parentNode
    assert div.localName == "div"
    assert div.parentNode is None
    assert div.previousSibling is None
    # Direct API use must extract, not crash (verified byte-exact vs the
    # reference's ungated JSDOMParser+Readability path when this was fixed).
    article = Readability(doc).parse()
    assert article is not None
    assert article["title"] == "Mismatched ancestor"
    assert "Paragraph 0 with some, commas" in article["textContent"]
