"""Wave 61: from-scratch PDF writer + text extractor (pdf.py) and the
two PDF round-trip queries.

Independent evidence beyond the DuckDB oracles: handcrafted PDFs (built
byte-by-byte in this file, NOT with encode_pdf) covering literal-string
escapes, TJ kerning arrays, the ' and " text operators, out-of-order
object placement, comments, nested page trees, multi-stream pages,
wrong /Length recovery, odd-digit hex strings — plus every degrade
class and a distributed pdf_features run."""

import zlib

from readability_1_spark.pdf import (
    decode_pdf,
    encode_pdf,
    extract_text,
    page_texts,
    paginate,
    pdf_corpus,
    pdf_features,
)

# ----------------------------------------------------- handcrafted PDFs


def _assemble(objs: dict[int, bytes], order=None, header=b"%PDF-1.4\n"):
    """Assemble object bodies into a PDF with a correct xref/trailer."""
    out = bytearray(header)
    offs = {}
    for n in order or sorted(objs):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    xref = len(out)
    n_obj = max(objs) + 1
    out += f"xref\n0 {n_obj}\n".encode() + b"0000000000 65535 f \n"
    for n in range(1, n_obj):
        out += f"{offs.get(n, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _stream_obj(body: bytes, extra: str = "") -> bytes:
    return (
        f"<< /Length {len(body)}{extra} >>".encode()
        + b"\nstream\n"
        + body
        + b"\nendstream"
    )


def test_handcrafted_operators_and_escapes():
    body = rb"""% content comment
BT /F1 10 Tf
12 0 Td (Hello \(PDF\) \101\102C\n) Tj
0 -12 Td [(a) -120 (b) 55 (c)] TJ
14 TL
(line via quote) '
1 2 (line via dquote) "
ET"""
    pdf = _assemble(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: _stream_obj(body),
        },
        order=[4, 3, 2, 1],  # physical order must not matter
        header=b"%PDF-1.4\n% file comment\n",
    )
    dec = decode_pdf(pdf)
    assert dec["status"] == "ok" and dec["n_pages"] == 1
    raw = extract_text(dec["spans"], "raw")
    assert raw == "Hello (PDF) ABC\nabcline via quoteline via dquote"
    lay = extract_text(dec["spans"], "layout")
    assert lay == "Hello (PDF) ABC\n\nabc\nline via quote\nline via dquote"


def test_hex_strings_odd_padding_and_whitespace():
    # <48 65 6C 6C 6> -> "Hell" + chr(0x60)  (odd digit pads with 0)
    body = b"BT (x) Tj <48 65 6C 6C 6> Tj ET"
    pdf = _assemble(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(body),
        }
    )
    dec = decode_pdf(pdf)
    assert extract_text(dec["spans"], "raw") == "xHell" + chr(0x60)


def test_nested_page_tree_and_multi_stream_page():
    # split MID-TEXT-OBJECT (BT in one stream, ET in the next): streams
    # concatenate before interpretation.  Per spec the split may only
    # fall on a token boundary, never inside a string.
    c1 = _stream_obj(b"BT (first-) Tj")
    c2 = _stream_obj(b"(second) Tj ET")
    pdf = _assemble(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [5 0 R 6 0 R] /Count 2 >>",
            5: b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents [7 0 R 8 0 R] >>",
            6: b"<< /Type /Page /Contents 9 0 R >>",
            7: c1,
            8: c2,
            9: _stream_obj(b"BT (page2) Tj ET"),
        }
    )
    dec = decode_pdf(pdf)
    assert dec["status"] == "ok" and dec["n_pages"] == 2
    assert page_texts(dec["spans"], 2) == ["first-second", "page2"]


def test_wrong_length_recovers_by_endstream_scan():
    body = b"BT (recovered) Tj ET"
    obj4 = (
        b"<< /Length 9999 >>\nstream\n" + body + b"\nendstream"
    )
    pdf = _assemble(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: obj4,
        }
    )
    dec = decode_pdf(pdf)
    assert dec["status"] == "ok"
    assert extract_text(dec["spans"], "raw") == "recovered"


def test_flate_stream_and_binary_safety():
    text = "compressed ☂ text with ) and ( and \\ inside"
    raw = ("BT <" + text.encode("utf-8").hex() + "> Tj ET").encode()
    body = zlib.compress(raw, 9)
    pdf = _assemble(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(body, extra=" /Filter /FlateDecode"),
        }
    )
    dec = decode_pdf(pdf)
    assert extract_text(dec["spans"], "raw") == text


def test_degrade_paths():
    assert decode_pdf(b"")["status"] == "not_pdf"
    assert decode_pdf(b"GIF89a....")["status"] == "not_pdf"
    assert decode_pdf(b"%PDF-1.4\nnothing here")["status"] == "parse_error"
    ok = encode_pdf([["x"]])
    enc = ok.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    assert decode_pdf(enc)["status"] == "unsupported"
    lzw = ok.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    assert decode_pdf(lzw)["status"] == "unsupported"
    # corrupt flate payload -> parse_error, never an exception
    broken = bytearray(ok)
    at = ok.find(b"stream\n") + len(b"stream\n")
    broken[at : at + 4] = b"\x00\x00\x00\x00"
    assert decode_pdf(bytes(broken))["status"] == "parse_error"


# ------------------------------------------------------- writer round trip


def test_roundtrip_unicode_and_structure():
    text = ("spark filter join " * 40) + "é漢字🙂 \\ ( ) tricky\nline"
    for compress in (True, False):
        payload = encode_pdf(paginate(text), compress=compress)
        dec = decode_pdf(payload)
        assert dec["status"] == "ok"
        assert extract_text(dec["spans"], "raw") == text
        assert dec["n_pages"] == len(paginate(text))
        # page reconstruction matches the pagination contract
        assert page_texts(dec["spans"], dec["n_pages"]) == [
            "".join(lines) for lines in paginate(text)
        ]


def test_paginate_contract():
    assert paginate("") == [[""]]
    assert paginate("a" * 400) == [[("a" * 80)] * 5]
    got = paginate("a" * 401)
    assert len(got) == 2 and got[1] == ["a"]
    # spans = ceil(len/80) because 400 is a multiple of 80
    import math

    for n in (1, 79, 80, 81, 399, 400, 401, 558):
        spans = sum(len(p) for p in paginate("x" * n))
        assert spans == math.ceil(n / 80)


# ------------------------------------------------------- Spark surface


def test_pdf_features_distributed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = pdf_features(pdf_corpus(docs)).collect()
    assert len(feats) == docs.count()
    by_id = {r["doc_id"]: r for r in feats}
    for row in docs.select("doc_id", "text").limit(20).collect():
        got = by_id[row["doc_id"]]
        assert got["status"] == "ok"
        assert got["n_chars"] == len(row["text"])
        import hashlib

        assert (
            got["text_digest"]
            == hashlib.md5(row["text"].encode("utf-8")).hexdigest()
        )


def test_pdf_extract_plan_no_exchange(spark):
    """The chained encode→decode kernels must stay a narrow map: no
    Exchange anywhere in the plan."""
    from readability_1_spark.queries import q_pdf_text_extract

    plan = (
        q_pdf_text_extract(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 2
