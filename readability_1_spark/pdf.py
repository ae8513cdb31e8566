"""Minimal from-scratch PDF writer + text extractor (stdlib only).

The north rule's main-content extraction brief covers "PDF/layout parse"
alongside HTML: a 100 TB crawl's document columns carry PDFs next to
HTML, and the pipeline must pull their text through the same
binary-column + Arrow-batch plumbing the image/audio decoders use
(multimodal.py).  This module implements the subset that matters for
text mining, end-to-end and honestly:

- `encode_pdf(pages)` — a deterministic PDF 1.4 writer (catalog, page
  tree, one Flate-compressed content stream per page, xref table with
  correct byte offsets).  Text is emitted as hex strings of the UTF-8
  bytes, one Tm+Tj span per line, so ANY unicode text round-trips
  byte-exactly through the extractor.
- `decode_pdf(payload)` — a real structural parser: object scan,
  PDF-dict/array/name/ref tokenizer, page-tree walk in /Kids order
  (nested trees supported), per-page content-stream concatenation,
  FlateDecode, and a content-stream text interpreter covering the text
  operators a text extractor needs: BT/ET, Tm, Td, TD, TL, T*, Tf,
  Tj, TJ (kerning arrays), ' and ".  Literal strings decode the full
  escape set (\\n \\r \\t \\b \\f \\\\ \\( \\) \\ooo octal,
  line continuations); hex strings pad odd digits per spec.
- `extract_text(spans, mode)` — 'raw' concatenates spans in content
  order (exact round trip of the writer's chunked text); 'layout'
  rebuilds lines from the spans' y positions (descending) and joins
  same-line spans in x order — the layout-parse half of the brief.

Unsupported constructs degrade loudly, never silently: encrypted PDFs,
unknown stream filters, and object streams (/Type /ObjStm xref streams)
report status 'unsupported'; structurally broken files report
'parse_error'.  The Spark surface (`pdf_features`) is the same
mapInPandas contract as multimodal.media_features: binary column in,
typed feature rows out, Arrow-batched, no per-row Python outside the
kernel.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Iterator

import pandas as pd

# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------


def _content_stream(lines: list[str]) -> bytes:
    """One text span per line: absolute Tm positioning + hex-string Tj."""
    parts = ["BT", "/F1 12 Tf"]
    y = 720
    for line in lines:
        hexs = line.encode("utf-8").hex()
        parts.append(f"1 0 0 1 72 {y} Tm <{hexs}> Tj")
        y -= 14
    parts.append("ET")
    return "\n".join(parts).encode("ascii")


def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Deterministic minimal PDF 1.4: one content stream per page.

    `pages` is a list of pages, each a list of line strings (any
    unicode).  Round trip: decode_pdf + extract_text(mode='raw')
    concatenates the lines of each page back byte-exactly.
    """
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        cont_num = page_num + 1
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode()
        data = _content_stream(lines)
        if compress:
            body = zlib.compress(data, 6)
            head = f"<< /Length {len(body)} /Filter /FlateDecode >>"
        else:
            body = data
            head = f"<< /Length {len(body)} >>"
        objs[cont_num] = (
            head.encode() + b"\nstream\n" + body + b"\nendstream"
        )
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# --------------------------------------------------------------------------
# Object-level parsing
# --------------------------------------------------------------------------


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class PdfError(ValueError):
    pass


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for PDF object syntax (dicts, arrays, names, numbers,
    strings, refs).  Used for both object dictionaries and content
    streams."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to end of line
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def at_end(self) -> bool:
        self._skip_ws()
        return self.pos >= len(self.data)

    def _literal_string(self) -> bytes:
        # pos is at '('
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.pos < len(d)
                        and 0x30 <= d[self.pos] <= 0x37
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # unknown escape: spec says drop the backslash
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:  # )
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated literal string")

    def _hex_string(self) -> bytes:
        # pos is at '<' (and next char is not '<')
        d = self.data
        end = d.find(b">", self.pos)
        if end < 0:
            raise PdfError("unterminated hex string")
        hexs = re.sub(rb"[\x00\t\n\x0c\r ]", b"", d[self.pos + 1 : end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        try:
            return bytes.fromhex(hexs.decode("ascii"))
        except ValueError as exc:
            raise PdfError("bad hex string") from exc

    def _name(self) -> str:
        # pos at '/'
        d = self.data
        self.pos += 1
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        if b"#" in raw:
            raw = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                raw,
            )
        return raw.decode("latin-1")

    _NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

    def _number_or_ref(self):
        """A number; when it is a non-negative int followed by another
        int and the keyword R, fold the triple into ('ref', _Ref)."""
        m = self._NUM_RE.match(self.data, self.pos)
        self.pos = m.end()
        raw = m.group()
        if b"." in raw:
            return ("num", float(raw))
        num = int(raw)
        save = self.pos
        self._skip_ws()
        m2 = self._NUM_RE.match(self.data, self.pos)
        if num >= 0 and m2 and b"." not in m2.group():
            self.pos = m2.end()
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] == b"R" and (
                self.pos + 1 >= len(self.data)
                or self.data[self.pos + 1] in _WS + _DELIM
            ):
                self.pos += 1
                return ("ref", _Ref(num))
        self.pos = save
        return ("num", num)

    def next_token(self):
        """Returns ('str', bytes) | ('name', str) | ('num', float|int) |
        ('dict', dict) | ('arr', list) | ('ref', _Ref) | ('bool', b) |
        ('null', None) | ('op', str) | None at end.

        Dict values and array elements are UNWRAPPED python values
        (bytes for strings, str for names, _Ref for references)."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            return None
        c = d[self.pos]
        if c == 0x28:  # (
            return ("str", self._literal_string())
        if c == 0x3C:  # < or <<
            if d[self.pos : self.pos + 2] == b"<<":
                self.pos += 2
                out: dict[str, object] = {}
                while True:
                    self._skip_ws()
                    if d[self.pos : self.pos + 2] == b">>":
                        self.pos += 2
                        return ("dict", out)
                    key = self.next_token()
                    if key is None:
                        raise PdfError("unterminated dict")
                    if key[0] != "name":
                        raise PdfError(f"dict key is not a name: {key}")
                    val = self.next_token()
                    if val is None:
                        raise PdfError("unterminated dict value")
                    out[key[1]] = val[1]
            return ("str", self._hex_string())
        if c == 0x2F:  # /
            return ("name", self._name())
        if c == 0x5B:  # [
            self.pos += 1
            arr: list = []
            while True:
                self._skip_ws()
                if self.pos < len(d) and d[self.pos] == 0x5D:
                    self.pos += 1
                    return ("arr", arr)
                tok = self.next_token()
                if tok is None:
                    raise PdfError("unterminated array")
                arr.append(tok[1])
        if c in b"]>":  # stray close delimiter: skip
            self.pos += 1
            return self.next_token()
        if self._NUM_RE.match(d, self.pos):
            return self._number_or_ref()
        # operator / keyword
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        if self.pos == start:  # lone delimiter we don't understand
            self.pos += 1
            return self.next_token()
        word = d[start : self.pos].decode("latin-1")
        if word == "true":
            return ("bool", True)
        if word == "false":
            return ("bool", False)
        if word == "null":
            return ("null", None)
        return ("op", word)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _scan_objects(payload: bytes) -> dict[int, tuple[dict, bytes | None]]:
    """Scan for `N G obj ... endobj`, returning num -> (dict, stream).

    Offset-table-free scanning survives mild xref corruption — the
    extractor's job is text recovery, not validation."""
    objs: dict[int, tuple[dict, bytes | None]] = {}
    for m in _OBJ_RE.finditer(payload):
        num = int(m.group(1))
        body_at = m.end()
        lex = _Lexer(payload, body_at)
        try:
            tok = lex.next_token()
        except PdfError:
            continue
        if tok is None:
            continue
        obj_dict = tok[1] if tok[0] == "dict" else {}
        stream: bytes | None = None
        # stream?
        sm = re.compile(rb"\s*stream(\r\n|\n|\r)").match(payload, lex.pos)
        if tok[0] == "dict" and sm is not None:
            data_at = sm.end()
            length = obj_dict.get("Length")
            end = -1
            if isinstance(length, int):
                cand = data_at + length
                if payload[cand : cand + 11].lstrip(b"\r\n").startswith(
                    b"endstream"
                ):
                    end = cand
            if end < 0:  # /Length wrong or a ref: scan
                end = payload.find(b"endstream", data_at)
                if end < 0:
                    continue
                # strip at most one EOL before the keyword
                if payload[end - 2 : end] == b"\r\n":
                    end -= 2
                elif payload[end - 1 : end] in (b"\n", b"\r"):
                    end -= 1
            stream = payload[data_at:end]
        if num not in objs:  # first definition wins (no incremental updates)
            objs[num] = (obj_dict, stream)
    return objs


def _resolve(objs, val):
    if isinstance(val, _Ref):
        got = objs.get(val.num)
        return got[0] if got else None
    return val


def _decode_stream(obj_dict: dict, raw: bytes) -> bytes:
    filt = obj_dict.get("Filter")
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    data = raw
    for f in filters:
        if f == "FlateDecode":
            data = zlib.decompress(data)
        else:
            raise NotImplementedError(f"stream filter {f}")
    return data


# --------------------------------------------------------------------------
# Content-stream text interpreter
# --------------------------------------------------------------------------


def _interpret_text(content: bytes, page_idx: int) -> list[tuple]:
    """Run the text operators of one page's content stream.

    Returns spans [(page_idx, x, y, text)] in content order.  The
    graphics operators a text extractor can ignore are skipped by the
    operand-stack discipline: every operator pops what it consumed."""
    lex = _Lexer(content)
    spans: list[tuple] = []
    stack: list = []
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    in_text = False

    def _emit(raw: bytes) -> None:
        spans.append(
            (page_idx, x, y, raw.decode("utf-8", errors="replace"))
        )

    while True:
        tok = lex.next_token()
        if tok is None:
            return spans
        kind, val = tok
        if kind != "op":
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            in_text = True
            x = y = line_x = line_y = 0.0
        elif op == "ET":
            in_text = False
        elif op == "Tm" and len(stack) >= 6:
            x = line_x = float(stack[-2][1])
            y = line_y = float(stack[-1][1])
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = float(stack[-2][1]), float(stack[-1][1])
            line_x += tx
            line_y += ty
            x, y = line_x, line_y
            if op == "TD":
                leading = -ty
        elif op == "TL" and stack:
            leading = float(stack[-1][1])
        elif op == "T*":
            line_y -= leading
            x, y = line_x, line_y
        elif op == "Tj" and in_text and stack and stack[-1][0] == "str":
            _emit(stack[-1][1])
        elif op == "'" and in_text and stack and stack[-1][0] == "str":
            line_y -= leading
            x, y = line_x, line_y
            _emit(stack[-1][1])
        elif op == '"' and in_text and len(stack) >= 3 and stack[-1][0] == "str":
            line_y -= leading
            x, y = line_x, line_y
            _emit(stack[-1][1])
        elif op == "TJ" and in_text and stack and stack[-1][0] == "arr":
            for el in stack[-1][1]:
                if isinstance(el, bytes):  # kerning numbers are skipped
                    _emit(el)
        stack.clear()


# --------------------------------------------------------------------------
# Extractor
# --------------------------------------------------------------------------


def _walk_pages(objs: dict, node_ref, acc: list, depth: int = 0) -> None:
    if depth > 64:
        raise PdfError("page tree too deep")
    node = _resolve(objs, node_ref)
    if not isinstance(node, dict):
        raise PdfError("bad page tree node")
    t = node.get("Type")
    if t == "Page":
        acc.append(node)
        return
    kids = node.get("Kids")
    kids = _resolve(objs, kids) if isinstance(kids, _Ref) else kids
    if not isinstance(kids, list):
        raise PdfError("Pages node without Kids")
    for kid in kids:
        _walk_pages(objs, kid, acc, depth + 1)


def decode_pdf(payload: bytes) -> dict:
    """Parse a PDF and extract its text spans.

    Returns {status, n_pages, spans} where spans is
    [(page_idx, x, y, text)].  status: 'ok' | 'not_pdf' |
    'unsupported' (encryption / unknown filter / object streams) |
    'parse_error'.  Never raises."""
    if not payload.startswith(b"%PDF-"):
        return {"status": "not_pdf", "n_pages": 0, "spans": []}
    try:
        objs = _scan_objects(payload)
        # trailer: /Root (scan all trailers, last wins; also accept a
        # catalog found by type when the trailer is damaged)
        root_ref = None
        for m in re.finditer(rb"trailer", payload):
            lex = _Lexer(payload, m.end())
            try:
                tok = lex.next_token()
            except PdfError:
                continue
            if tok and tok[0] == "dict":
                if "Encrypt" in tok[1]:
                    return {"status": "unsupported", "n_pages": 0, "spans": []}
                if isinstance(tok[1].get("Root"), _Ref):
                    root_ref = tok[1]["Root"]
        if root_ref is None:
            cands = [
                n for n, (d, _) in objs.items() if d.get("Type") == "Catalog"
            ]
            if not cands:
                if any(
                    d.get("Type") == "ObjStm" for d, _ in objs.values()
                ):
                    return {
                        "status": "unsupported",
                        "n_pages": 0,
                        "spans": [],
                    }
                return {"status": "parse_error", "n_pages": 0, "spans": []}
            root_ref = _Ref(min(cands))
        catalog = _resolve(objs, root_ref)
        if not isinstance(catalog, dict):
            return {"status": "parse_error", "n_pages": 0, "spans": []}
        pages: list[dict] = []
        _walk_pages(objs, catalog.get("Pages"), pages)
        spans: list[tuple] = []
        for page_idx, page in enumerate(pages):
            contents = page.get("Contents")
            content_refs = (
                contents if isinstance(contents, list) else [contents]
            )
            data = bytearray()
            for ref in content_refs:
                if not isinstance(ref, _Ref):
                    continue
                got = objs.get(ref.num)
                if got is None or got[1] is None:
                    continue
                data += _decode_stream(got[0], got[1])
                data += b"\n"
            spans.extend(_interpret_text(bytes(data), page_idx))
        return {"status": "ok", "n_pages": len(pages), "spans": spans}
    except NotImplementedError:
        return {"status": "unsupported", "n_pages": 0, "spans": []}
    except (PdfError, zlib.error, ValueError, RecursionError):
        return {"status": "parse_error", "n_pages": 0, "spans": []}


def extract_text(spans: list[tuple], mode: str = "raw") -> str:
    """'raw': concatenate spans in content order (byte-exact round trip
    of encode_pdf).  'layout': rebuild visual lines — group spans per
    page by y (descending), order within a line by x, join lines with
    \\n and pages with \\f."""
    if mode == "raw":
        return "".join(s[3] for s in spans)
    if mode != "layout":
        raise ValueError(f"unknown mode {mode!r}")
    by_page: dict[int, dict[float, list[tuple]]] = {}
    for page_idx, px, py, text in spans:
        by_page.setdefault(page_idx, {}).setdefault(py, []).append((px, text))
    pages_out = []
    for page_idx in sorted(by_page):
        lines = []
        for py in sorted(by_page[page_idx], reverse=True):
            chunks = sorted(by_page[page_idx][py], key=lambda t: t[0])
            lines.append("".join(c[1] for c in chunks))
        pages_out.append("\n".join(lines))
    return "\f".join(pages_out)


def page_texts(spans: list[tuple], n_pages: int) -> list[str]:
    """Raw text per page index (empty string for text-free pages)."""
    out = [""] * n_pages
    for page_idx, _x, _y, text in spans:
        if 0 <= page_idx < n_pages:
            out[page_idx] += text
    return out


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

PDF_FEATURES_SCHEMA_DDL = (
    "doc_id long, status string, n_pages int, n_spans int, "
    "n_chars long, text_digest string"
)


def make_pdf_feature_kernel():
    """mapInPandas kernel: (doc_id, payload binary) → PDF text features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload) if payload is not None else b""
                dec = decode_pdf(payload)
                raw = extract_text(dec["spans"], mode="raw")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "status": dec["status"],
                        "n_pages": dec["n_pages"],
                        "n_spans": len(dec["spans"]),
                        "n_chars": len(raw),
                        "text_digest": hashlib.md5(
                            raw.encode("utf-8")
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return kernel


def pdf_features(pdf_df):
    """pdf_df: (doc_id long, payload binary) → PDF_FEATURES_SCHEMA_DDL."""
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(pdf_df.sparkSession)
    return pdf_df.mapInPandas(make_pdf_feature_kernel(), PDF_FEATURES_SCHEMA_DDL)


# Pagination contract shared by the corpus builder and the DuckDB oracle:
# pages are 400-char slices of the document text, lines are 80-char
# slices of a page (400 = 5*80, so total spans = ceil(n_chars/80)).
PDF_PAGE_CHARS = 400
PDF_LINE_CHARS = 80


def paginate(text: str) -> list[list[str]]:
    """Deterministic char pagination (always at least one page/line so
    empty docs still produce a structurally-valid one-page PDF)."""
    pages = [
        text[i : i + PDF_PAGE_CHARS]
        for i in range(0, len(text), PDF_PAGE_CHARS)
    ] or [""]
    return [
        [
            page[j : j + PDF_LINE_CHARS]
            for j in range(0, len(page), PDF_LINE_CHARS)
        ]
        or [""]
        for page in pages
    ]


def make_pdf_corpus_kernel():
    """mapInPandas kernel: (doc_id, text) → (doc_id, payload) PDFs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                payload = encode_pdf(paginate(text or ""))
                rows.append({"doc_id": doc_id, "payload": payload})
            yield pd.DataFrame(rows)

    return kernel


def pdf_corpus(docs_df):
    """(doc_id, text) → (doc_id, payload binary): the synthetic PDF
    corpus used by the pdf_* queries (built distributed, never on the
    driver)."""
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(docs_df.sparkSession)
    return docs_df.select("doc_id", "text").mapInPandas(
        make_pdf_corpus_kernel(), "doc_id long, payload binary"
    )
