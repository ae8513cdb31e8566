"""WHATWG-URL-compatible resolution, `new URL(input, base).href` equivalent.

The reference resolves every link/image URI through the WHATWG URL parser
(Readability.js:42-54 `toAbsoluteURI`, JSDOMParser.js:593-605 `baseURI`).
Python's urllib follows RFC 3986, which differs in observable ways (backslash
handling, whitespace stripping, percent-encoding sets, default-port and empty
-path normalization), so this module implements the subset of the WHATWG
"basic URL parser" that matters for http(s)-based documents.  Validated
against node's `URL` over every (uri, base) pair occurring in the reference
fixture corpus (tests/test_whatwg_url.py).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

SPECIAL_SCHEMES = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                   "ftp": "21", "file": None}

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):")
_TAB_NL = dict.fromkeys(map(ord, "\t\n\r"))

# Percent-encode sets (URL Standard §1.3).  '%' is never re-encoded.
_FRAGMENT_SET = set(' "<>`')
_QUERY_SET = set(' "#<>')
_SPECIAL_QUERY_SET = _QUERY_SET | {"'"}
_PATH_SET = _QUERY_SET | set("?`{}")
_USERINFO_SET = _PATH_SET | set("/:;=@[\\]^|")


class URLError(ValueError):
    pass


def _clean(s: str) -> str:
    # Strip leading/trailing C0 controls + space; remove all tab/newline.
    start, end = 0, len(s)
    while start < end and s[start] <= " ":
        start += 1
    while end > start and s[end - 1] <= " ":
        end -= 1
    return s[start:end].translate(_TAB_NL)


def _pct_encode(s: str, encode_set: set) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or cp > 0x7E or ch in encode_set:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)


def _encode_host(host: str) -> str:
    if not host:
        return host
    host = host.lower()
    # Percent-decode, then IDNA (simplified: only when non-ASCII present).
    if any(ord(c) > 0x7E for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except Exception:
            host = _pct_encode(host, set())
    return host


def url_resolve(input_url: str, base: str | None = None) -> str:
    """Return `new URL(input_url, base).href`; raise URLError on failure."""
    input_url = _clean(input_url)
    base = _clean(base) if base is not None else None

    m = _SCHEME_RE.match(input_url)
    scheme = m.group(1).lower() if m else None

    if scheme is not None and scheme not in SPECIAL_SCHEMES:
        # Opaque-path URL (mailto:, data:, javascript:, about:, …):
        # lowercase the scheme, C0-percent-encode the rest.
        rest = input_url[len(scheme) + 1 :]
        frag = None
        if "#" in rest:
            rest, frag = rest.split("#", 1)
        out = scheme + ":" + _pct_encode_opaque(rest)
        if frag is not None:
            out += "#" + _pct_encode(frag, _FRAGMENT_SET)
        return out

    base_scheme = None
    if base is not None:
        bm = _SCHEME_RE.match(base)
        base_scheme = bm.group(1).lower() if bm else None

    eff_scheme = scheme or base_scheme
    if eff_scheme is None:
        raise URLError(f"Invalid URL: {input_url!r}")
    if eff_scheme in SPECIAL_SCHEMES:
        # Backslashes count as slashes in special URLs.
        input_url = input_url.replace("\\", "/")
        if base is not None:
            base = base.replace("\\", "/")

    if scheme is not None and base is not None and scheme != base_scheme:
        joined = input_url
    elif base is not None:
        joined = urljoin(base, input_url)
    else:
        joined = input_url

    parts = urlsplit(joined)
    if parts.scheme == "":
        raise URLError(f"Invalid URL: {input_url!r}")
    out_scheme = parts.scheme.lower()

    # netloc → userinfo + host + port
    netloc = parts.netloc
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
    host, port = hostport, None
    if hostport.startswith("["):
        # IPv6: [::1]:8080
        close = hostport.find("]")
        host = hostport[: close + 1]
        rest = hostport[close + 1 :]
        if rest.startswith(":"):
            port = rest[1:]
    elif ":" in hostport:
        host, port = hostport.rsplit(":", 1)
    host = _encode_host(host)
    if out_scheme in SPECIAL_SCHEMES and out_scheme != "file" and not host:
        raise URLError(f"Invalid URL: {input_url!r} (empty host)")
    if port is not None:
        port = port.lstrip("0") or ""
        if port == "" or port == SPECIAL_SCHEMES.get(out_scheme):
            port = None
        elif not port.isdigit() or int(port) > 65535:
            raise URLError(f"Invalid port in {input_url!r}")

    new_netloc = host
    if userinfo:
        user, _, pw = userinfo.partition(":")
        ui = _pct_encode(user, _USERINFO_SET)
        if pw or ":" in userinfo:
            ui += ":" + _pct_encode(pw, _USERINFO_SET)
        new_netloc = ui + "@" + new_netloc
    if port is not None:
        new_netloc += ":" + port

    path = parts.path
    if out_scheme in SPECIAL_SCHEMES and not path:
        path = "/"
    path = _pct_encode(path, _PATH_SET)

    out = out_scheme + "://" + new_netloc + path
    # Preserve '?'/'#' presence exactly as the WHATWG serializer does.
    has_query = "?" in joined.split("#", 1)[0]
    if has_query or parts.query:
        qset = _SPECIAL_QUERY_SET if out_scheme in SPECIAL_SCHEMES else _QUERY_SET
        out += "?" + _pct_encode(parts.query, qset)
    has_frag = "#" in joined
    if has_frag or parts.fragment:
        out += "#" + _pct_encode(parts.fragment, _FRAGMENT_SET)
    return out


def _pct_encode_opaque(s: str) -> str:
    # C0-control percent-encode set: C0 controls and > U+007E.
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or cp > 0x7E:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)
