"""WHATWG-URL-compatible resolution — `new URL(input, base).href` equivalent.

The reference resolves every link/image URI through the WHATWG URL parser
(Readability.js:42-54 `toAbsoluteURI`, JSDOMParser.js:593-605 `baseURI`).
Python's urllib follows RFC 3986, which differs in observable ways (backslash
handling, empty-segment collapsing, %2e dot segments, lone '?'/'#'
preservation, percent-encoding sets, default-port/empty-path normalization,
file drive letters), so this implements the subset of the WHATWG "basic URL
parser" needed for document URL resolution.  Validated against node's `URL`
over every (uri, base) pair occurring in the reference fixture corpus
(tests/test_whatwg_url.py — 13k+ pairs).
"""

from __future__ import annotations

import re

SPECIAL_SCHEMES = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                   "ftp": "21", "file": ""}

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):")
_TAB_NL = dict.fromkeys(map(ord, "\t\n\r"))

# Percent-encode sets (URL Standard §1.3).  '%' is never re-encoded.
_FRAGMENT_SET = set(' "<>`')
_QUERY_SET = set(' "#<>')
_SPECIAL_QUERY_SET = _QUERY_SET | {"'"}
_PATH_SET = _QUERY_SET | set("?`{}")
_USERINFO_SET = _PATH_SET | set("/:;=@[\\]^|")

_DRIVE_RE = re.compile(r"^[A-Za-z][:|]$")


class URLError(ValueError):
    pass


def _clean(s: str) -> str:
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


_FORBIDDEN_HOST = set("\x00\t\n\r #/:<>?@[\\]^|\"%")


def _encode_host(host: str) -> str:
    if "%" in host:
        from urllib.parse import unquote

        host = unquote(host, errors="strict")
    if any(ch in _FORBIDDEN_HOST or ord(ch) < 0x20 for ch in host):
        raise URLError(f"Invalid host {host!r}")
    host = host.lower()
    if any(ord(c) > 0x7E for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except Exception:
            host = _pct_encode(host, set())
    return host


_DOT_SEGMENTS = {".", "%2e", "%2E"}
_DDOT_SEGMENTS = {
    "..", ".%2e", ".%2E", "%2e.", "%2E.", "%2e%2e", "%2e%2E", "%2E%2e", "%2E%2E",
}


def _normalize_path(path: str, is_file: bool) -> str:
    """WHATWG path state: split on '/', resolve single/double dot segments
    (including %2e spellings), preserve empty segments, keep a trailing slash
    when the last segment was a dot."""
    if not path.startswith("/"):
        path = "/" + path
    segs = path.split("/")[1:]
    out: list[str] = []
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if seg in _DDOT_SEGMENTS:
            if out and not (is_file and len(out) == 1 and _DRIVE_RE.match(out[0])):
                out.pop()
            if last:
                out.append("")
        elif seg in _DOT_SEGMENTS:
            if last:
                out.append("")
        else:
            if is_file and not out and _DRIVE_RE.match(seg):
                seg = seg[0] + ":"
            out.append(seg)
    return "/" + "/".join(out)


class _URL:
    __slots__ = ("scheme", "userinfo", "host", "port", "path",
                 "query", "fragment")

    def __init__(self) -> None:
        self.scheme = ""
        self.userinfo = ""
        self.host = ""
        self.port: str | None = None
        self.path = "/"
        self.query: str | None = None
        self.fragment: str | None = None


def _parse_authority(auth: str, scheme: str, input_url: str) -> tuple[str, str, str | None]:
    userinfo = ""
    hostport = auth
    if "@" in auth:
        userinfo, hostport = auth.rsplit("@", 1)
    host, port = hostport, None
    if hostport.startswith("["):
        close = hostport.find("]")
        if close == -1:
            raise URLError(f"Invalid IPv6 host in {input_url!r}")
        host = hostport[: close + 1]
        rest = hostport[close + 1 :]
        if rest.startswith(":"):
            port = rest[1:]
    elif ":" in hostport:
        host, port = hostport.rsplit(":", 1)
    host = _encode_host(host)
    if not host and scheme != "file":
        raise URLError(f"Invalid URL: {input_url!r} (empty host)")
    if port is not None:
        port = port.lstrip("0") or ""
        if port == "" or port == SPECIAL_SCHEMES.get(scheme):
            port = None
        elif not port.isdigit() or int(port) > 65535:
            raise URLError(f"Invalid port in {input_url!r}")
    return userinfo, host, port


def _parse_special_absolute(rest: str, scheme: str, input_url: str) -> _URL:
    """Parse `scheme:<rest>` for a special scheme: skip any run of slashes,
    then authority, path, query, fragment."""
    url = _URL()
    url.scheme = scheme
    i = 0
    while i < len(rest) and rest[i] == "/":
        i += 1
    rest = rest[i:]
    # authority runs to the next / ? #
    cut = len(rest)
    for ch in "/?#":
        p = rest.find(ch)
        if p != -1:
            cut = min(cut, p)
    auth, rest = rest[:cut], rest[cut:]
    if scheme == "file" and _DRIVE_RE.match(auth):
        # "file:///C|/x" — a drive letter is path, not host.
        url.userinfo, url.host, url.port = "", "", None
        rest = "/" + auth + rest
    else:
        url.userinfo, url.host, url.port = _parse_authority(auth, scheme, input_url)
    _parse_path_query_fragment(url, rest, scheme)
    return url


def _parse_path_query_fragment(url: _URL, rest: str, scheme: str) -> None:
    frag = None
    if "#" in rest:
        rest, frag = rest.split("#", 1)
    query = None
    if "?" in rest:
        rest, query = rest.split("?", 1)
    url.path = _normalize_path(rest, scheme == "file")
    url.query = query
    url.fragment = frag


def _serialize(url: _URL) -> str:
    out = url.scheme + "://"
    if url.userinfo:
        user, sep, pw = url.userinfo.partition(":")
        out += _pct_encode(user, _USERINFO_SET)
        if sep:
            out += ":" + _pct_encode(pw, _USERINFO_SET)
        out += "@"
    out += url.host
    if url.port is not None:
        out += ":" + url.port
    out += _pct_encode(url.path, _PATH_SET)
    if url.query is not None:
        qset = _SPECIAL_QUERY_SET if url.scheme in SPECIAL_SCHEMES else _QUERY_SET
        out += "?" + _pct_encode(url.query, qset)
    if url.fragment is not None:
        out += "#" + _pct_encode(url.fragment, _FRAGMENT_SET)
    return out


def url_resolve(input_url: str, base: str | None = None) -> str:
    """Return `new URL(input_url, base).href`; raise URLError on failure."""
    input_url = _clean(input_url)
    base = _clean(base) if base is not None else None

    m = _SCHEME_RE.match(input_url)
    scheme = m.group(1).lower() if m else None

    if scheme is not None and scheme not in SPECIAL_SCHEMES:
        # Opaque-path URL (mailto:, data:, javascript:, about:, …): C0-encode
        # the opaque path, query-encode after '?', fragment-encode after '#'.
        rest = input_url[len(scheme) + 1 :]
        frag = None
        if "#" in rest:
            rest, frag = rest.split("#", 1)
        query = None
        if "?" in rest:
            rest, query = rest.split("?", 1)
        out = scheme + ":" + _pct_encode(rest, set())
        if query is not None:
            out += "?" + _pct_encode(query, _QUERY_SET)
        if frag is not None:
            out += "#" + _pct_encode(frag, _FRAGMENT_SET)
        return out

    base_url: _URL | None = None
    if base is not None:
        bm = _SCHEME_RE.match(base)
        base_scheme = bm.group(1).lower() if bm else None
        if base_scheme in SPECIAL_SCHEMES:
            base_fixed = base.replace("\\", "/")
            base_url = _parse_special_absolute(
                base_fixed[len(base_scheme) + 1 :], base_scheme, base
            )
        elif base_scheme is not None:
            base_url = None  # opaque base: only absolute inputs can resolve
        else:
            raise URLError(f"Invalid base URL: {base!r}")

    if scheme is not None:
        rest = input_url[len(scheme) + 1 :].replace("\\", "/")
        if base_url is not None and scheme == base_url.scheme and not rest.startswith("//"):
            # "http:foo" with an http base → treated as relative.
            return _resolve_relative(rest, base_url)
        return _serialize(_parse_special_absolute(rest, scheme, input_url))

    if base_url is None:
        raise URLError(f"Invalid URL: {input_url!r}")
    return _resolve_relative(input_url.replace("\\", "/"), base_url)


def _resolve_relative(rel: str, base: _URL) -> str:
    url = _URL()
    url.scheme = base.scheme
    if rel.startswith("//"):
        return _serialize(_parse_special_absolute(rel, base.scheme, rel))

    url.userinfo, url.host, url.port = base.userinfo, base.host, base.port

    if rel == "":
        url.path, url.query = base.path, base.query
        return _serialize(url)
    if rel.startswith("#"):
        url.path, url.query = base.path, base.query
        url.fragment = rel[1:]
        return _serialize(url)
    if rel.startswith("?"):
        url.path = base.path
        _parse_path_query_fragment(url, base.path + rel, base.scheme)
        return _serialize(url)
    if rel.startswith("/"):
        _parse_path_query_fragment(url, rel, base.scheme)
        return _serialize(url)
    # Path-relative: merge with the base directory.
    base_dir = base.path[: base.path.rfind("/") + 1] or "/"
    _parse_path_query_fragment(url, base_dir + rel, base.scheme)
    return _serialize(url)
