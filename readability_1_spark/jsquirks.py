"""ECMAScript-compatible string/number helpers.

The extraction kernel must match the reference JS library byte-for-byte
(reference: /root/reference/Readability.js, /root/reference/JSDOMParser.js),
so every place the reference relies on JS semantics — `String.prototype.trim`,
`split(/\\s+/)`, `parseInt`, regex `\\s`/`$` behavior, float64 division by
zero — gets an explicit Python equivalent here instead of the near-miss
Python builtin.
"""

from __future__ import annotations

import math
import re

# ECMAScript WhiteSpace ∪ LineTerminator (what JS `trim()` strips and `\s`
# matches).  Differs from Python's `str.strip()` set: JS includes U+FEFF and
# excludes U+001C-001F / U+0085.
JS_WS = (
    "\t\n\x0b\x0c\r "
    "  "
    "           "
    "    　﻿"
)

# Character-class source fragments for porting JS regexes: use WS/NWS in
# place of \s/\S and compile with re.ASCII so \d/\w/\b keep JS (non-/u)
# semantics.  JS `$` (no /m) maps to Python \Z.
WS = (
    "[\\t\\n\\x0b\\x0c\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]"
)
NWS = (
    "[^\\t\\n\\x0b\\x0c\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]"
)

_WS_RUN = re.compile(WS + "+")


def js_trim(s: str) -> str:
    """`String.prototype.trim` (ECMAScript whitespace set)."""
    return s.strip(JS_WS)


def js_split_ws(s: str) -> list[str]:
    """`str.split(/\\s+/)` — keeps the leading/trailing empty strings JS keeps."""
    return _WS_RUN.split(s)


def word_count(s: str) -> int:
    """Readability.js:38-40 `wordCount`: `str.split(/\\s+/).length`."""
    return len(js_split_ws(s))


def js_parse_int(s: str, radix: int = 10) -> float:
    """`parseInt(s, radix)`: strip whitespace, optional sign, longest valid
    digit prefix; NaN when no digit is consumed."""
    s = js_trim(s)
    sign = 1.0
    if s[:1] in ("+", "-"):
        if s[0] == "-":
            sign = -1.0
        s = s[1:]
    if radix == 16 and s[:2].lower() == "0x":
        s = s[2:]
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
    n = 0
    for ch in s:
        if ch.lower() not in digits:
            break
        n += 1
    if n == 0:
        return math.nan
    return sign * int(s[:n], radix)


def from_char_code(num: float) -> str:
    """`String.fromCharCode(n)` — ToUint16, so NaN → U+0000."""
    if math.isnan(num) or math.isinf(num):
        return "\x00"
    return chr(int(num) & 0xFFFF)


def js_div(a: float, b: float) -> float:
    """Float64 division with JS Infinity/NaN semantics (never raises)."""
    if b == 0:
        if a == 0:
            return math.nan
        return math.inf if a > 0 else -math.inf
    return a / b
