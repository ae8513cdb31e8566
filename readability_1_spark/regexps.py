"""Ports of the reference's regex constants (Readability.js:23-28, 187-206).

JS-regex semantics preserved: `\\s`/`\\S` are replaced with the exact
ECMAScript whitespace class, `$` becomes `\\Z` (JS has no multiline flag on
any of these), and everything is compiled with re.ASCII so `\\d`/`\\w`/`\\b`
keep JS (non-/u) meaning.
"""

from __future__ import annotations

import re

from .jsquirks import NWS, WS

_A = re.ASCII
_AI = re.ASCII | re.I

# Readability.js:192
UNLIKELY_CANDIDATES = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus"
    r"|extra|footer|gdpr|header|legends|menu|related|remark|replies|rss|shoutbox"
    r"|sidebar|skyscraper|social|sponsor|supplemental|ad-break|agegate|pagination"
    r"|pager|popup|yom-remote",
    _AI,
)
# Readability.js:193
OK_MAYBE_ITS_A_CANDIDATE = re.compile(r"and|article|body|column|content|main|shadow", _AI)
# Readability.js:194
POSITIVE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|blog|story",
    _AI,
)
# Readability.js:195 (note the ^hid$-style anchors: JS $ → \Z)
NEGATIVE = re.compile(
    r"hidden|^hid\Z| hid\Z| hid |^hid |banner|combx|comment|com-|contact|foot"
    r"|footer|footnote|gdpr|masthead|media|meta|outbrain|promo|related|scroll"
    r"|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|tool|widget",
    _AI,
)
# Readability.js:197
BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", _AI)
# Readability.js:199
NORMALIZE = re.compile(WS + "{2,}", _A)
# Readability.js:200
VIDEOS = re.compile(
    r"\/\/(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq)\.com"
    r"|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
    _AI,
)
# Readability.js:201
SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", _AI)
# Readability.js:204
WHITESPACE = re.compile("^" + WS + r"*\Z", _A)
# Readability.js:205
HAS_CONTENT = re.compile(NWS + r"\Z", _A)

# Readability.js:23-24
LAZY_SRCSET = re.compile(r"\.(jpg|jpeg|png|webp)" + WS + r"+[0-9]", _A)
LAZY_SRC = re.compile(
    "^" + WS + "*" + NWS + r"+\.(jpg|jpeg|png|webp)" + NWS + "*" + WS + r"*\Z", _A
)

# Readability.js:26-28
META_NAME = re.compile(
    "^" + WS + r"*(?:(dc|dcterm|og|twitter|weibo:(article|webpage))" + WS
    + r"*[\.:]" + WS + r"*)?(author|creator|description|title|site_name)" + WS + r"*\Z",
    _AI,
)
META_PROPERTY = re.compile(
    WS + r"*(dc|dcterm|og|twitter)" + WS + r"*:" + WS
    + r"*(author|creator|description|title|site_name)" + WS + "*",
    _AI,
)

# Title heuristics (Readability.js:514-560)
TITLE_SEPARATOR = re.compile(r" [\|\-\\\/>»] ", _A)
TITLE_HIERARCHICAL_SEP = re.compile(r" [\\\/>»] ", _A)
TITLE_CUT_END = re.compile(r"(.*)[\|\-\\\/>»] .*", _AI)
TITLE_CUT_FRONT = re.compile(r"[^\|\-\\\/>»]*[\|\-\\\/>»](.*)", _AI)
TITLE_ANY_SEP = re.compile(r"[\|\-\\\/>»]+", _A)

# Readability.js:1331 — nodeContent.search(/\.( |$)/)
SENTENCE_DOT = re.compile(r"\.( |\Z)", _A)
