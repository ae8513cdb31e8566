"""Ports of the reference's Readability API tests
(test/test-readability.js:188-257): option plumbing, oversize abort,
keepClasses behavior."""

import os
from unittest import mock

import pytest

from readability_1_spark.dom import JSDOMParser
from readability_1_spark.readability import Readability, TooManyElemsError

from .conftest import FIXTURES_DIR


def _doc(html="<html><div>yo</div></html>"):
    return JSDOMParser().parse(html)


def test_option_defaults_and_overrides():
    assert Readability(_doc())._nb_top_candidates == 5
    assert Readability(_doc(), {"nbTopCandidates": 42})._nb_top_candidates == 42
    assert Readability(_doc())._max_elems_to_parse == 0
    assert Readability(_doc(), {"maxElemsToParse": 42})._max_elems_to_parse == 42
    assert Readability(_doc())._keep_classes is False
    assert Readability(_doc(), {"keepClasses": True})._keep_classes is True
    assert Readability(_doc(), {"keepClasses": False})._keep_classes is False
    assert Readability(_doc())._char_threshold == 500
    assert Readability(_doc(), {"charThreshold": 123})._char_threshold == 123
    assert Readability(_doc())._classes_to_preserve == ["page"]
    assert Readability(_doc(), {"classesToPreserve": ["x"]})._classes_to_preserve == [
        "page", "x",
    ]


def test_oversized_document_aborts():
    reader = Readability(_doc(), {"maxElemsToParse": 1})
    with pytest.raises(TooManyElemsError, match="2 elements found"):
        reader.parse()


def _example_source():
    with open(os.path.join(FIXTURES_DIR, "001", "source.html")) as f:
        return f.read().strip()


@pytest.mark.parametrize(
    ("opts", "called"),
    [({}, True), ({"keepClasses": False}, True), ({"keepClasses": True}, False)],
)
def test_clean_classes_gated_by_keep_classes(opts, called):
    reader = Readability(JSDOMParser().parse(_example_source()), opts)
    with mock.patch.object(reader, "_clean_classes") as fake:
        reader.parse()
    assert fake.called is called


def test_keep_classes_preserves_class_attributes():
    src = (
        '<html><head><title>T is a title</title></head><body><div id="main">'
        + "".join(
            f'<p class="para keepme">Paragraph {i} with plenty, of, commas, and '
            "sufficient length to pass thresholds easily in this engine.</p>"
            for i in range(30)
        )
        + "</div></body></html>"
    )
    kept = Readability(JSDOMParser().parse(src), {"keepClasses": True}).parse()
    assert 'class="para keepme"' in kept["content"]
    stripped = Readability(JSDOMParser().parse(src), {}).parse()
    assert "keepme" not in stripped["content"]
