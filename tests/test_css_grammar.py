"""CSS value-definition grammar parser (F9) corpus goldens.

Corpus lifted from the reference's test fixtures
(/root/reference/test/css-grammar-parser/in + out.json) and vendored in
tests/data/css_grammar_corpus.json so the suite is standalone.
"""

import json
import os

import pytest

from reffy_spark.functions.css_grammar import (
    CSSValueSyntaxError,
    parse_propdef_value,
    tokenize,
)

_CORPUS = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "css_grammar_corpus.json"))
)


@pytest.mark.parametrize(
    "case", _CORPUS, ids=[c["in"][:40].strip() for c in _CORPUS]
)
def test_corpus(case):
    assert parse_propdef_value(case["in"]) == case["out"]


def test_tokenize_quotes_and_ranges():
    assert tokenize("<angle [0deg,360deg]>") == ["<angle [0deg,360deg]>"]
    assert tokenize("a{1,2} 'b' <'c'>") == ["a", "{1,2}", "'b'", "<'c'>"]


def test_function_notation():
    got = parse_propdef_value("fit-content( <length> )")
    assert got == {
        "type": "function",
        "name": "fit-content",
        "arguments": [{"type": "primitive", "name": "length"}],
    }


def test_errors():
    with pytest.raises(CSSValueSyntaxError):
        parse_propdef_value("a ]]>")
    with pytest.raises(CSSValueSyntaxError):
        parse_propdef_value("[ a | b")
