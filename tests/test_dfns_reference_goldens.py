"""dfns extractor goldens lifted from the reference's own test suite
(/root/reference/test/extract-dfns.js:126-238, the generic cases — the
ecmascript/html/svg2 spec-specific preprocessor cases are flagged
out-of-scope in SURVEY.md §7.1 step 5). Full-record comparison against
baseDfn + per-case deltas, exactly like the reference harness."""

import pytest

from reffy_spark.extractors import extract_page

URL = "about:blank"

BASE_DFN = {
    "id": "foo",
    "href": f"{URL}#foo",
    "linkingText": ["Foo"],
    "localLinkingText": [],
    "type": "dfn",
    "for": [],
    "access": "private",
    "informative": False,
    "heading": {"href": URL, "title": ""},
    "definedIn": "prose",
    "links": [],
}

CASES = [
    ("parses a simple <dfn>",
     "<dfn id='foo' data-dfn-type='dfn'>Foo</dfn>", [{}]),
    ("normalizes whitespace and trims text",
     "<dfn id='foo' data-dfn-type='dfn'>Foo\n    \n</dfn>", [{}]),
    ("encodes the href fragment",
     "<dfn id='foo-%' data-dfn-type='dfn'>Foo</dfn>",
     [{"id": "foo-%", "href": f"{URL}#foo-%25"}]),
    ("ignores a <dfn> without an id",
     "<dfn data-dfn-type='dfn'>Foo</dfn>", []),
    ("marks as public a <dfn data-export>",
     "<dfn id=foo data-export>Foo</dfn>", [{"access": "public"}]),
    ("marks as public a <dfn data-dfn-type='interface'>",
     "<dfn id=foo data-dfn-type=interface>Foo</dfn>",
     [{"access": "public", "type": "interface"}]),
    ("marks as private with data-noexport",
     "<dfn id=foo data-noexport data-dfn-type=interface>Foo</dfn>",
     [{"type": "interface"}]),
    ("detects informative definitions",
     "<div class=informative><dfn id=foo data-dfn-type='dfn'>Foo</dfn></div>",
     [{"informative": True}]),
    ("associates a definition to a namespace",
     "<dfn data-dfn-for='Bar,Baz' id=foo>Foo</dfn>",
     [{"for": ["Bar", "Baz"]}]),
    ("considers definitions in headings",
     "<h2 data-dfn-type=dfn id=foo>Foo</h2>",
     [{"heading": {"id": "foo", "href": f"{URL}#foo", "title": "Foo"},
       "definedIn": "heading"}]),
    ("ignores elements that aren't <dfn> and headings",
     "<span data-dfn-type=dfn id=foo>Foo</span>", []),
    ("ignores headings without a data-dfn-type",
     "<h2 id=foo>Foo</h2>", []),
    ("uses text in data-lt as linking text",
     "<dfn data-lt='foo \n   |\nbar' id=foo data-dfn-type='dfn'>Foo</dfn>",
     [{"linkingText": ["foo", "bar"]}]),
    ("ignores dfns with an invalid data-dfn-type",
     "<dfn id=foo data-dfn-type=invalidtype>Foo</dfn>", []),
    ("ignores dfns in a <del>",
     "<del><dfn id=foo>Foo</dfn></del>", []),
    ("ignores dfns already exported",
     "<dfn id='foo' data-dfn-type='dfn' data-export>Foo</dfn>. "
     "<dfn id='foo2' data-export>Foo</dfn> is already exported.",
     [{"access": "public"}]),
    ("fixes internal-slot dfns with invalid 'idl' type (attribute)",
     "<dfn id=foo data-dfn-type=idl>Foo</dfn>",
     [{"type": "attribute", "access": "public"}]),
    ("fixes internal-method dfns with invalid 'idl' type (method)",
     "<dfn id=foo data-dfn-type=idl>Foo()</dfn>",
     [{"linkingText": ["Foo()"], "type": "method", "access": "public"}]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_reference_dfn_case(case):
    _title, html, changes = case
    got = extract_page(html, URL, ["dfns"])["dfns"]
    want = [{**BASE_DFN, **delta} for delta in changes]
    assert got == want
