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
    # htmlProse cases (extract-dfns.js:680-795)
    ("extracts the prose that defines a term",
     "<p data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a bar.\n"
     "    </p>",
     [{"htmlProse": "<dfn>Foo</dfn> enters a bar."}]),
    ("keeps basic structure for the prose that defines a term",
     "<div data-defines='#foo'>\n"
     "      <p><dfn id='foo' data-dfn-type='dfn'>Foo</dfn> <i>enters</i> a <b>bar</b>.\n"
     "      <br>The bar has <strong>2 baz</strong> on tap:</p>\n"
     "      <ul>\n"
     "        <li>Baz<sub>1</sub></li>\n"
     "        <li>Baz<sup>2</sup></li>\n"
     "      </ul>\n"
     "      <pre>Foo bar baz</pre>\n"
     "    </div>",
     [{"htmlProse":
       "<p><dfn>Foo</dfn> <i>enters</i> a <b>bar</b>.\n"
       "      <br>The bar has <strong>2 baz</strong> on tap:</p>\n"
       "      <ul>\n"
       "        <li>Baz<sub>1</sub></li>\n"
       "        <li>Baz<sup>2</sup></li>\n"
       "      </ul>\n"
       "      <pre>Foo bar baz</pre>"}]),
    ("keeps useful attributes in prose that defines a term",
     "<p data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> "
     "<i dir=\"ltr\">enters</i> a "
     "<a lang=\"en\" title=\"Ze ol' tavern\">bar</a>.\n"
     "    </p>",
     [{"htmlProse":
       '<dfn>Foo</dfn> <i dir="ltr">enters</i> a '
       '<a lang="en" title="Ze ol\' tavern">bar</a>.'}]),
    ("keeps href in prose that defines a term",
     "<p data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a "
     "<a href=\"#bar\">bar</a>.\n"
     "    </p>",
     [{"htmlProse":
       '<dfn>Foo</dfn> enters a <a href="about:blank#bar">bar</a>.'}]),
    ("keeps href in prose that defines a term in multi-page specs too",
     "<p data-defines='#foo' "
     "data-reffy-page=\"https://www.w3.org/TR/foo/page1.html\">\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a "
     "<a href=\"page2.html#bar\">bar</a>.\n"
     "    </p>",
     [{"href": "https://www.w3.org/TR/foo/page1.html#foo",
       "heading": {"href": "https://www.w3.org/TR/foo/page1.html",
                   "title": ""},
       "htmlProse":
       '<dfn>Foo</dfn> enters a '
       '<a href="https://www.w3.org/TR/foo/page2.html#bar">bar</a>.'}]),
    ("extracts prose that defines a term without extra attributes",
     "<p data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> "
     "<i class=\"verb\">enters</i> a <a hidden inert tabindex=2>bar</a>.\n"
     "    </p>",
     [{"htmlProse": "<dfn>Foo</dfn> <i>enters</i> a <a>bar</a>."}]),
    ("suppresses asides from the prose that defines a term",
     "<div data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a bar.\n"
     "      <aside><p>I'm an aside</p></aside>\n"
     "      <p class='mdn-anno'>So am I</p>\n"
     "      <span class='wpt-tests-block'>Lots of tests</span>\n"
     "      <span class='annotation'>And annotations</span>\n"
     "      <div id='dfn-panel-foo'>A list of references</div>\n"
     "    </div>",
     [{"htmlProse": "<dfn>Foo</dfn> enters a bar."}]),
    ("suppresses more complex structure from the prose that defines a term",
     "<div data-defines='#foo'>\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> "
     "<i class=\"verb\">enters</i> a <a autofocus>bar</a>.\n"
     "      <section>\n"
     "        <h4>An inner section</h4>\n"
     "      </section>\n"
     "      <img src=\"bar.png\" alt=\"A bar\">\n"
     "    </div>",
     [{"htmlProse": "<dfn>Foo</dfn> <i>enters</i> a <a>bar</a>."}]),
    ("skips HTML comments when it extracts the prose that defines a term",
     "<p data-defines='#foo'>\n"
     "      <!-- No comment -->\n"
     "      <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a bar.\n"
     "    </p>",
     [{"htmlProse": "<dfn>Foo</dfn> enters a bar."}]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_reference_dfn_case(case):
    _title, html, changes = case
    got = extract_page(html, URL, ["dfns"])["dfns"]
    want = [{**BASE_DFN, **delta} for delta in changes]
    assert got == want
