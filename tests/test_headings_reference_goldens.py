"""headings extractor goldens lifted from the reference's own test suite
(/root/reference/test/extract-headings.js:10-105)."""

import pytest

from reffy_spark.extractors import extract_page

URL = "about:blank"

CASES = [
    ("extracts a simple heading",
     "<h1 id=title>Title</h1>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title", "level": 1}]),
    ("ignores a heading without id",
     "<h1>Heading without id</h1>", []),
    ("extracts a heading title without its section number",
     "<h2 id=title>2.3 Title</h2>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "2.3", "level": 2}]),
    ("encodes the href fragment",
     "<h1 id='title-%'>%</h1>",
     [{"id": "title-%", "href": f"{URL}#title-%25", "title": "%", "level": 1}]),
    ("extracts a CSS 2.1 heading at level 1",
     "<h1><a name=title>2 Title</a></h1>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "2", "level": 1}]),
    ("extracts a CSS 2.1 heading at level 3",
     "<h3><a name=title>4.5.1 Title</a></h3>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "4.5.1", "level": 3}]),
    ("extracts a CSS 2.1 appendix heading",
     "<h1><a name=title>Appendix A. Title</a></h1>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "A", "level": 1}]),
    ("extracts an appendix that starts with Appendix and uses ':'",
     "<h1 id=title>Appendix A: Title</h1>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "A", "level": 1}]),
    ("ignores test annotations in the heading",
     "<h2 id=title><div class='annotation'>18 tests</div>2.3 Title</h2>",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "2.3", "level": 2}]),
    ("ignores an empty id if there's a better one",
     "<section id><h1 id=title>Heading in a section with empty id</h1></section>",
     [{"id": "title", "href": f"{URL}#title",
       "title": "Heading in a section with empty id", "level": 1}]),
    ("documents alternate ids when they exist",
     "<section id=title-0><h1 id=title>Heading in a section with its own id</h1>"
     "</section>",
     [{"id": "title-0", "href": f"{URL}#title-0",
       "title": "Heading in a section with its own id", "level": 1,
       "alternateIds": ["title"]}]),
    ("deals with headings in www.rfc-editor.org RFCs",
     """<pre>
      <span class="h2">
        <a class="selflink" id="title" href="#title">2</a>.
        Title
      </span>
    </pre>""",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "2", "level": 1}]),
    ("deals with sub-headings in www.rfc-editor.org RFCs",
     """<pre>
      <span class="h3">
        <a class="selflink" id="title" href="#title">3.1</a>.
        Title
      </span>
    </pre>""",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "3.1", "level": 2}]),
    ("deals with appendices in www.rfc-editor.org RFCs",
     """<pre>
      <span class="h3">
        <a class="selflink" id="title" href="#title">Appendix A</a>.
        Title
      </span>
    </pre>""",
     [{"id": "title", "href": f"{URL}#title", "title": "Title",
       "number": "A", "level": 1}]),
    ("documents alternate IDs in WebGL1",
     """<h2 id="5.2">
        <span class="secno">5.2</span>
        <a name="WEBGLCONTEXTATTRIBUTES">WebGLContextAttributes</a>
      </h2>""",
     [{"id": "5.2", "href": f"{URL}#5.2", "title": "WebGLContextAttributes",
       "number": "5.2", "level": 2, "alternateIds": ["WEBGLCONTEXTATTRIBUTES"]}]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_reference_heading_case(case):
    _title, html, want = case
    got = extract_page(html, URL, ["headings"])["headings"]
    assert got == want
