"""Mini-DOM unit tests (the query surface the extractors rely on)."""

from reffy_spark.html.dom import parse_html


HTML = """
<html><head><title> My  Spec </title>
<meta name="generator" content="bikeshed">
</head><body>
<div class="head"><a href="https://x.org/ignored#f">ign</a><time>10 June 2024</time></div>
<h2 id="t1">2.3 Title</h2>
<section data-reffy-page="https://ex.org/page2">
  <h3 id="t2">Sub</h3>
  <p>Some <dfn id="d1" data-dfn-type="dfn" data-lt="term|alias">term</dfn> here.</p>
</section>
<div class="note"><a href="https://y.org/spec#frag">note link</a></div>
<pre class="idl">interface Foo {};</pre>
<ul><li>one<li>two</ul>
<table><tr><td>a<td>b<tr><td>c</table>
<del><dfn id="gone">x</dfn></del>
</body></html>
"""


def test_parse_and_query():
    root = parse_html(HTML)
    assert root.query("title").text.strip() == "My  Spec"
    h2 = root.query("h2")
    assert h2.id == "t1" and h2.text == "2.3 Title"
    assert root.query("meta[name=generator]").get("content") == "bikeshed"
    assert len(root.query_all("li")) == 2
    assert [td.text for td in root.query_all("td")] == ["a", "b", "c"]


def test_selectors():
    root = parse_html(HTML)
    assert root.query("pre.idl").text == "interface Foo {};"
    assert root.query("#d1").get("data-lt") == "term|alias"
    assert root.query("[data-dfn-type]").id == "d1"
    assert len(root.query_all("div.note a, div.head a")) == 2
    assert root.query("section > h3").id == "t2"
    assert root.query("section > p") is not None
    assert root.query("body > h3") is None  # child combinator respected


def test_closest_and_ancestors():
    root = parse_html(HTML)
    dfn = root.query("#d1")
    sec = dfn.closest("[data-reffy-page]")
    assert sec is not None and sec.get("data-reffy-page") == "https://ex.org/page2"
    gone = root.query("#gone")
    assert gone.closest("del") is not None
    assert dfn.closest("del") is None


def test_document_order():
    root = parse_html(HTML)
    ids = sorted(
        (el.pos, el.id) for el in root.iter() if el.id
    )
    assert [i for _, i in ids] == ["t1", "t2", "d1", "gone"]


def test_attr_prefix_selector():
    root = parse_html('<a id="respec-x"></a><a id="ok"></a>')
    assert [e.id for e in root.query_all("[id^=respec-]")] == ["respec-x"]
