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


# ---------------------------------------------------------------------------
# Indexed query engine ≡ legacy tree walk (the index is an optimization,
# never a semantics change)
# ---------------------------------------------------------------------------

import random

from reffy_spark.html.dom import _parse_selector

_TAGS = ["div", "p", "span", "section", "aside", "dfn", "a", "li", "h2"]
_CLASSES = ["note", "informative", "example", "algo", "x-y"]


def _random_html(rng: random.Random, n: int) -> str:
    out = []
    depth = 0
    for i in range(n):
        tag = rng.choice(_TAGS)
        attrs = ""
        if rng.random() < 0.5:
            attrs += f' class="{" ".join(rng.sample(_CLASSES, rng.randint(1, 2)))}"'
        if rng.random() < 0.4:
            attrs += f' id="e{i}"'
        if rng.random() < 0.2:
            attrs += ' data-dfn-type="dfn"'
        if depth > 0 and rng.random() < 0.45:
            out.append(f"</{_TAGS[0]}>")  # imbalanced on purpose
            depth -= 1
        out.append(f"<{tag}{attrs}>t{i}")
        depth += 1
    return "".join(out)


_SELECTORS = [
    "div", "p, span", "section dfn", "section > p", "div.note",
    ".informative, aside, .note", "[data-dfn-type]", "[id^=e1]",
    "div p span", "aside > dfn, section a", "*", ".x-y",
    "div.note a, .example > span", "li", "h2, section > aside dfn",
]


def test_indexed_query_matches_legacy_walk():
    rng = random.Random(7)
    for trial in range(25):
        root = parse_html(_random_html(rng, rng.randint(5, 120)))
        nodes = [root] + list(root.iter())
        for sel in _SELECTORS:
            compounds = _parse_selector(sel)
            for node in nodes[:: max(1, len(nodes) // 7)]:
                fast = node.query_all(sel)
                slow = node._query_all_walk(compounds)
                assert [e.pos for e in fast] == [e.pos for e in slow], (
                    f"trial {trial} sel {sel!r} node {node!r}"
                )


def test_within_matches_closest():
    rng = random.Random(11)
    for _ in range(10):
        root = parse_html(_random_html(rng, rng.randint(5, 100)))
        for sel in [".informative, aside, .note", "section", "div.note"]:
            for el in root.iter():
                assert el.within(sel) == (el.closest(sel) is not None)


def test_detached_fragment_falls_back():
    from reffy_spark.html.dom import Element

    root = parse_html("<div><p class=note>x</p><span>y</span></div>")
    frag = Element("div", {}, None, 0)
    for c in root.query("div").children:
        frag.children.append(c)
    assert [e.tag for e in frag.query_all("p, span")] == ["p", "span"]
    assert frag.query_all(".note")[0].tag == "p"
