"""HTML outline algorithm goldens, ported from the reference's
/root/reference/test/create-outline.js (themselves lifted from the
"Sample outlines" section of the HTML spec)."""

import re

from reffy_spark.html.dom import parse_html
from reffy_spark.html.outline import IMPLIED, create_outline


def _heading_str(h):
    if h == IMPLIED or h is None:
        return "(implied)"
    if h.tag == "hgroup":
        # innerText of an hgroup: child headings on separate lines
        return "\n".join(
            re.sub(r"\s+", " ", c.text).strip() for c in h.child_elements()
        )
    return re.sub(r"\s+", " ", h.text).strip()


def _outline_str(outline, level=0):
    return "".join(
        f"{level} - {_heading_str(s.heading)}\n" + _outline_str(s.sub_sections, level + 1)
        for s in outline
    )


def run(html):
    root = parse_html(html)
    body = root.query("body") or root
    outline, node_to_section = create_outline(body)
    charlie = next((e for e in body.iter() if e.id == "charlie"), None)
    where = None
    if charlie is not None:
        sec = node_to_section.get(charlie)
        if sec is not None:
            where = _heading_str(sec.heading)
    return _outline_str(outline).strip(), where


def test_implied_sections():
    out, where = run(
        """
<body>
 <nav><p><a href="/">Home</a></p></nav>
 <p>Hello world.</p>
 <aside><p id="charlie">My cat is cute.</p></aside>
</body>"""
    )
    assert out == "0 - (implied)\n1 - (implied)\n1 - (implied)"
    assert where == "(implied)"


def test_sibling_headings():
    out, where = run(
        """
<h1>The Tax Book</h1>
<h2>Earning money</h2>
<p>Earning money is good.</p>
<h3>Getting a job</h3>
<h2>Spending money</h2>
<h3>Cheap things</h3>
<h3>Expensive things</h3>
<h2>Investing money</h2>
<p id="charlie">You can lend your money to other people.</p>
<h2>Losing money</h2>
<h3>Poor judgement</h3>"""
    )
    assert out == (
        "0 - The Tax Book\n"
        "1 - Earning money\n"
        "2 - Getting a job\n"
        "1 - Spending money\n"
        "2 - Cheap things\n"
        "2 - Expensive things\n"
        "1 - Investing money\n"
        "1 - Losing money\n"
        "2 - Poor judgement"
    )
    assert where == "Investing money"


def test_sectioning_content():
    out, where = run(
        """
<h1>The Tax Book</h1>
<section>
 <h1>Earning money</h1>
 <section><h1>Getting a job</h1></section>
</section>
<section>
 <h1>Spending money</h1>
 <section><h1>Cheap things</h1></section>
 <section><h1>Expensive things</h1></section>
</section>
<section>
 <h1>Investing money</h1>
 <p id="charlie">You can lend your money to other people.</p>
</section>
<section>
 <h1>Losing money</h1>
 <section><h1>Poor judgement</h1></section>
</section>"""
    )
    assert out == (
        "0 - The Tax Book\n"
        "1 - Earning money\n"
        "2 - Getting a job\n"
        "1 - Spending money\n"
        "2 - Cheap things\n"
        "2 - Expensive things\n"
        "1 - Investing money\n"
        "1 - Losing money\n"
        "2 - Poor judgement"
    )
    assert where == "Investing money"


def test_multiple_top_level_headings():
    out, where = run(
        "<h1>Apples</h1><p>Pomaceous.</p>"
        "<h1>Bananas</h1><p id='charlie'>Edible.</p>"
        "<h1>Carambola</h1><p>Star.</p>"
    )
    assert out == "0 - Apples\n0 - Bananas\n0 - Carambola"
    assert where == "Bananas"


def test_sectioning_mixed_with_headings():
    out, where = run(
        "<section><h1>Apples</h1><p>Pomaceous.</p>"
        "<h1>Bananas</h1><p id='charlie'>Edible.</p>"
        "<h1>Carambola</h1><p>Star.</p></section>"
    )
    assert out == "0 - (implied)\n1 - Apples\n1 - Bananas\n1 - Carambola"
    assert where == "Bananas"


def test_headings_never_rise_above_sections():
    out, where = run(
        "<section><h1>A plea from our caretakers</h1></section>"
        "<h1>Feathers</h1><p id='charlie'>Epidermal growths.</p>"
    )
    assert out == "0 - (implied)\n1 - A plea from our caretakers\n0 - Feathers"
    assert where == "Feathers"


def test_late_headings():
    out, where = run(
        """
<h1>Ray's blog</h1>
<article>
 <header>
  <nav>
   <a href="?t=-1d">Yesterday</a>;
   <a href="?t=-7d" id="charlie">Last week</a>;
  </nav>
  <h1>We're adopting a child!</h1>
 </header>
 <p>As of today...</p>
</article>"""
    )
    assert out == (
        "0 - Ray's blog\n"
        "1 - (implied)\n"
        "2 - (implied)\n"
        "1 - We're adopting a child!"
    )
    assert where == "(implied)"


def test_hgroup():
    out, where = run(
        """
<hgroup><h1> The morning </h1><h2> 06:00 to 12:00 </h2></hgroup>
<p>We sleep.</p>
<hgroup><h1> The afternoon </h1><h2> 12:00 to 18:00 </h2></hgroup>
<p id="charlie">We study.</p>
<hgroup>
 <h2>Additional Commentary</h2>
 <h3>Because not all this is necessarily true</h3>
 <h6>Ok it's almost certainly not true</h6>
</hgroup>
<p>Yeah we probably play.</p>
<hgroup><h1> The evening </h1><h2> 18:00 to 00:00 </h2></hgroup>
<hgroup><h1> The night </h1><h2> 00:00 to 06:00 </h2></hgroup>"""
    )
    assert out == (
        "0 - The morning\n06:00 to 12:00\n"
        "0 - The afternoon\n12:00 to 18:00\n"
        "1 - Additional Commentary\n"
        "Because not all this is necessarily true\n"
        "Ok it's almost certainly not true\n"
        "0 - The evening\n18:00 to 00:00\n"
        "0 - The night\n00:00 to 06:00"
    )
    assert where == "The afternoon\n12:00 to 18:00"


def test_td_creates_own_outline():
    out, where = run(
        """
<h1>Main outline</h1>
<h2>A table</h2>
<table><tbody><tr>
 <th>Heading</th>
 <td><h1>Another outline</h1><p id="charlie">Content in other outline</p></td>
</tr></tbody></table>
<h2>A chair</h2>"""
    )
    assert out == "0 - Main outline\n1 - A table\n1 - A chair"
    assert where == "Another outline"


# ---------------------------------------------------------------------------
# Sparse-walk equivalence: create_outline() visits only relevant nodes;
# create_outline(dense=True) is the literal every-element walk. They must
# produce identical outlines and node->section maps on arbitrary trees.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = [
    "div", "p", "span", "section", "article", "nav", "aside",
    "blockquote", "td", "figure", "details", "h1", "h2", "h3", "h4",
    "h5", "h6", "hgroup", "dfn", "a",
]


@st.composite
def _tree_html(draw, depth=0):
    tag = draw(st.sampled_from(_TAGS))
    attrs = ""
    if draw(st.integers(0, 3)) == 0:
        attrs += f' id="i{draw(st.integers(0, 30))}"'
    if draw(st.integers(0, 5)) == 0:
        attrs += f' name="n{draw(st.integers(0, 9))}"'
    if draw(st.integers(0, 7)) == 0:
        attrs += " hidden"
    kids = ""
    if depth < 4:
        kids = "".join(
            draw(st.lists(_tree_html(depth=depth + 1), max_size=4))
        )
    text = draw(st.sampled_from(["", "x", "Title Text"]))
    return f"<{tag}{attrs}>{text}{kids}</{tag}>"


def _sec_canon(sec):
    """Content+ancestry fingerprint of a Section (object identities differ
    between the two walks, structure must not)."""
    chain = []
    s = sec
    while s is not None:
        h = s.heading
        hkey = (
            "implied" if h == IMPLIED
            else None if h is None
            else ("el", h.pos)
        )
        rkey = None if s.root is None else s.root.pos
        chain.append((hkey, rkey, len(s.sub_sections), len(s.sub_roots)))
        s = s.parent
    return tuple(chain)


def _outline_canon(outline):
    return tuple(
        (
            "implied" if s.heading == IMPLIED
            else None if s.heading is None
            else ("el", s.heading.pos),
            None if s.root is None else s.root.pos,
            _outline_canon(s.sub_sections),
            _outline_canon(s.sub_roots),
        )
        for s in outline
    )


@given(st.lists(_tree_html(), min_size=1, max_size=6))
@settings(max_examples=120, deadline=None)
def test_sparse_walk_equals_dense_walk(trees):
    html = "<body>" + "".join(trees) + "</body>"
    root = parse_html(html)
    body = root.query("body") or root
    d_out, d_map = create_outline(body, dense=True)
    s_out, s_map = create_outline(body)
    assert _outline_canon(s_out) == _outline_canon(d_out)
    assert {e.pos for e in s_map} == {e.pos for e in d_map}
    for el, sec in d_map.items():
        assert _sec_canon(s_map[el]) == _sec_canon(sec)


def test_sparse_walk_root_hgroup_equals_dense():
    """ADVICE r7: a root that is ITSELF an hgroup must behave like the
    dense walk (kids=[] — no descendants visited, no id mappings)."""
    root = parse_html('<hgroup><h1 id="a">T</h1><p id="b">x</p></hgroup>')
    hg = root.query("hgroup")
    d_out, d_map = create_outline(hg, dense=True)
    s_out, s_map = create_outline(hg)
    assert _outline_canon(s_out) == _outline_canon(d_out)
    assert {e.pos for e in s_map} == {e.pos for e in d_map}
