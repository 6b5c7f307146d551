"""CSS extractor goldens (modeled on /root/reference/test/extract-css.js)."""

from reffy_spark.extractors import extract_page

URL = "https://example.org/css-spec/"


def css(html):
    return extract_page(html, URL, ["css"])["css"]


PROPDEF = """
<table class='propdef'>
  <tr><th>Name:</th><td><dfn id='propdef-margin'>margin</dfn></td></tr>
  <tr><th>Value:</th><td>&lt;length&gt; | auto</td></tr>
  <tr><th>Initial:</th><td>0</td></tr>
  <tr><th>Inherited:</th><td>no</td></tr>
</table>
"""


def test_propdef_table():
    res = css(PROPDEF)
    assert res["properties"] == [
        {
            "name": "margin",
            "href": f"{URL}#propdef-margin",
            "value": "<length> | auto",
            "initial": "0",
            "inherited": "no",
        }
    ]


def test_propdef_newvalues_merge():
    html = PROPDEF + """
    <table class='propdef'>
      <tr><th>Name:</th><td><dfn id='margin2'>margin</dfn></td></tr>
      <tr><th>New values:</th><td>clever</td></tr>
    </table>
    """
    res = css(html)
    assert len(res["properties"]) == 1
    assert res["properties"][0]["value"] == "<length> | auto | clever"


def test_propdef_multiple_names_in_one_table():
    html = """
    <table class='propdef'>
      <tr><th>Name:</th><td><dfn id='p-a'>a</dfn>, <dfn id='p-b'>b</dfn></td></tr>
      <tr><th>Value:</th><td>none</td></tr>
    </table>
    """
    res = css(html)
    assert [p["name"] for p in res["properties"]] == ["a", "b"]
    assert all(p["value"] == "none" for p in res["properties"])


def test_descdef_attached_to_atrule():
    html = """
    <p><dfn id='at-media' data-dfn-type='at-rule'>@media</dfn></p>
    <table class='descdef'>
      <tr><th>Name:</th><td><dfn id='desc-width'>width</dfn></td></tr>
      <tr><th>For:</th><td>@media</td></tr>
      <tr><th>Value:</th><td>&lt;length&gt;</td></tr>
    </table>
    """
    res = css(html)
    assert len(res["atrules"]) == 1
    rule = res["atrules"][0]
    assert rule["name"] == "@media"
    assert rule["descriptors"][0]["name"] == "width"
    assert rule["descriptors"][0]["value"] == "<length>"


def test_typed_dfns_and_informative_skip():
    html = """
    <p><dfn id='sel-hover' data-dfn-type='selector' data-export=''>:hover</dfn></p>
    <p><dfn id='fn-calc' data-dfn-type='function'>calc()</dfn></p>
    <p><dfn id='ty-len' data-dfn-type='type'>&lt;length&gt;</dfn></p>
    <div class='example'>
      <table class='propdef'>
        <tr><th>Name:</th><td><dfn id='ignored'>nope</dfn></td></tr>
      </table>
    </div>
    """
    res = css(html)
    assert [s["name"] for s in res["selectors"]] == [":hover"]
    assert sorted(v["name"] for v in res["values"]) == ["<length>", "calc()"]
    assert res["values"][0]["type"] in ("function", "type")
    assert res["properties"] == []


def test_duplicate_atrule_warns():
    html = """
    <p><dfn id='a1' data-dfn-type='at-rule'>@page</dfn></p>
    <p><dfn id='a2' data-dfn-type='at-rule'>@page</dfn></p>
    """
    res = css(html)
    assert len(res["atrules"]) == 1
    assert any(w["msg"] == "Duplicate definition" for w in res["warnings"])


def test_legacy_dl_form():
    html = """
    <div class='propdef'><dl>
      <dt><dfn id='old-prop'>'border-width'</dfn></dt>
      <dd><table><tr><th>Value:</th><td>thin | thick</td></tr></table></dd>
    </dl></div>
    """
    res = css(html)
    assert res["properties"] == [
        {
            "name": "border-width",
            "href": f"{URL}#old-prop",
            "value": "thin | thick",
        }
    ]


def test_minus_sign_normalization():
    html = """
    <table class='propdef'>
      <tr><th>Name:</th><td><dfn id='p'>p</dfn></td></tr>
      <tr><th>Value:</th><td>−5</td></tr>
    </table>
    """
    assert css(html)["properties"][0]["value"] == "-5"


# --- production rules / typed-dfn value syntax (round 2) --------------------
# cases derived from /root/reference/test/extract-css.js


def test_atrule_syntax_from_prod():
    html = """
    <dfn data-dfn-type="at-rule" id="at-layer">@layer</dfn> is an at-rule.
    <pre class="prod">
      @layer <a class="production">&lt;layer-name&gt;</a>? {
        <a class="production">&lt;stylesheet&gt;</a>
      }
    </pre>
    """
    res = css(html)
    assert res["atrules"] == [
        {
            "name": "@layer",
            "href": f"{URL}#at-layer",
            "descriptors": [],
            "value": "@layer <layer-name>? { <stylesheet> }",
        }
    ]


def test_atrule_syntax_multiple_definitions_combined():
    html = """
    <dfn data-dfn-type="at-rule" id="at-layer">@layer</dfn>
    <pre class="prod">@layer <a>&lt;layer-name&gt;</a>? { &lt;stylesheet&gt; }</pre>
    <pre class="prod">@layer <a>&lt;layer-name&gt;</a>#;</pre>
    """
    res = css(html)
    assert res["atrules"][0]["value"] == (
        "@layer <layer-name>? { <stylesheet> } | @layer <layer-name>#;"
    )


def test_type_with_prod_rule_and_scoped_values():
    html = """
    <dl><dt><dfn data-dfn-type="type" data-export="" id="valdef-ray-size">&lt;size&gt;</dfn></dt>
    <dd>
     <pre class="prod">&lt;size&gt; = [ closest-side | closest-corner | sides ]</pre>
     <dl>
      <dt><dfn data-dfn-for="<size>" data-dfn-type="value" data-export=""
           id="size-closest-side">closest-side</dfn></dt>
      <dd>Closest side.</dd>
     </dl>
    </dd></dl>
    """
    res = css(html)
    types = res["values"]
    assert len(types) == 1
    t = types[0]
    assert t["name"] == "<size>"
    assert t["value"] == "[ closest-side | closest-corner | sides ]"
    assert t["values"][0]["name"] == "closest-side"
    assert t["values"][0]["value"] == "closest-side"


def test_function_signature_value():
    html = (
        '<p><dfn data-dfn-type="function" data-export="" id="f-ray">'
        "ray( &lt;angle&gt; &amp;&amp; &lt;size&gt; )</dfn></p>"
    )
    res = css(html)
    fn = res["values"][0]
    assert fn["name"] == "ray() = ray( <angle> && <size> )".split(" = ")[0]
    assert fn["value"] == "ray( <angle> && <size> )"


def test_selector_value_from_name():
    html = '<dfn data-dfn-type="selector" data-export="" id="sel-hover">:hover</dfn>'
    res = css(html)
    sel = res["selectors"][0]
    assert sel["name"] == ":hover" and sel["value"] == ":hover"
