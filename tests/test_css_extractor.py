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
