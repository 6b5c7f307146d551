"""Crawl-level report outputs validate against the ported
postprocessing schemas — the reference runs exactly this check with Ajv
over its generate-backrefs / css outputs (schemas/postprocessing/*.json
via util.js:1065-1140). Synthetic-example tests live in
test_schema_validation.py; these validate OUR ACTUAL report builders'
output shapes."""

from reffy_spark.plans.cssmerge import cssmerge_crawl
from reffy_spark.plans.postprocess import backrefs_crawl
from reffy_spark.validation import DEFS, validate, validate_post


def _dfn(i):
    return {
        "id": f"t{i}", "href": f"https://a.test/#t{i}", "linkingText": [f"t{i}"],
        "localLinkingText": [], "type": "dfn", "for": [], "access": "public",
        "informative": False,
        "heading": {"href": "https://a.test/", "title": "A"},
        "definedIn": "prose",
    }


def test_backrefs_crawl_report_conforms(spark):
    specs = [
        {"shortname": "a", "title": "Spec A", "url": "https://a.test/",
         "nightly": {"url": "https://a.test/"}, "dfns": [_dfn(1), _dfn(2)],
         "links": {}},
        {"shortname": "b-v1.1", "title": "Spec B", "url": "https://b.test/",
         "nightly": {"url": "https://b.test/"}, "dfns": [],
         "links": {"rawlinks": {"https://a.test/": {"anchors": ["t1"]}}}},
    ]
    out = backrefs_crawl(spark, specs)
    assert set(out) == {"a"}
    for shortname, backrefs in out.items():
        spec = next(s for s in specs if s["shortname"] == shortname)
        rec = {"spec": {"title": spec["title"], "url": spec["url"]},
               "backrefs": backrefs}
        assert validate_post("backrefs", rec) == []


def test_cssmerge_crawl_report_conforms(spark):
    specs = [
        {"shortname": "css-a", "title": "CSS A", "url": "https://csa.test/",
         "crawled": "https://csa.test/",
         "css": {
             "properties": [{"name": "color", "href": "https://csa.test/#color",
                             "value": "<color>"}],
             "atrules": [{"name": "@media", "href": "https://csa.test/#media",
                          "descriptors": [{"name": "width", "for": "@media",
                                           "value": "<length>"}]}],
             "selectors": [{"name": ":hover", "href": "https://csa.test/#hover"}],
             "values": [{"name": "<color>", "type": "type",
                         "href": "https://csa.test/#colorty",
                         "value": "red | blue"}],
         }},
        {"shortname": "css-b", "title": "CSS B", "url": "https://csb.test/",
         "crawled": "https://csb.test/",
         "css": {"properties": [{"name": "color",
                                 "href": "https://csb.test/#color",
                                 "newValues": "green"}],
                 "atrules": [], "selectors": [], "values": []}},
    ]
    out = cssmerge_crawl(spark, specs)
    assert validate_post("css", out) == []
    # the merged property carries both the base syntax and the extension
    color = next(p for p in out["properties"] if p["name"] == "color")
    assert "syntax" in color


def test_shortname_pattern_matches_js_lookbehind_semantics():
    # the JS original (^[\w\-]+((?<=-v?\d+)\.\d+)?$) uses a
    # variable-width look-behind Python re rejects; the translated
    # alternation must agree on representative cases
    cases = {
        "css-fonts-4": True,
        "svg-v1.1": True,
        "css2.1": False,  # '.1' not preceded by -v?N
        "webrtc-stats-1.1": True,
        "a.b": False,
        "SVG11": True,
    }
    for s, ok in cases.items():
        errs = validate(s, DEFS["shortname"], DEFS)
        assert (not errs) == ok, (s, errs)
