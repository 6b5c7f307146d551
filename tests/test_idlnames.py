"""idlnames fragment assembly + expected-dfn matching
(reference: src/postprocessing/idlnames.js:40-391,
src/cli/check-missing-dfns.js:96-348)."""

import pytest
from pyspark.sql import functions as F

from reffy_spark.functions.webidl import parse_idl
from reffy_spark.plans import postprocess as PP


def test_parse_idl_fragments():
    r = parse_idl(
        '[Exposed=Window]\ninterface Foo : Bar {\n  attribute DOMString x;\n};\n'
        "partial interface Foo { const short y = 1; };\n"
        "Foo includes Mix;\n"
        'enum E { "a", "b" };'
    )
    assert r["idlNames"]["Foo"]["fragment"] == (
        "[Exposed=Window]\ninterface Foo : Bar {\n  attribute DOMString x;\n};"
    )
    assert (
        r["idlExtendedNames"]["Foo"][0]["fragment"]
        == "partial interface Foo { const short y = 1; };"
    )
    assert r["idlExtendedNames"]["Foo"][1]["fragment"] == "Foo includes Mix;"
    assert r["idlNames"]["E"]["fragment"] == 'enum E { "a", "b" };'


@pytest.fixture(scope="module")
def idl_world(spark):
    rows = [
        (
            "https://s1.test/",
            "interface Foo : Bar {\n  attribute DOMString x;\n};\n"
            "Foo includes Mix;\n"
            "interface mixin Mix { attribute long m; };\n"
            "interface Bar : Baz { };\n"
            "interface Baz { };",
        ),
        (
            "https://s2.test/",
            # duplicate definition of Foo — ignored (s1 < s2, first wins)
            "interface Foo { };\n"
            "partial interface Foo { const short y = 1; };\n"
            # cyclic inheritance pair
            "interface P : Q { };\ninterface Q : P { };\n"
            # inheritance to an unknown name — dropped from deps
            "interface Lone : NotDefinedAnywhere { };",
        ),
    ]
    parsed = PP.idlparsed(
        spark.createDataFrame(rows, "url string, idl string")
    )
    titles = spark.createDataFrame(
        [("https://s1.test/", "Spec One"), ("https://s2.test/", "Spec Two")],
        "url string, title string",
    )
    return parsed, titles


def test_idlnames_fragments_assembly(spark, idl_world):
    parsed, titles = idl_world
    out = {r["name"]: r for r in PP.idlnames_fragments(parsed, titles).collect()}

    foo = out["Foo"]
    # first definition (s1) wins; s2's duplicate definition is dropped,
    # but s2's partial still extends (idlnames.js:209-246)
    assert foo["defined_spec"] == "https://s1.test/"
    assert foo["extended_specs"] == ["https://s1.test/", "https://s2.test/"]
    assert foo["fragment"] == (
        "// Source: Spec One (https://s1.test/)\n"
        "interface Foo : Bar {\n  attribute DOMString x;\n};"
        "\n\n// Source: Spec One (https://s1.test/)\nFoo includes Mix;"
        "\n\n// Source: Spec Two (https://s2.test/)\n"
        "partial interface Foo { const short y = 1; };"
    )
    # transitive deps: inheritance chain + includes
    assert foo["deps"] == ["Bar", "Baz", "Mix"]
    assert out["Bar"]["deps"] == ["Baz"]
    assert out["Mix"]["deps"] == []
    # cyclic inheritance: self-edges cut, the other node kept
    assert out["P"]["deps"] == ["Q"]
    assert out["Q"]["deps"] == ["P"]
    # unknown inheritance target dropped (idlnames.js:262-268)
    assert out["Lone"]["deps"] == []
    assert "NotDefinedAnywhere" not in out


def test_expected_dfns_reference_switch(spark):
    idl = """[Exposed=Window]
interface Foo {
  attribute DOMString x;
  undefined go(long a, DOMString... rest);
  undefined go();
  [Default] object toJSON();
  stringifier;
  constructor(DOMString q);
};
interface HTMLSpan { constructor(); };
enum E { "a", "" };
partial interface Foo { const short k = 1; };
"""
    parsed = PP.idlparsed(
        spark.createDataFrame([("u", idl)], "url string, idl string")
    )
    rows = {
        (r["root"], r["member"], r["dfn_type"], tuple(r["linking"])): r
        for r in PP.expected_dfns_from_idl(parsed).collect()
    }
    keys = set(rows)
    # overloads are distinct expected rows with serialized args
    assert ("Foo", "go", "method", ("go(a, ...rest)",)) in keys
    assert ("Foo", "go", "method", ("go()",)) in keys
    # default toJSON skipped (check-missing-dfns.js:128-133,236)
    assert not any(k[1] == "toJSON" for k in keys)
    # stringifier → 'stringification behavior' dfn
    assert (
        "Foo", "", "dfn",
        ("stringification behavior", "stringificationbehavior"),
    ) in keys
    # constructor linking text; HTML element constructors skipped
    assert ("Foo", "constructor", "constructor", ("constructor(q)",)) in keys
    assert not any(k[0] == "HTMLSpan" and k[2] == "constructor" for k in keys)
    # enum values: quoted + unquoted, empty string only quoted
    assert ("E", "a", "enum-value", ('"a"', "a")) in keys
    assert ("E", "", "enum-value", ('""',)) in keys
    # partial root excluded, but its members are expected
    assert ("Foo", "k", "const", ("k",)) in keys
    roots = [k for k in keys if k[1] is None]
    assert ("Foo", None, "interface", ("Foo",)) in roots
    assert ("E", None, "enum", ("E",)) in roots


def test_match_idl_dfns_fixups_and_order(spark):
    expected = spark.createDataFrame(
        [
            ("u", "Foo", "go", "method", ["go(a)"], ["Foo"]),
            ("u", "Foo", "only", "method", ["only()"], ["Foo"]),
        ],
        "spec string, root string, member string, dfn_type string, "
        "linking array<string>, dfn_for array<string>",
    )
    dfns = spark.createDataFrame(
        [
            # overload tag + respec '(, ' artifact are normalized away
            ("u", "method", ["Foo"], ["go!overload-1(a)"], "#go1", 1),
            ("u", "method", ["Foo"], ["go(a)"], "#go0", 0),
            # matches `only` via the '(, ' fix
            ("u", "method", ["Foo"], ["only(, )"], "#only", 2),
            # wrong `for` — never matches
            ("u", "method", ["Other"], ["go(a)"], "#other", 3),
        ],
        "url string, type string, for array<string>, "
        "linkingText array<string>, href string, dfn_idx int",
    )
    got = {
        (r["member"],): r["href"]
        for r in PP.match_idl_dfns(expected, dfns).collect()
    }
    # first matching dfn in document order (dfn_idx) wins
    assert got[("go",)] == "#go0"
    assert got[("only",)] == "#only"
