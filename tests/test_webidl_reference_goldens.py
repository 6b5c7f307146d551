"""WebIDL parser + idlparsed post-processor goldens transcribed from the
reference's own suites (/root/reference/test/webidl-parser/*.js,
/root/reference/test/generate-idlparsed.js)."""

import pytest

from reffy_spark.functions.webidl import parse_idl
from reffy_spark.plans.postprocess import idlparsed_run


# --- webidl-parser/exported-names.js ---------------------------------------


def test_exports_named_definitions():
    data = parse_idl(
        """
      interface testInterface {};
      dictionary testDict {};
      enum testEnum { "one" };
      callback testCallback = void ();
      typedef string testTypedef;
      callback interface testCallbackInterface {};
    """
    )
    for name in (
        "testInterface", "testDict", "testEnum", "testCallback",
        "testCallbackInterface",
    ):
        assert name in data["idlNames"], name


def test_does_not_export_partial_definitions():
    data = parse_idl(
        """
      partial interface testInterface {};
      partial dictionary testDict {};
    """
    )
    assert "testInterface" not in data["idlNames"]
    assert "testDict" not in data["idlNames"]


# --- webidl-parser/global.js ------------------------------------------------


def test_not_exposed_on_window_by_default():
    data = parse_idl("interface notExposedOnWindow {};")
    assert "Window" not in data["jsNames"]["functions"]
    assert data["globals"] == {}
    assert data["exposed"] == {}


def test_simple_global_definition_and_reference():
    data = parse_idl(
        """
      [Global=primaryInterface]
      interface primaryInterface {};

      [Exposed=primaryInterface]
      interface exposedOnPrimaryInterface {};
    """
    )
    assert "primaryInterface" in data["globals"]["primaryInterface"]
    assert "exposedOnPrimaryInterface" in data["exposed"]["primaryInterface"]
    assert (
        "exposedOnPrimaryInterface"
        in data["jsNames"]["functions"]["primaryInterface"]
    )


def test_global_interface_uses_global_name():
    data = parse_idl(
        "[Global=theInterface, Exposed=theInterface]\ninterface anInterface {};"
    )
    assert "anInterface" in data["globals"]["theInterface"]
    assert "anInterface" not in data["globals"]
    assert "anInterface" in data["exposed"]["theInterface"]
    assert "anInterface" not in data["exposed"]
    assert "anInterface" in data["jsNames"]["functions"]["theInterface"]


def test_multiple_global_names():
    data = parse_idl(
        "[Global=(theInterface,sameInterface), Exposed=theInterface]\n"
        "interface anInterface {};"
    )
    assert "anInterface" in data["globals"]["theInterface"]
    assert "anInterface" in data["globals"]["sameInterface"]
    assert "anInterface" not in data["globals"]
    assert "anInterface" in data["exposed"]["theInterface"]
    assert "sameInterface" not in data["exposed"]
    assert "anInterface" in data["jsNames"]["functions"]["theInterface"]
    assert "sameInterface" not in data["jsNames"]["functions"]


def test_exposed_star():
    data = parse_idl("[Exposed=*]\ninterface anInterface {};")
    assert "*" in data["exposed"]


# --- webidl-parser/includes.js ---------------------------------------------


def test_includes_statements():
    data = parse_idl(
        "interface Base {};\ninterface Extended {};\nExtended includes Base;"
    )
    assert "Extended" in data["idlNames"]


# --- webidl-parser/well-known.js -------------------------------------------


@pytest.mark.parametrize(
    "type_", ["undefined", "boolean", "DOMString", "long long"]
)
def test_well_known_types_not_dependencies(type_):
    data = parse_idl(
        f"interface test {{\n  {type_} doNothing();\n}};"
    )
    assert "test" in data["dependencies"]
    assert data["dependencies"]["test"] == []
    assert data["externalDependencies"] == []


# --- generate-idlparsed.js --------------------------------------------------


def test_idlparsed_leaves_spec_without_idl_intact():
    assert idlparsed_run({}) == {}


def test_idlparsed_parses_raw_idl():
    result = idlparsed_run({"idl": "interface foo {};"})
    assert result["idlparsed"]["idlNames"] == {
        "foo": {
            "extAttrs": [],
            "fragment": "interface foo {};",
            "inheritance": None,
            "members": [],
            "name": "foo",
            "partial": False,
            "type": "interface",
        }
    }


def test_idlparsed_reports_parse_errors():
    result = idlparsed_run({"idl": "intraface foo {};"})
    assert result["idlparsed"] == (
        "WebIDLParseError: Syntax error at line 1:\n"
        "intraface foo {};\n"
        "^ Unrecognised tokens"
    )


@pytest.mark.parametrize(
    "type_",
    ["dictionary", "interface", "interface mixin", "callback interface",
     "namespace"],
)
def test_idlparsed_links_back_to_definition(type_):
    spec = {
        "dfns": [
            {
                "href": "about:blank/#foo",
                "linkingText": ["foo"],
                "localLinkingText": [],
                "type": type_.split(" ")[0],
                "for": [],
                "access": "public",
                "informative": False,
                "links": [],
            }
        ],
        "idl": f"{type_} foo {{}};",
    }
    result = idlparsed_run(spec)
    assert result["idlparsed"]["idlNames"] == {
        "foo": {
            "extAttrs": [],
            "fragment": f"{type_} foo {{}};",
            "inheritance": None,
            "members": [],
            "name": "foo",
            "partial": False,
            "type": type_,
            "href": "about:blank/#foo",
        }
    }
