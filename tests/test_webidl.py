"""WebIDL parser tests (parse-webidl.js semantics)."""

from reffy_spark.functions.webidl import event_handlers_of, parse_idl

IDL = """
[Exposed=(Window,Worker)]
interface Foo : EventTarget {
  constructor(DOMString name);
  readonly attribute unsigned long count;
  attribute EventHandler onchange;
  Promise<sequence<Bar>> list(optional unsigned long max = 10);
  DOMString list(DOMString filter);
  const unsigned short MODE = 2;
};

interface mixin Extras {
  undefined ping();
};
Foo includes Extras;

partial interface Foo {
  attribute DOMString extra;
};

dictionary Options : BaseOptions {
  required DOMString name;
  unsigned long count = 1;
};

enum Mode { "auto", "manual" };
typedef (DOMString or Foo) FooLike;
callback Cb = undefined (DOMString msg);

[Global=Worker, Exposed=Worker]
interface WorkerScope {
};
"""


def test_idl_names_and_types():
    r = parse_idl(IDL)
    assert set(r["idlNames"]) == {
        "Foo", "Extras", "Options", "Mode", "FooLike", "Cb", "WorkerScope"
    }
    assert r["idlNames"]["Foo"]["type"] == "interface"
    assert r["idlNames"]["Foo"]["inheritance"] == "EventTarget"
    assert r["idlNames"]["Extras"]["type"] == "interface mixin"
    assert r["idlNames"]["Mode"]["values"] == ["auto", "manual"]


def test_members_and_overloads():
    r = parse_idl(IDL)
    members = r["idlNames"]["Foo"]["members"]
    kinds = [(m["type"], m["name"]) for m in members]
    assert ("constructor", "constructor") in kinds
    assert ("attribute", "count") in kinds
    ops = [m for m in members if m["type"] == "operation" and m["name"] == "list"]
    assert len(ops) == 2  # overloads preserved (W4 numbering downstream)


def test_extended_names_partial_and_includes():
    r = parse_idl(IDL)
    exts = r["idlExtendedNames"]["Foo"]
    types = sorted(e["type"] for e in exts)
    assert types == ["includes", "interface"]


def test_globals_exposed_jsnames():
    r = parse_idl(IDL)
    assert r["globals"] == {"Worker": ["WorkerScope"]}
    assert set(r["exposed"]) == {"Window", "Worker"}
    assert "Foo" in r["exposed"]["Window"]
    assert "Foo" in r["jsNames"]["constructors"]["Window"]
    assert "WorkerScope" in r["jsNames"]["functions"]["Worker"]


def test_dependencies():
    r = parse_idl(IDL)
    assert "EventTarget" in r["dependencies"]["Foo"]
    assert "Bar" in r["dependencies"]["Foo"]
    assert "EventTarget" in r["externalDependencies"]
    assert "Bar" in r["externalDependencies"]
    assert "Extras" not in r["externalDependencies"]  # defined internally


def test_webidl1_normalization():
    r = parse_idl("interface A { attribute DOMString[] names; serializer = {attribute}; };")
    assert r.get("hasObsoleteIdl") is True
    m = r["idlNames"]["A"]["members"][0]
    assert m["idlType"] == "FrozenArray<DOMString>"


def test_event_handlers_of():
    r = parse_idl(IDL)
    assert event_handlers_of(r) == [("Foo", "change")]


def test_empty_and_garbage():
    assert parse_idl("")["idlNames"] == {}
    r = parse_idl("this is ; not idl at all ;")
    assert isinstance(r["idlNames"], dict)

def test_exposed_identifier_list_in_parens():
    # [Exposed=(Window,Worker)]: commas inside parens must NOT split the
    # extended attribute (webidl2.js IdentifierList semantics)
    r = parse_idl("[Exposed=(Window,Worker)] interface Foo { attribute long x; };")
    assert set(r["exposed"]) == {"Window", "Worker"}
    assert r["idlNames"]["Foo"]["extAttrs"] == ["Exposed"]
    assert "Foo" in r["jsNames"]["functions"]["Window"]
    assert "Foo" in r["jsNames"]["functions"]["Worker"]
