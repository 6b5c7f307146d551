"""webidl2.js-shaped WebIDL AST parser.

The reference's ``idlparsed`` post-processor stores the FULL webidl2.js
AST per construct (/root/reference/src/postprocessing/idlparsed.js,
schema ``common.json`` $defs idlType/idlMember): structured ``idlType``
objects (context-typed, generic/union/nullable flags), extended
attributes as ``{type: "extended-attribute", name, rhs, arguments}``
records, argument ``default`` value records, const ``value`` records,
and ``special`` as a single string. ``functions/webidl.py`` emits a
simplified normal form (string types) that every oracle asserts
against; this module is the full-fidelity twin for consumers that
round-trip reference-shaped ``idlparsed`` JSON.

Shapes follow the public webidl2.js AST documented in its README
("Data types" section): https://github.com/w3c/webidl2.js — this is a
from-scratch recursive-descent implementation, no code copied.
"""

from __future__ import annotations

from reffy_spark.functions.webidl import PRIMITIVES, tokenize_spans

_GENERICS = frozenset(
    ["sequence", "record", "Promise", "FrozenArray", "ObservableArray"]
)
_MULTIWORD_FOLLOW = frozenset(["short", "long", "float", "double"])


class _AstParser:
    def __init__(self, idl: str):
        self.idl = idl
        self.toks, self.spans = tokenize_spans(idl)
        self.i = 0

    # -- token plumbing -----------------------------------------------------
    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t: str):
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    def eat(self, t: str) -> bool:
        if self.peek() == t:
            self.next()
            return True
        return False

    def cur_start(self) -> int:
        return self.spans[self.i][0] if self.i < len(self.spans) else -1

    def prev_end(self) -> int:
        return self.spans[self.i - 1][1] if 0 < self.i <= len(self.spans) else -1

    # -- extended attributes ------------------------------------------------
    def parse_ext_attrs(self) -> list[dict]:
        """``[A, B=x, C=(y, z), D=f(T t)]`` → webidl2 extended-attribute
        records. rhs types: identifier / identifier-list / string /
        string-list / integer / decimal / ``*``; trailing argument list
        parsed with full argument records."""
        attrs: list[dict] = []
        while self.peek() == "[":
            self.next()
            while True:
                name = self.next()
                rhs = None
                arguments: list[dict] = []
                if self.eat("="):
                    rhs = self._ext_attr_rhs()
                if self.peek() == "(":
                    arguments = self.parse_arguments()
                attrs.append(
                    {
                        "type": "extended-attribute",
                        "name": name,
                        "rhs": rhs,
                        "arguments": arguments,
                    }
                )
                if self.eat(","):
                    continue
                self.expect("]")
                break
        return attrs

    def _ext_attr_rhs(self) -> dict:
        t = self.peek()
        if t == "(":  # list form
            self.next()
            items = []
            kind = "identifier-list"
            while self.peek() not in (")", None):
                v = self.next()
                if v == ",":
                    continue
                if v.startswith('"'):
                    kind = "string-list"
                    v = v.strip('"')
                elif _is_int(v):
                    kind = "integer-list"
                elif _is_decimal(v):
                    kind = "decimal-list"
                items.append({"value": v})
            self.next()  # )
            return {"type": kind, "value": items}
        v = self.next()
        if v == "*":
            return {"type": "*"}
        if v.startswith('"'):
            return {"type": "string", "value": v.strip('"')}
        if _is_int(v):
            return {"type": "integer", "value": v}
        if _is_decimal(v):
            return {"type": "decimal", "value": v}
        return {"type": "identifier", "value": v}

    # -- types ----------------------------------------------------------------
    def parse_type(self, ctx: str) -> dict:
        """A webidl2 ``idlType`` record; nested generic/union member
        types inherit the context string, per webidl2.js."""
        ext = self.parse_ext_attrs()
        t = {
            "type": ctx,
            "extAttrs": ext,
            "generic": "",
            "nullable": False,
            "union": False,
            "idlType": "",
        }
        if self.peek() == "(":  # union
            self.next()
            members = []
            while self.peek() not in (")", None):
                if self.eat("or"):
                    continue
                members.append(self.parse_type(ctx))
            self.next()  # )
            t["union"] = True
            t["idlType"] = members
        else:
            word = self.next()
            if word in _GENERICS and self.peek() == "<":
                self.next()
                params = []
                while self.peek() not in (">", None):
                    if self.eat(","):
                        continue
                    params.append(self.parse_type(ctx))
                self.next()  # >
                t["generic"] = word
                t["idlType"] = params
            else:
                words = [word]
                while words[-1] in ("unsigned", "unrestricted", "long") and self.peek() in _MULTIWORD_FOLLOW:
                    words.append(self.next())
                t["idlType"] = " ".join(words)
        if self.eat("?"):
            t["nullable"] = True
        return t

    # -- values ---------------------------------------------------------------
    def parse_value(self) -> dict:
        """Default / const value records (webidl2 ``Default`` shapes)."""
        t = self.next()
        if t == "[":
            self.expect("]")
            return {"type": "sequence", "value": []}
        if t == "{":
            self.expect("}")
            return {"type": "dictionary"}
        if t is None:
            return {"type": "null"}
        if t.startswith('"'):
            return {"type": "string", "value": t.strip('"')}
        if t == "null":
            return {"type": "null"}
        if t in ("true", "false"):
            return {"type": "boolean", "value": t == "true"}
        if t in ("Infinity", "-Infinity"):
            return {"type": "Infinity", "negative": t.startswith("-")}
        if t == "NaN":
            return {"type": "NaN"}
        return {"type": "number", "value": t}

    # -- arguments ------------------------------------------------------------
    def parse_arguments(self) -> list[dict]:
        args = []
        self.expect("(")
        while self.peek() not in (")", None):
            if self.eat(","):
                continue
            ext = self.parse_ext_attrs()
            optional = self.eat("optional")
            typ = self.parse_type("argument-type")
            variadic = self.eat("...")
            name = self.next()
            default = None
            if self.eat("="):
                default = self.parse_value()
            args.append(
                {
                    "type": "argument",
                    "name": name,
                    "extAttrs": ext,
                    "idlType": typ,
                    "default": default,
                    "optional": optional,
                    "variadic": variadic,
                }
            )
        self.next()  # )
        return args

    # -- members --------------------------------------------------------------
    def parse_members(self) -> list[dict]:
        members: list[dict] = []
        if not self.eat("{"):
            self.eat(";")
            return members
        while self.peek() not in ("}", None):
            members.append(self.parse_member())
        self.next()  # }
        self.eat(";")
        return members

    def parse_member(self) -> dict:
        ext = self.parse_ext_attrs()
        special = ""
        readonly = False
        async_ = False
        while True:
            t = self.peek()
            if t in ("static", "stringifier", "inherit", "getter", "setter", "deleter"):
                special = self.next()
            elif t == "readonly":
                readonly = True
                self.next()
            elif t == "async":
                async_ = True
                self.next()
            else:
                break
        t = self.peek()
        if t == "constructor":
            self.next()
            args = self.parse_arguments()
            self.eat(";")
            return {"type": "constructor", "arguments": args, "extAttrs": ext}
        if t == "attribute":
            self.next()
            typ = self.parse_type("attribute-type")
            name = self.next()
            self.eat(";")
            return {
                "type": "attribute",
                "name": name,
                "special": special,
                "readonly": readonly,
                "idlType": typ,
                "extAttrs": ext,
            }
        if t == "const":
            self.next()
            typ = self.parse_type("const-type")
            name = self.next()
            self.expect("=")
            value = self.parse_value()
            self.eat(";")
            return {
                "type": "const",
                "name": name,
                "idlType": typ,
                "value": value,
                "extAttrs": ext,
            }
        if t in ("iterable", "maplike", "setlike"):
            kind = self.next()
            params = []
            if self.eat("<"):
                while self.peek() not in (">", None):
                    if self.eat(","):
                        continue
                    params.append(self.parse_type(None))
                self.next()
            args = self.parse_arguments() if self.peek() == "(" else []
            self.eat(";")
            return {
                "type": kind,
                "idlType": params,
                "readonly": readonly,
                "async": async_,
                "arguments": args,
                "extAttrs": ext,
            }
        if t == ";":  # bare `stringifier;`
            self.next()
            return {
                "type": "operation",
                "name": "",
                "special": special,
                "idlType": None,
                "arguments": [],
                "extAttrs": ext,
            }
        # operation (or dictionary field — dictionaries use parse_field)
        typ = self.parse_type("return-type")
        name = "" if self.peek() == "(" else self.next()
        if self.peek() == "(":
            args = self.parse_arguments()
            self.eat(";")
            return {
                "type": "operation",
                "name": name,
                "special": special,
                "idlType": typ,
                "arguments": args,
                "extAttrs": ext,
            }
        self.eat(";")
        # interface bodies have no plain fields; tolerate by emitting a
        # field record (webidl2.js would throw — callers surface errors
        # through the strict simplified parser)
        typ["type"] = "dictionary-type"
        return {
            "type": "field",
            "name": name,
            "required": False,
            "idlType": typ,
            "default": None,
            "extAttrs": ext,
        }

    def parse_dict_members(self) -> list[dict]:
        members: list[dict] = []
        if not self.eat("{"):
            self.eat(";")
            return members
        while self.peek() not in ("}", None):
            ext = self.parse_ext_attrs()
            required = self.eat("required")
            typ = self.parse_type("dictionary-type")
            name = self.next()
            default = None
            if self.eat("="):
                default = self.parse_value()
            self.eat(";")
            members.append(
                {
                    "type": "field",
                    "name": name,
                    "required": required,
                    "idlType": typ,
                    "default": default,
                    "extAttrs": ext,
                }
            )
        self.next()
        self.eat(";")
        return members

    # -- top-level constructs -------------------------------------------------
    def parse(self) -> list[dict]:
        out = []
        while self.peek() is not None:
            start = self.cur_start()
            c = self.parse_construct()
            if c is None:
                continue
            c["fragment"] = self.idl[start : self.prev_end()].strip()
            out.append(c)
        return out

    def parse_construct(self) -> dict | None:
        ext = self.parse_ext_attrs()
        partial = self.eat("partial")
        t = self.peek()
        if t is None:
            return None
        if t == "interface" or (t == "callback" and self.peek(1) == "interface"):
            callback = t == "callback"
            if callback:
                self.next()
            self.next()  # interface
            mixin = self.eat("mixin")
            name = self.next()
            inheritance = self.next() if self.eat(":") else None
            members = self.parse_members()
            return {
                "type": "interface mixin" if mixin else (
                    "callback interface" if callback else "interface"
                ),
                "name": name,
                "inheritance": inheritance,
                "members": members,
                "partial": partial,
                "extAttrs": ext,
            }
        if t == "namespace":
            self.next()
            name = self.next()
            members = self.parse_members()
            return {
                "type": "namespace",
                "name": name,
                "inheritance": None,
                "members": members,
                "partial": partial,
                "extAttrs": ext,
            }
        if t == "dictionary":
            self.next()
            name = self.next()
            inheritance = self.next() if self.eat(":") else None
            members = self.parse_dict_members()
            return {
                "type": "dictionary",
                "name": name,
                "inheritance": inheritance,
                "members": members,
                "partial": partial,
                "extAttrs": ext,
            }
        if t == "enum":
            self.next()
            name = self.next()
            values = []
            self.expect("{")
            while self.peek() not in ("}", None):
                v = self.next()
                if v != ",":
                    values.append({"type": "enum-value", "value": v.strip('"')})
            self.next()
            self.eat(";")
            return {"type": "enum", "name": name, "values": values, "extAttrs": ext}
        if t == "typedef":
            self.next()
            typ = self.parse_type("typedef-type")
            name = self.next()
            self.eat(";")
            return {"type": "typedef", "name": name, "idlType": typ, "extAttrs": ext}
        if t == "callback":
            self.next()
            name = self.next()
            self.expect("=")
            ret = self.parse_type("return-type")
            args = self.parse_arguments()
            self.eat(";")
            return {
                "type": "callback",
                "name": name,
                "idlType": ret,
                "arguments": args,
                "extAttrs": ext,
            }
        if self.peek(1) == "includes":
            target = self.next()
            self.next()
            mixin = self.next()
            self.eat(";")
            return {
                "type": "includes",
                "target": target,
                "includes": mixin,
                "extAttrs": ext,
            }
        raise ValueError(f"unrecognised construct at token {t!r}")


def _is_int(t: str) -> bool:
    try:
        int(t, 0)
        return True
    except (ValueError, TypeError):
        return False


def _is_decimal(t: str) -> bool:
    try:
        float(t)
        return True
    except (ValueError, TypeError):
        return False


def parse_webidl2(idl: str) -> list[dict]:
    """Parse an IDL dump into a webidl2.js-shaped construct list (the
    analog of ``WebIDL2.parse(idl)``). Applies the same WebIDL-1→2
    normalization as ``parse_idl`` first (F10)."""
    import re

    idl = re.sub(r"(\w+(?:<[^>]*>)?)\[\]", r"FrozenArray<\1>", idl)
    idl = re.sub(r"serializer\s*=\s*{[^}]*};?", "[Default] object toJSON();", idl)
    return _AstParser(idl).parse()


def type_deps(t) -> set[str]:
    """Non-primitive identifiers referenced by an idlType record."""
    out: set[str] = set()
    if t is None:
        return out
    inner = t.get("idlType") if isinstance(t, dict) else t
    if isinstance(inner, str):
        if inner not in PRIMITIVES and inner[:1].isupper():
            out.add(inner)
    elif isinstance(inner, list):
        for sub in inner:
            out |= type_deps(sub)
    return out


def build_report_ast(idl: str) -> dict:
    """The reference's idlparsed report built over the FULL AST — same
    walk as src/postprocessing/idlparsed.js:30-118 (there over the
    webidl2.js parse), full-AST constructs in idlNames/idlExtendedNames.

    Raises ValueError on unparseable IDL (webidl2.js throw semantics);
    the simplified parser's lenient/skip-to-semicolon + error-string
    behavior lives in ``parse_idl``/``idlparsed_run``.
    """
    import re

    constructs = parse_webidl2(idl)
    report: dict = {
        "jsNames": {"constructors": {}, "functions": {}},
        "idlNames": {},
        "idlExtendedNames": {},
        "globals": {},
        "exposed": {},
        "dependencies": {},
        "externalDependencies": [],
        "hasObsoleteIdl": bool(
            re.search(r"\w+\[\]", idl) or re.search(r"serializer\s*=", idl)
        ),
    }
    all_deps: dict[str, set] = {}

    def _rhs_values(rhs) -> list[str]:
        if rhs is None:
            return []
        if rhs["type"] == "*":
            return ["*"]
        v = rhs.get("value")
        if isinstance(v, list):
            return [x["value"] for x in v]
        return [v]

    for c in constructs:
        ctype = c["type"]
        if ctype == "includes":
            report["idlExtendedNames"].setdefault(c["target"], []).append(c)
            all_deps.setdefault(c["target"], set()).add(c["includes"])
            continue
        name = c.get("name")
        deps: set[str] = set()
        if c.get("inheritance"):
            deps.add(c["inheritance"])
        for m in c.get("members") or []:
            deps |= type_deps(m.get("idlType"))
            for a in m.get("arguments") or []:
                deps |= type_deps(a.get("idlType"))
            for sub in (
                m.get("idlType") if isinstance(m.get("idlType"), list) else []
            ):
                deps |= type_deps(sub)
        if ctype == "callback":
            deps |= type_deps(c.get("idlType"))
            for a in c.get("arguments") or []:
                deps |= type_deps(a.get("idlType"))
        if ctype == "typedef":
            deps |= type_deps(c.get("idlType"))

        if c.get("partial"):
            report["idlExtendedNames"].setdefault(name, []).append(c)
        else:
            report["idlNames"][name] = c
        all_deps.setdefault(name, set()).update(deps)

        exposed: list[str] = []
        globals_: list[str] = []
        for a in c.get("extAttrs") or []:
            if a["name"] == "Exposed":
                exposed = _rhs_values(a["rhs"]) or ["*"]
            elif a["name"] == "Global":
                globals_ = _rhs_values(a["rhs"])
        for g in exposed:
            report["exposed"].setdefault(g, [])
            if name not in report["exposed"][g]:
                report["exposed"][g].append(name)
        for g in globals_:
            report["globals"].setdefault(g, [])
            if name not in report["globals"][g]:
                report["globals"][g].append(name)
        if (
            exposed
            and ctype == "interface"
            and not c.get("partial")
        ):
            has_ctor = any(
                m["type"] == "constructor" for m in c.get("members") or []
            )
            bucket = "constructors" if has_ctor else "functions"
            for g in exposed:
                report["jsNames"][bucket].setdefault(g, [])
                if name not in report["jsNames"][bucket][g]:
                    report["jsNames"][bucket][g].append(name)

    for name, deps in all_deps.items():
        deps.discard(name)
        report["dependencies"][name] = sorted(deps)
    known = set(report["idlNames"])
    ext_deps: set = set()
    for deps in all_deps.values():
        ext_deps.update(d for d in deps if d not in known)
    report["externalDependencies"] = sorted(ext_deps)
    return report
