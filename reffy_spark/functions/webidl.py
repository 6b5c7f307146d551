"""Minimal WebIDL parser + the idlparsed report.

Re-expresses the reference's ``parse-webidl`` post-processor
(/root/reference/src/cli/parse-webidl.js:85-130 — there built on the
public webidl2.js parser): given the raw IDL dump of a spec, produce

    {jsNames: {constructors, functions}, idlNames, idlExtendedNames,
     globals, exposed, dependencies, externalDependencies}

This is a from-scratch recursive-descent parser covering the WebIDL
surface that actually appears in spec extracts: interfaces (incl.
partial / mixin / callback), namespaces, dictionaries, enums, typedefs,
callbacks, includes statements, constructors, operations (overloads),
attributes, consts, iterable/maplike/setlike, extended attributes
(Exposed / Global parsed; others carried as names), union / generic /
nullable types. WebIDL-1 constructs are normalized first
(``T[]`` → ``FrozenArray<T>`` — parse-webidl.js:30-55, F10).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<str>"[^"]*")
  | (?P<float>-?\d+\.\d+(e[-+]?\d+)?|-?\.\d+|-?\d+e[-+]?\d+|Infinity|-Infinity|NaN)
  | (?P<int>-?0[xX][0-9a-fA-F]+|-?\d+)
  | (?P<id>[_-]?[A-Za-z][0-9A-Za-z_-]*)
  | (?P<punct>\.\.\.|[(){}\[\]<>,;:=?*])
""",
    re.VERBOSE | re.DOTALL,
)

PRIMITIVES = frozenset(
    """any object boolean byte octet short unsigned long float double
    unrestricted undefined void DOMString ByteString USVString bigint
    symbol or sequence record Promise FrozenArray ObservableArray
    optional""".split()
)


def tokenize_spans(idl: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Tokens plus their (start, end) character spans in ``idl`` — spans
    let the parser slice each construct's source fragment (the reference
    records per-construct ``fragment`` text in the idlparsed report,
    src/postprocessing/idlparsed.js, consumed by idlnames.js)."""
    out: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    while pos < len(idl):
        m = _TOKEN_RE.match(idl, pos)
        if not m:
            pos += 1  # skip unknown byte
            continue
        pos = m.end()
        if m.lastgroup != "ws":
            out.append(m.group())
            spans.append((m.start(), m.end()))
    return out, spans


def tokenize(idl: str) -> list[str]:
    return tokenize_spans(idl)[0]


class _Parser:
    def __init__(self, tokens: list[str], spans: list[tuple[int, int]] | None = None):
        self.toks = tokens
        self.spans = spans
        self.i = 0

    def cur_start(self) -> int:
        """Source offset where the current (unconsumed) token begins."""
        if self.spans is None or self.i >= len(self.spans):
            return -1
        return self.spans[self.i][0]

    def prev_end(self) -> int:
        """Source offset just past the last consumed token."""
        if self.spans is None or self.i == 0:
            return -1
        return self.spans[min(self.i, len(self.spans)) - 1][1]

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str | None:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r} at {self.i}")

    def skip_until(self, t: str) -> None:
        while self.peek() is not None and self.peek() != t:
            self.next()
        self.next()

    # -- extended attributes ------------------------------------------------
    def parse_ext_attrs(self) -> list[dict]:
        attrs = []
        while self.peek() == "[":
            self.next()
            depth = 1
            paren = 0
            current: list[str] = []
            groups: list[list[str]] = [current]
            while depth > 0:
                t = self.next()
                if t is None:
                    break
                if t == "[":
                    depth += 1
                elif t == "]":
                    depth -= 1
                    if depth == 0:
                        break
                elif t == "(":
                    paren += 1
                elif t == ")":
                    paren -= 1
                if t == "," and depth == 1 and paren == 0:
                    current = []
                    groups.append(current)
                else:
                    current.append(t)
            for g in groups:
                if g:
                    attrs.append(self._ext_attr(g))
        return attrs

    @staticmethod
    def _ext_attr(tokens: list[str]) -> dict:
        name = tokens[0]
        rhs: list[str] = []
        if len(tokens) > 1 and tokens[1] == "=":
            rhs = [t for t in tokens[2:] if t not in ("(", ")", ",")]
        return {"name": name, "rhs": rhs}

    # -- types ----------------------------------------------------------------
    def parse_type(self, deps: set[str]) -> str:
        t = self.peek()
        if t == "(":  # union
            self.next()
            parts = []
            while self.peek() not in (")", None):
                if self.peek() == "or":
                    self.next()
                    continue
                parts.append(self.parse_type(deps))
            self.next()  # )
            typ = "(" + " or ".join(parts) + ")"
        else:
            words = [self.next()]
            # multi-word primitives: unsigned long long, long long, ...
            while words[-1] in ("unsigned", "unrestricted", "long") and self.peek() in (
                "short", "long", "float", "double",
            ):
                words.append(self.next())
            typ = " ".join(words)
            if self.peek() == "<":
                self.next()
                inner = []
                while self.peek() not in (">", None):
                    if self.peek() == ",":
                        self.next()
                        continue
                    inner.append(self.parse_type(deps))
                self.next()
                typ += "<" + ", ".join(inner) + ">"
        if self.peek() == "?":
            self.next()
            typ += "?"
        base = typ.split("<")[0].strip("?() ")
        for name in re.findall(r"[A-Za-z_][\w]*", typ):
            if name not in PRIMITIVES and name[0].isupper():
                deps.add(name)
        _ = base
        return typ

    # -- argument list ----------------------------------------------------------
    def parse_args(self, deps: set[str]) -> list[dict]:
        args = []
        self.expect("(")
        while self.peek() not in (")", None):
            if self.peek() == ",":
                self.next()
                continue
            self.parse_ext_attrs()
            optional = False
            if self.peek() == "optional":
                self.next()
                optional = True
            typ = self.parse_type(deps)
            variadic = False
            if self.peek() == "...":
                self.next()
                variadic = True
            name = self.next()
            if self.peek() == "=":  # default value
                self.next()
                depth = 0
                while self.peek() not in (None,) and not (
                    depth == 0 and self.peek() in (",", ")")
                ):
                    if self.peek() in ("[", "("):
                        depth += 1
                    elif self.peek() in ("]", ")"):
                        depth -= 1
                    self.next()
            args.append(
                {"name": name, "idlType": typ, "optional": optional, "variadic": variadic}
            )
        self.next()  # )
        return args


def _exposed_of(ext_attrs: list[dict]) -> list[str]:
    for a in ext_attrs:
        if a["name"] == "Exposed":
            return a["rhs"] or ["*"]
    return []


def _globals_of(ext_attrs: list[dict]) -> list[str]:
    for a in ext_attrs:
        if a["name"] == "Global":
            return a["rhs"]
    return []


def parse_idl(idl: str) -> dict:
    """Parse an IDL dump into the idlparsed report shape."""
    # WebIDL-1→2 normalization (F10): T[] → FrozenArray<T>;
    # serializer={...} → [Default] object toJSON();
    has_obsolete = bool(
        re.search(r"\w+\[\]", idl) or re.search(r"serializer\s*=", idl)
    )
    idl = re.sub(r"(\w+(?:<[^>]*>)?)\[\]", r"FrozenArray<\1>", idl)
    idl = re.sub(r"serializer\s*=\s*{[^}]*};?", "[Default] object toJSON();", idl)

    report: dict = {
        "jsNames": {"constructors": {}, "functions": {}},
        "idlNames": {},
        "idlExtendedNames": {},
        "globals": {},
        "exposed": {},
        "dependencies": {},
        "externalDependencies": [],
    }
    # always present, true or false — the reference assigns it
    # unconditionally (src/postprocessing/idlparsed.js:119) and the
    # idlparsed schema lists it as required
    report["hasObsoleteIdl"] = has_obsolete

    toks, spans = tokenize_spans(idl)
    p = _Parser(toks, spans)
    all_deps: dict[str, set] = {}
    last_recorded: list[dict] = []

    def record_construct(name, construct, partial, deps):
        if partial:
            report["idlExtendedNames"].setdefault(name, []).append(construct)
        else:
            report["idlNames"][name] = construct
        all_deps.setdefault(name, set()).update(deps)
        last_recorded.append(construct)

    while p.peek() is not None:
        frag_start = p.cur_start()
        last_recorded.clear()
        ext = p.parse_ext_attrs()
        t = p.peek()
        if t is None:
            break
        partial = False
        if t == "partial":
            p.next()
            partial = True
            t = p.peek()

        if t == "interface" or (t == "callback" and p.peek(1) == "interface"):
            callback = t == "callback"
            if callback:
                p.next()
            p.next()  # interface
            mixin = False
            if p.peek() == "mixin":
                p.next()
                mixin = True
            name = p.next()
            deps: set[str] = set()
            inheritance = None
            if p.peek() == ":":
                p.next()
                inheritance = p.next()
                deps.add(inheritance)
            members = _parse_members(p, deps)
            construct = {
                "type": "interface mixin" if mixin else (
                    "callback interface" if callback else "interface"
                ),
                "name": name,
                "inheritance": inheritance,
                "members": members,
                "partial": partial,
                "extAttrs": [a["name"] for a in ext],
            }
            record_construct(name, construct, partial, deps)
            exposed = _exposed_of(ext)
            for g in exposed:
                report["exposed"].setdefault(g, [])
                if name not in report["exposed"][g]:
                    report["exposed"][g].append(name)
            for g in _globals_of(ext):
                report["globals"].setdefault(g, [])
                if name not in report["globals"][g]:
                    report["globals"][g].append(name)
            if exposed and not mixin and not callback and not partial:
                has_ctor = any(m["type"] == "constructor" for m in members)
                bucket = "constructors" if has_ctor else "functions"
                for g in exposed:
                    report["jsNames"][bucket].setdefault(g, [])
                    if name not in report["jsNames"][bucket][g]:
                        report["jsNames"][bucket][g].append(name)
        elif t == "namespace":
            p.next()
            name = p.next()
            deps = set()
            members = _parse_members(p, deps)
            record_construct(
                name,
                {
                    "type": "namespace",
                    "name": name,
                    "inheritance": None,
                    "members": members,
                    "partial": partial,
                    "extAttrs": [a["name"] for a in ext],
                },
                partial,
                deps,
            )
        elif t == "dictionary":
            p.next()
            name = p.next()
            deps = set()
            inheritance = None
            if p.peek() == ":":
                p.next()
                inheritance = p.next()
                deps.add(inheritance)
            members = _parse_dict_members(p, deps)
            record_construct(
                name,
                {
                    "type": "dictionary",
                    "name": name,
                    "inheritance": inheritance,
                    "members": members,
                    "partial": partial,
                    "extAttrs": [a["name"] for a in ext],
                },
                partial,
                deps,
            )
        elif t == "enum":
            p.next()
            name = p.next()
            values = []
            p.expect("{")
            while p.peek() not in ("}", None):
                v = p.next()
                if v not in (",",):
                    values.append(v.strip('"'))
            p.next()
            if p.peek() == ";":
                p.next()
            record_construct(
                name, {"type": "enum", "name": name, "values": values}, False, set()
            )
        elif t == "typedef":
            p.next()
            deps = set()
            p.parse_ext_attrs()
            typ = p.parse_type(deps)
            name = p.next()
            if p.peek() == ";":
                p.next()
            record_construct(
                name, {"type": "typedef", "name": name, "idlType": typ}, False, deps
            )
        elif t == "callback":
            p.next()
            name = p.next()
            p.expect("=")
            deps = set()
            ret = p.parse_type(deps)
            args = p.parse_args(deps)
            if p.peek() == ";":
                p.next()
            record_construct(
                name,
                {"type": "callback", "name": name, "idlType": ret, "arguments": args},
                False,
                deps,
            )
        elif p.peek(1) == "includes":
            target = p.next()
            p.next()  # includes
            mixin = p.next()
            if p.peek() == ";":
                p.next()
            inc = {"type": "includes", "target": target, "includes": mixin}
            report["idlExtendedNames"].setdefault(target, []).append(inc)
            all_deps.setdefault(target, set()).add(mixin)
            last_recorded.append(inc)
        else:
            # unknown token: record the first as a webidl2-style syntax
            # error (the reference stores the throw message as the whole
            # idlparsed value, src/postprocessing/idlparsed.js), then
            # skip to the next semicolon to stay in sync
            if "_syntaxError" not in report and frag_start >= 0:
                line_no = idl.count("\n", 0, frag_start) + 1
                line_start = idl.rfind("\n", 0, frag_start) + 1
                line = idl.split("\n")[line_no - 1]
                col = frag_start - line_start
                report["_syntaxError"] = (
                    f"WebIDLParseError: Syntax error at line {line_no}:\n"
                    f"{line}\n{' ' * col}^ Unrecognised tokens"
                )
            p.skip_until(";")
        # attach the construct's source slice (the reference's per-
        # construct `fragment`, src/postprocessing/idlparsed.js; idlnames
        # fragment files are assembled from these)
        if last_recorded and frag_start >= 0 and p.prev_end() > frag_start:
            last_recorded[0]["fragment"] = idl[frag_start : p.prev_end()].strip()

    for name, deps in all_deps.items():
        deps.discard(name)
        report["dependencies"][name] = sorted(deps)
    known = set(report["idlNames"])
    ext_deps = set()
    for deps in all_deps.values():
        ext_deps.update(d for d in deps if d not in known)
    report["externalDependencies"] = sorted(ext_deps)

    # Flag mis-parses so strict consumers can mirror webidl2.js's throw
    # semantics (the reference ignores a spec's ENTIRE IdL when any
    # fragment is invalid — extract-events.mjs:13-22). The lenient parser
    # stays in sync by skipping to ';', which produces members whose
    # names are not valid IDL identifiers.
    ident = re.compile(r"^[A-Za-z_][0-9A-Za-z_-]*$")

    def _valid(construct: dict) -> bool:
        for m in construct.get("members") or []:
            name = m.get("name")
            if name is not None and not ident.match(name):
                return False
        return True

    if not all(
        _valid(c) for c in report["idlNames"].values()
    ) or not all(
        _valid(e)
        for exts in report["idlExtendedNames"].values()
        for e in exts
    ):
        report["hasSyntaxErrors"] = True
    return report


def _parse_members(p: _Parser, deps: set) -> list[dict]:
    members: list[dict] = []
    if p.peek() != "{":
        if p.peek() == ";":
            p.next()
        return members
    p.expect("{")
    while p.peek() not in ("}", None):
        mext = [a["name"] for a in p.parse_ext_attrs()]
        special = []
        while p.peek() in ("static", "stringifier", "readonly", "inherit", "async"):
            special.append(p.next())
        t = p.peek()
        if t == "constructor":
            p.next()
            args = p.parse_args(deps)
            members.append({"type": "constructor", "name": "constructor", "arguments": args})
            if p.peek() == ";":
                p.next()
        elif t == "attribute":
            p.next()
            typ = p.parse_type(deps)
            name = p.next()
            members.append(
                {
                    "type": "attribute",
                    "name": name,
                    "idlType": typ,
                    "readonly": "readonly" in special,
                    "static": "static" in special,
                }
            )
            if p.peek() == ";":
                p.next()
        elif t == "const":
            p.next()
            typ = p.parse_type(deps)
            name = p.next()
            p.skip_until(";")
            members.append({"type": "const", "name": name, "idlType": typ})
        elif t in ("iterable", "maplike", "setlike"):
            kind = p.next()
            inner: set = set()
            if p.peek() == "<":
                p.parse_type(inner)  # re-parse as generic: consume <...>
            deps.update(inner)
            p.skip_until(";")
            members.append({"type": kind, "name": None})
        elif t == "getter" or t == "setter" or t == "deleter":
            special.append(p.next())
            typ = p.parse_type(deps)
            name = p.peek()
            if name == "(":
                name = None
            else:
                name = p.next()
            args = p.parse_args(deps)
            members.append(
                {"type": "operation", "name": name, "idlType": typ,
                 "arguments": args, "special": special}
            )
            if p.peek() == ";":
                p.next()
        elif t == ";":
            p.next()
            if special == ["stringifier"]:
                members.append({"type": "operation", "name": None, "special": ["stringifier"]})
        else:
            typ = p.parse_type(deps)
            if p.peek() == "(":  # stringifier DOMString ();
                name = None
            else:
                name = p.next()
            if p.peek() == "(":
                args = p.parse_args(deps)
                members.append(
                    {
                        "type": "operation",
                        "name": name,
                        "idlType": typ,
                        "arguments": args,
                        "special": special,
                        "static": "static" in special,
                        "extAttrs": mext,
                    }
                )
            else:
                members.append({"type": "field", "name": name, "idlType": typ})
            if p.peek() == ";":
                p.next()
    p.next()  # }
    if p.peek() == ";":
        p.next()
    return members


def _parse_dict_members(p: _Parser, deps: set) -> list[dict]:
    members = []
    if p.peek() != "{":
        if p.peek() == ";":
            p.next()
        return members
    p.expect("{")
    while p.peek() not in ("}", None):
        p.parse_ext_attrs()
        required = False
        if p.peek() == "required":
            p.next()
            required = True
        typ = p.parse_type(deps)
        name = p.next()
        if p.peek() == "=":
            p.skip_until(";")
        elif p.peek() == ";":
            p.next()
        members.append(
            {"type": "field", "name": name, "idlType": typ, "required": required}
        )
    p.next()
    if p.peek() == ";":
        p.next()
    return members


def event_handlers_of(report: dict) -> list[tuple[str, str]]:
    """(interface, event_type) pairs from ``on<event>`` EventHandler
    attributes — feeds the J6 event↔EventHandler join
    (extract-events.mjs:25-34,373-406)."""
    out = []
    for name, construct in report["idlNames"].items():
        for m in construct.get("members") or []:
            if (
                m.get("type") == "attribute"
                and (m.get("name") or "").startswith("on")
                and "EventHandler" in (m.get("idlType") or "")
            ):
                out.append((name, m["name"][2:]))
    return out
