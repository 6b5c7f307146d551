"""CSS value-definition grammar parser (F9).

Parses CSS property-definition syntax (css-values-4 value definitions,
e.g. ``[ <length> | thick | medium ]{1,4}``) into a JSON-schema-like
structure: combinators become ``oneOf``/``anyOf``/``allOf``, multipliers
become array wrappers, terminals become typed nodes (primitive /
valuespace / keyword / string / propertyref / function).

Semantics match the reference's src/lib/css-grammar-parser.js:1-440,
validated against its test corpus (test/css-grammar-parser/in|out.json →
tests/test_css_grammar.py). Pure Python — runs inside extraction UDFs;
Spark-side exposure is a mapInPandas stage over extracted value strings.
"""

from __future__ import annotations

import re

# primitive names in priority order; value = extra metadata (unused in
# the parse result itself, kept for parity with the reference table)
PRIMITIVES = [
    "ident",
    "ident-token",
    "declaration-value",
    "number-token",
    "hash-token",
    "any-value",
    "string-token",
    "function-token",
    "dimension-token",
    "zero",
    "custom-ident",
    "string",
    "url",
    "integer",
    "number",
    "percentage",
    "number-percentage",
    "length-percentage",
    "frequency-percentage",
    "angle-percentage",
    "time-percentage",
    "dimension",
    "length",
    "angle",
    "time",
    "frequency",
    "resolution",
    "color",
    "image",
    "position",
]

COMBINATORS = [("&&", "allOf"), ("||", "anyOf"), ("|", "oneOf")]
MULTIPLIER_STARTERS = ("{", "+", "#", "!", "?", "*")
UNQUOTED_TOKENS = ("/", ",", "(", ")")

_DELIMITER_STATES = ("new", "keyword", "pipe")


class CSSValueSyntaxError(ValueError):
    pass


def _is_multiplier(s) -> bool:
    return isinstance(s, str) and s.startswith(MULTIPLIER_STARTERS)


def tokenize(value: str) -> list[str]:
    """Split a value definition into tokens, tracking quote/bracket/range
    state so <...>, '...', {m,n} and [min,max] stay single tokens."""
    tokens: list[str] = []
    cur = ""
    state = "new"

    def flush() -> None:
        nonlocal cur
        if cur:
            tokens.append(cur)
        cur = ""

    for c in value:
        if c.isspace():
            if state == "labracket":  # bracketed range notation
                cur += c
            else:
                flush()
                state = "new"
        elif c == "<":
            if state in _DELIMITER_STATES:
                flush()
                cur = c
                state = "labracket"
            elif state == "quote":
                cur += c
            else:
                raise CSSValueSyntaxError(f"unexpected < in {cur!r} ({state})")
        elif c == ">":
            if state == "quote":
                cur += c
            elif state in ("rabracket", "labracket"):
                cur += c
                flush()
                state = "new"
            else:
                raise CSSValueSyntaxError(f"unexpected > in {cur!r} ({state})")
        elif c == "'":
            if state == "quote":
                cur += c
                flush()
                state = "new"
            elif state == "labracket":
                cur += c
                state = "labracketquote"
            elif state == "labracketquote":
                cur += c
                state = "rabracket"
            else:
                flush()
                cur = c
                state = "quote"
        elif c in "[]+*#!?/":
            if state in _DELIMITER_STATES:
                flush()
                tokens.append(c)
                state = "new"
            elif state == "quote":
                cur += c
            elif state == "labracket" and c == "[":
                state = "bracketedrange"
                cur += c
            elif state == "bracketedrange" and c == "]":
                cur += c
                state = "labracket"
            else:
                raise CSSValueSyntaxError(f"unexpected {c} in {cur!r} ({state})")
        elif c == "{":
            if state == "quote":
                cur += c
            elif state in _DELIMITER_STATES:
                flush()
                cur = c
                state = "curlybracket"
            else:
                raise CSSValueSyntaxError(f"unexpected {{ in {cur!r} ({state})")
        elif c == "}":
            if state == "quote":
                cur += c
            elif state == "curlybracket":
                cur += c
                flush()
                state = "new"
            else:
                raise CSSValueSyntaxError(f"unexpected }} in {cur!r} ({state})")
        elif c == ",":
            if state in _DELIMITER_STATES:
                flush()
                tokens.append(c)
                state = "new"
            elif state in ("quote", "curlybracket", "bracketedrange"):
                cur += c
            else:
                raise CSSValueSyntaxError(f"unexpected , in {cur!r} ({state})")
        elif c == "(":
            if state in ("new", "pipe"):
                flush()
                tokens.append(c)
                state = "new"
            elif state in ("quote", "labracket", "labracketquote"):
                cur += c
            elif state == "keyword":
                cur += c
                flush()
                state = "new"
            else:
                raise CSSValueSyntaxError(f"unexpected ( in {cur!r} ({state})")
        elif c == ")":
            if state in _DELIMITER_STATES:
                flush()
                tokens.append(c)
                state = "new"
            elif state in ("quote", "labracket", "labracketquote"):
                cur += c
            else:
                raise CSSValueSyntaxError(f"unexpected ) in {cur!r} ({state})")
        elif c == "&":
            if state in ("new", "keyword"):
                flush()
                cur = c
                state = "ampersand"
            elif state == "quote":
                cur += c
            elif state == "ampersand":
                cur += c
                flush()
                state = "new"
            else:
                raise CSSValueSyntaxError(f"unexpected & in {cur!r} ({state})")
        elif c == "|":
            if state in ("new", "keyword"):
                flush()
                cur = c
                state = "pipe"
            elif state == "quote":
                cur += c
            elif state == "pipe":
                cur += c
                flush()
                state = "new"
            else:
                raise CSSValueSyntaxError(f"unexpected | in {cur!r} ({state})")
        else:
            if state == "pipe":
                # single "|" directly followed by a word char: emit the
                # pipe and start a keyword (the reference resets the token
                # to the literal 'c' here — css-grammar-parser.js:355 —
                # which reads like a typo for the char; we keep the char)
                tokens.append(cur)
                cur = c
                state = "keyword"
            else:
                cur += c
                if state == "new":
                    state = "keyword"

    if state in ("new", "keyword"):
        flush()
    else:
        raise CSSValueSyntaxError(f"unexpected EOF while parsing {value!r} ({state})")
    return tokens


def _primitive_match(s: str, name: str):
    return re.search("<(" + name + r")( +\[[^\]]*\])?>", s)


def _parse_bracketed_range(s: str | None):
    if not s or not s.strip():
        return None
    inner = s.strip()[1 : len(s) - 2]
    parts = [x.strip() for x in inner.split(",")]
    if len(parts) != 2:
        raise CSSValueSyntaxError(f"unrecognized range descriptor {s!r}")
    return parts


def parse_terminal(s: str):
    """Map one token to its typed node (or pass through structural
    tokens: combinators, brackets, multipliers)."""
    if s in dict(COMBINATORS) or s == "[" or s.startswith("]") or _is_multiplier(s):
        return s
    if s in UNQUOTED_TOKENS:
        return {"type": "string", "content": s}
    m = re.fullmatch(r"'([^']*)'", s)
    if m:
        return {"type": "string", "content": m.group(1)}
    m = re.fullmatch(r"<'([-_a-zA-Z][^'>]*)'>", s)
    if m:
        return {"type": "propertyref", "name": m.group(1)}
    for p in PRIMITIVES:
        m = _primitive_match(s, p)
        if m:
            node = {"type": "primitive", "name": m.group(1)}
            rng = _parse_bracketed_range(m.group(2))
            if rng is not None:
                node["range"] = rng
            return node
    if re.fullmatch(r"<[-_a-zA-Z][^>]*>", s):
        return {"type": "valuespace", "name": s[1:-1]}
    if re.fullmatch(r"[-_a-zA-Z][-_a-zA-Z0-9]*", s):
        return {"type": "keyword", "name": s}
    if re.fullmatch(r"[-_a-zA-Z][-_a-zA-Z0-9]*\(", s):
        return {"type": "functionstart", "name": s}
    raise CSSValueSyntaxError(f"unrecognized token {s!r}")


def _parse_multiplier_range(rng: str) -> dict:
    if not (rng.startswith("{") and rng.endswith("}")):
        raise CSSValueSyntaxError(f"bad multiplier range {rng!r}")
    values = rng[1:-1]
    if re.fullmatch(r"[0-9]+", values):
        n = int(values)
        return {"minItems": n, "maxItems": n}
    m = re.fullmatch(r"([0-9]+),([0-9]+)?", values)
    if m:
        out = {"minItems": int(m.group(1))}
        if m.group(2):
            out["maxItems"] = int(m.group(2))
        return out
    raise CSSValueSyntaxError(f"unrecognized range format {rng!r}")


def apply_multiplier(multiplier: str, modifiee):
    if multiplier == "*":
        return {"type": "array", "items": modifiee}
    if multiplier == "+":
        return {"type": "array", "items": modifiee, "minItems": 1}
    if multiplier == "#":
        return {"type": "array", "items": modifiee, "separator": ","}
    if multiplier.startswith("{"):
        return {"type": "array", "items": modifiee, **_parse_multiplier_range(multiplier)}
    if multiplier == "?":
        if isinstance(modifiee, list):
            return {"type": "array", "items": modifiee, "maxItems": 1}
        return {**modifiee, "optional": True}
    if multiplier == "!":
        if isinstance(modifiee, list):
            return {"type": "array", "items": modifiee, "minItems": 1}
        raise CSSValueSyntaxError(f'multiplier "!" applied to non-group {modifiee!r}')
    raise CSSValueSyntaxError(f"unrecognized multiplier {multiplier!r}")


def _split_by_combinator(parts: list, combinator: str) -> list:
    components: list = []
    head: list = []
    for b in parts:
        if b == combinator:
            components.append(head[0] if len(head) == 1 else head)
            head = []
        elif isinstance(b, list):
            head.append(_componentize(b))
        else:
            head.append(b)
    components.append(head[0] if len(head) == 1 else head)
    return components


def _componentize(parts, combinators: list | None = None):
    """Group a token list by combinator precedence (&& > || > |)."""
    if combinators is None:
        combinators = COMBINATORS
    for idx, (c, t) in enumerate(combinators):
        if isinstance(parts, list) and c in parts:
            lower = combinators[:idx] + combinators[idx + 1 :]
            return {
                t: [
                    _componentize(p, lower)
                    for p in _split_by_combinator(parts, c)
                ]
            }
    if isinstance(parts, list):
        if len(parts) > 1:
            return {"type": "array", "items": [_componentize(p) for p in parts]}
        return _componentize(parts[0])
    if isinstance(parts, dict) and parts.get("type") == "array":
        return {**parts, "items": _componentize(parts["items"])}
    return parts


def parse_propdef_value(value: str):
    """Parse a CSS value definition into its component structure."""
    tokens = tokenize(value.strip())
    parts = [parse_terminal(t) for t in tokens if t]

    # apply multipliers to terminals (group multipliers handled below)
    reduced: list = []
    for i, item in enumerate(parts):
        if not _is_multiplier(item):
            reduced.append(item)
            continue
        if i == 0:
            raise CSSValueSyntaxError(f"multiplier {item!r} at start of {value!r}")
        prev = reduced.pop()
        if prev != "]":
            reduced.append(apply_multiplier(item, prev))
        else:
            reduced.append(prev)
            reduced.append(item)
    parts = reduced

    # fold functional notations f( ... )
    def _find(pred, items, start=0):
        for i in range(start, len(items)):
            if pred(items[i]):
                return i
        return -1

    while True:
        fi = _find(
            lambda p: isinstance(p, dict) and p.get("type") == "functionstart", parts
        )
        if fi == -1:
            break
        ci = _find(
            lambda p: isinstance(p, dict) and p.get("content") == ")", parts, fi + 1
        )
        if ci == -1:
            raise CSSValueSyntaxError(f"unterminated function notation in {value!r}")
        name = parts[fi]["name"]
        func = {
            "type": "function",
            "name": name[:-1],
            "arguments": parts[fi + 1 : ci],
        }
        parts = parts[:fi] + [func] + parts[ci + 1 :]

    # fold (possibly nested) bracket groups, innermost-last first
    while "[" in parts:
        bi = len(parts) - 1 - parts[::-1].index("[")
        mi = _find(lambda p: p == "]", parts, bi + 1)
        if mi == -1:
            raise CSSValueSyntaxError(f"unterminated bracket-group in {value!r}")
        group: object = parts[bi + 1 : mi]
        i = 0
        while mi + 1 + i < len(parts) and _is_multiplier(parts[mi + 1 + i]):
            group = apply_multiplier(parts[mi + 1 + i], group)
            i += 1
        # either the multiplied dict or the raw sub-list becomes ONE element
        parts = parts[:bi] + [group] + parts[mi + 1 + i :]

    return _componentize(parts)
