"""URL kernels: canonicalization, origin grouping, JS-parity encoding.

Semantics mirror the reference crawler (w3c/reffy):

* ``canonicalize_url`` — reference ``canonicalizeUrl``
  (/root/reference/src/postprocessing/annotate-links.js:6-17): http→https,
  fragment strip, ``index.html``/``Overview.html``/``cover.html`` drop,
  whatwg + w3.org/TR multipage → root document, trailing-slash enforcement.
* ``host_group`` — reference ``getOrigin``
  (/root/reference/src/lib/throttled-queue.js:18-37): collapses
  ``*.whatwg.org`` / ``*.github.io`` / ``*.csswg.org|*.css-houdini.org|
  *.fxtf.org`` so per-host politeness serializes on the real server.
* ``encode_uri_component`` — byte-parity shim for JS
  ``encodeURIComponent`` (used by the extractors' fragment building,
  /root/reference/src/browserlib/get-absolute-url.mjs:13-29). Python's
  ``urllib.parse.quote`` differs on ``!'()*`` — we pin the JS table.
* ``url_canon`` — the frontier key: RFC 3986 normalization (lowercase
  scheme/host, default-port drop, uppercase percent-escapes, decode
  unreserved escapes) composed with the reference canonicalization.

Scale design: the canonicalization chain is pure Column expressions
(whole-stage codegen, JVM-side). Percent-escape normalization needs a
character-table rewrite, so ``canonicalize_urls`` routes only rows that
actually contain ``%`` (rare in practice) through an Arrow-batched pandas
UDF and unions the two branches — the hot path never leaves the JVM.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# --------------------------------------------------------------------------
# Python kernels (used inside pandas UDFs and by tests / the simulator)
# --------------------------------------------------------------------------

# JS encodeURIComponent leaves these unescaped: A-Z a-z 0-9 - _ . ! ~ * ' ( )
_JS_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.!~*'()"
)


# fast paths for encode_uri_component: all-safe strings pass through
# untouched; otherwise one dict lookup per UTF-8 byte
_JS_SAFE_RE = re.compile(r"[A-Za-z0-9_.!~*'()-]*\Z")
_JS_ENC = {
    b: (chr(b) if chr(b) in _JS_SAFE else f"%{b:02X}") for b in range(256)
}


def encode_uri_component(s: str) -> str:
    """Byte-parity reimplementation of JS ``encodeURIComponent``."""
    if _JS_SAFE_RE.match(s):
        return s
    return "".join(map(_JS_ENC.__getitem__, s.encode("utf-8")))


_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
# RFC 3986 unreserved characters — safe to decode in normalization.
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _pct_normalize(s: str) -> str:
    """Uppercase %XX escapes; decode escapes of unreserved characters."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def canonicalize_url_py(url: str) -> str:
    """Reference ``canonicalizeUrl`` semantics, Python (oracle/test side)."""
    u = re.sub(r"^http:", "https:", url).split("#")[0]
    u = u.replace("index.html", "").replace("Overview.html", "").replace("cover.html", "")
    u = re.sub(r"spec\.whatwg\.org/.*", "spec.whatwg.org/", u)
    u = re.sub(r"w3\.org/TR/(([^/]+/)+)[^/]+\.[^/]+$", r"w3.org/TR/\1", u)
    u = re.sub(r"w3\.org/TR/([^/]+)$", r"w3.org/TR/\1/", u)
    u = re.sub(r"w3c\.github\.io/([^/]+)$", r"w3c.github.io/\1/", u)
    return u


def url_canon_py(url: str) -> str:
    """Frontier canonical key: RFC 3986 normalize + reference canonicalize.

    The output is stripped: fragment-stripping can expose a trailing
    space from inside a malformed path ("/p #f" → "/p "), and the
    URL-seen set requires canon to be IDEMPOTENT — otherwise a page's
    own canonical URL, re-extracted, would re-enter the frontier
    (property-tested in tests/test_properties.py)."""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return canonicalize_url_py(url).strip()
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    # Drop the ORIGINAL scheme's default port ("http://x:80" → "http://x"),
    # then apply the reference's http→https rewrite, then drop the NEW
    # scheme's default port ("http://x:443" → "https://x:443" → "https://x").
    # Both drops are needed for one-pass idempotence: rewriting first would
    # keep ":80"; dropping only first would leave ":443" for a second pass.
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and netloc.endswith(dp):
        netloc = netloc[: -len(dp)]
    if scheme == "http":
        scheme = "https"
        dp = _DEFAULT_PORTS.get(scheme)
        if dp and netloc.endswith(dp):
            netloc = netloc[: -len(dp)]
    path = _pct_normalize(parts.path)
    query = _pct_normalize(parts.query)
    u = urlunsplit((scheme, netloc, path, query, ""))  # fragment stripped
    return canonicalize_url_py(u).strip()


def host_of_py(url: str) -> str:
    try:
        return urlsplit(url).hostname or ""
    except ValueError:
        return ""


def host_group_py(url: str) -> str:
    """Reference ``getOrigin`` grouping (throttled-queue.js:18-37)."""
    host = host_of_py(url)
    if not host:
        return ""
    if host == "whatwg.org" or host.endswith(".whatwg.org"):
        return "whatwg.org"
    if host == "github.io" or host.endswith(".github.io"):
        return "github.io"
    if (
        host.endswith(".csswg.org")
        or host == "csswg.org"
        or host.endswith(".css-houdini.org")
        or host == "css-houdini.org"
        or host.endswith(".fxtf.org")
        or host == "fxtf.org"
    ):
        return "csswg.org"
    return host


# --------------------------------------------------------------------------
# Column (JVM / codegen) kernels — the distributed hot path
# --------------------------------------------------------------------------


def canonicalize_url_col(url: Column) -> Column:
    """Reference ``canonicalizeUrl`` as a pure Column expression chain.

    Whole-stage-codegen friendly; no Python boundary.
    """
    u = F.regexp_replace(url, r"^http:", "https:")
    u = F.split(u, "#").getItem(0)
    u = F.replace(u, F.lit("index.html"), F.lit(""))
    u = F.replace(u, F.lit("Overview.html"), F.lit(""))
    u = F.replace(u, F.lit("cover.html"), F.lit(""))
    u = F.regexp_replace(u, r"spec\.whatwg\.org/.*", "spec.whatwg.org/")
    u = F.regexp_replace(u, r"w3\.org/TR/(([^/]+/)+)[^/]+\.[^/]+$", "w3.org/TR/$1")
    u = F.regexp_replace(u, r"w3\.org/TR/([^/]+)$", "w3.org/TR/$1/")
    u = F.regexp_replace(u, r"w3c\.github\.io/([^/]+)$", "w3c.github.io/$1/")
    return u


def _lower_scheme_host(url: Column) -> Column:
    """Lowercase the scheme://host[:port] prefix; drop the original
    scheme's default port, rewrite http→https (reference canonicalizeUrl
    rule), then drop :443 — both drops for one-pass idempotence, see
    ``url_canon_py``."""
    prefix = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(url, F.length(prefix) + F.lit(1), F.lit(2 ** 30))
    prefix = F.lower(prefix)
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]*):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^http://", "https://")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]*):443$", "$1")
    return F.when(prefix == "", url).otherwise(F.concat(prefix, rest))


def url_canon_col(url: Column) -> Column:
    """JVM-only url_canon: correct for URLs with no percent-escapes.
    Output-trimmed like ``url_canon_py`` (idempotence — see there)."""
    return F.trim(canonicalize_url_col(_lower_scheme_host(F.trim(url))))


@pandas_udf(StringType())
def url_canon_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched full url_canon (handles percent normalization)."""
    return urls.map(lambda u: url_canon_py(u) if u is not None else None)


def with_url_canon(df: DataFrame, url_col: str = "url", out: str = "url_canon") -> DataFrame:
    """Add the canonical-URL key, keeping the hot path JVM-side.

    Rows without ``%`` (the overwhelming majority of crawl URLs) are
    canonicalized by the codegen Column chain; only rows containing a
    percent-escape cross the Arrow boundary. The union preserves schema.
    """
    c = F.col(url_col)
    has_pct = c.contains("%")
    fast = df.filter(~has_pct).withColumn(out, url_canon_col(c))
    slow = df.filter(has_pct).withColumn(out, url_canon_udf(c))
    return fast.unionByName(slow)


def host_col(url: Column) -> Column:
    """Hostname (lowercased, port stripped) as a Column expression."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))


def host_group_col(url: Column) -> Column:
    """Reference ``getOrigin`` grouping as a Column expression."""
    h = host_col(url)
    return (
        F.when((h == "whatwg.org") | h.endswith(".whatwg.org"), F.lit("whatwg.org"))
        .when((h == "github.io") | h.endswith(".github.io"), F.lit("github.io"))
        .when(
            (h == "csswg.org")
            | h.endswith(".csswg.org")
            | (h == "css-houdini.org")
            | h.endswith(".css-houdini.org")
            | (h == "fxtf.org")
            | h.endswith(".fxtf.org"),
            F.lit("csswg.org"),
        )
        .otherwise(h)
    )
