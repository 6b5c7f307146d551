"""Output-contract validation (the reference's Ajv layer, re-expressed).

``validate_module(name, value)`` checks one page's decoded module output
against the ported schema; ``validate_extracts(df)`` is the distributed
variant — one Arrow pass over an extract DataFrame producing a table of
violations (empty = every page conforms). The reference validates every
extract in its test suite (util.js:1065-1140 via Ajv, used by every
test/extract-*.js); here the same layer guards against novel page shapes
that produce well-formed-but-schema-invalid extracts (wrong enum value,
missing required key) which byte-parity goldens alone cannot catch.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from reffy_spark.validation.schemas import DEFS, MODULE_SCHEMAS, POST_SCHEMAS
from reffy_spark.validation.validator import validate

__all__ = [
    "MODULE_SCHEMAS",
    "POST_SCHEMAS",
    "validate",
    "validate_module",
    "validate_post",
    "validate_extracts",
]


def validate_module(name: str, value) -> list[str]:
    """Errors for one page's decoded output of extractor module ``name``.

    ``None`` is always valid: the reference drops falsy module results
    from crawl output before validation (specs-crawler.js:142-146 keeps
    only truthy ``result[mod.property]``), so a null extract means "module
    not applicable to this page", not a violation.
    """
    if value is None:
        return []
    return validate(value, MODULE_SCHEMAS[name], DEFS)


def validate_post(name: str, value) -> list[str]:
    """Errors for a post-processing table entry (backrefs, idlparsed, …)."""
    return validate(value, POST_SCHEMAS[name], DEFS)


def validate_extracts(df, modules: list[str] | None = None, url_col: str = "url_canon"):
    """Distributed schema validation of an extract DataFrame.

    ``df`` is the output of ``extract_all`` (one JSON-string column per
    module). Returns (url, module, error) rows — empty means every page
    validates. One ``mapInPandas`` stage; upstream column pruning keeps
    only the validated columns in the scan.
    """
    import pandas as pd

    cols = [m for m in (modules or MODULE_SCHEMAS) if m in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, mods, errs = [], [], []
            for _, row in b.iterrows():
                for m in cols:
                    raw = row[m]
                    if raw is None:
                        continue
                    for e in validate_module(m, json.loads(raw)):
                        urls.append(row[url_col])
                        mods.append(m)
                        errs.append(e)
            yield pd.DataFrame({"url": urls, "module": mods, "error": errs})

    return df.select(url_col, *cols).mapInPandas(run, "url string, module string, error string")
