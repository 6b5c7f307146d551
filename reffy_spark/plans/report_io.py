"""Executor-side JSON report emission shared by crawl-level writers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json_reports(
    report_df: DataFrame, out_dir: str, key_col: str
) -> DataFrame:
    """Write one ``{out_dir}/{key}.json`` per row of
    ``(key_col, report)`` via mapInPandas — no report bytes cross the
    driver. ``out_dir`` must be shared storage on a real cluster; the
    makedirs runs INSIDE the emitter so executor-local paths exist on
    whichever node writes. Returns ``(key_col, path)``; evaluate to
    write."""
    import os

    import pandas as pd

    def emit(batches):
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths = []
            for key, report in zip(pdf[key_col], pdf["report"]):
                p = os.path.join(out_dir, f"{key}.json")
                with open(p, "w", encoding="utf-8") as fh:
                    fh.write(report)
                paths.append(p)
            yield pd.DataFrame({key_col: pdf[key_col], "path": paths})

    return report_df.mapInPandas(emit, f"{key_col} string, path string")
