"""Local harness mirroring the driver's oracle comparison.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
Runs each query's Spark plan AND DuckDB oracle, compares row count,
sorted-column schema, and value frame (stringified, sorted). Prints one
line per query.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from reffy_spark.plans import entry_queries as EQ
    from reffy_spark.session import get_spark

    names = sys.argv[2:] or [n for n in EQ.QUERIES if n in EQ.ORACLES]
    spark = get_spark("check-oracles", cores=8)

    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        try:
            sdf = EQ.QUERIES[name](spark, sf_dir).toPandas()
            odf = con.execute(EQ.ORACLES[name]).df()
            cols = sorted(sdf.columns)
            ocols = sorted(odf.columns)
            if cols != ocols:
                print(f"FAIL {name}: schema spark={cols} oracle={ocols}")
                failures += 1
                continue
            a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
            b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
                failures += 1
                continue
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                idx = diff[diff].index[:3]
                print(f"FAIL {name}: values differ ({int(diff.sum())} rows)")
                for j in idx:
                    print(f"  spark : {a.loc[j].to_dict()}")
                    print(f"  oracle: {b.loc[j].to_dict()}")
                failures += 1
                continue
            print(f"ok   {name}: {len(a)} rows")
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
