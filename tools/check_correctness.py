"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, then compares row count, column names, and order-insensitive values
(sorted by all columns; floats compared exactly, as a value-hash would).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from lib_gdal_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s) cols={list(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        ok = True
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"[FAIL] {name}: columns spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            ok = False
        elif len(sdf) != len(odf):
            print(f"[FAIL] {name}: rows spark={len(sdf)} oracle={len(odf)}")
            ok = False
        else:
            a, b = canon(sdf), canon(odf)
            b = b.astype(a.dtypes.to_dict(), errors="ignore")
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
            except AssertionError as exc:
                print(f"[FAIL] {name}: values differ: {str(exc)[:400]}")
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
                bad = neq.any(axis=1)
                print("spark:\n", a[bad].head(5))
                print("oracle:\n", b[bad].head(5))
                ok = False
        if ok:
            print(f"[ OK ] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
