"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names,
and order-insensitive value equality (floats to 1e-9 relative).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
        if "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith(("Int", "int", "uint")):
            df[c] = df[c].astype("float64")  # unify int widths, keep NaN for null
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"row count: spark={len(got)} oracle={len(exp)}")
        return errs
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        a, b = g[c], e[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            bad = ~(((a - b).abs() <= 1e-6 + 1e-9 * b.abs()) | (a.isna() & b.isna()))
        else:
            bad = ~((a == b) | (a.isna() & b.isna()))
        if bad.any():
            i = bad.idxmax()
            errs.append(f"col {c}: {int(bad.sum())} mismatches, first @{i}: spark={a[i]!r} oracle={b[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from otel_arrow_spark.session import get_spark

    spark = get_spark(app_name="check-entry")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        finally:
            # release dedup/LSH caches so per-query persists never
            # accumulate across the 65+-query session
            from otel_arrow_spark.dataops.dedup import release_caches

            release_caches()
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: no oracle ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        errs = compare(name, got, exp)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failed of {len(only) or len(qs)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
