"""Self-check harness mirroring the driver's CORRECTNESS gate: run every
queries() entry through Spark and its oracle_sql() through DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes the results in the driver's
CORRECTNESS_rN.json shape (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err per query) so a full-registry parity run can
be committed as an artifact directly diffable against the official one.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from sophox_spark.plans import get_spark


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            coerced = pd.to_numeric(df[c], errors="coerce")
            if coerced.notna().sum() == df[c].notna().sum():
                df[c] = coerced
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("Int", "UInt")) or pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if not sf_dir:
        sf_dir = "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark("parity", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:28s} rows-only  n={n}")
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "oracle_rows": None, "err": "no_oracle",
                }
            except Exception as e:
                failures.append(name)
                print(f"{name:28s} ERROR (rows-only): {type(e).__name__}: {e}")
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"{type(e).__name__}: {str(e)[:200]}",
                }
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            want = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"{name:28s} ERROR: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": None, "oracle_rows": None,
                "err": f"{type(e).__name__}: {str(e)[:200]}",
            }
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA got={list(got.columns)} want={list(want.columns)}")
        if len(got) != len(want):
            status.append(f"ROWS got={len(got)} want={len(want)}")
        if not status:
            if got.equals(want):
                status.append("OK")
            else:
                neq = (got != want) & ~(got.isna() & want.isna())
                bad_cols = [c for c in got.columns if neq[c].any()]
                status.append(f"VALUES differ in {bad_cols}")
                for c in bad_cols[:2]:
                    i = int(np.argmax(neq[c].to_numpy()))
                    status.append(f"  {c}[{i}]: got={got[c].iloc[i]!r} want={want[c].iloc[i]!r}")
        line = f"{name:28s} n={len(got)} {' | '.join(status)}"
        print(line)
        results[name] = {
            "rows_match": len(got) == len(want),
            "schema_match": list(got.columns) == list(want.columns),
            "hash_match": status == ["OK"],
            "spark_rows": len(got),
            "oracle_rows": len(want),
            "err": None,
        }
        if status != ["OK"]:
            failures.append(name)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"\nwrote {json_out} ({len(results)} queries)")
    print()
    if failures:
        print("FAILED:", ", ".join(failures))
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
