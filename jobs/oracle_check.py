#!/usr/bin/env python3
"""Local stand-in for the driver's CORRECTNESS gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` text on DuckDB
over the same parquet tables (default sf0.01), then compares row count,
column names, and values with dtype-kind sensitivity (int-like vs float-like
vs object) after sorting columns by name and rows by all columns — the same
canonicalization family the driver hashes. Prints one JSON line per query.

Usage: python jobs/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def kind(s: pd.Series) -> str:
    if s.dtype.kind in "iu":
        return "int"
    if s.dtype.kind == "f":
        return "float"
    if s.dtype.kind == "M":
        return "ts"
    return "obj"


def values_equal(a: pd.Series, b: pd.Series) -> bool:
    if kind(a) != kind(b):
        return False
    if kind(a) == "float":
        return bool(np.allclose(a.astype(float), b.astype(float),
                                rtol=0, atol=1e-9, equal_nan=True))
    return list(a.astype(str).where(a.notna(), "<NULL>")) == \
        list(b.astype(str).where(b.notna(), "<NULL>"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from torspider_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"q": name}
        try:
            sdf = canon(fn(spark, sf_dir).toPandas())
            rec["spark_rows"] = len(sdf)
            if name not in oracles:
                rec["err"] = "no_oracle"
                print(json.dumps(rec))
                continue
            odf = canon(con.execute(oracles[name]).df())
            rec["oracle_rows"] = len(odf)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["schema_match"] = list(sdf.columns) == list(odf.columns)
            rec["hash_match"] = bool(
                rec["rows_match"] and rec["schema_match"] and all(
                    values_equal(sdf[c], odf[c]) for c in sdf.columns))
            if not rec["hash_match"] and rec["rows_match"] and rec["schema_match"]:
                rec["mismatch_cols"] = [
                    c for c in sdf.columns
                    if not values_equal(sdf[c], odf[c])]
                rec["kinds"] = {c: [kind(sdf[c]), kind(odf[c])]
                                for c in rec["mismatch_cols"]}
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            bad += 1
        if not rec.get("hash_match", True):
            bad += 1
        print(json.dumps(rec, default=str))
    print(json.dumps({"failures": bad}))


if __name__ == "__main__":
    main()
