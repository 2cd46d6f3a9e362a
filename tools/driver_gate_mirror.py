"""Strict mirror of the driver's correctness gate at sf0.01.

The driver samples the FIRST 50 entries of ``queries()`` order, runs the
Spark query and the DuckDB oracle twin, and canonicalizes both frames
with a plain ``pandas.sort_values`` over every column — which CRASHES on
list/ndarray cells (``TypeError: unhashable type: 'list'``, the round-3
failure mode). The repo's pytest parity mirror is more lenient (it maps
lists to tuples first), so this tool exists to reproduce the driver's
exact failure surface before the gate does.

Usage: python tools/driver_gate_mirror.py [N=50 | name1,name2,...] [SF_DIR]
Prints one line per query: OK / ROWS / SCHEMA / VALUES / ERR.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonicalization: sort columns by name, then a
    plain multi-column sort_values — no list→tuple rescue."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                df[c] = pd.to_datetime(s).dt.tz_localize(None)
            except TypeError:
                pass
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          na_position="last")


def _eq(a, b) -> bool:
    an = a is None or (isinstance(a, float) and math.isnan(a))
    bn = b is None or (isinstance(b, float) and math.isnan(b))
    if an or bn:
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9,
                                abs_tol=1e-9)
        except (TypeError, ValueError):
            return a == b
    return a == b


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # VANILLA session on purpose — the external driver does not apply
    # the engine's tuned session config, so neither does the mirror
    # (200 shuffle partitions, default AQE). Set MIRROR_FAST=1 for the
    # quicker 8-partition variant while iterating.
    b = SparkSession.builder.master("local[8]")
    if os.environ.get("MIRROR_FAST"):
        b = b.config("spark.sql.shuffle.partitions", "8")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = mod.queries(), mod.oracle_sql()
    names = list(qs)[: int(arg)] if arg.isdigit() else arg.split(",")
    bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as exc:
            print(f"ERR    {name}: spark: {type(exc).__name__}: {exc}"[:300])
            bad += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: spark_rows={len(sdf)}")
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as exc:
            print(f"ERR    {name}: oracle: {type(exc).__name__}: {exc}"[:300])
            bad += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"SCHEMA {name}: spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"ROWS   {name}: spark={len(sdf)} oracle={len(odf)}")
            bad += 1
            continue
        try:
            s, o = _canon(sdf), _canon(odf)
        except Exception as exc:
            print(f"ERR    {name}: canon: {type(exc).__name__}: {exc}"[:300])
            bad += 1
            continue
        diff = None
        for col in s.columns:
            for i, (x, y) in enumerate(zip(s[col].tolist(), o[col].tolist())):
                x = None if (pd.api.types.is_scalar(x) and pd.isna(x)) else x
                y = None if (pd.api.types.is_scalar(y) and pd.isna(y)) else y
                if not _eq(x, y):
                    diff = (col, i, x, y)
                    break
            if diff:
                break
        if diff:
            print(f"VALUES {name}: col={diff[0]} row={diff[1]} "
                  f"spark={diff[2]!r} oracle={diff[3]!r}")
            bad += 1
        else:
            print(f"OK     {name} ({len(sdf)} rows)")
    print(f"\n{len(names) - bad}/{len(names)} clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
