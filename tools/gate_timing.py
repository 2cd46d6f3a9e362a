"""Time every registry query the way the driver's correctness gate does.

For each entry in ``__spark_entry__.queries()``: build + collect the
Spark result at sf0.01 on a vanilla session, and run the DuckDB oracle
twin. Prints per-query seconds sorted descending so the slowest gate
entries (the ones that eat the driver's per-round budget) are on top.

Usage: python tools/gate_timing.py [N_SLOWEST]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    rows = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            n = len(fn(spark, SF).collect())
            spark_s = time.perf_counter() - t0
        except Exception as exc:  # pragma: no cover - diagnostic tool
            rows.append((name, -1.0, -1.0, f"SPARK ERR {exc}"))
            continue
        oracle_s = 0.0
        if name in osql:
            t0 = time.perf_counter()
            try:
                con.execute(osql[name]).fetchall()
                oracle_s = time.perf_counter() - t0
            except Exception as exc:  # pragma: no cover
                rows.append((name, spark_s, -1.0, f"ORACLE ERR {exc}"))
                continue
        rows.append((name, spark_s, oracle_s, n))

    rows.sort(key=lambda r: -(r[1] + max(r[2], 0)))
    total_spark = sum(r[1] for r in rows if r[1] > 0)
    total_oracle = sum(r[2] for r in rows if r[2] > 0)
    print(f"# total spark={total_spark:.1f}s oracle={total_oracle:.1f}s "
          f"n={len(rows)}")
    for name, s, o, n in rows[:top_n]:
        print(f"{s + max(o, 0):7.2f}s  spark={s:6.2f} oracle={o:6.2f}  "
              f"{name} ({n})")
    print(json.dumps({r[0]: round(r[1] + max(r[2], 0), 2) for r in rows}))


if __name__ == "__main__":
    main()
