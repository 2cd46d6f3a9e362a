"""Time named registry entries at a replicated scale directory.

Institutionalizes the per-operator scaling-datapoint convention the
docstrings follow ("Measured at 100x replication of sf0.1 ..."): build
or reuse a factor-replicated copy of a source scale dir (see
``benchdata.ensure_scaled`` — ids are stride-shifted per replica so
join/group cardinalities scale realistically, not just row counts),
then run each named entry once with the bench's cache-clear + GC
quiesce so earlier queries' garbage is not collected inside a later
query's timed window.

Usage:
    python tools/scale_timing.py name1,name2[,...] [factor=100] [src=/root/testdata/sf0.1]

Prints one line per entry: ``<factor>x <name>: <sec>s (<rows> rows)``.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from az_datapipeline_sentiment_analysis_spark import benchdata  # noqa: E402
from az_datapipeline_sentiment_analysis_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from az_datapipeline_sentiment_analysis_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    names = sys.argv[1].split(",")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    spark = get_spark("scale-timing")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = f"/root/repo/.bench_scale{factor}" if factor != 10 \
        else "/root/repo/.bench_scale"
    d = benchdata.ensure_scaled(spark, src, out_dir, factor=factor)
    for name in names:
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        t = time.time()
        n = len(REGISTRY[name].fn(spark, d).collect())
        print(f"{factor}x {name}: {time.time() - t:.1f}s ({n} rows)",
              flush=True)


if __name__ == "__main__":
    main()
