"""Best-of-N isolated timing of named registry entries, bench-faithful.

Same methodology as bench.py's per-query loop (get_spark session, the
cache-clear + System.gc quiesce before each timed window, collect() as
the timed action), but for a hand-picked entry list in a session that
runs NOTHING else — the triage tool the round-5..11 noise playbook
calls for when a bench co-resident number needs an isolated reference.

Usage:
    python tools/isolate_timing.py name1,name2[,...] [runs=3] [SF_DIR]

Prints one line per run and a best-of summary per entry.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from az_datapipeline_sentiment_analysis_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from az_datapipeline_sentiment_analysis_spark.session import (  # noqa: E402
    get_spark,
)


def _quiesce(spark) -> None:
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    spark = get_spark("isolate-timing")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = REGISTRY[name].fn
        best, n = float("inf"), 0
        for i in range(runs):
            _quiesce(spark)
            t0 = time.perf_counter()
            n = len(fn(spark, sf).collect())
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"  {name} run{i + 1}: {dt:.3f}s", flush=True)
        print(f"{name}: best-of-{runs} {best:.3f}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
