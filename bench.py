#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Headline set spans the engine's cost classes: columnar hash-agg
(q1), broadcast star join, shuffle join+agg, window rank, JVM-path
text scoring, pandas-UDF text scoring (Arrow boundary), exact dedup,
MinHash LSH near-dup, embedding top-k, and a time-windowed agg.
"""

from __future__ import annotations

import json
import os
import time

from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
from az_datapipeline_sentiment_analysis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "join_broadcast",
    "join_inner_equi",
    "win_rank",
    "window_tumbling",
    "sentiment_score_sql",
    "sentiment_score",
    "dedup_fingerprint",
    "minhash_neardup",
    "embed_cosine_topk",
]


def main() -> None:
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        # collect() forces full materialization of every operator
        n = len(fn(spark, SF_DIR).collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", flush=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
