"""Capture .explain('formatted') for a set of registry queries.

Usage: python tools/capture_plans.py <suffix> name1,name2,... [SF_DIR]
Writes plans/$PLANS_ROUND/<name>_<suffix>.txt for each query
(PLANS_ROUND defaults to r12).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
from az_datapipeline_sentiment_analysis_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = f"/root/repo/plans/{os.environ.get('PLANS_ROUND', 'r12')}"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{out_dir}/{name}_{suffix}.txt", "w") as fh:
                fh.write(buf.getvalue())
            print(f"captured {name}", flush=True)
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
