"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's declared operator surface (see
``az_datapipeline_sentiment_analysis_spark/plans/queries.py`` — one entry per operator from
SURVEY.md §2.2, each with a DuckDB oracle twin where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from az_datapipeline_sentiment_analysis_spark.plans import queries as _plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return _plans.q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    return _plans.oracle_sql()
