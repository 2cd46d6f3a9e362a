"""Synthetic/replay sources for tests and load generation (S2 cadence).

``rate_events`` wraps the built-in rate source into the engine's
events shape so every streaming operator can be driven at a controlled
rows/sec without files — the replay/load-test source from SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_events(
    spark: SparkSession, *, rows_per_second: int = 100, n_users: int = 50
) -> DataFrame:
    """Unbounded events-shaped stream from the rate source.

    Deterministic mapping from the rate source's (timestamp, value):
    event ids are the monotonically increasing value, users/types/
    values derive from it by modular arithmetic.
    """
    types = F.array(F.lit("click"), F.lit("view"), F.lit("signup"), F.lit("purchase"))
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("value") % n_users).alias("user_id"),
            F.element_at(types, (F.col("value") % 4 + 1).cast("int")).alias(
                "event_type"
            ),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).cast("double").alias("value"),
            F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
        )
    )
