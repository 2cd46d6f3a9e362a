"""Sink helpers: append, console/log, and upsert entry points.

The reference's three write paths (SURVEY §2.1): S15 row-at-a-time
INSERT -> set-at-a-time append; S4 json-to-log -> console sink /
to_json projection; S16 UPDATE..IN(..) -> the idempotent merge in
``streaming.incremental``. Kept thin on purpose — the table layer
(parquet here, Delta/Iceberg in deployment) owns transactionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_parquet(df: DataFrame, path: str) -> None:
    """S15 as a distributed append (no driver loop, no row-at-a-time)."""
    df.write.mode("append").parquet(path)


def to_json_rows(df: DataFrame) -> DataFrame:
    """S4's serialize-whole-record: one JSON string column per row."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))


def log_stream(df: DataFrame, *, n_rows: int = 20):
    """S4's log sink for a streaming frame: console sink, bounded rows.

    Returns the started query handle (caller stops it).
    """
    return (
        df.writeStream.format("console")
        .option("numRows", n_rows)
        .option("truncate", "true")
        .trigger(availableNow=True)
        .start()
    )
