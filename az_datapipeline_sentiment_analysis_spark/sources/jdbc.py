"""JDBC source (S7): the reference's SQL scan, with pushdown intact.

The reference reads ``SELECT id, text_column FROM SourceTable WHERE
processed = 0`` over pymssql (reference
``FunctionApp2/process_data/__init__.py:40-43``) and pulls the whole
result into one process. The Spark equivalent keeps the projection and
predicate pushed down to the database AND parallelizes the pull:

* ``predicates=`` gives one partition per predicate (mutually
  exclusive ranges), or
* ``partitionColumn/lowerBound/upperBound/numPartitions`` stripes a
  numeric key — either way the database sees N range-scans instead of
  one giant cursor, and executors ingest concurrently.

Spark's own distribution bundles Apache Derby (the Hive-metastore
default), so the path IS exercised live: :func:`seed_derby` loads a
parquet table into an embedded-Derby database and the ``jdbc_scan``
registry query reads it back through ``spark.read.jdbc`` with the
filter and projection pushed into the database (asserted in
``tests/test_sources.py``). At deployment, swap the url/driver for the
real warehouse; everything else is identical.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# sf-dir -> seeded embedded-Derby database path. Embedded Derby allows
# one booting JVM per database; caching per scale factor keeps repeat
# registry invocations (driver gate, bench, tests) on one database.
_DERBY_DBS: dict[tuple[str, str], str] = {}


def derby_url(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Seed an embedded-Derby database with ``table`` from ``sf_dir``
    (once per (sf, table)) and return its JDBC url.

    The seed write itself goes through ``spark.write.jdbc`` — the
    executable proof of the write half of the JDBC contract. The write
    is coalesced to one partition: embedded Derby serializes writers
    anyway, and the seed is a test fixture, not the scale path (a real
    warehouse load keeps the default parallel writers).
    """
    from ..catalog import table as _t

    key = (sf_dir, table)
    path = _DERBY_DBS.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="sg_derby_") + "/db"
        src = _t(spark, sf_dir, table)
        if table == "documents":
            src = src.select("doc_id", "lang", "n_chars")
            col_types = "doc_id BIGINT, lang VARCHAR(16), n_chars BIGINT"
        else:
            col_types = None
        w = (
            src.coalesce(1)
            .write.format("jdbc")
            .option("url", f"jdbc:derby:{path};create=true")
            .option("dbtable", table)
            .option("driver", DERBY_DRIVER)
            .mode("overwrite")
        )
        if col_types:
            # Spark maps StringType to CLOB on Derby; VARCHAR keeps the
            # column filter/compare-friendly DB-side.
            w = w.option("createTableColumnTypes", col_types)
        w.save()
        _DERBY_DBS[key] = path
    return f"jdbc:derby:{path}"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Filters/projections applied on the returned
    DataFrame are pushed into the database by Catalyst (the WHERE
    processed = 0 of S7 runs DB-side, not in Spark)."""
    props = {"fetchsize": str(fetchsize), **(properties or {})}
    if predicates:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def incremental_predicates(
    key: str, lower: int, upper: int, n: int
) -> list[str]:
    """Mutually-exclusive range predicates for ``read_jdbc``: the
    parallel version of the reference's single full-table cursor."""
    if n <= 0 or upper <= lower:
        return [f"{key} >= {lower} AND {key} <= {upper}"]
    step = max(1, (upper - lower + n) // n)
    out = []
    lo = lower
    while lo <= upper:
        hi = min(lo + step - 1, upper)
        out.append(f"{key} >= {lo} AND {key} <= {hi}")
        lo = hi + 1
    return out
