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

No JDBC driver jar ships in this environment, so there is no live
test; ``tests/test_sources.py::test_jdbc_option_plumbing`` asserts the
option wiring without connecting. At deployment, pass the driver via
``spark.jars`` and a real ``url``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
