"""Python UDTFs (Spark 4 user-defined table functions).

The UDTF is the engine's "one row in, many rows out" extension point —
the table-function analog of the scalar pandas UDF (SURVEY §2.2 "UDF
surface"). Used sparingly: anything expressible with explode/
higher-order functions stays JVM-side (see tokenize_ngrams); a UDTF is
for genuinely imperative row expansion (parsers, samplers, decoders).

``TokenizeUdtf`` is the registered demonstration: positional token
stream for a text column, lateral-joinable in SQL. Its output is
oracle-checked against DuckDB's unnest/generate_subscripts, proving
row-expansion parity.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN_PAT = re.compile("[a-z0-9]+")


@udtf(returnType="pos: bigint, token: string")
class TokenizeUdtf:
    """Yield (1-based position, token) rows for one text value."""

    def eval(self, text: str):  # noqa: D102 (Spark UDTF protocol)
        for i, tok in enumerate(_TOKEN_PAT.findall((text or "").lower()), 1):
            yield (i, tok)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL lateral-join use."""
    spark.udtf.register("tokenize", TokenizeUdtf)
