"""Catalog type-normalization contract (VERDICT r2 advice #6).

``events.ts`` has shipped under three different parquet encodings across
driver rounds — TIMESTAMP(NANOS), TIMESTAMP(MICROS) without timezone
(Spark: TIMESTAMP_NTZ), and TIMESTAMP(MICROS) UTC. ``catalog.table``
must normalize all three to a plain ``TimestampType`` with identical
UTC instants, so downstream ``unix_millis``/window-range/streaming code
can never be broken again by a testdata re-encode.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from az_datapipeline_sentiment_analysis_spark import catalog

# 2024-03-01T12:34:56.789Z and one hour later, as epoch micros.
_US = [1709296496789000, 1709300096789000]
_EXPECTED_MS = [us // 1000 for us in _US]


def _write_events(tmp_path, arrow_type):
    # Build as micros then convert, so the unit change is a real
    # conversion (int64 -> timestamp casts interpret values in the
    # TARGET unit, which would silently shift the instant).
    ts = pa.array(_US, type=pa.timestamp("us")).cast(arrow_type)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "user_id": pa.array([10, 20], type=pa.int64()),
            "ts": ts,
            "value": pa.array([1.5, 2.5], type=pa.float64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(tbl, path)
    return str(tmp_path)


@pytest.mark.parametrize(
    "arrow_type",
    [
        pytest.param(pa.timestamp("ns"), id="nanos"),
        pytest.param(pa.timestamp("us"), id="micros-ntz"),
        pytest.param(pa.timestamp("us", tz="UTC"), id="micros-utc"),
    ],
)
def test_events_ts_normalized_to_timestamp(spark, tmp_path, arrow_type):
    sf_dir = _write_events(tmp_path, arrow_type)
    ev = catalog.table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # unix_millis must work directly (this is what broke in round 2) and
    # the instants must agree across encodings (session TZ pinned UTC).
    rows = ev.select("event_id", F.unix_millis("ts").alias("ms")).orderBy(
        "event_id"
    ).collect()
    assert [r.ms for r in rows] == _EXPECTED_MS
