"""Incremental pipeline: idempotence + crash-recovery (SURVEY §5.2 #4).

The reference's known flaw: two separate commits (results insert at
``FunctionApp2/process_data/__init__.py:96``, flag update at ``:104``)
duplicate work on a crash between them. These tests assert our merge
semantics absorb exactly that failure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from az_datapipeline_sentiment_analysis_spark.streaming import incremental


@pytest.fixture()
def source_df(spark):
    rows = [
        (1, "fast clean nice room", 0),
        (2, "slow dirty cold hallway", 0),
        (3, "average stay nothing special", 0),
        (4, "already done", 1),
    ]
    return spark.createDataFrame(rows, "id long, text_column string, processed int")


def _counts(spark, results_path):
    df = spark.read.parquet(results_path)
    return df.count(), df.select("record_id").distinct().count()


def test_increment_scores_only_unprocessed(spark, source_df, tmp_path):
    src, res = str(tmp_path / "src"), str(tmp_path / "res")
    incremental.init_source(spark, source_df, src)
    n = incremental.run_increment(spark, src, res)
    assert n == 3  # id=4 already processed
    out = {r.record_id: r for r in spark.read.parquet(res).collect()}
    assert set(out) == {"1", "2", "3"}  # reference's str(id) cast
    assert out["1"].sentiment == "positive"
    assert out["2"].sentiment == "negative"
    # all flags flipped
    flags = spark.read.parquet(src).select("processed").collect()
    assert all(r.processed == 1 for r in flags)


def test_rerun_is_noop(spark, source_df, tmp_path):
    src, res = str(tmp_path / "src"), str(tmp_path / "res")
    incremental.init_source(spark, source_df, src)
    assert incremental.run_increment(spark, src, res) == 3
    assert incremental.run_increment(spark, src, res) == 0  # S8 short-circuit
    assert _counts(spark, res) == (3, 3)


def test_crash_between_writes_recovers_without_dupes(spark, source_df, tmp_path):
    """Simulate the reference's failure window: results written, flags
    NOT flipped (crash between the two commits). Re-running must not
    duplicate results — the anti-join merge absorbs the replay."""
    src, res = str(tmp_path / "src"), str(tmp_path / "res")
    incremental.init_source(spark, source_df, src)

    source = spark.read.parquet(src)
    results = incremental.score_unprocessed(source)
    assert incremental.merge_results(spark, results, res) == 3
    # crash here: mark_processed never ran; all rows still processed=0

    n_retry = incremental.run_increment(spark, src, res)
    assert n_retry == 0  # everything already merged
    assert _counts(spark, res) == (3, 3)  # no dupes
    flags = spark.read.parquet(src).filter(F.col("id") <= 3)
    assert all(r.processed == 1 for r in flags.collect())  # now converged


def test_new_rows_after_convergence(spark, source_df, tmp_path):
    src, res = str(tmp_path / "src"), str(tmp_path / "res")
    incremental.init_source(spark, source_df, src)
    incremental.run_increment(spark, src, res)

    extra = spark.createDataFrame(
        [(5, "great fresh quick service", 0)],
        "id long, text_column string, processed int",
    )
    merged = spark.read.parquet(src).unionByName(extra)
    incremental.init_source(spark, merged, src)
    assert incremental.run_increment(spark, src, res) == 1
    assert _counts(spark, res) == (4, 4)


def test_concurrent_writer_raises_and_lock_released(spark, source_df, tmp_path):
    """Contended path of the single-writer guard: while one writer holds
    the mkdir lock, a second overwrite of the same path must raise
    ConcurrentWriterError (not interleave renames) — and a failed writer
    must release the lock so later writers proceed."""
    import os

    src = str(tmp_path / "src")
    lock = f"{src}__writelock"
    os.mkdir(lock)  # first writer holds the swap lock
    try:
        with pytest.raises(incremental.ConcurrentWriterError):
            incremental.init_source(spark, source_df, src)
        assert not os.path.exists(src)  # blocked writer left no target
    finally:
        os.rmdir(lock)

    # lock released -> the write goes through cleanly
    incremental.init_source(spark, source_df, src)
    assert spark.read.parquet(src).count() == 4
    assert not os.path.exists(lock)  # happy path releases the lock too
