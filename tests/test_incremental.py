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


def test_scd2_merge_successive_batches(spark):
    """scd2_merge must compose: applying batch 2 to batch 1's output
    keeps closed history verbatim, preserves surviving rows'
    valid_from, and closes/reopens only the re-updated keys."""
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, seg string"
    )
    upd1 = spark.createDataFrame([(2, "b2"), (4, "d")], "id long, seg string")
    v1 = incremental.scd2_merge(
        dim, upd1, key_col="id", effective_date="2024-06-01",
        initial_date="2024-01-01",
    )
    rows1 = {(r.id, r.seg, str(r.valid_from), str(r.valid_to), r.is_current)
             for r in v1.collect()}
    assert rows1 == {
        (1, "a", "2024-01-01 00:00:00", "None", True),
        (3, "c", "2024-01-01 00:00:00", "None", True),
        (2, "b", "2024-01-01 00:00:00", "2024-06-01 00:00:00", False),
        (2, "b2", "2024-06-01 00:00:00", "None", True),
        (4, "d", "2024-06-01 00:00:00", "None", True),
    }

    # batch 2 re-updates key 2 and touches key 1 for the first time
    upd2 = spark.createDataFrame([(2, "b3"), (1, "a2")], "id long, seg string")
    v2 = incremental.scd2_merge(
        v1, upd2, key_col="id", effective_date="2024-09-01",
        initial_date="IGNORED",  # must not be used on SCD input
    )
    rows2 = {(r.id, r.seg, str(r.valid_from), str(r.valid_to), r.is_current)
             for r in v2.collect()}
    assert rows2 == {
        # closed history from batch 1 passes through verbatim
        (2, "b", "2024-01-01 00:00:00", "2024-06-01 00:00:00", False),
        # untouched current keeps ITS OWN valid_from (4 opened in batch 1)
        (3, "c", "2024-01-01 00:00:00", "None", True),
        (4, "d", "2024-06-01 00:00:00", "None", True),
        # re-updated keys: old current closed at batch-2 date
        (1, "a", "2024-01-01 00:00:00", "2024-09-01 00:00:00", False),
        (2, "b2", "2024-06-01 00:00:00", "2024-09-01 00:00:00", False),
        (1, "a2", "2024-09-01 00:00:00", "None", True),
        (2, "b3", "2024-09-01 00:00:00", "None", True),
    }
    # exactly one current version per live key
    cur = v2.filter(F.col("is_current")).groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)
