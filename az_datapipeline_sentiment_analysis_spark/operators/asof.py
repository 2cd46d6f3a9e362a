"""As-of (nearest-prior-event) join, expressed shuffle-minimally.

Spark has no native ASOF JOIN. The scalable formulation is the
union-and-carry-forward trick: union both sides tagged, sort within the
join key by time once, and carry the right side's last value forward
with ``last(..., ignorenulls=True)``. One shuffle on the key — the same
cost as a regular equi-join — versus the naive range-join + groupBy,
which is quadratic per key. This is the 100 TB-safe plan: skew on the
key is the only hazard (AQE skew handling applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts < left_ts`` (strict) or ``<=`` (non-strict), per key.

    Returns the left rows plus ``asof_ts`` (+ ``asof_<payload>``
    columns), null when no prior right row exists.
    """
    payload = payload or []
    lcols = left.columns
    l_tag = left.select(*lcols).withColumn("__side", F.lit(0))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).withColumn("__side", F.lit(1))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__ts", F.when(F.col("__side") == 1, F.col("__r_ts")).otherwise(F.col(left_ts))
    )
    # Tie handling at equal timestamps: strict -> left rows sort first
    # (equal-ts right rows fall outside the <current frame); non-strict
    # -> right rows sort first (equal-ts right rows are visible).
    side_order = F.col("__side").asc() if strict else F.col("__side").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = [
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("asof_ts")
    ] + [
        F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in payload
    ]
    return (
        merged.select("*", *carried)
        .filter(F.col("__side") == 0)
        .select(*lcols, "asof_ts", *[f"asof_{c}" for c in payload])
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts > left_ts`` (strict) or ``>=`` (non-strict), per key —
    the forward twin of :func:`asof_join` (next touch instead of last
    touch). Same union-and-carry plan, with the carry running over the
    FOLLOWING frame: one shuffle on the key, never quadratic.

    Returns the left rows plus ``next_ts`` (+ ``next_<payload>``
    columns), null when no later right row exists.
    """
    payload = payload or []
    lcols = left.columns
    l_tag = left.select(*lcols).withColumn("__side", F.lit(0))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).withColumn("__side", F.lit(1))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__ts",
        F.when(F.col("__side") == 1, F.col("__r_ts")).otherwise(
            F.col(left_ts)
        ),
    )
    # Tie handling mirrors asof_join: strict -> left rows sort LAST at
    # equal ts (equal-ts right rows fall before the >current frame);
    # non-strict -> right rows sort after left so they are visible.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carried = [
        F.first(F.col("__r_ts"), ignorenulls=True).over(w).alias("next_ts")
    ] + [
        F.first(F.col(f"__r_{c}"), ignorenulls=True)
        .over(w)
        .alias(f"next_{c}")
        for c in payload
    ]
    return (
        merged.select("*", *carried)
        .filter(F.col("__side") == 0)
        .select(*lcols, "next_ts", *[f"next_{c}" for c in payload])
    )
