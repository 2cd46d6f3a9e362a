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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """For each left row, attach the right row NEAREST in time in
    EITHER direction (strictly before or strictly after; equidistant
    ties resolve to the prior row) — the bidirectional completion of
    :func:`asof_join` / :func:`asof_join_forward`.

    Both carries run in ONE pass: the union shuffles once on the key,
    and the two window frames (prior-carry ordered left-first at equal
    ts, next-carry ordered right-first) are two in-partition sorts over
    the same exchange — the plan has a single Exchange however large
    the sides are, where the naive formulation is two range joins with
    per-key quadratic blowup.

    Returns the left rows plus ``near_ts`` (null when the key has no
    other-side rows at a different instant) and ``near_dist_us``
    (integer microseconds, exact).
    """
    lcols = left.columns
    l_tag = left.select(*lcols).withColumn("__side", F.lit(0))
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__r_ts")
    ).withColumn("__side", F.lit(1))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__ts",
        F.when(F.col("__side") == 1, F.col("__r_ts")).otherwise(
            F.col(left_ts)
        ),
    )
    # strict both ways: equal-ts right rows sort AFTER left for the
    # preceding frame (invisible to prev) and BEFORE left for the
    # following frame (invisible to next)
    wp = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    out = (
        merged.select(
            "*",
            F.last(F.col("__r_ts"), ignorenulls=True).over(wp).alias(
                "__prev_ts"
            ),
            F.first(F.col("__r_ts"), ignorenulls=True).over(wn).alias(
                "__next_ts"
            ),
        )
        .filter(F.col("__side") == 0)
        .withColumn("__pd", us("__ts") - us("__prev_ts"))
        .withColumn("__nd", us("__next_ts") - us("__ts"))
    )
    prev_wins = F.col("__next_ts").isNull() | (
        F.col("__prev_ts").isNotNull() & (F.col("__pd") <= F.col("__nd"))
    )
    return out.select(
        *lcols,
        F.when(prev_wins, F.col("__prev_ts"))
        .otherwise(F.col("__next_ts"))
        .alias("near_ts"),
        F.when(prev_wins, F.col("__pd"))
        .otherwise(F.col("__nd"))
        .alias("near_dist_us"),
    )
