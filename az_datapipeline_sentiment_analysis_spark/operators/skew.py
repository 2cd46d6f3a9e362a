"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is
the complementary *declared* strategy for the cases AQE can't fix:

* a single hot key whose rows must still meet ALL matching rows of the
  other side (AQE splits the partition, but every split still needs the
  full other-side key group), and
* hot-key aggregation where one reducer would own the whole key.

``salted_join`` replicates the (small) right side R times and scatters
the left side across R salt values — the hot key's work spreads over R
tasks at the cost of R× the right side's shuffle volume, which is the
correct trade when left skew dominates (the usual case: a viral
document id, a null-ish default key, a mega-customer).

``salted_agg_count`` shows two-phase aggregation: per-(key, salt)
partial, then per-key final — for aggs that are not algebraic partials
Spark already handles (count/sum/avg are; use this pattern for e.g.
exact distinct via two groupBys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered over n_salts.

    The left side gets a random-but-deterministic salt from a hash of
    its full row (monotonically_increasing_id would break retry
    determinism); the right side is exploded to every salt value so any
    (key, salt) pair still finds its matches. Output columns = the
    plain join's columns (salt is internal).

    ``pmod`` (not ``abs(hash) % n``) keeps the salt in [0, n_salts):
    ``abs(Int.MinValue)`` is still negative in Spark, so the abs form
    silently drops a ~2^-32 sliver of rows for non-power-of-two salts.
    Only inner/left/left_semi are supported: right/full-outer would
    emit each unmatched right row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the right side is replicated per salt, so right/full outer "
            "joins would duplicate unmatched right rows n_salts times"
        )
    salt_l = (
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    ).alias("__salt")
    l_s = left.withColumn("__salt", salt_l)
    r_s = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return l_s.join(r_s, [on, "__salt"], how).drop("__salt")


def salted_agg_count(
    df: DataFrame, key: str, *, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-phase count per key: (key, salt) partials, then key totals.

    Equivalent to ``df.groupBy(key).count()`` but the first shuffle
    spreads each hot key over n_salts reducers. Output: (key, n).
    """
    partial = (
        df.withColumn("__salt", F.spark_partition_id() % n_salts)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").cast("long").alias("n"))
