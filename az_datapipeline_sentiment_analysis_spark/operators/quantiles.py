"""Exact distributed quantiles with bounded memory (two-phase selection).

Spark's built-in EXACT ``percentile`` / ``median`` aggregates are
``TypedImperativeAggregate``s: every partition buffers the whole value
column (ObjectHashAggregate) before the final merge — the one
aggregation class in the engine whose state grows with data volume
instead of with group count. That is fine at test scales and fatal at
100 TB column volumes. The registry's sketch entries (approx_quantile,
sketch_kll_*) are the approximate answer; this module is the EXACT
answer with bounded state, so operators that hash-check interpolated
quantiles against a ``quantile_cont`` oracle don't have to buffer.

Algorithm (the generalization of ``weighted_median``'s two-phase
bucketed selection, first applied to ``quantile_bucketing``):

1. Per group: min/max/count in ONE codegen'd hash aggregate.
2. Route every row into ``nb`` monotone value buckets (map-only; equal
   values always share a bucket, so edge rounding cannot split a tie).
3. Per-(group, bucket) counts — a <= groups x nb frame — and a
   cumulative sweep over it locate, for each order-statistic position
   ``floor/ceil((n-1)*p)`` the interpolation touches, the bucket that
   holds it.
4. Phase 2 aggregates ONLY the target buckets' distinct values
   (~n/nb rows per bucket) and reads the positioned values off a
   per-bucket cumulative count.
5. ``v_lo + frac * (v_hi - v_lo)`` — the linear interpolation
   ``quantile_cont`` defines (and Spark's own Percentile computes, up
   to float association) — assembled per (group, quantile).

Memory per task is bounded by the bucket-count frames (groups x nb
rows) and the target buckets' distinct values — never by the column.
Every pass over the fact is a codegen'd hash aggregate or filter.

The group-stats / bucket-count frames are broadcast by default,
which is correct while ``groups x nb`` fits in the driver (thousands
of groups). For unbounded group cardinality pass
``broadcast_groups=False``: the same plan runs with every group-keyed
broadcast turned into a co-keyed shuffle join — no other change,
property-tested equivalent.

Reference grounding: generalizes the Grafana-style summary statistics
the reference's dashboard DB serves (applications/applications.tf:
135-145); no reference operator computes quantiles — this is part of
the mandated at-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _join(a: DataFrame, b: DataFrame, on: list[str], broadcast: bool = True):
    """Equi-join on ``on``, degrading to a cross join for global (no
    group) quantiles; ``b`` is always the small side."""
    bb = F.broadcast(b) if broadcast else b
    if on:
        return a.join(bb, on)
    return a.crossJoin(bb)


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: dict[str, float],
    group_cols: list[str] | None = None,
    *,
    nb: int = 1024,
    keep: dict[str, str] | None = None,
    broadcast_groups: bool = True,
) -> DataFrame:
    """Exact interpolated quantiles per group, bounded memory.

    Parameters
    ----------
    df : input frame.
    value_col : numeric column to take quantiles of (nulls ignored,
        matching ``percentile`` / ``quantile_cont`` semantics).
    quantiles : output-column-name -> p (0 <= p <= 1). The p literals
        are used verbatim in the ``(n-1)*p`` position arithmetic, so
        pass the same floats the oracle SQL uses.
    group_cols : grouping key (empty/None = one global row).
    nb : value buckets per group; phase 2 touches ~len(quantiles)*2/nb
        of the rows.
    keep : optional output-column-name -> one of "count"/"min"/"max" —
        per-group stats the phase-1 aggregate computes anyway, exposed
        for free so callers don't re-scan the input for them (count and
        min/max come back as the value column's double cast).
    broadcast_groups : True (default) ships the group-stats /
        bucket-sweep / located frames broadcast — right while groups
        fit the driver. False turns every group-keyed join into a
        co-keyed shuffle join for unbounded group cardinality;
        identical results (unit-tested), one extra shuffle per phase.

    Returns one row per group: ``group_cols + list(quantiles) [+ keep
    columns]``, quantiles DoubleType, UNROUNDED (callers own output
    rounding). Groups with zero non-null values produce no row (grouped
    aggregate semantics).
    """
    g = list(group_cols or [])
    bg = broadcast_groups
    vals = df.select(
        *g, F.col(value_col).cast("double").alias("__v")
    ).filter(F.col("__v").isNotNull())

    stats = vals.groupBy(*g).agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count("*").alias("__n"),
    ).persist()

    # the order-statistic positions each interpolation touches
    plist = F.array(
        *[
            F.struct(
                F.lit(a).alias("__alias"), F.lit(float(p)).alias("__p")
            )
            for a, p in quantiles.items()
        ]
    )
    pos = (
        stats.select(*g, "__n", F.explode(plist).alias("__q"))
        .select(
            *g,
            F.col("__q.__alias").alias("__alias"),
            ((F.col("__n") - 1) * F.col("__q.__p")).alias("__h"),
        )
        .select(
            *g,
            "__alias",
            (F.col("__h") - F.floor("__h")).alias("__frac"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lo").alias("__side"),
                        F.floor("__h").cast("long").alias("__k"),
                    ),
                    F.struct(
                        F.lit("hi").alias("__side"),
                        F.ceil("__h").cast("long").alias("__k"),
                    ),
                )
            ).alias("__s"),
        )
        .select(
            *g,
            "__alias",
            "__frac",
            F.col("__s.__side").alias("__side"),
            F.col("__s.__k").alias("__k"),
        )
    )

    # monotone value-bucket routing (map-only)
    width = (F.col("__hi") - F.col("__lo")) / nb
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(1)).otherwise(
        F.least(
            F.lit(nb),
            F.floor((F.col("__v") - F.col("__lo")) / width).cast("int") + 1,
        )
    )
    fact = (
        _join(vals, stats.select(*g, "__lo", "__hi"), g, broadcast=bg)
        .withColumn("__b", bucket)
        .select(*g, "__v", "__b")
    )

    # phase 1: per-bucket counts, cumulative sweep, position -> bucket
    bw = fact.groupBy(*g, "__b").agg(F.count("*").alias("__w"))
    wc = (
        Window.partitionBy(*g) if g else Window.partitionBy()
    ).orderBy("__b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = bw.select(
        *g, "__b", "__w", F.sum("__w").over(wc).alias("__cum")
    )
    located = (
        _join(pos, marked, g, broadcast=bg)
        .filter(
            (F.col("__cum") - F.col("__w") <= F.col("__k"))
            & (F.col("__k") < F.col("__cum"))
        )
        .select(
            *g,
            "__alias",
            "__frac",
            "__side",
            "__k",
            "__b",
            (F.col("__cum") - F.col("__w")).alias("__before"),
        )
        .persist()
    )

    # phase 2: position values inside ONLY the target buckets
    tbs = located.select(*g, "__b", "__before").distinct()
    pw = Window.partitionBy(*g, "__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    positioned = (
        _join(fact, tbs, g + ["__b"], broadcast=bg)
        .groupBy(*g, "__b", "__before", "__v")
        .agg(F.count("*").alias("__c"))
        .select(
            *g,
            "__b",
            "__v",
            (F.col("__before") + F.sum("__c").over(pw)).alias("__gcum"),
        )
    )
    # broadcast side matters here: ``located`` is ~2 rows per quantile
    # per group while ``positioned`` holds the target buckets' distinct
    # values (~n/nb rows per bucket, growing with data volume) — the
    # big frame stays distributed, the tiny one ships
    sel = (
        _join(positioned, located, g + ["__b"], broadcast=bg)
        .filter(F.col("__gcum") >= F.col("__k") + 1)
        .groupBy(*g, "__alias", "__frac", "__side")
        .agg(F.min("__v").alias("__val"))
        .groupBy(*g, "__alias", "__frac")
        .agg(
            F.min(F.when(F.col("__side") == "lo", F.col("__val"))).alias(
                "__vlo"
            ),
            F.min(F.when(F.col("__side") == "hi", F.col("__val"))).alias(
                "__vhi"
            ),
        )
        .select(
            *g,
            "__alias",
            (
                F.col("__vlo")
                + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))
            ).alias("__qv"),
        )
    )
    out = sel.groupBy(*g).agg(
        *[
            F.min(F.when(F.col("__alias") == a, F.col("__qv"))).alias(a)
            for a in quantiles
        ]
    )
    if keep:
        src = {"count": "__n", "min": "__lo", "max": "__hi"}
        extras = stats.select(
            *g, *[F.col(src[which]).alias(a) for a, which in keep.items()]
        )
        out = _join(out, extras, g, broadcast=False)
    # Materialize the (groups x quantiles)-sized result eagerly so the
    # persisted intermediates can be released NOW instead of leaking
    # cached partitions across repeated invocations in a long-lived
    # session. localCheckpoint keeps only the tiny output blocks (freed
    # by the context cleaner once the frame is unreferenced); the
    # caller still receives a composable DataFrame.
    out = out.localCheckpoint(eager=True)
    stats.unpersist()
    located.unpersist()
    return out
