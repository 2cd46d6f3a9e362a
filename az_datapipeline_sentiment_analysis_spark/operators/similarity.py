"""Embedding similarity search: brute-force top-k and LSH-bucketed ANN.

Brute force is the correctness baseline: broadcast the (small) query
set, one shuffle-free scan of the corpus computing cosine JVM-side,
then a per-query top-k (window). At 100 TB the corpus scan dominates
and parallelizes perfectly; the broadcast keeps the join shuffle-free.

The ANN path buckets vectors by random-hyperplane signs (deterministic
seed): corpus is scanned once to assign buckets, queries probe only
their own bucket(s), and the exact cosine re-rank runs on the tiny
candidate set. Recall < 1 by construction — compared against the brute
force in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output: (q_id, vec_id, cosine, rank); self-matches excluded.
    Ranking uses the ROUNDED cosine with id tiebreak so results are
    stable across engines/float orderings.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", F.round(cosine_expr("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )


# --- random-hyperplane LSH ANN --------------------------------------

N_PLANES = 8  # 2^8 = 256 buckets


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-pattern bucket id as a JVM expression (no UDF): sum of
    2^i * (dot(vec, plane_i) > 0)."""
    terms = []
    for i, p in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x!r} as double)" for x in p) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x as double) * y),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(terms)).cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    n_planes: int = N_PLANES,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket plus (with
    ``multiprobe=1``) every bucket one sign-flip away.

    One scan to bucket the corpus, shuffle on bucket id, exact re-rank
    within buckets. Multi-probe expands only the (tiny) QUERY side —
    the standard recall knob that costs nothing on the corpus scan: a
    near neighbor straddling one hyperplane lands one Hamming step
    away, and probing those buckets recovers it without re-bucketing.
    Output schema matches :func:`brute_force_topk`.
    """
    planes = _planes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("bucket", _bucket_expr("c_vec", planes))
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", _bucket_expr("q_vec", planes))
    if multiprobe >= 1:
        # query-side bucket fan-out: home bucket + one-bit flips
        flips = ", ".join(
            f"bucket ^ {1 << i}" for i in range(n_planes)
        )
        q = q.withColumn(
            "bucket", F.explode(F.expr(f"array(bucket, {flips})"))
        )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .drop("bucket")
        # no dedup needed: each corpus row lives in exactly one bucket
        # and the probed buckets are pairwise distinct
        .withColumn("cosine", F.round(cosine_expr("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )
