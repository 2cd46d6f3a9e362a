"""Round-12 optimization pins.

The fixture co-occurrence graphs have NO node below degree k=3 at any
test scale (checked in duckdb for sf0.001/0.01/0.1), so graph_kcore's
oracle parity never exercises the incremental peeling's subtraction
path. These tests drive ``_kcore_peel`` on synthetic multi-round
graphs against a brute-force reference of the ORIGINAL recompute
semantics (degrees recomputed from the surviving edge set every
round, 12-round unroll), including the non-broadcast fallback branch
of the size guard.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from az_datapipeline_sentiment_analysis_spark.plans import (
    queries_r8 as r8,
)


def _reference_kcore(edges, k=3, rounds=12):
    """Brute-force recompute peeling (the pre-r12 semantics): each
    round recomputes degrees from the edges whose BOTH endpoints
    survive, drops nodes under k, early-exits at the fixpoint; output
    is the degree within the final surviving set."""
    keep = {n for e in edges for n in e}
    for _ in range(rounds):
        surv = [(u, v) for u, v in edges if u in keep and v in keep]
        deg: dict[int, int] = {}
        for u, v in surv:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        new_keep = {n for n, d in deg.items() if d >= k}
        if new_keep == keep:
            break
        keep = new_keep
    core = [(u, v) for u, v in edges if u in keep and v in keep]
    out: dict[int, int] = {}
    for u, v in core:
        out[u] = out.get(u, 0) + 1
        out[v] = out.get(v, 0) + 1
    return out


def _cascade_graph():
    """K5 core plus a peeling cascade: t1 (deg 2) dies round 1, which
    drops t2 to 2 (dies round 2), which drops t3 (dies round 3) —
    at least three removal rounds before the fixpoint."""
    edges = [(u, v) for u in range(1, 6) for v in range(u + 1, 6)]
    # t3=10 leans on the core (deg 3: two core edges + t2)
    edges += [(3, 10), (4, 10)]
    # t2=11: t3, core, t1 (deg 3 until t1 dies)
    edges += [(10, 11), (1, 11)]
    # t1=12: t2 and one core edge (deg 2 -> dies round 1)
    edges += [(11, 12), (2, 12)]
    return edges


def _random_graph(seed=7, n=120, m=260):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            es.add((min(u, v), max(u, v)))
    return sorted(es)


def _run_peel(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long").persist()
    try:
        rows = r8._kcore_peel(df, **kw).collect()
        return {r["node"]: r["core_degree"] for r in rows}
    finally:
        df.unpersist()


def test_kcore_peel_multi_round_cascade(spark):
    edges = _cascade_graph()
    ref = _reference_kcore(edges)
    # the cascade must actually take >= 3 removal rounds, or this
    # test stops guarding the subtraction path
    keep = {n for e in edges for n in e}
    removal_rounds = 0
    for _ in range(12):
        deg: dict[int, int] = {}
        for u, v in edges:
            if u in keep and v in keep:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        new_keep = {n for n, d in deg.items() if d >= 3}
        if new_keep == keep:
            break
        removal_rounds += 1
        keep = new_keep
    assert removal_rounds >= 3, removal_rounds
    assert _run_peel(spark, edges) == ref


def test_kcore_peel_random_graph_matches_reference(spark):
    # sparse random graph: many sub-k nodes, cascading removals, some
    # isolated-survivor and zero-degree edge cases land by volume
    edges = _random_graph()
    assert _run_peel(spark, edges) == _reference_kcore(edges)


def test_kcore_peel_non_broadcast_fallback(spark, monkeypatch):
    # force the size guard's fallback branch (no broadcast hint): the
    # plain-join path must emit identical values
    edges = _random_graph(seed=11)
    ref = _reference_kcore(edges)
    monkeypatch.setattr(r8, "_KCORE_BROADCAST_MAX_ROWS", 0)
    assert _run_peel(spark, edges) == ref


def test_cluster_blocked_pairs_salted_bit_identical(spark):
    # Force the sub-block salting path (block_rows far below the
    # corpus) and pin its output bit-for-bit against the unsalted
    # B=1 fast path: same pair set, same rounded cosines. The salting
    # must be pure re-grouping — every unordered pair lands in
    # exactly one (list, p, q) group and the per-pair arithmetic is
    # unchanged.
    from az_datapipeline_sentiment_analysis_spark.catalog import table
    from az_datapipeline_sentiment_analysis_spark.operators import (
        similarity as sim,
    )

    from conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "embeddings")
    base = {
        (int(r["u"]), int(r["v"])): r["cosine"]
        for r in sim.cluster_blocked_pairs(
            e, n_lists=16, tau=0.35, block_rows=10**9
        ).collect()
    }
    salted = {
        (int(r["u"]), int(r["v"])): r["cosine"]
        for r in sim.cluster_blocked_pairs(
            e, n_lists=16, tau=0.35, block_rows=8
        ).collect()
    }
    assert salted == base and len(base) > 0


def test_cluster_blocked_pairs_hot_cluster_is_salted(spark):
    # A synthetic hot cluster (every vector identical => one cluster
    # holds the whole corpus): with a small block budget the stage
    # must still emit every pair exactly once with cosine 1.0 —
    # n*(n-1)/2 pairs — through cross-block groups.
    import pyspark.sql.functions as F

    from az_datapipeline_sentiment_analysis_spark.operators import (
        similarity as sim,
    )

    n = 60
    vec = [float(x) for x in range(1, 65)]
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x).cast("float") for x in vec]).alias(
            "embedding"
        ),
    )
    out = sim.cluster_blocked_pairs(
        e, n_lists=16, tau=0.5, block_rows=7
    ).collect()
    pairs = {(int(r["u"]), int(r["v"])) for r in out}
    assert len(out) == n * (n - 1) // 2
    assert pairs == {
        (u, v) for u in range(n) for v in range(u + 1, n)
    }
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in out)


def test_minhash_dup_doc_ids_equals_pair_doc_b(spark):
    # the expansion-free drop set must equal the pair form's distinct
    # doc_b exactly — on the fixture corpus AND on a synthetic corpus
    # engineered to exercise every branch: multi-member copy groups
    # (intra), cross near-dup groups where the A-side holds ids both
    # below and above the B rep (the ia > rep_b cut), and an
    # empty-shingle copy group (the nonempty gate)
    from az_datapipeline_sentiment_analysis_spark.catalog import table
    from az_datapipeline_sentiment_analysis_spark.operators import (
        dedup as dd,
    )

    from conftest import SF_SMOKE

    def drop_set(df):
        got = {
            int(r["doc_id"])
            for r in dd.minhash_dup_doc_ids(df, threshold=0.3).collect()
        }
        want = {
            int(r["doc_b"])
            for r in dd.minhash_pairs(df, threshold=0.3)
            .select("doc_b")
            .distinct()
            .collect()
        }
        assert got == want, (sorted(got - want), sorted(want - got))
        return got

    drop_set(table(spark, SF_SMOKE, "documents"))

    base = (
        "the quick brown fox jumps over the lazy dog again and again"
        " with many shared tokens across documents in this corpus"
    )
    near = base + " trailing variation tokens here"
    rows = [
        (1, base), (5, base), (9, base),        # copy group A (rep 1)
        (2, near), (7, near),                   # copy group B (rep 2)
        (3, "completely different text about unrelated topics entirely"
            " nothing shared with the others at all in any way"),
        (4, ""), (6, ""),                       # empty-shingle copies
        (8, "zz"),                              # singleton, no shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = drop_set(df)
    assert len(got) > 0


def test_kcore_peel_everything_peels(spark):
    # a bare path graph: every node dies (degrees <= 2), the loop must
    # fixpoint on an empty frame and emit zero rows
    edges = [(i, i + 1) for i in range(20)]
    assert _run_peel(spark, edges) == {}
