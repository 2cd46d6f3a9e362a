"""Invariant tests for the round-8 continuation batch
(prefix-filtered similarity join, sorted-neighborhood linkage,
conformal intervals, CUPED, URL parsing, mapInArrow).

Oracle parity for each entry is owned by test_oracle_parity.py; these
pin the properties parity can't see — losslessness of the prefix
filter vs the full-index plan, candidate-set shrinkage, plan shapes
(no joins in SNM candidate generation, no ObjectHashAggregate), the
conformal coverage guarantee, and CUPED's variance-reduction
direction.
"""

from __future__ import annotations

import decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from az_datapipeline_sentiment_analysis_spark.catalog import table as _t
from az_datapipeline_sentiment_analysis_spark.operators import dedup as dd
from az_datapipeline_sentiment_analysis_spark.plans import queries_r8c as r8c

from conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- prefix-filtered similarity join ---------------------------------

def test_prefix_filter_matches_full_index_exactly(spark):
    """Losslessness: the prefix-filtered join returns EXACTLY the
    pairs the full inverted index finds at the same threshold."""
    docs = _t(spark, SF_ORACLE, "documents")
    got = sorted(
        map(
            tuple,
            dd.prefix_filter_jaccard_pairs(docs, t_num=3, t_den=10)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            dd.ngram_jaccard_pairs(docs, threshold=0.3)
            .filter(F.col("jaccard") >= 0.3)
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_prefix_index_is_smaller_than_full_index(spark):
    """The point of the technique: the prefix index holds strictly
    fewer postings than the full index (|d| - ceil(0.3|d|) + 1 < |d|
    whenever |d| >= 2), so candidate generation shrinks."""
    docs = _t(spark, SF_ORACLE, "documents")
    src = docs.select(
        F.col("doc_id"), F.col("text"),
    )
    ex = dd.with_shingles(src, "text").select(
        "doc_id", F.size("shingles").alias("sz"),
        F.explode("shingles").alias("s"),
    )
    full = ex.count()
    pref_len = F.expr("sz - ((3 * sz + 9) div 10) + 1")
    w = F.row_number().over(Window.partitionBy("doc_id").orderBy("s"))
    pruned = ex.withColumn("rn", w).filter(F.col("rn") <= pref_len).count()
    assert pruned < full


def test_prefix_filter_plan_is_codegen_safe(spark):
    plan = _plan(
        dd.prefix_filter_jaccard_pairs(
            _t(spark, SF_SMOKE, "documents"), t_num=3, t_den=10
        )
    )
    assert "ObjectHashAggregate" not in plan
    assert "CartesianProduct" not in plan


# --- sorted-neighborhood record linkage -------------------------------

def test_snm_candidate_generation_has_no_join(spark):
    """SNM's candidates come from lead() over one block-partitioned
    window — the plan must contain a Window and NO join of any kind
    (the naive matcher's self-join is exactly what SNM avoids)."""
    plan = _plan(r8c.record_linkage_snm(spark, SF_ORACLE))
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_snm_pairs_respect_window_and_block(spark):
    rows = r8c.record_linkage_snm(spark, SF_ORACLE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.rank_gap <= r8c._SNM_W
        assert 0 <= r.bal_diff_cents <= r8c._SNM_EPS_CENTS
        assert r.custkey_a != r.custkey_b


# --- split-conformal intervals ----------------------------------------

def test_conformal_coverage_guarantee(spark):
    """Split conformal guarantees E[coverage] >= 1 - alpha = 0.9 over
    the calibration/test randomness; with ~2000 test points per type
    the realized coverage concentrates well above 0.85."""
    rows = r8c.conformal_interval(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.q_resid >= 0.0
        assert r.n_covered <= r.n_test
        assert r.coverage >= 0.85, (r.event_type, r.coverage)
        # rank k = ceil(0.9 * (n_cal + 1)), clamped to n_cal
        assert r.k == min((9 * (r.n_cal + 1) + 9) // 10, r.n_cal)


# --- CUPED -------------------------------------------------------------

def test_cuped_theta_is_pooled_variance_minimizer(spark):
    """theta = cov(x,y)/var(x) minimizes POOLED var(y - theta*x), so
    any other theta' must do worse on the pooled frame — the defining
    property of CUPED's adjustment. (Per-arm variance may tick up
    when an arm's local covariance differs from the pooled theta;
    that's real CUPED behavior, not a bug, so the per-arm direction
    is deliberately NOT asserted.) Also pins that theta is a single
    shared broadcast value across arms."""
    rows = r8c.cuped_adjustment(spark, SF_ORACLE).collect()
    assert {r.arm for r in rows} == {"treat", "control"}
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1
    theta = thetas.pop()
    assert theta is not None

    ev = _t(spark, SF_ORACLE, "events")
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    pu = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cutoff, cents)), F.lit(0))
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cutoff, cents)), F.lit(0))
        .alias("y"),
    )

    def pooled_var_adj(t: float) -> float:
        return (
            pu.select(
                F.var_samp(
                    (F.col("y").cast("double") - F.lit(t) * F.col("x"))
                    / 100.0
                ).alias("v")
            ).collect()[0].v
        )

    best = pooled_var_adj(theta)
    assert best <= pooled_var_adj(0.0) + 1e-9   # no worse than no adjustment
    for other in (theta - 0.5, theta + 0.5, 1.0):
        assert best < pooled_var_adj(other)


# --- mapInArrow ---------------------------------------------------------

def test_mapinarrow_matches_jvm_higher_order_norms(spark):
    """The Arrow-batch kernel must agree with the pure-JVM
    higher-order-function formulation (embed_norms) on every vector."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    arrow = {
        r.vec_id: r.l2_norm
        for r in r8c.mapinarrow_transform(spark, SF_SMOKE).collect()
    }
    jvm = {
        r.vec_id: r.l2_norm
        for r in REGISTRY["embed_norms"].fn(spark, SF_SMOKE).collect()
    }
    assert arrow == jvm and len(arrow) == 500


def test_mapinarrow_kernel_ragged_and_null_vectors():
    """ADVICE r9: a genuinely SHORT non-null vector must keep its real
    components (trailing-zero pad), never be silently zeroed; only
    None rows zero-fill. Batch-composition independence follows:
    [3,4] reports norm 5 whether it shares a batch with a longer
    vector or not."""
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3], type=pa.int64()),
            pa.array(
                [[3.0, 4.0], [1.0, 2.0, 2.0, 4.0], None],
                type=pa.list_(pa.float32()),
            ),
        ],
        names=["vec_id", "embedding"],
    )
    out = next(r8c._arrow_norm_batches(iter([batch])))
    got = {
        r["vec_id"]: (r["dim"], r["l2_norm"], r["max_abs"])
        for r in out.to_pylist()
    }
    assert got[1] == (2, 5.0, 4.0)  # short vector: real norm, not 0
    assert got[2] == (4, 5.0, 4.0)
    assert got[3] == (0, 0.0, 0.0)  # None: zero-filled, dim 0 signals


# --- difference-in-differences ----------------------------------------

def test_did_scalars_replay_from_arm_rows(spark):
    """did/se/t must be the documented scalar functions of the two
    arm rows' quantized moments (the welch quantize-first shape),
    and identical on both output rows."""
    import math

    rows = {r.arm: r for r in r8c.diff_in_diff(spark, SF_ORACLE).collect()}
    t, c = rows["treat"], rows["control"]
    assert t.did_estimate == c.did_estimate
    assert t.se == c.se and t.t_stat == c.t_stat
    assert t.did_estimate == round(t.mean_delta - c.mean_delta, 4)
    se = math.sqrt(t.var_delta / t.n_users + c.var_delta / c.n_users)
    assert t.se == round(se, 6)


# --- sequential SPRT ----------------------------------------------------

def test_sprt_walk_replays_in_python(spark):
    """The quantized LLR walk must replay exactly from the daily
    (x, n) counts with the module's constants — no float accumulation
    can exist anywhere in the entry."""
    import math

    c1 = float(r8c._SPRT_C1)
    c2 = float(r8c._SPRT_C2)
    rows = r8c.ab_sequential_sprt(spark, SF_ORACLE).collect()
    by_arm = {}
    for r in sorted(rows, key=lambda r: (r.arm, r.day)):
        lq = int(round((r.x * c1 + (r.n - r.x) * c2) * 1_000_000))
        assert r.llr_q == lq, (r.arm, r.day)
        cum = by_arm.get(r.arm, 0) + lq
        by_arm[r.arm] = cum
        assert r.cum_llr_q == cum
        want = (
            "accept_h1" if cum >= r8c._SPRT_A_Q
            else "accept_h0" if cum <= -r8c._SPRT_A_Q
            else "continue"
        )
        assert r.decision == want


# --- JL projection -------------------------------------------------------

def test_jl_norm_ratio_concentrates(spark):
    """The JL guarantee made measurable: ||proj(x)|| / ||x|| must
    concentrate around 1 (k=16 gives a loose but real band)."""
    ratios = [
        r.norm_ratio
        for r in r8c.embed_jl_project(spark, SF_ORACLE).collect()
    ]
    assert len(ratios) == 500
    mean = sum(ratios) / len(ratios)
    assert 0.85 <= mean <= 1.15, mean
    var = sum((x - mean) ** 2 for x in ratios) / len(ratios)
    assert var ** 0.5 <= 0.35


def test_jl_matrix_is_achlioptas_shaped():
    """Fixed-matrix sanity: ~1/3 of entries are nonzero, both signs
    present, and the matrix is identical on recomputation
    (determinism — no RNG anywhere)."""
    cols = [r8c._jl_signs(j) for j in range(r8c._JL_OUT_DIMS)]
    nnz = sum(len(c) for c in cols)
    assert 0.2 <= nnz / (64 * r8c._JL_OUT_DIMS) <= 0.5
    signs = {s for c in cols for _, s in c}
    assert signs == {1, -1}
    assert cols == [r8c._jl_signs(j) for j in range(r8c._JL_OUT_DIMS)]


# --- prefix-filtering principle (pure-python hypothesis model) ----------

def test_prefix_filter_principle_hypothesis():
    """Property-check the math the Spark plan relies on: under ANY
    global token order, if J(x, y) >= t then the
    (|d| - ceil(t|d|) + 1)-prefixes intersect. Run over random small
    set pairs; a counterexample here would mean the prefix join can
    DROP a qualifying pair at any scale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    t_num, t_den = 3, 10

    @settings(max_examples=300, deadline=None)
    @given(
        st.sets(st.integers(0, 40), min_size=1, max_size=25),
        st.sets(st.integers(0, 40), min_size=1, max_size=25),
        st.randoms(use_true_random=False),
    )
    def check(x, y, rng):
        inter = len(x & y)
        union = len(x | y)
        if inter * t_den < t_num * union:  # J < t — no guarantee
            return
        order = list(range(41))
        rng.shuffle(order)
        rank = {tok: i for i, tok in enumerate(order)}
        def prefix(s):
            p = len(s) - ((t_num * len(s) + t_den - 1) // t_den) + 1
            return set(sorted(s, key=rank.__getitem__)[:p])
        assert prefix(x) & prefix(y), (x, y, order)

    check()


# --- nDCG ranking eval --------------------------------------------------

def test_ndcg_bounds_and_perfect_ranking_consistency(spark):
    """0 <= nDCG <= 1 per query (DCG over any k-list can't beat the
    ideal list — relevance is clamped nonnegative and weights
    decrease), and queries where LSH@5 returns exactly the exact@5
    set in the same order must score 1.0."""
    from az_datapipeline_sentiment_analysis_spark.operators import similarity as sim

    rows = {r.q_id: r for r in r8c.ndcg_ranking_eval(spark, SF_ORACLE).collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert 0.0 <= r.ndcg <= 1.0, r
        assert 0 <= r.dcg_q <= r.idcg_q

    e = _t(spark, SF_ORACLE, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = {
        (r.q_id, r.rank): r.vec_id
        for r in sim.brute_force_topk(e, q, k=5).collect()
    }
    lsh = {
        (r.q_id, r.rank): r.vec_id
        for r in sim.lsh_topk(e, q, k=5).collect()
    }
    for qid in rows:
        same = all(
            exact.get((qid, i)) == lsh.get((qid, i)) for i in range(1, 6)
        )
        if same:
            assert rows[qid].ndcg == 1.0, qid


# --- item-item CF ---------------------------------------------------------

def test_itemcf_scores_replay_and_topk_shape(spark):
    """score_q must equal the binary-cosine formula from the row's own
    counts; each item carries at most k neighbors; the neighbor
    relation's underlying pair counts are symmetric."""
    import math

    rows = r8c.itemcf_neighbors(spark, SF_ORACLE).collect()
    assert rows
    per_item = {}
    for r in rows:
        assert r.score_q == int(
            round(r.n_ij * 1_000_000.0 / math.sqrt(float(r.n_i) * r.n_j))
        )
        assert 1 <= r.rnk <= r8c._ITEMCF_K
        assert r.n_ij >= r8c._ITEMCF_FLOOR
        assert r.n_ij <= min(r.n_i, r.n_j)
        per_item.setdefault(r.part_i, []).append(r.rnk)
    for ranks in per_item.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# --- classification report ----------------------------------------------

def test_classification_report_identities(spark):
    """Count identities that hold for ANY confusion matrix: sum(tp)
    == total correct, per-class tp <= min(support, predicted), F1
    equals the harmonic mean computed from the row's own counts, and
    micro-precision == micro-recall (both are total-correct / N)."""
    rows = r8c.classification_report(spark, SF_ORACLE).collect()
    labels = {r.label for r in rows}
    assert {"en", "es", "de", "fr", "zh"} <= labels
    n_gold = sum(r.support for r in rows)
    assert n_gold == 500  # every doc has exactly one gold label
    n_pred = sum(r.tp + r.fp for r in rows)
    assert n_pred == 500  # and exactly one prediction
    for r in rows:
        assert 0 <= r.tp <= min(r.support, r.tp + r.fp)
        assert r.fp >= 0 and r.fn >= 0
        denom = (r.tp + r.fp) + r.support
        # Spark ROUND is HALF_UP; Python round() is ties-to-even. An
        # exact tie at the 7th decimal (denom a power-of-two multiple)
        # would diverge — quantize HALF_UP like the engine does.
        want_f1 = (
            float(
                decimal.Decimal(2 * r.tp)
                / decimal.Decimal(denom)
            )
            if denom
            else 0.0
        )
        assert abs(r.f1 - want_f1) <= 1e-6
