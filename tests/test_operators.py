"""Operator-level tests: dedup recall, ANN recall, as-of semantics,
multimodal plumbing — the claims the operator docstrings make, checked.

The approximate operators (MinHash LSH, SimHash, hyperplane LSH) are
graded against their exact baselines on the same data: precision must
be 1.0 (candidates are exact-verified) and recall above a floor that
the banding math predicts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from az_datapipeline_sentiment_analysis_spark.catalog import table
from az_datapipeline_sentiment_analysis_spark.operators import dedup as dd
from az_datapipeline_sentiment_analysis_spark.operators import multimodal as mm
from az_datapipeline_sentiment_analysis_spark.operators import similarity as sim
from az_datapipeline_sentiment_analysis_spark.operators.asof import asof_join

from conftest import SF_SMOKE


def _pairs(df, cols=("doc_a", "doc_b")):
    return {(r[cols[0]], r[cols[1]]) for r in df.collect()}


# --- MinHash vs exact Jaccard ---------------------------------------

def test_minhash_precision_and_recall_vs_exact(spark):
    docs = table(spark, SF_SMOKE, "documents")
    exact = dd.ngram_jaccard_pairs(docs, threshold=0.3)
    approx = dd.minhash_pairs(docs, threshold=0.3)
    exact_pairs, approx_pairs = _pairs(exact), _pairs(approx)
    # precision 1.0 by construction: candidates are exact-verified
    assert approx_pairs <= exact_pairs
    # 8 bands x 4 rows: P(catch | j>=0.5) ~ 1-(1-j^4)^8 >= 0.93. The
    # 0.3..0.5 tail may be missed; require >=80% of the j>=0.5 pairs.
    strong = _pairs(exact.filter(F.col("jaccard") >= 0.5))
    if strong:
        caught = len(strong & approx_pairs) / len(strong)
        assert caught >= 0.8, f"LSH recall {caught:.2f} on strong pairs"


def test_minhash_jaccard_values_match_exact(spark):
    docs = table(spark, SF_SMOKE, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    for r in dd.minhash_pairs(docs, threshold=0.3).collect():
        assert exact[(r.doc_a, r.doc_b)] == pytest.approx(r.jaccard, abs=1e-4)


def test_simhash_pairs_are_near_identical_docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog tonight"),
        Row(doc_id=3, text="completely unrelated text about parquet shuffles and joins"),
    ]
    out = dd.simhash_pairs(spark.createDataFrame(rows), max_hamming=16)
    got = _pairs(out)
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_exact_dedup_counts(spark):
    rows = [
        Row(doc_id=1, text="Hello   World"),
        Row(doc_id=2, text="hello world"),  # same fingerprint (case/ws)
        Row(doc_id=3, text="something else"),
    ]
    out = dd.exact_dedup(spark.createDataFrame(rows)).collect()
    by_canon = {r.canonical_id: r.n_dupes for r in out}
    assert by_canon == {1: 2, 3: 1}


# --- ANN recall vs brute force --------------------------------------

def test_lsh_ann_finds_planted_near_neighbors(spark):
    # Uniform random vectors have no meaningful "near" neighbors, so
    # recall there measures noise. Plant real ones: each query is a
    # corpus vector plus small noise (cosine ~0.99); multi-probe LSH
    # must land it in the planted vector's bucket or one flip away.
    import numpy as np

    rng = np.random.RandomState(3)
    corpus_np = rng.standard_normal((400, 64)).astype("float32")
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v])
        for i, v in enumerate(corpus_np)
    ]
    emb = spark.createDataFrame(rows)
    n_q = 20
    queries = spark.createDataFrame(
        [
            Row(
                vec_id=10_000 + i,
                embedding=[
                    float(x)
                    for x in corpus_np[i] + 0.05 * rng.standard_normal(64)
                ],
            )
            for i in range(n_q)
        ]
    )
    got = sim.lsh_topk(emb, queries, k=3, multiprobe=1).collect()
    rank1 = {r.q_id: r.vec_id for r in got if r.rank == 1}
    hits = sum(1 for i in range(n_q) if rank1.get(10_000 + i) == i)
    # deterministic planes+data; measured 1.0, floor leaves slack only
    # for float-order jitter
    assert hits / n_q >= 0.7, f"planted-neighbor recall {hits}/{n_q}"


def test_lsh_candidates_subset_of_brute_force_universe(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = sim.lsh_topk(emb, q, k=5).collect()
    # schema parity with brute force + no self matches + valid ranks
    assert {r.q_id for r in out} <= {0, 1, 2, 3, 4}
    assert all(r.vec_id != r.q_id for r in out)
    assert all(1 <= r.rank <= 5 for r in out)


def test_knn_ann_vote_recovers_planted_labels(spark):
    # knn_classify_ann swaps brute_force_topk for lsh_topk but reuses
    # majority_vote unchanged. On UNIFORM random embeddings prediction
    # agreement with the exact knn is meaningless (cosines are
    # near-ties; any candidate subset votes differently — measured
    # ~0.2-0.26 agreement on the synthetic table, i.e. chance), so the
    # envelope is planted CLUSTER structure instead: queries are noisy
    # copies of labeled corpus vectors, and the LSH-candidate vote
    # must recover the planted label — the end-to-end composition
    # check (candidate generation AND vote), not just neighbor recall.
    import numpy as np

    rng = np.random.RandomState(11)
    n_classes, per_class = 5, 40
    protos = rng.standard_normal((n_classes, 64))
    rows = []
    for cls in range(n_classes):
        for j in range(per_class):
            v = protos[cls] + 0.15 * rng.standard_normal(64)
            rows.append(
                Row(
                    vec_id=cls * per_class + j,
                    embedding=[float(x) for x in v],
                    label=cls,
                )
            )
    corpus = spark.createDataFrame(rows)
    n_q = 20
    queries = spark.createDataFrame(
        [
            Row(
                vec_id=10_000 + i,
                embedding=[
                    float(x)
                    for x in protos[i % n_classes]
                    + 0.15 * rng.standard_normal(64)
                ],
            )
            for i in range(n_q)
        ]
    )
    nn = sim.lsh_topk(corpus, queries, k=5).select("q_id", "vec_id")
    pred = {
        r.q_id: r.pred_label
        for r in sim.majority_vote(
            corpus.select("vec_id", "label"), nn
        ).collect()
    }
    hits = sum(
        1 for i in range(n_q) if pred.get(10_000 + i) == i % n_classes
    )
    # deterministic planes+data; measured 20/20 — floor leaves slack
    # only for float-order jitter
    assert hits / n_q >= 0.8, f"planted-label vote recovery {hits}/{n_q}"


# --- as-of join ------------------------------------------------------

def test_asof_join_nearest_prior(spark):
    left = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts="2024-01-01 10:00:00"),
         Row(event_id=2, user_id=1, ts="2024-01-01 12:00:00"),
         Row(event_id=3, user_id=2, ts="2024-01-01 09:00:00")]
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(user_id=1, ts="2024-01-01 09:30:00"),
         Row(user_id=1, ts="2024-01-01 11:15:00"),
         Row(user_id=2, ts="2024-01-01 09:00:00")]  # equal ts: strict -> excluded
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.event_id: (str(r.asof_ts) if r.asof_ts else None)
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts", strict=True
        ).collect()
    }
    assert out == {
        1: "2024-01-01 09:30:00",
        2: "2024-01-01 11:15:00",
        3: None,
    }


# --- multimodal plumbing --------------------------------------------

def test_multimodal_meta_schema_and_determinism(spark):
    d = mm.with_binary_payload(table(spark, SF_SMOKE, "documents").limit(20))
    out1 = mm.extract_media_meta(d).orderBy("doc_id").collect()
    out2 = mm.extract_media_meta(d).orderBy("doc_id").collect()
    assert out1 == out2 and len(out1) == 20
    assert all(r.n_bytes > 0 for r in out1)
    assert all(r.format in ("png", "jpeg", "webp") for r in out1)


def test_media_header_parse_real_formats():
    # pure-Python fixtures: valid container headers, no media libs
    assert mm.parse_media_header(mm._png_bytes(123, 456, b"body")) == {
        "format": "png", "width": 123, "height": 456,
    }
    assert mm.parse_media_header(mm._jpeg_bytes(321, 654, b"payload")) == {
        "format": "jpeg", "width": 321, "height": 654,
    }
    assert mm.parse_media_header(mm._wav_bytes(16000, b"x" * 64000)) == {
        "format": "wav", "sample_rate": 16000, "duration_ms": 2000,
    }
    gif = b"GIF89a" + (10).to_bytes(2, "little") + (20).to_bytes(2, "little")
    assert mm.parse_media_header(gif) == {
        "format": "gif", "width": 10, "height": 20,
    }
    assert mm.parse_media_header(b"not a container") is None
    assert mm.parse_media_header(b"") is None


def test_multimodal_meta_extracts_true_dimensions(spark):
    d = mm.with_media_payload(table(spark, SF_SMOKE, "documents").limit(30))
    out = mm.extract_media_meta(d).orderBy("doc_id").collect()
    assert len(out) == 30
    for r in out:
        kind = r.doc_id % 3
        if kind in (0, 1):
            assert r.format == ("png" if kind == 0 else "jpeg")
            assert r.width == 16 + (r.doc_id * 7) % 1024
            assert r.height == 16 + (r.doc_id * 13) % 1024
            assert r.sample_rate is None
        else:
            assert r.format == "wav"
            assert r.sample_rate == 8000 + (r.doc_id % 5) * 4000
            assert r.duration_ms is not None and r.width is None


def test_multimodal_meta_strict_raises_on_unknown_format(spark):
    import pytest as _pytest

    d = mm.with_binary_payload(table(spark, SF_SMOKE, "documents").limit(3))
    with _pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        mm.extract_media_meta(d, decode_stub=False).collect()
    # strict mode is fine when every payload is a known container
    ok = mm.with_media_payload(table(spark, SF_SMOKE, "documents").limit(3))
    assert len(mm.extract_media_meta(ok, decode_stub=False).collect()) == 3


# --- skew utilities --------------------------------------------------

def test_salted_join_matches_plain_join(spark):
    from az_datapipeline_sentiment_analysis_spark.operators.skew import salted_join

    # skewed left: one hot key with 500 rows, long tail of singletons
    left = spark.createDataFrame(
        [Row(k=0, v=i) for i in range(500)]
        + [Row(k=i, v=i) for i in range(1, 50)]
    )
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(50)])
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, "k").select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_count_matches_groupby(spark):
    from az_datapipeline_sentiment_analysis_spark.operators.skew import (
        salted_agg_count,
    )

    df = spark.createDataFrame(
        [Row(k=0) for _ in range(300)] + [Row(k=i % 7) for i in range(100)]
    )
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    got = {r.k: r.n for r in salted_agg_count(df, "k").collect()}
    assert got == want


# --- MLlib sentiment pipeline ----------------------------------------

def test_mllib_sentiment_agrees_with_lexicon_on_polar_docs(spark):
    from az_datapipeline_sentiment_analysis_spark.functions.ml import (
        score_with_model,
        train_sentiment_model,
    )
    from az_datapipeline_sentiment_analysis_spark.functions.text import (
        sentiment_components_expr,
        sentiment_label_expr,
    )

    docs = table(spark, SF_SMOKE, "documents")
    model = train_sentiment_model(docs)
    got = {r.record_id: r.sentiment for r in score_with_model(model, docs).collect()}
    assert all(r is not None for r in got.values())

    pos, neg = sentiment_components_expr("text")
    polar = docs.select(
        "doc_id", sentiment_label_expr(pos, neg).alias("lex")
    ).filter(F.col("lex").isin("positive", "negative"))
    rows = polar.collect()
    agree = sum(1 for r in rows if got[r.doc_id] == r.lex)
    # weak-label training on its own corpus: expect high agreement
    assert agree / len(rows) >= 0.9, f"agreement {agree}/{len(rows)}"

    # confidence is a probability and ordered consistently with label
    sc = score_with_model(model, docs).collect()
    assert all(0.0 <= r.confidence <= 1.0 for r in sc)
    assert all(
        (r.confidence >= 0.5) == (r.sentiment == "positive") for r in sc
    )


def test_mllib_sentiment_prediction_hash_pinned(spark):
    # sentiment_mllib is the registry's one trained entry (no SQL
    # oracle), so its check is this REPRODUCIBILITY pin (VERDICT r7
    # #6): the pipeline is deterministic end to end — fixed tokenizer/
    # TF dimensionality, deterministic weak labels, zero-init LBFGS —
    # so retraining on the same corpus must reproduce every prediction
    # AND every 6-dp confidence bit-for-bit. Hashes verified identical
    # under both 8 and 32 shuffle partitions before pinning; a drift
    # here means the training path picked up nondeterminism (or a
    # Spark upgrade changed LBFGS), which must be a conscious re-pin.
    import hashlib

    from az_datapipeline_sentiment_analysis_spark.plans.queries import (
        REGISTRY,
    )

    def hashes():
        rows = sorted(
            REGISTRY["sentiment_mllib"].fn(spark, SF_SMOKE).collect(),
            key=lambda r: r.record_id,
        )
        lab = hashlib.md5(
            "\n".join(f"{r.record_id}|{r.sentiment}" for r in rows).encode()
        ).hexdigest()
        conf = hashlib.md5(
            "\n".join(
                f"{r.record_id}|{r.sentiment}|{r.confidence:.6f}"
                for r in rows
            ).encode()
        ).hexdigest()
        return len(rows), lab, conf

    n, lab, conf = hashes()
    assert n == 500
    assert lab == "39c10e1f0e2056c7bd994d9a8bf563a8"
    assert conf == "ff448280c7b2d62f4c1bbbff3667d987"
    # retrain-in-session reproducibility (independent of the pin)
    assert hashes() == (n, lab, conf)


# --- IVF ANN ---------------------------------------------------------

def test_ivf_ann_finds_planted_near_neighbors(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    corpus_np = rng.standard_normal((400, 64)).astype("float32")
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v])
        for i, v in enumerate(corpus_np)
    ]
    emb = spark.createDataFrame(rows)
    n_q = 20
    queries = spark.createDataFrame(
        [
            Row(
                vec_id=10_000 + i,
                embedding=[
                    float(x)
                    for x in corpus_np[i] + 0.05 * rng.standard_normal(64)
                ],
            )
            for i in range(n_q)
        ]
    )
    got = sim.ivf_topk(emb, queries, k=3, n_lists=16, n_probe=4).collect()
    rank1 = {r.q_id: r.vec_id for r in got if r.rank == 1}
    hits = sum(1 for i in range(n_q) if rank1.get(10_000 + i) == i)
    # a planted ~0.99-cosine neighbor dominates its list; probing the
    # 4 nearest of 16 lists must recover nearly all of them
    assert hits / n_q >= 0.8, f"planted-neighbor recall {hits}/{n_q}"


def test_ivf_recall_vs_brute_force_on_testdata(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.vec_id)
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in sim.ivf_topk(emb, q, k=5, n_lists=16, n_probe=6).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5, (
        f"IVF recall {len(approx & exact)}/{len(exact)}"
    )


def test_ivf_fixed_recall_matches_trained_on_testdata(spark):
    # the fixed-quantizer (oracle-checkable) IVF must not cost recall
    # vs the trained quantizer on the synthetic uniform table — the
    # equivalence claim in embed_ann_ivf_exact's docstring
    emb = table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.vec_id)
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }
    trained = {
        (r.q_id, r.vec_id)
        for r in sim.ivf_topk(emb, q, k=5, n_lists=16, n_probe=4).collect()
    }
    fixed = {
        (r.q_id, r.vec_id)
        for r in sim.ivf_fixed_topk(emb, q, k=5).collect()
    }
    r_fixed = len(fixed & exact) / len(exact)
    r_trained = len(trained & exact) / len(exact)
    assert r_fixed >= r_trained - 0.2, (
        f"fixed-quantizer recall {r_fixed:.2f} vs trained {r_trained:.2f}"
    )


# --- multimodal frame sampling / features ----------------------------

def test_frame_sample_arithmetic(spark):
    from az_datapipeline_sentiment_analysis_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 600), Row(doc_id=2, text="b" * 256),
         Row(doc_id=3, text="")],
    )
    out = mm.frame_sample(mm.with_binary_payload(df), chunk=256).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3
    assert sorted(r.n_frame_bytes for r in by_doc[1]) == [88, 256, 256]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_frame_bytes == 256
    assert 3 not in by_doc  # empty payload -> no frames
    # frames reassemble to the original payload
    frames = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert b"".join(bytes(r.frame_bytes) for r in frames) == b"a" * 600


def test_media_features_deterministic_histogram(spark):
    from az_datapipeline_sentiment_analysis_spark.operators import multimodal as mm

    df = spark.createDataFrame([Row(doc_id=1, text="aabb"), Row(doc_id=2, text="")])
    out = {r.doc_id: r.features for r in
           mm.media_features(mm.with_binary_payload(df)).collect()}
    assert len(out[1]) == 8 and abs(sum(out[1]) - 1.0) < 1e-9
    # 'a'=97, 'b'=98 -> both in bucket 97>>5 == 3
    assert out[1][3] == 1.0
    assert out[2] == [0.0] * 8


# --- sampling / histogram / gapfill / argmax invariants --------------

def test_hash_sampling_invariants(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    base = {r.doc_id for r in
            REGISTRY["sample_hash"].fn(spark, SF_SMOKE).collect()}
    again = {r.doc_id for r in
             REGISTRY["sample_hash"].fn(spark, SF_SMOKE).collect()}
    assert base == again  # deterministic across runs
    total = table(spark, SF_SMOKE, "documents").count()
    # ~10% rate, loose bounds for the multiplicative hash at small n
    assert 0.02 * total < len(base) < 0.3 * total
    strat = REGISTRY["sample_stratified"].fn(spark, SF_SMOKE).collect()
    # non-en rate (20%) is a superset of the uniform hash < 10 cut for
    # the same keys; en rate (5%) is a subset of it
    en = {r.doc_id for r in strat if r.lang == "en"}
    assert en <= base


def test_histogram_bins_partition_rows(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["histogram_bins"].fn(spark, SF_SMOKE).collect()
    assert sum(r.n for r in rows) == table(spark, SF_SMOKE, "customer").count()
    for r in rows:  # bin bounds actually contain their min/max
        assert r.lo <= r.hi


def test_gapfill_daily_is_dense(spark):
    import datetime

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = sorted(
        REGISTRY["gapfill_daily"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    days = [r.day for r in rows]
    assert len(days) == len(set(days))
    for a, b in zip(days, days[1:]):  # no holes in the spine
        assert b - a == datetime.timedelta(days=1)
    assert any(r.n == 0 for r in rows) or all(r.n > 0 for r in rows)


def test_argmax_matches_window_formulation(spark):
    from pyspark.sql import Window

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.c_mktsegment: (r.richest, r.poorest)
        for r in REGISTRY["agg_argmax"].fn(spark, SF_SMOKE).collect()
    }
    c = table(spark, SF_SMOKE, "customer")
    w_hi = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.desc("c_custkey")
    )
    expect_hi = {
        r.c_mktsegment: r.c_custkey
        for r in c.withColumn("rn", F.row_number().over(w_hi))
        .filter("rn = 1")
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == expect_hi


def test_editdist_pairs_are_canonical_and_thresholded(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["editdist_neardup"].fn(spark, SF_SMOKE).collect()
    assert rows  # blocking must leave real candidates at smoke scale
    for r in rows:
        assert r.doc_a < r.doc_b  # each pair exactly once, canonical order
        assert 0 <= r.edit_dist <= 20  # thresholded variant never leaks -1


def test_q15_returns_exactly_the_max_revenue_suppliers(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["q15_top_supplier"].fn(spark, SF_SMOKE).collect()
    assert rows
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # all returned suppliers tie on the max


def test_agg_regression_matches_numpy(spark):
    import numpy as np

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.l_returnflag: (r.slope, r.intercept)
        for r in REGISTRY["agg_regression"].fn(spark, SF_SMOKE).collect()
    }
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    for flag, (slope, intercept) in got.items():
        x = np.array([r.l_quantity for r in li if r.l_returnflag == flag])
        y = np.array([r.l_extendedprice for r in li if r.l_returnflag == flag])
        b, a = np.polyfit(x, y, 1)
        assert abs(b - slope) < 1e-3 and abs(a - intercept) < 1e-3


def test_stream_session_agg_equals_batch_twin(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    stream_rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in REGISTRY["stream_session_agg"].fn(spark, SF_SMOKE).collect()
    }
    batch_rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in REGISTRY["window_session"].fn(spark, SF_SMOKE).collect()
    }
    assert stream_rows == batch_rows


def test_scan_partitioned_prunes_and_preserves_rows(spark):
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = REGISTRY["scan_partitioned"].fn(spark, SF_SMOKE)  # asserts pruning
    direct = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert got.count() == direct


# --- approximate-sketch error bounds ---------------------------------

def test_approx_distinct_within_documented_error(spark):
    """Since round 11 the entry emits the exact distinct count plus an
    exact-integer boolean pinning the HLL++ estimate within 15% (3
    sigma of the default rsd 0.05; measured worst 9.7%). Assert every
    boolean holds AND the exact column matches a directly computed
    countDistinct — the accuracy pin the driver hash now also covers."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
    from az_datapipeline_sentiment_analysis_spark.catalog import table as _t

    got = {
        r.o_orderpriority: r
        for r in REGISTRY["approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in _t(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, row in got.items():
        assert row.n_cust_exact == exact[k], (k, row)
        assert row.approx_within_15pct, (k, row)


def test_sketch_hll_within_documented_error(spark):
    """Since round 11 the entry emits the exact distinct count plus a
    boolean pinning the DataSketches HLL estimate within 3% (~2 sigma
    of the default lgK=12 rsd 1.6%; measured worst 1.07%)."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
    from az_datapipeline_sentiment_analysis_spark.catalog import table as _t

    got = {
        r.o_orderpriority: r
        for r in REGISTRY["sketch_hll"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in _t(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, row in got.items():
        assert row.n_cust_exact == exact[k], (k, row)
        assert row.hll_within_3pct, (k, row)


def test_quantile_bucketing_approx_envelope(spark):
    """Since round 11 the entry emits GK's deterministic rank-error
    guarantee as per-decile booleans: cut i's rank interval
    [cnt_lt+1, cnt_le] must intersect target i*n/10 +- (n/10000 + 1).
    Assert all 9 deciles present, every boolean true, and the total
    row count matches the table — and independently recompute one
    cut's rank interval to confirm the booleans measure what they
    claim."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
    from az_datapipeline_sentiment_analysis_spark.catalog import table as _t

    rows = {
        r.decile: r
        for r in REGISTRY["quantile_bucketing_approx"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    li = _t(spark, SF_SMOKE, "lineitem")
    n = li.count()
    assert set(rows) == set(range(1, 10))
    for d, r in rows.items():
        assert r.n_rows == n, (d, r)
        assert r.rank_lo_ok and r.rank_hi_ok, (d, r)
    # independent recount for the median cut: recompute the sketch cut
    # and its rank interval directly and re-derive the decile-5 checks
    cut5 = li.agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("c")
    ).collect()[0].c
    cnt_le = li.filter(F.col("l_extendedprice") <= cut5).count()
    cnt_lt = li.filter(F.col("l_extendedprice") < cut5).count()
    assert cnt_lt * 10000 <= 5000 * n + n + 10000
    assert cnt_le * 10000 >= 5000 * n - n - 10000


def test_sketch_kll_rank_error_above_capacity(spark):
    """At sf0.1 the per-type event groups (~20k-30k rows) exceed the
    KLL sketch's k=8192 exact retention, so the quartiles are genuinely
    approximate there (the one documented by-design mirror divergence).
    This pins the ACCURACY: each estimated quartile's true rank must be
    within 1% of its target — far looser than KLL's theoretical error
    at k=8192, tight enough to catch a mis-wired sketch."""
    from az_datapipeline_sentiment_analysis_spark.catalog import table
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.1"
    got = REGISTRY["sketch_kll_quantiles"].fn(spark, sf)
    ev = table(spark, sf, "events")
    ranks = (
        ev.join(F.broadcast(got), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("q25")).cast("double")).alias("r25"),
            F.avg((F.col("value") <= F.col("q50")).cast("double")).alias("r50"),
            F.avg((F.col("value") <= F.col("q75")).cast("double")).alias("r75"),
        )
        .collect()
    )
    assert len(ranks) > 0
    for r in ranks:
        for target, rank in ((0.25, r.r25), (0.5, r.r50), (0.75, r.r75)):
            assert abs(rank - target) <= 0.01, (r.event_type, target, rank)


def test_markov_transition_rows_sum_to_one(spark):
    """Each prev_type's outgoing probabilities must sum to ~1 and its
    cell counts must total the number of lagged successor events."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["markov_transitions"].fn(spark, SF_SMOKE).collect()
    by_prev: dict[str, float] = {}
    total = 0
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
        total += r.n
    assert by_prev and all(abs(s - 1.0) < 1e-4 for s in by_prev.values())
    ev = table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes one transition
    assert total == n_events - n_users


def test_ohlc_bar_invariants(spark):
    """low <= open/close <= high per bar, and bar event counts total
    the table's row count (no event lost to the rollup)."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["ohlc_bars"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
    assert sum(r.n_events for r in rows) == table(
        spark, SF_SMOKE, "events"
    ).count()


def test_entropy_bounds_and_singleton_zero(spark):
    """0 <= H <= log2(n_langs); a synthetic single-language frame must
    yield exactly 0.0 (the signed-zero hazard collapsed)."""
    from az_datapipeline_sentiment_analysis_spark.plans import queries_ext3 as x3
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY
    import math

    for r in REGISTRY["entropy_by_group"].fn(spark, SF_SMOKE).collect():
        assert -0.0 < r.lang_entropy + 1e-12  # never negative
        assert r.lang_entropy <= math.log2(r.n_langs) + 1e-9

    one = spark.createDataFrame(
        [Row(source="s", lang="en")] * 5
    )
    lc = one.groupBy("source", "lang").agg(F.count("*").alias("n"))
    # reuse the query's arithmetic shape directly on the tiny frame
    from pyspark.sql import Window

    ws = Window.partitionBy("source")
    p = F.col("n").cast("double") / F.sum("n").over(ws).cast("double")
    h = (
        lc.select("source", (-p * F.log2(p)).alias("t"))
        .groupBy("source")
        .agg((F.round(F.sum("t"), 6) + F.lit(0.0)).alias("h"))
        .collect()[0]
        .h
    )
    assert repr(h) == "0.0"  # not -0.0


def test_chi2_cells_margins_consistent(spark):
    """Cell observed counts must total |customer|, and the expected
    counts must reproduce the row/column margins exactly."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["chi2_independence"].fn(spark, SF_SMOKE).collect()
    n_cust = table(spark, SF_SMOKE, "customer").count()
    assert sum(r.obs for r in rows) == n_cust
    exp_by_seg = defaultdict(float)
    obs_by_seg = defaultdict(int)
    for r in rows:
        exp_by_seg[r.segment] += r.expected
        obs_by_seg[r.segment] += r.obs
    for seg in obs_by_seg:
        assert abs(exp_by_seg[seg] - obs_by_seg[seg]) < 1e-3


def test_rolling_wau_bounds(spark):
    """WAU must dominate the daily DAU, never exceed the 7-day true
    distinct union, and match a brute-force check on the smoke table."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.day: r.wau
        for r in REGISTRY["rolling_wau"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events")
    pairs = [
        (r.day, r.user_id)
        for r in ev.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct().collect()
    ]
    days = sorted({d for d, _ in pairs})
    assert set(got) == set(days)
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        expect = len({u for dd, u in pairs if lo <= dd <= d})
        assert got[d] == expect, (d, got[d], expect)


def test_token_bpe_counts_monotone(spark):
    """BPE-ish tokens are never fewer than whitespace tokens (the
    pattern splits at least at whitespace boundaries) and the per-doc
    compression ratio stays positive and bounded by the doc length."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["token_bpe_count"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens
        if r.chars_per_tok is not None:
            assert 0 < r.chars_per_tok <= r.n_chars


def test_welch_ttest_against_scipy_free_reference(spark):
    """Re-derive one region's one-vs-rest t statistic from raw data
    with plain Python floats and compare to the operator's output."""
    import math

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["welch_ttest"].fn(spark, SF_SMOKE).collect()
    assert rows
    r0 = rows[0]
    cust = table(spark, SF_SMOKE, "customer")
    nat = table(spark, SF_SMOKE, "nation")
    vals = [
        (x.c_mktsegment, x.n_regionkey, x.c_acctbal)
        for x in cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .select("c_mktsegment", "n_regionkey", "c_acctbal")
        .collect()
    ]
    a = [v for s, rk, v in vals if rk == r0.regionkey and s == r0.segment]
    b = [v for s, rk, v in vals if rk == r0.regionkey and s != r0.segment]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert r0.n == len(a) and r0.n2 == len(b)
    # operator quantizes moments before the division; agree to 1e-3
    assert abs(r0.t_stat - t) < 1e-3, (r0.t_stat, t)


def test_dow_seasonality_weighted_mean_is_one(spark):
    """The n-weighted mean of each type's seasonal indices must be ~1
    (the index is defined against the type's own weighted average)."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["dow_seasonality"].fn(spark, SF_SMOKE).collect()
    acc = defaultdict(lambda: [0.0, 0])
    for r in rows:
        assert 1 <= r.dow <= 7
        acc[r.event_type][0] += r.seasonal_index * r.n
        acc[r.event_type][1] += r.n
    assert acc
    for et, (sw, n) in acc.items():
        assert abs(sw / n - 1.0) < 1e-3, (et, sw / n)


def test_interval_overlap_join_matches_theta_bruteforce(spark):
    """The bucketed equi-join rewrite must reproduce the brute-force
    theta-join overlap computed driver-side on the smoke table."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        (r.user_id, r.session_no): (r.overlap_s, r.n_hours)
        for r in REGISTRY["interval_overlap_join"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events")
    # brute-force sessions
    rows = sorted(
        (r.user_id, int(r.ts.timestamp()), r.event_id)
        for r in ev.select("user_id", "ts", "event_id").collect()
    )
    sessions = {}
    prev = {}
    sess_no = {}
    for u, t, _eid in rows:
        if u not in prev or t - prev[u] > 1800:
            sess_no[u] = sess_no.get(u, 0) + 1
        prev[u] = t
        key = (u, sess_no[u])
        a, b = sessions.get(key, (t, t))
        sessions[key] = (min(a, t), max(b, t))
    # brute-force incident hours
    from collections import Counter

    errs = Counter(
        int(r.ts.timestamp()) // 3600 * 3600
        for r in ev.filter(F.col("event_type") == "error")
        .select("ts")
        .collect()
    )
    total, nh = sum(errs.values()), len(errs)
    incidents = [h for h, c in errs.items() if c * nh * 10 >= 13 * total]
    expect = {}
    for key, (a, b) in sessions.items():
        if b <= a:
            continue
        ov = sum(
            max(0, min(b, h + 3600) - max(a, h)) for h in incidents
        )
        n = sum(1 for h in incidents if h < b and a < h + 3600)
        if ov > 0:
            expect[key] = (ov, n)
    assert got == expect


def test_theta_setops_inclusion_exclusion(spark):
    """In exact mode the sketch set algebra must satisfy
    inclusion-exclusion and difference identities exactly."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    r = REGISTRY["sketch_theta_setops"].fn(spark, SF_SMOKE).collect()[0]
    assert r.n_union == r.n_1995 + r.n_1996 - r.n_both
    assert r.n_only_1995 == r.n_1995 - r.n_both
    assert 0 < r.n_both <= min(r.n_1995, r.n_1996)


def test_kll_merge_equals_single_pass(spark):
    """Merging daily KLL partials must give the same quartiles as one
    direct sketch pass — the mergeability invariant."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    merged = {
        r.event_type: (r.q25, r.q50, r.q75)
        for r in REGISTRY["sketch_kll_merge"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events")
    direct = {
        r.event_type: (r.q25, r.q50, r.q75)
        for r in ev.groupBy("event_type")
        .agg(F.expr("kll_sketch_agg_double(value, 32768)").alias("sk"))
        .selectExpr(
            "event_type",
            "kll_sketch_get_quantile_double(sk, 0.25) AS q25",
            "kll_sketch_get_quantile_double(sk, 0.5) AS q50",
            "kll_sketch_get_quantile_double(sk, 0.75) AS q75",
        )
        .collect()
    }
    assert merged == direct


def test_scan_text_lines_round_trips_documents(spark):
    """The text-source parse must reproduce every doc's id, lang, and
    char count from the staged line file."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.doc_id: (r.lang, r.n_chars)
        for r in REGISTRY["scan_text_lines"].fn(spark, SF_SMOKE).collect()
    }
    want = {
        r.doc_id: (r.lang, len(r.text))
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    assert got == want


def test_round5_entries_rerun_and_cross_sf_in_one_session(spark):
    """Driver-shaped robustness: every round-5 entry must run twice in
    one session (no temp-view/staging collisions) and run against a
    second sf dir without leaking the first dir's staged state."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    names = [
        "quantile_bucketing_approx", "minmax_scaler_join", "ewma_smooth",
        "anomaly_mad", "graph_degree_hist", "funnel_time_to_convert",
        "token_bpe_count", "markov_transitions", "ohlc_bars",
        "entropy_by_group", "chi2_independence", "rolling_wau",
        "welch_ttest", "dow_seasonality", "interval_overlap_join",
        "sketch_theta_setops", "scan_text_lines", "sketch_kll_merge",
        "stream_ohlc_bars",
    ]
    for name in names:
        fn = REGISTRY[name].fn
        a = fn(spark, SF_SMOKE).count()
        b = fn(spark, SF_SMOKE).count()
        assert a == b > 0, name
    # second sf dir in the same session: the staged text source keys
    # its cache by sf dir, token counts must reflect the bigger corpus
    big = REGISTRY["scan_text_lines"].fn(spark, "/root/testdata/sf0.01")
    assert big.count() == 500
    assert REGISTRY["scan_text_lines"].fn(spark, SF_SMOKE).count() == 500


def test_weighted_median_bruteforce(spark):
    """The cumulative-weight selection must match a driver-side
    brute-force weighted median on the smoke table."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.flag: (r.wmedian, r.total_weight)
        for r in REGISTRY["weighted_median"].fn(spark, SF_SMOKE).collect()
    }
    li = table(spark, SF_SMOKE, "lineitem")
    rows = li.select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append(
            (r.l_extendedprice, r.l_orderkey, r.l_linenumber,
             int(r.l_quantity))
        )
    for flag, items in groups.items():
        items.sort()
        tot = sum(q for *_, q in items)
        cum = 0
        for price, _ok, _ln, q in items:
            cum += q
            if 2 * cum >= tot:
                assert got[flag] == (round(price, 4), tot), flag
                break


def test_split_leakage_flags_known_plants(spark):
    """Every flagged fingerprint group must genuinely span >= 2 splits
    and its per-split counts must total n_docs; and the flagged set
    must equal a brute-force recomputation."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["split_leakage_check"].fn(spark, SF_SMOKE).collect()
    assert rows  # corpus contains permuted near-copies at smoke scale
    for r in rows:
        assert r.n_splits >= 2
        assert r.n_train + r.n_val + r.n_test == r.n_docs
    docs = table(spark, SF_SMOKE, "documents").collect()
    fps = defaultdict(set)
    import hashlib

    for d in docs:
        canon = " ".join(sorted(set(d.text.split(" "))))
        fp = hashlib.md5(canon.encode()).hexdigest()
        h = ((d.doc_id % 100) * 61) % 100
        split = "train" if h < 80 else ("val" if h < 90 else "test")
        fps[fp].add(split)
    expect = {fp for fp, ss in fps.items() if len(ss) >= 2}
    assert {r.fp for r in rows} == expect


def test_attribution_last_touch_bruteforce(spark):
    """Attribution must match a driver-side per-user timeline sweep:
    most recent prior non-purchase within 1h, else NULL."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.event_id: (r.channel, r.ms_since)
        for r in REGISTRY["attribution_last_touch"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    timelines = defaultdict(list)
    for r in ev:
        ms = int(r.ts.timestamp() * 1_000_000) // 1000
        timelines[r.user_id].append((r.ts, r.event_id, r.event_type, ms))
    expect = {}
    for rows in timelines.values():
        rows.sort(key=lambda x: (x[0], x[1]))
        prior = None  # (type, ms)
        for _ts, eid, etype, ms in rows:
            if etype == "purchase":
                if prior is not None and ms - prior[1] <= 3_600_000:
                    expect[eid] = (prior[0], ms - prior[1])
                else:
                    expect[eid] = (None, None)
            else:
                prior = (etype, ms)
    assert got == expect


def test_rare_collapse_threshold_and_coverage(spark):
    """Every doc keeps its language iff that language holds >= 5% of
    the corpus; collapsed output covers every input row."""
    from collections import Counter

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["group_rare_collapse"].fn(spark, SF_SMOKE).collect()
    docs = table(spark, SF_SMOKE, "documents").collect()
    assert len(rows) == len(docs)
    freq = Counter(d.lang for d in docs)
    total = sum(freq.values())
    for r in rows:
        keep = freq[r.lang] * 20 >= total
        assert r.lang_collapsed == (r.lang if keep else "OTHER"), r


def test_impute_mean_fills_only_errors(spark):
    """Non-error rows keep their value; error rows get their user's
    valid-mean (or NULL when the user has no valid readings)."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.event_id: (r.value_filled, r.was_imputed)
        for r in REGISTRY["impute_mean_group"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events").collect()
    sums = defaultdict(lambda: [0.0, 0])
    for r in ev:
        if r.event_type != "error":
            sums[r.user_id][0] += r.value
            sums[r.user_id][1] += 1
    for r in ev:
        filled, imputed = got[r.event_id]
        if r.event_type == "error":
            assert imputed == 1
            s, n = sums[r.user_id]
            if n:
                assert abs(filled - s / n) < 1e-3
            else:
                assert filled is None
        else:
            assert imputed == 0
            assert abs(filled - r.value) < 1e-3


def test_win_time_range_bruteforce(spark):
    """The RANGE-frame trailing-hour counts must match a brute-force
    per-type sweep (inclusive 3600s bound, peers included)."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.event_id: r.n_last_hour
        for r in REGISTRY["win_time_range"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "ts"
    ).collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((int(r.ts.timestamp()), r.event_id))
    for rows in by_type.values():
        secs = sorted(s for s, _ in rows)
        import bisect

        for s, eid in rows:
            lo = bisect.bisect_left(secs, s - 3600)
            hi = bisect.bisect_right(secs, s)
            assert got[eid] == hi - lo, (eid, got[eid], hi - lo)


def test_session_paths_match_sessionize(spark):
    """Each top path's session count must equal a recount from the
    sessionize_events grouping joined with per-session event order."""
    from collections import Counter, defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.path: r.n_sessions
        for r in REGISTRY["session_paths_topk"].fn(spark, SF_SMOKE).collect()
    }
    assert got and all(">" in p for p in got)
    ev = table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    timelines = defaultdict(list)
    for r in ev:
        timelines[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts = Counter()
    for rows in timelines.values():
        rows.sort(key=lambda x: (x[0], x[1]))
        path, prev = [], None
        for ts, _eid, etype in rows:
            t = ts.timestamp()
            if prev is not None and t - prev <= 1800:
                path.append(etype)
            else:
                if len(path) > 1:
                    counts[">".join(path)] += 1
                path = [etype]
            prev = t
        if len(path) > 1:
            counts[">".join(path)] += 1
    expect = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )
    assert got == expect


def test_pareto_frontier_dominance_bruteforce(spark):
    """Frontier membership must match the quadratic dominance test,
    including equal-(price,size) duplicates surviving together."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.partkey
        for r in REGISTRY["pareto_frontier"].fn(spark, SF_SMOKE).collect()
    }
    parts = table(spark, SF_SMOKE, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    ).collect()
    by_brand = defaultdict(list)
    for r in parts:
        by_brand[r.p_brand].append((r.p_partkey, r.p_retailprice, r.p_size))
    expect = set()
    for items in by_brand.values():
        for k, pr, sz in items:
            dominated = any(
                pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz)
                for k2, pr2, sz2 in items
                if k2 != k
            )
            if not dominated:
                expect.add(k)
    assert got == expect


def test_asof_forward_bruteforce(spark):
    """Forward as-of must attach the earliest strictly-later click per
    user, matching a driver-side sweep (NULL when none exists)."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.event_id: r.next_ts
        for r in REGISTRY["asof_join_forward"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    clicks = defaultdict(list)
    for r in ev:
        if r.event_type == "click":
            clicks[r.user_id].append(r.ts)
    for u in clicks:
        clicks[u].sort()
    import bisect

    for r in ev:
        if r.event_type != "purchase":
            continue
        cs = clicks.get(r.user_id, [])
        i = bisect.bisect_right(cs, r.ts)
        expect = cs[i] if i < len(cs) else None
        assert got[r.event_id] == expect, (r.event_id, got[r.event_id], expect)


def test_decimal_exact_is_sum_of_cents(spark):
    """The decimal revenue must equal the integer-cents sum exactly
    (string-rendered with two digits), never a float approximation."""
    from collections import defaultdict
    from decimal import Decimal

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.flag: r.revenue_exact
        for r in REGISTRY["agg_decimal_exact"].fn(spark, SF_SMOKE).collect()
    }
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    cents = defaultdict(int)
    for r in li:
        cents[r.l_returnflag] += int(
            Decimal(repr(r.l_extendedprice)).quantize(Decimal("0.01"))
            * 100
        )
    for flag, c in cents.items():
        assert got[flag] == f"{Decimal(c) / 100:.2f}", (flag, got[flag], c)


def test_ivm_matches_full_recompute(spark):
    """The incrementally-maintained gold view must exactly equal a
    full re-aggregation of the merged snapshot (the IVM identity),
    computed here via the cdc_apply merge + driver-side aggregation."""
    from collections import defaultdict
    from decimal import Decimal

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.segment: (r.n, r.sum_cents)
        for r in REGISTRY["incremental_view_maintenance"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    snap = REGISTRY["cdc_apply"].fn(spark, SF_SMOKE).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in snap:
        cents = int(
            (Decimal(repr(r.acctbal)) * 100).quantize(Decimal("1"))
        )
        agg[r.mktsegment][0] += 1
        agg[r.mktsegment][1] += cents
    assert got == {k: (v[0], v[1]) for k, v in agg.items()}


def test_vocab_oov_rate_bruteforce(spark):
    """Per-doc OOV counts must match a Python recount against the
    deterministic top-50 vocabulary."""
    from collections import Counter

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in REGISTRY["vocab_oov_rate"].fn(spark, SF_SMOKE).collect()
    }
    docs = table(spark, SF_SMOKE, "documents").collect()
    tf = Counter()
    for d in docs:
        tf.update(t for t in d.text.split(" ") if t)
    vocab = {
        t for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    }
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        oov = sum(1 for t in toks if t not in vocab)
        assert got[d.doc_id] == (len(toks), oov), d.doc_id


def test_cross_source_overlap_symmetric_bruteforce(spark):
    """Pair counts must equal a set-intersection recount, each
    unordered source pair appearing exactly once."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["cross_source_overlap"].fn(spark, SF_SMOKE).collect()
    assert all(r.source_a < r.source_b for r in rows)
    docs = table(spark, SF_SMOKE, "documents").collect()
    import hashlib

    by_source = defaultdict(set)
    for d in docs:
        canon = " ".join(sorted(set(d.text.split(" "))))
        by_source[d.source].add(hashlib.md5(canon.encode()).hexdigest())
    expect = {}
    srcs = sorted(by_source)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            n = len(by_source[sa] & by_source[sb])
            if n:
                expect[(sa, sb)] = n
    assert {(r.source_a, r.source_b): r.shared_fingerprints
            for r in rows} == expect


def test_fulfillment_latency_bruteforce(spark):
    """Per-priority order counts and max latency must match a
    driver-side recount of first-ship dates."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.priority: (r.n_orders, r.max_days)
        for r in REGISTRY["fulfillment_latency"].fn(spark, SF_SMOKE).collect()
    }
    orders = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in table(spark, SF_SMOKE, "orders").collect()
    }
    first_ship = {}
    for r in table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        k = r.l_orderkey
        if k not in first_ship or r.l_shipdate < first_ship[k]:
            first_ship[k] = r.l_shipdate
    agg = defaultdict(lambda: [0, 0])
    for k, (prio, od) in orders.items():
        if k not in first_ship:
            continue
        days = (first_ship[k].date() - od.date()).days
        agg[prio][0] += 1
        agg[prio][1] = max(agg[prio][1], days)
    assert got == {p: (v[0], v[1]) for p, v in agg.items()}


def test_dup_rate_consistency(spark):
    """n_canonical <= n_docs, the rate matches the ratio, and totals
    agree with cross_source_overlap's fingerprint universe."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["dup_rate_by_source"].fn(spark, SF_SMOKE).collect()
    docs = table(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 < r.n_canonical <= r.n_docs
        assert abs(r.dup_rate - (1 - r.n_canonical / r.n_docs)) < 1e-5


def test_exact_k_sampling_counts_and_determinism(spark):
    """Every language with >= 10 docs contributes exactly 10; smaller
    strata contribute all their docs; and the draw is identical on a
    second invocation (hash-deterministic, not RNG)."""
    from collections import Counter

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    fn = REGISTRY["sample_stratified_exact_k"].fn
    rows = fn(spark, SF_SMOKE).collect()
    again = fn(spark, SF_SMOKE).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)
    got = Counter(r.lang for r in rows)
    full = Counter(
        r.lang for r in table(spark, SF_SMOKE, "documents").collect()
    )
    for lang, n in full.items():
        assert got[lang] == min(10, n), lang


def test_twa_bruteforce(spark):
    """Time-weighted means must match a driver-side recount of
    duration-weighted sums over each user's timeline."""
    from collections import defaultdict

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.user_id: (r.span_s, r.twa)
        for r in REGISTRY["time_weighted_average"].fn(spark, SF_SMOKE).collect()
    }
    ev = table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    tl = defaultdict(list)
    for r in ev:
        tl[r.user_id].append((r.ts, r.event_id, r.value))
    for u, rows in tl.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        span = 0
        wsum = 0.0
        for (ts, _e, v), (ts2, _e2, _v2) in zip(rows, rows[1:]):
            dt = int(ts2.timestamp()) - int(ts.timestamp())
            span += dt
            wsum += v * dt
        if span > 0:
            assert got[u][0] == span
            assert abs(got[u][1] - wsum / span) < 1e-3
        else:
            assert u not in got


# --- exact_group_quantiles (two-phase bucketed selection) -----------

def test_exact_group_quantiles_matches_builtin_percentile(spark):
    # the operator's contract: same interpolated quantiles as Spark's
    # buffering Percentile aggregate (and therefore quantile_cont),
    # computed with bounded per-task state. Pin grouped + global forms
    # against the built-in on real data at every decile.
    from az_datapipeline_sentiment_analysis_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    li = table(spark, SF_SMOKE, "lineitem")
    ps = {f"q{i}": i / 10.0 for i in range(1, 10)}

    got = {
        r["l_returnflag"]: r.asDict()
        for r in exact_group_quantiles(
            li, "l_quantity", ps, ["l_returnflag"]
        ).collect()
    }
    want = {
        r["l_returnflag"]: r.asDict()
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_quantity, {p})").alias(a)
                for a, p in ps.items()
            ]
        )
        .collect()
    }
    assert set(got) == set(want)
    for flag in want:
        for a in ps:
            assert abs(got[flag][a] - want[flag][a]) < 1e-9, (flag, a)

    g = exact_group_quantiles(li, "l_extendedprice", {"med": 0.5}, []).collect()
    w = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("med")).collect()
    assert abs(g[0]["med"] - w[0]["med"]) < 1e-9


def test_exact_group_quantiles_nulls_ties_and_tiny_groups(spark):
    # percentile semantics: nulls ignored; heavy ties positioned
    # exactly; single-row and all-equal groups degenerate cleanly
    from az_datapipeline_sentiment_analysis_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    rows = (
        [Row(g="ties", v=float(x)) for x in [1, 1, 1, 2, 2, 2, 2, 9]]
        + [Row(g="nulls", v=v) for v in [None, 3.0, None, 5.0, 7.0]]
        + [Row(g="one", v=42.0)]
        + [Row(g="const", v=6.0), Row(g="const", v=6.0), Row(g="const", v=6.0)]
    )
    df = spark.createDataFrame(rows)
    got = {
        r["g"]: r.asDict()
        for r in exact_group_quantiles(
            df, "v", {"q25": 0.25, "med": 0.5, "q75": 0.75}, ["g"], nb=4
        ).collect()
    }
    want = {
        r["g"]: r.asDict()
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.25)").alias("q25"),
            F.expr("percentile(v, 0.5)").alias("med"),
            F.expr("percentile(v, 0.75)").alias("q75"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for grp in want:
        for a in ("q25", "med", "q75"):
            assert abs(got[grp][a] - want[grp][a]) < 1e-12, (grp, a)


def test_exact_group_quantiles_keep_stats(spark):
    # the keep= extras ride on the phase-1 stats frame: count/min/max
    # must match dedicated aggregates without another input scan
    from az_datapipeline_sentiment_analysis_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    ev = table(spark, SF_SMOKE, "events")
    got = {
        r["event_type"]: r.asDict()
        for r in exact_group_quantiles(
            ev, "value", {"med": 0.5}, ["event_type"],
            keep={"n": "count", "vmin": "min", "vmax": "max"},
        ).collect()
    }
    want = {
        r["event_type"]: r.asDict()
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    for t in want:
        assert got[t]["n"] == want[t]["n"]
        assert got[t]["vmin"] == want[t]["vmin"]
        assert got[t]["vmax"] == want[t]["vmax"]


def test_round6_entries_rerun_and_cross_sf_in_one_session(spark):
    """Driver-shaped robustness for the round-6 entries (and the
    win_ntile rewrite): run twice in one session — the eager
    localCheckpoint materializations must not collide or leak — and
    once against a second sf dir."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    names = [
        "q11_important_stock", "asof_join_nearest", "graph_triangles",
        "anomaly_cusum", "doc_chunking", "join_key_skew_report",
        "dataset_split_leakproof", "win_ntile",
        # drift/novelty batch (the psi cut computation persists and
        # releases caches inside exact_group_quantiles — rerunning in
        # one session is exactly where a leak would show)
        "ks_drift", "psi_drift", "containment_neardup",
        "novelty_bigram_loo", "vocab_jsd_drift", "embed_drift",
        # round-6 second batch
        "q2_min_cost_supplier", "bpe_merge_pairs",
        "global_shuffle_order", "stream_static_enrich",
        "knn_classify", "auc_by_cohort", "bitmap_distinct_exact",
        "domain_mix_temperature", "upsample_epochs", "shard_manifest",
        "k_anonymity_audit", "multimodal_audio_pcm",
        "dynamic_partition_overwrite", "map_lambda_funcs",
        "collation_funcs",
        # round-6 third/fourth batches (population metrics, sampling,
        # diversity, streaming left join staging, the pipe dialect's
        # temp view — rerunning catches any view-name collision)
        "sketch_cms", "gini_by_group", "survival_km",
        "apportion_quota", "readability_flesch", "decile_lift",
        "benford_dq", "bootstrap_ci", "stream_stream_left_join",
        "negative_sampling", "dataset_split_time", "share_of_parent",
        "time_decayed_score", "distinct_ngram_ratio",
        "calibration_ece", "sql_pipe_syntax",
        "rfm_segmentation", "seasonal_naive_eval",
        "market_basket_rules", "neyman_allocation",
        "perm_test_diff_means", "mmr_diversify",
        "ab_srm_check", "ess_weight_diagnostic",
        "rate_shrunk_bayes",
    ]
    for name in names:
        fn = REGISTRY[name].fn
        a = fn(spark, SF_SMOKE).count()
        b = fn(spark, SF_SMOKE).count()
        assert a == b > 0, name
    # second sf dir in the same session; every doc yields >= 1 chunk
    # (both smoke dirs hold 500 docs — lengths differ, counts don't)
    for sf in ("/root/testdata/sf0.01", SF_SMOKE):
        n_docs = table(spark, sf, "documents").count()
        chunks = REGISTRY["doc_chunking"].fn(spark, sf)
        assert chunks.count() >= n_docs
        assert chunks.select("doc_id").distinct().count() == n_docs


# --- round-6 drift / novelty additions -------------------------------

def test_containment_bruteforce(spark):
    """ngram_containment_pairs vs a pure-Python trigram-set model:
    doc-in-doc (containment 1.0, low Jaccard), exact copies, an
    unrelated doc, and a shingle-less doc that must never pair."""
    import re

    rows = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=2, text="intro words here alpha beta gamma delta"
                           " epsilon zeta plus a long tail of extra"
                           " filler content words everywhere"),
        Row(doc_id=3, text="totally different content nothing shared"
                           " at all here honestly"),
        Row(doc_id=4, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=5, text="aa bb"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dd.ngram_containment_pairs(df, threshold=0.2).collect()
    }

    def sh(t):
        toks = re.findall("[a-z]+", t.lower())
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    texts = {r.doc_id: r.text for r in rows}
    exp = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh(texts[a]), sh(texts[b])
            if not sa or not sb:
                continue
            c = round(len(sa & sb) / min(len(sa), len(sb)), 4)
            if c >= 0.2:
                exp[(a, b)] = c
    assert got == exp
    assert got[(1, 2)] == 1.0  # doc-in-doc: the case Jaccard misses
    assert got[(1, 4)] == 1.0  # exact copy via the collapse pre-pass


def test_ks_drift_matches_numpy_model(spark):
    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.pair: (r.n_ref, r.n_cur, r.ks_stat)
        for r in REGISTRY["ks_drift"].fn(spark, SF_SMOKE).collect()
    }
    doc = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    h = ((doc.doc_id % 100) * 61) % 100
    split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    train = np.sort(doc.n_chars[split == "train"].to_numpy())
    assert set(got) == {"val", "test"}
    for pair in ("val", "test"):
        cur = np.sort(doc.n_chars[split == pair].to_numpy())
        pooled = np.unique(np.concatenate([train, cur]))
        d = np.max(np.abs(
            np.searchsorted(train, pooled, side="right") / train.size
            - np.searchsorted(cur, pooled, side="right") / cur.size
        ))
        n_ref, n_cur, ks = got[pair]
        assert (n_ref, n_cur) == (train.size, cur.size)
        assert ks == pytest.approx(d, abs=1e-6)


def test_psi_drift_matches_numpy_model(spark):
    """Cell-level check against numpy: train-decile cuts via
    np.quantile (linear interpolation == quantile_cont == the
    two-phase selection), integer-quantized terms, and the
    order-independent psi_total identity."""
    import math

    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    rows = REGISTRY["psi_drift"].fn(spark, SF_SMOKE).collect()
    doc = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    h = ((doc.doc_id % 100) * 61) % 100
    split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    train = doc.n_chars[split == "train"].to_numpy()
    cuts = np.quantile(train, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
                               0.8, 0.9])

    def half_up(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for pair in ("val", "test"):
        cur = doc.n_chars[split == pair].to_numpy()
        rb = np.searchsorted(cuts, train, side="left")
        cb = np.searchsorted(cuts, cur, side="left")
        # searchsorted('left') counts cuts < v... we need cuts < v
        # strictly (v > c); equal-to-cut goes LOW. side='left' gives
        # index of first cut >= v, i.e. count of cuts strictly < v.
        tus, total = {}, 0
        for b in range(10):
            rn, cn = int((rb == b).sum()), int((cb == b).sum())
            pr = (rn + 0.5) / (train.size + 5.0)
            pc = (cn + 0.5) / (cur.size + 5.0)
            tu = half_up((pc - pr) * math.log(pc / pr) * 10000.0)
            tus[b] = (rn, cn, tu)
            total += tu
        seen = 0
        for r in rows:
            if r.pair != pair:
                continue
            seen += 1
            rn, cn, tu = tus[r.bucket]
            assert (r.ref_n, r.cur_n) == (rn, cn), (pair, r.bucket)
            assert r.psi_term == pytest.approx(tu / 10000.0, abs=2e-4)
            assert r.psi_total == pytest.approx(total / 10000.0,
                                                abs=2e-3)
        assert seen == 10  # every bucket emitted (train deciles are
        #                    nonempty by construction)


def test_novelty_bigram_loo_bruteforce(spark):
    """Leave-one-doc-out Stupid-Backoff model in pure Python over the
    smoke corpus; per-doc novelty must match within the final-rounding
    + log-ulp envelope."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.doc_id: (r.n_bigrams, r.novelty)
        for r in REGISTRY["novelty_bigram_loo"].fn(spark, SF_SMOKE).collect()
    }
    doc = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    toks = {
        int(r.doc_id): re.findall("[a-z]+", str(r.text).lower())
        for r in doc.itertuples()
    }
    assert set(got) == set(toks)
    guc, gbc, n_total = Counter(), Counter(), 0
    for t in toks.values():
        guc.update(t)
        n_total += len(t)
        gbc.update(zip(t, t[1:]))

    def half_up(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for did, t in toks.items():
        dbc = Counter(zip(t, t[1:]))
        duc = Counter(t)
        nb = sum(dbc.values())
        assert got[did][0] == nb, did
        if nb == 0:
            assert got[did][1] is None, did
            continue
        su = 0
        for (w1, w2), dc in dbc.items():
            bco = gbc[(w1, w2)] - dc
            if bco > 0:
                s = bco * 1.0 / (guc[w1] - duc[w1])
            else:
                s = (0.4 * ((guc[w2] - duc[w2]) + 0.5)
                     / ((n_total - len(t)) + 1.0))
            su += half_up(dc * math.log10(s) * 1000000.0)
        exp = -(su / 1000000.0) / nb
        assert got[did][1] == pytest.approx(exp, abs=1e-4), did


def test_vocab_jsd_drift_dense_model(spark):
    """The support-only JSD identity vs a DENSE pure-Python model that
    sums over the full vocabulary (p=0 terms handled explicitly) —
    proving the absent-mass shortcut is exact, not an approximation."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.source: (r.n_tokens, r.jsd)
        for r in REGISTRY["vocab_jsd_drift"].fn(spark, SF_SMOKE).collect()
    }
    doc = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    per_src, corpus = {}, Counter()
    for r in doc.itertuples():
        t = re.findall("[a-z]+", str(r.text).lower())
        per_src.setdefault(str(r.source), Counter()).update(t)
        corpus.update(t)
    big = sum(corpus.values())
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        assert got[src][0] == n, src
        jsd = 0.0
        for w, tot in corpus.items():  # DENSE: every corpus word
            p = cnt.get(w, 0) / n
            q = tot / big
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log2(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log2(q / m)
        assert got[src][1] == pytest.approx(jsd, abs=2e-4), src


def test_embed_drift_numpy_model(spark):
    import math

    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.split: (r.n_vecs, r.cos_dist)
        for r in REGISTRY["embed_drift"].fn(spark, SF_SMOKE).collect()
    }
    emb = pd.read_parquet(SF_SMOKE + "/embeddings.parquet")
    h = ((emb.vec_id % 100) * 61) % 100
    split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    mat = np.vstack(emb.embedding.to_numpy())

    def half_up(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def cent(mask):
        m = mat[mask].mean(axis=0)
        return np.array([half_up(v * 1e6) for v in m], dtype=np.int64)

    tr = cent(split == "train")
    assert set(got) == {"val", "test"}
    for pair in ("val", "test"):
        cu = cent(split == pair)
        cos = float(cu @ tr) / (
            math.sqrt(float(cu @ cu)) * math.sqrt(float(tr @ tr))
        )
        n_vecs, cos_dist = got[pair]
        assert n_vecs == int((split == pair).sum())
        assert cos_dist == pytest.approx(1.0 - cos, abs=2e-6), pair


def test_winsorize_clip_bruteforce(spark):
    """winsorize_clip vs numpy: group p1/p99 via np.quantile (linear
    interpolation == quantile_cont), then clip — every row's clipped
    value and flag must match."""
    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = REGISTRY["winsorize_clip"].fn(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber", "price"]
    for flag, grp in li.groupby("l_returnflag"):
        v = grp.l_extendedprice.to_numpy()
        p01, p99 = np.quantile(v, 0.01), np.quantile(v, 0.99)
        want = grp.assign(price=grp.l_extendedprice).assign(
            clipped=np.clip(grp.l_extendedprice, p01, p99),
            was_clipped=(grp.l_extendedprice < p01)
            | (grp.l_extendedprice > p99),
        )[keys + ["clipped", "was_clipped"]].sort_values(
            keys, ignore_index=True
        )
        sub = got[got.l_returnflag == flag][
            keys + ["clipped", "was_clipped"]
        ].sort_values(keys, ignore_index=True)
        assert len(sub) == len(want)
        assert (sub.was_clipped.to_numpy()
                == want.was_clipped.to_numpy()).all(), flag
        assert np.allclose(sub.clipped.to_numpy(),
                           want.clipped.to_numpy(), atol=1e-6), flag
        assert bool(want.was_clipped.any()), flag  # test has teeth


def test_robust_scaler_bruteforce(spark):
    """robust_scaler vs numpy: per-type quartiles via np.quantile,
    then (v − med)/IQR — every row's scaled value must match."""
    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = (
        REGISTRY["robust_scaler"].fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_id"], ignore_index=True)
    )
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    for etype, grp in ev.groupby("event_type"):
        v = grp.value.to_numpy()
        q1, med, q3 = np.quantile(v, [0.25, 0.5, 0.75])
        sub = got[got.event_type == etype].set_index("event_id")
        assert len(sub) == len(grp)
        want = (grp.set_index("event_id").value - med) / (q3 - q1)
        diff = (sub.scaled - want.round(6)).abs()
        assert float(diff.max()) <= 1e-9, etype


def test_perplexity_buckets_bruteforce(spark):
    """perplexity_buckets vs a pure-Python model: integer-quantized
    unigram log terms, per-lang tercile cuts via np.quantile (linear
    == quantile_cont), and the head/middle/tail CASE — bucket counts
    per lang must be ~balanced and every doc's bucket must match."""
    import math
    from collections import Counter, defaultdict

    import numpy as np
    import pandas as pd

    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    got = {
        r.doc_id: (r.lang, r.ppl_proxy, r.bucket)
        for r in REGISTRY["perplexity_buckets"].fn(spark, SF_SMOKE).collect()
    }
    doc = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    toks = {
        int(r.doc_id): ([t for t in str(r.text).split(" ") if t], r.lang)
        for r in doc.itertuples()
    }
    freq = Counter()
    for t, _ in toks.values():
        freq.update(t)
    n = sum(freq.values())

    def half_up(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    ppl, by_lang = {}, defaultdict(list)
    for did, (t, lang) in toks.items():
        if not t:
            assert did not in got
            continue
        su = sum(half_up(math.log(freq[w] / n) * 1e6) for w in t)
        p = -((su / 1e6) / len(t))
        ppl[did] = (lang, p)
        by_lang[lang].append(p)
    cuts = {
        lang: (np.quantile(v, 1 / 3), np.quantile(v, 2 / 3))
        for lang, v in by_lang.items()
    }
    assert set(got) == set(ppl)
    for did, (lang, p) in ppl.items():
        c1, c2 = cuts[lang]
        want = "head" if p <= c1 else ("middle" if p <= c2 else "tail")
        glang, gppl, gbucket = got[did]
        assert glang == lang
        assert gppl == pytest.approx(p, abs=1e-4)
        assert gbucket == want, (did, p, c1, c2)


def test_order_sensitive_entries_invariant_to_partitioning(spark):
    """Determinism contract at cluster scale: the entries whose OUTPUT
    encodes an ordering (global shuffle positions, packed bins, OHLC
    open/close picks, knn votes) must return byte-identical results
    whatever ``spark.sql.shuffle.partitions`` is — on a 1000-executor
    cluster that knob differs from the test value by orders of
    magnitude, and any hidden dependence on physical row order would
    surface as non-reproducible shards."""
    from az_datapipeline_sentiment_analysis_spark.plans.queries import REGISTRY

    names = [
        "global_shuffle_order", "pack_sequences", "ohlc_bars",
        "knn_classify", "auc_by_cohort", "bitmap_distinct_exact",
        "domain_mix_temperature", "upsample_epochs", "shard_manifest",
        "k_anonymity_audit", "multimodal_audio_pcm",
        "dynamic_partition_overwrite", "map_lambda_funcs",
        "collation_funcs",
    ]
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    results = {}
    try:
        for parts in ("3", "32"):
            spark.conf.set(key, parts)
            for name in names:
                rows = sorted(
                    map(tuple, REGISTRY[name].fn(spark, SF_SMOKE).collect())
                )
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set(key, prev)
    for name, (a, b) in results.items():
        assert a == b, name
