"""Round-8 widening: the composed end-to-end curation pipeline and
the approximate triangle-count twin.

Registers into the shared ``REGISTRY`` (imported at the bottom of
``queries.py``). The headline entry is ``curation_pipeline`` — the five
individually-green curation stages (quality_filter_gate ->
dedup_verdict -> dataset_split_leakproof -> pack_sequences ->
shard_manifest) run as ONE lineage producing the artifact a shard
writer actually consumes (VERDICT r7 #5).

Conventions (SURVEY §2.3): integer aggregates CAST to BIGINT in oracle
SQL; ROUNDed floats that can be zero get ``+ 0.0``; md5-derived
integer hashes via conv/UBIGINT so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import spread as _sp
from ..catalog import table as _t
from ..functions.text import alpha_ratio_expr
from .queries import _minhash_pairs_ctes, _q
from .queries_ext3 import _oriented_triangle_count, _part_cooccurrence_edges

# =====================================================================
# Composed curation pipeline (the shard writer's input, end to end)
# =====================================================================

def _curation_oracle_sql() -> str:
    """The five curation stages composed in DuckDB SQL, each CTE a
    verbatim restatement of its component entry's oracle."""
    return f"""
    WITH sigq AS (
      SELECT doc_id, text, lang, n_chars,
             length(text) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             regexp_extract_all(lower(text), '[a-z]+') AS toks
      FROM documents
    ),
    kept AS (
      SELECT doc_id, text, lang, n_chars FROM sigq
      WHERE len(toks) >= 10 AND len(toks) <= 100000
        AND ROUND(CASE WHEN n = 0 THEN 0.0
                       ELSE alpha * 1.0 / n END, 6) >= 0.5
        AND COALESCE(ROUND(len(list_distinct(toks)) * 1.0
                           / nullif(len(toks), 0), 4), 0.0) >= 0.2
    ),
    {_minhash_pairs_ctes("kept")},
    ex AS (
      SELECT doc_id,
             MIN(doc_id) OVER (
               PARTITION BY md5(coalesce(text, ''))) AS rep
      FROM kept
    ),
    near AS (
      SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jaccard >= 0.3
    ),
    surv AS (
      SELECT k.doc_id, k.text, k.lang, k.n_chars
      FROM kept k JOIN ex e ON k.doc_id = e.doc_id
      WHERE e.doc_id = e.rep
        AND k.doc_id NOT IN (SELECT doc_id FROM near)
    ),
    train AS (
      SELECT doc_id, text, lang, n_chars FROM surv
      WHERE substring(md5(array_to_string(list_sort(list_distinct(
              string_split(text, ' '))), ' ')), 1, 2) < 'cc'
    ),
    packed AS (
      SELECT doc_id, lang, n_chars,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
             SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM train
    ),
    shard_rows AS (
      SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::UBIGINT % 64 AS BIGINT) AS shard_id,
             tok,
             CAST((cum - tok) // 2048 AS BIGINT) AS bin_id,
             CAST(('0x' || substr(md5(concat_ws('|',
                    CAST(doc_id AS VARCHAR), lang,
                    CAST(n_chars AS VARCHAR),
                    CAST((cum - tok) // 2048 AS VARCHAR),
                    CAST((cum - tok) % 2048 AS VARCHAR))), 1, 15))
                  ::UBIGINT AS BIGINT) AS row_hash
      FROM packed
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens_total,
           CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins,
           bit_xor(row_hash) AS packed_checksum
    FROM shard_rows GROUP BY shard_id ORDER BY shard_id
    """


@_q(
    "curation_pipeline",
    _curation_oracle_sql(),
    "The END-TO-END curation pipeline as one lineage (VERDICT r7 #5):"
    " quality_filter_gate -> dedup_verdict -> dataset_split_leakproof"
    " -> pack_sequences -> shard_manifest, composed exactly as their"
    " individually-green entries define them, producing the artifact"
    " a shard writer actually consumes — per-shard doc/token totals,"
    " bins touched, and an order-independent XOR checksum over"
    " (doc, lang, chars, bin_id, bin_offset), so a re-run proves both"
    " MEMBERSHIP and PACKED LAYOUT bit-equal without rereading"
    " payloads. Stage flow: the map-only quality gate drops"
    " short/low-alpha/repetitive docs before any shuffle touches"
    " them; the dedup verdict runs exact-before-near on the KEPT set"
    " only (one md5-fingerprint window + the minhash_pairs LSH path"
    " over survivors of the gate — dedup work scales with what the"
    " gate passes, not raw corpus); the leakproof split is a map-only"
    " fingerprint-hash rule (copies can't straddle splits, so the"
    " dedup and split stages can never disagree about a document);"
    " packing is the distributed two-phase prefix-sum (bucket-local"
    " cumsums + broadcast base offsets — no single-task global"
    " window); the manifest is ONE 64-group map-combined aggregate."
    " Co-keyed stages share work instead of re-shuffling: gate and"
    " split are shuffle-free projections fused into the scan, and the"
    " only exchanges are the ones the dedup/pack stages own"
    " (plan-budgeted in tests/test_plans.py). Fully hash-checked:"
    " the oracle composes the five component oracles verbatim"
    " (the minhash CTE chain re-pointed at the kept set). Measured"
    " at 100x replication of sf0.1 (local[32]): 35.8s for 500k raw"
    " docs through all five stages to 64 manifest rows — comparable"
    " to the r7 SUM of the standalone stages, with the gate's"
    " pre-shuffle shrink paying for the composition overhead.",
)
def curation_pipeline(spark, sf):
    from ..operators import dedup as dd

    d = _t(spark, sf, "documents")

    # stage 1 — quality gate (quality_filter_gate's exact rules)
    sig = d.withColumn(
        "__toks", F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    )
    nt = F.expr("size(__toks)")
    uf = F.coalesce(
        F.round(
            F.expr("size(array_distinct(__toks))") * F.lit(1.0)
            / F.nullif(F.expr("size(__toks)"), F.lit(0)),
            4,
        ),
        F.lit(0.0),
    )
    kept = sig.filter(
        (nt >= 10)
        & (nt <= 100000)
        & (alpha_ratio_expr("text") >= 0.5)
        & (uf >= 0.2)
    ).select("doc_id", "text", "lang", "n_chars")
    # materialize the gate ONCE (optimization round 11): the regex
    # gate costs a full corpus scan (4.5s/pass at 10x), and without a
    # persist it re-ran inside every downstream consumer — both
    # minhash_pairs branches, the exact-dedup window, and the packing
    # token pass — measured 30.9s -> 11.9s at 10x for the whole entry.
    # Generation-tracked persist keeps the pinning bounded to one
    # invocation's blocks (the operators/dedup lesson).
    (kept,) = dd._persist_generation("curation_kept", kept)

    # stage 2 — dedup verdict on the kept set (dedup_verdict's rule:
    # exact-before-near, keep-the-smallest-id)
    w = Window.partitionBy(F.md5(F.coalesce(F.col("text"), F.lit(""))))
    ex = kept.withColumn("__rep", F.min("doc_id").over(w))
    # near-dup DROP SET directly (optimization round 12): the verdict
    # only consumes distinct doc_b, so the member-pair expansion is
    # skipped (minhash_dup_doc_ids — pytest-pinned equal to the pair
    # form's distinct doc_b)
    near = dd.minhash_dup_doc_ids(kept, threshold=0.3)
    surv = (
        ex.filter(F.col("doc_id") == F.col("__rep"))
        .join(near, "doc_id", "left_anti")
        .drop("__rep")
    )

    # stage 3 — leakproof split (dataset_split_leakproof's rule),
    # train slice only: the shard writer packs the training corpus
    fp2 = F.substring(
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
                " ",
            )
        ),
        1,
        2,
    )
    train = surv.filter(fp2 < "cc")

    # stage 4 — sequence packing (pack_sequences' two-phase prefix
    # sum). Width from the CORPUS row count (metadata-only parquet
    # count — never an action over the pipeline lineage), keeping the
    # phase-1 bucket table ~thousands of rows at any scale; any width
    # yields the same global cumsum, so output is width-invariant.
    width = max(100, d.count() // 4096)
    t = train.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
        .alias("tok"),
        (F.col("doc_id") / width).cast("long").alias("bkt"),
    )
    # the narrow token frame feeds TWO window passes (bucket bases +
    # local cumsum); persist it once so the dedup verdict upstream is
    # not re-derived per pass (optimization round 11, same measurement
    # as the kept persist above)
    (t,) = dd._persist_generation("curation_tok", t)
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        t.groupBy("bkt")
        .agg(F.sum("tok").alias("btok"))
        .withColumn("base", F.coalesce(F.sum("btok").over(wb), F.lit(0)))
        .select("bkt", "base")
    )
    wl = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        t.withColumn("lcum", F.sum("tok").over(wl))
        .join(F.broadcast(bases), "bkt")
        .withColumn("cum", F.col("base") + F.col("lcum"))
    )
    start = F.col("cum") - F.col("tok")

    # stage 5 — shard manifest (shard_manifest's md5 route + XOR fold,
    # with the packed position folded into the row hash)
    rows = cum.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) % 64"
        ).alias("shard_id"),
        F.col("tok"),
        (start / 2048).cast("long").alias("bin_id"),
        (start % 2048).cast("long").alias("bin_offset"),
        "doc_id",
        "lang",
        "n_chars",
    ).select(
        "shard_id",
        "tok",
        "bin_id",
        F.expr(
            "CAST(conv(substr(md5(concat_ws('|', CAST(doc_id AS STRING),"
            " lang, CAST(n_chars AS STRING), CAST(bin_id AS STRING),"
            " CAST(bin_offset AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("row_hash"),
    )
    return (
        rows.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens_total"),
            F.countDistinct("bin_id").cast("long").alias("n_bins"),
            F.expr("bit_xor(row_hash)").alias("packed_checksum"),
        )
        .orderBy("shard_id")
    )


# =====================================================================
# DOULION approximate triangle count (edge-sampled twin)
# =====================================================================

# Keep probability p = 1/5: the estimator scale 1/p^3 = 125 is an
# EXACT integer, so the estimate is pure int64 arithmetic — no float
# render hazard, and (because the md5 edge coin is deterministic) the
# whole entry is hash-checkable against DuckDB counting triangles on
# the IDENTICAL sampled subgraph.
_TRI_P_PCT = 20
_TRI_SCALE = 125  # (100 / _TRI_P_PCT) ** 3

_TRI_COIN_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(u AS STRING), ':',"
    " CAST(v AS STRING), ':tri')), 1, 8), 16, 10) AS BIGINT)"
    f" % 100 < {_TRI_P_PCT}"
)
_TRI_COIN_DD = (
    "('0x' || substring(md5(CAST(u AS VARCHAR) || ':' ||"
    " CAST(v AS VARCHAR) || ':tri'), 1, 8))::UBIGINT"
    f" % 100 < {_TRI_P_PCT}"
)


@_q(
    "graph_triangles_approx",
    f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    s AS (SELECT u, v FROM e WHERE {_TRI_COIN_DD}),
    tri AS (
      SELECT COUNT(*) AS t
      FROM s ab JOIN s bc ON ab.v = bc.u
                JOIN s ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    m AS (SELECT COUNT(*) AS me FROM s)
    SELECT CAST(t AS BIGINT) AS n_triangles_sampled,
           CAST(t * {_TRI_SCALE} AS BIGINT) AS n_triangles_est,
           CAST(me AS BIGINT) AS n_edges_sampled
    FROM tri, m
    """,
    "DOULION approximate triangle count (Tsourakakis et al., KDD"
    " 2009): keep each undirected edge with probability p = 0.2 via a"
    " deterministic md5 coin, count triangles EXACTLY on the sampled"
    " subgraph with graph_triangles' degree-oriented adjacency"
    " intersection (shared code), and scale by 1/p^3 = 125 — the"
    " interactive tier next to the exact entry's honest m^1.5"
    " (420.3s at 100x). p is chosen so the scale is an exact integer:"
    " the estimate is pure int64, and the deterministic coin makes"
    " the WHOLE entry hash-checkable (the oracle counts triangles on"
    " the identical sampled subgraph) — stronger than the rows-only"
    " check the approximation family usually gets; the accuracy-vs-"
    "exact envelope lives in tests/test_metrics_invariants.py"
    " (measured rel. err. 1.5% at sf0.001, 2.5% at sf0.01; DOULION"
    " bounds variance by T/p^3 + wedge covariance). Sampling cuts"
    " edges 5x and oriented-intersect work ~p^1.5 ~ 11x; the coin is"
    " pushed BELOW the pair distinct (filter commutes with distinct"
    " for a pure (u,v) function), so the pair-dedup shuffle — the"
    " edge derivation's dominant cost — also shrinks 5x; the plan"
    " shape is the exact entry's with every frame 5-25x smaller."
    " Measured at 100x replication of sf0.1 (local[32]): 32.4s warm"
    " / 102.5s cold vs the exact entry's 420.3s single-shot — ~13x"
    " on the compute, ~4x including the cold lineitem scan the"
    " sampling cannot skip.",
)
def graph_triangles_approx(spark, sf):
    # coin pushed BELOW the pair distinct (filter commutes with
    # distinct for a pure (u,v) function): the pair-dedup shuffle —
    # the edge derivation's dominant cost — shrinks by the keep rate
    s = _part_cooccurrence_edges(
        spark, sf, edge_filter=F.expr(_TRI_COIN_SPARK)
    )
    _, tri = _oriented_triangle_count(s)
    m = s.agg(F.count("*").alias("me"))
    return tri.crossJoin(F.broadcast(m)).select(
        F.col("t").cast("long").alias("n_triangles_sampled"),
        (F.col("t") * _TRI_SCALE).cast("long").alias("n_triangles_est"),
        F.col("me").cast("long").alias("n_edges_sampled"),
    )


# =====================================================================
# DSIR importance weighting (hashed n-gram importance resampling)
# =====================================================================

_DSIR_B = 2048   # hashed unigram buckets (the paper uses 10^4 for
#                  bigrams at web scale; the bucket AGG is B-bounded
#                  either way)
_DSIR_K = 100    # Gumbel-top-k sampling budget (production sizes this
#                  by token budget; the selection machinery is k-free)


@_q(
    "dsir_importance_weights",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT
                  % {_DSIR_B} AS BIGINT) AS b,
             (lang = 'en') AS is_tgt
      FROM tok
    ),
    cnt AS (
      SELECT b, COUNT(*) AS rc,
             SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tc
      FROM tb GROUP BY b
    ),
    tot AS (
      SELECT SUM(rc) AS r_total, SUM(tc) AS t_total FROM cnt
    ),
    lam AS (
      SELECT b,
             CAST(ROUND(ln((tc + 1) * 1.0 / (t_total + {_DSIR_B}))
                        * 1000000.0) AS BIGINT)
             - CAST(ROUND(ln((rc + 1) * 1.0 / (r_total + {_DSIR_B}))
                          * 1000000.0) AS BIGINT) AS l1e6
      FROM cnt, tot
    ),
    lw AS (
      SELECT d.doc_id,
             CAST(COALESCE(SUM(l1e6), 0) AS BIGINT) AS w
      FROM documents d
      LEFT JOIN tb ON tb.doc_id = d.doc_id
      LEFT JOIN lam ON lam.b = tb.b
      GROUP BY d.doc_id
    ),
    sc AS (
      SELECT doc_id, w AS dsir_logweight_1e6,
             CAST(ROUND(-ln(-ln(
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                  || ':dsir'), 1, 8))::UBIGINT + 1) * 1.0
               / 4294967297.0)) * 1000000.0) AS BIGINT) AS gumbel_1e6
      FROM lw
    ),
    scored AS (
      SELECT doc_id, dsir_logweight_1e6, gumbel_1e6,
             dsir_logweight_1e6 + gumbel_1e6 AS score_1e6
      FROM sc
    ),
    top AS (
      SELECT doc_id FROM scored
      ORDER BY score_1e6 DESC, doc_id LIMIT {_DSIR_K}
    )
    SELECT s.doc_id, dsir_logweight_1e6, gumbel_1e6, score_1e6,
           (s.doc_id IN (SELECT doc_id FROM top)) AS selected
    FROM scored s
    """,
    "DSIR — Data Selection via Importance Resampling (Xie et al."
    " 2023, arXiv:2302.03169): score every raw document by how much"
    " it looks like a TARGET domain under hashed bag-of-words"
    " language models, then Gumbel-top-k sample the training subset"
    " — the published recipe for 'give me web data that looks like"
    " Wikipedia'. Here target = the lang='en' slice, raw = the full"
    " corpus; features are unigrams hashed into 2048 buckets, so"
    " BOTH distributions come from ONE bucket-keyed aggregate (raw"
    " count + conditional target count per bucket, map-combined into"
    " <=2048 partials per task at any corpus size). Each bucket's"
    " Laplace-smoothed log-ratio is quantized to integer 1e-6 units"
    " ONCE on the 2048-row frame (each ln rounded separately — the"
    " novelty_bigram_loo convention), so every per-doc weight is an"
    " exact int64 dot product: order-independent, hash-stable."
    " Selection is Gumbel-top-k (g = -ln(-ln(U)) from a 1e-6-"
    "quantized deterministic md5 uniform — reproducible sampling"
    " without replacement, proportional to the softmax of weights),"
    " the top-k a distributed TakeOrdered with doc_id tie-break,"
    " flagged back via one broadcast semi-structure join. Plan: two"
    " passes over the token explode (bucket agg + per-doc sum), the"
    " 2048-row lambda frame broadcast, zero corpus-sized sorts."
    " Fully hash-checked end to end. Measured at 100x replication"
    " of sf0.1 (local[32]): 14.5s warm / 23.7s cold for 500k docs"
    " scored + sampled — two token-explode passes, output-bound"
    " (the pre-aggregation form; the join-first form measured the"
    " same within noise at this scale, but shuffles tokens instead"
    " of doc partials — the map-combine shape is the one that holds"
    " at 100 TB).",
)
def dsir_importance_weights(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    tb = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_tgt"),
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    ).select(
        "doc_id",
        "is_tgt",
        F.expr(
            "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"
            f" % {_DSIR_B}"
        ).alias("b"),
    )
    cnt = tb.groupBy("b").agg(
        F.count("*").alias("rc"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("tc"),
    )
    tot = cnt.agg(
        F.sum("rc").alias("r_total"), F.sum("tc").alias("t_total")
    )
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.round(
                F.log(
                    (F.col("tc") + 1).cast("double")
                    / (F.col("t_total") + _DSIR_B)
                )
                * 1e6
            ).cast("long")
            - F.round(
                F.log(
                    (F.col("rc") + 1).cast("double")
                    / (F.col("r_total") + _DSIR_B)
                )
                * 1e6
            ).cast("long")
        ).alias("l1e6"),
    )
    # aggregate BEFORE the docs join: the per-doc sum map-combines the
    # token-level frame down to |docs| partials per task, so the
    # doc_id shuffle moves docs, not tokens (joining first shuffled
    # the token stream at token cardinality)
    w_tok = (
        tb.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.sum("l1e6").alias("w0"))
    )
    lw = (
        d.select("doc_id")
        .join(w_tok, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("w0"), F.lit(0)).cast("long").alias("w"),
        )
    )
    u = (
        (
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
                " ':dsir')), 1, 8), 16, 10) AS BIGINT)"
            )
            + 1
        ).cast("double")
        / F.lit(4294967297.0)
    )
    scored = lw.select(
        "doc_id",
        F.col("w").alias("dsir_logweight_1e6"),
        F.round(-F.log(-F.log(u)) * 1e6).cast("long").alias("gumbel_1e6"),
    ).withColumn(
        "score_1e6", F.col("dsir_logweight_1e6") + F.col("gumbel_1e6")
    )
    top = (
        scored.orderBy(F.desc("score_1e6"), F.asc("doc_id"))
        .limit(_DSIR_K)
        .select("doc_id", F.lit(True).alias("__sel"))
    )
    return scored.join(F.broadcast(top), "doc_id", "left").select(
        "doc_id",
        "dsir_logweight_1e6",
        "gumbel_1e6",
        "score_1e6",
        F.coalesce(F.col("__sel"), F.lit(False)).alias("selected"),
    )


# =====================================================================
# k-core decomposition (iterative peeling, fixed-round form)
# =====================================================================

_KCORE_K = 3
_KCORE_ROUNDS = 12
# Hint the per-round removed-set broadcast only under this row bound
# (~32 MB of longs in the built relation — far inside the 8 GB /
# 512M-row broadcast cap and any sane driver heap). Above it the join
# is left unhinted so AQE picks a strategy from runtime sizes instead
# of the driver collecting an unbounded node set (VERDICT r11 Wrong
# #1: |part| scales linearly with SF, so "bounded by the catalog
# dimension" does not bound anything at 100 TB).
_KCORE_BROADCAST_MAX_ROWS = 4_000_000


def _kcore_oracle_sql() -> str:
    """Peeling unrolled as chained CTEs (the graph_pagerank /
    mmr_diversify move): each round keeps nodes with degree >= k in
    the SURVIVING subgraph and drops edges touching a peeled node.
    Both engines emit the round-N state, so parity holds by
    construction even before the fixpoint; convergence at the test
    scales is pytest-asserted."""
    # AS MATERIALIZED: each round references the previous frame three
    # times; without materialization DuckDB inlines CTEs and the
    # 12-round chain re-evaluates the base scan ~3^12 times (observed
    # as a too-many-open-files blowup)
    ctes = ["""
    d AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""]
    for r in range(_KCORE_ROUNDS):
        ctes.append(f"""
    dg{r} AS MATERIALIZED (
      SELECT n, COUNT(*) AS dg FROM (
        SELECT u AS n FROM e{r} UNION ALL SELECT v AS n FROM e{r}
      ) GROUP BY n
    ),
    k{r} AS MATERIALIZED (SELECT n FROM dg{r} WHERE dg >= {_KCORE_K}),
    e{r + 1} AS MATERIALIZED (
      SELECT u, v FROM e{r}
      WHERE u IN (SELECT n FROM k{r}) AND v IN (SELECT n FROM k{r})
    )""")
    body = ",".join(ctes)
    last = _KCORE_ROUNDS
    return f"""
    WITH {body},
    core AS (
      SELECT n, COUNT(*) AS dg FROM (
        SELECT u AS n FROM e{last} UNION ALL SELECT v AS n FROM e{last}
      ) GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS node,
           CAST(dg AS BIGINT) AS core_degree
    FROM core
    """


@_q(
    "graph_kcore",
    _kcore_oracle_sql(),
    "k-core decomposition (k=3) of the part co-occurrence graph by"
    " iterative peeling: repeatedly drop nodes whose degree in the"
    " SURVIVING subgraph is < k, until the fixpoint — the standard"
    " dense-subgraph / influence-zone primitive (community cores,"
    " graph sparsification, the 'which parts co-sell with at least 3"
    " stable partners' question). The engine peels INCREMENTALLY in"
    " a driver loop (optimization round 12): degrees are maintained"
    " as a node-level frame and each round subtracts only the"
    " removed nodes' contributions from their surviving neighbors,"
    " so per-round edge work is proportional to edges INCIDENT TO"
    " THE REMOVED set (empty at the fixpoint), the one full-width"
    " aggregate is the initial degree count, and the final degree"
    " frame IS the output — no closing core pass. The removed-set"
    " broadcast is SIZE-GUARDED (forced hint only under an explicit"
    " row bound; above it AQE picks the strategy), so the plan"
    " degrades to a shuffle semi join instead of a driver OOM when"
    " the node set outgrows broadcast at 100 TB. Pinned to 12 rounds"
    " so the oracle can unroll the same peeling as chained CTEs (the"
    " pagerank move) — both engines emit round-12 state, so parity"
    " holds by construction even mid-convergence, and pytest asserts"
    " the fixpoint is reached at every test scale; the early exit on"
    " an empty removal set is output-identical to the literal"
    " 12-round unroll (a fixpoint is invariant under further"
    " rounds). Emits (node, degree-in-core) for the surviving core."
    " Fully hash-checked. Measured at 100x replication of sf0.1"
    " (local[32], same-session alternating A/B best-of-3): 43.2s"
    " over ~120M edges / 2M nodes vs the round-11 recompute form's"
    " 79.3s — and the whole residual is the shared edge-builder +"
    " one degree aggregate, since the bench graph fixpoints in round"
    " 1 (round-10 history: 356.0s without the fixpoint exit; an"
    " earlier cut that checkpointed the shrinking EDGE frame per"
    " round OOMed — node-level state is the only thing the loop"
    " checkpoints).",
)
def graph_kcore(spark, sf):
    from ..operators.dedup import _persist_generation

    # the undirected edge frame, persisted once (loop-invariant) —
    # see _kcore_peel for the incremental peeling design
    edges, = _persist_generation(
        "graph_kcore_edges", _part_cooccurrence_edges(spark, sf)
    )
    return _kcore_peel(edges)


def _kcore_peel(edges, *, k=None, rounds=None):
    """Incremental k-core peeling over a persisted undirected edge
    frame (u, v) — the loop body of :func:`graph_kcore`, extracted so
    the multi-round subtraction path is unit-testable (the fixture
    graphs fixpoint in round 1 at every scale, so the oracle alone
    never exercises a removal).

    INCREMENTAL peeling (optimization round 12). The round-11 form
    recomputed degrees from the full surviving edge set every round
    (two broadcast semi joins + a 2x|edges| union-aggregate per
    round, plus a final full core pass), and its forced
    F.broadcast(keep) hint did not survive scale: |part| grows
    linearly with SF, so at 100 TB the surviving-node set is ~1e10
    keys and the hint forces a driver collect -> OOM (VERDICT r11
    Wrong #1). This form maintains degrees incrementally instead:
      deg(n) = degree of n within the alive-induced subgraph.
      Each round removes R = {n : deg(n) < k} and SUBTRACTS the
      removed nodes' contributions from their still-alive
      neighbors — an edge (a, b) with a in R decrements b iff b
      survives, which the deg join enforces (dead targets simply
      have no deg row left). An edge whose other endpoint died in
      an EARLIER round already stopped contributing then, so no
      double subtraction is possible.
    Per-round work is proportional to edges INCIDENT TO THE REMOVED
    set (shrinking, empty at the fixpoint) instead of the full edge
    set, the only full-width aggregate is the ONE initial degree
    count, and the final deg frame IS the output (core_degree =
    degree within the surviving set), so the old final core pass
    disappears entirely. Output is identical round for round: alive
    after round r == keep_r of the recompute form (a node whose
    within-alive degree hits 0 is removed the same round the
    recompute form drops it, because 0 < k), and the dg > 0 output
    filter reproduces the old union-aggregate's implicit exclusion
    of isolated survivors.
    """
    k = _KCORE_K if k is None else k
    rounds = _KCORE_ROUNDS if rounds is None else rounds
    # the directed view EXPLODES the cached undirected frame per scan
    # instead of unioning two scans, so every degree/loss pass reads
    # the cached edges exactly once and the 2x row doubling lives only
    # inside the generator, collapsed by the map-side partial
    # aggregate before any exchange.
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    deg = (
        both.groupBy(F.col("a").alias("n"))
        .agg(F.count("*").alias("dg"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        removed = deg.filter(F.col("dg") < k).select("n")
        # one small node-frame count per round: the fixpoint test
        # (peeling is monotone, so an empty removal set is THE
        # fixpoint and further rounds are identity) and the size
        # guard for the broadcast hint below.
        n_removed = removed.count()
        if n_removed == 0:
            break
        # SIZE-GUARDED broadcast (VERDICT r11 Wrong #1): the removed
        # set is usually tiny (the shrinking periphery), so hint the
        # broadcast only under an explicit row bound — ~32 MB of
        # longs, far inside the 8 GB / 512M-row broadcast cap. Above
        # the bound, fall back to a plain join and let AQE pick the
        # strategy from runtime sizes; the plan degrades to a shuffle
        # semi join instead of OOMing the driver.
        rem = removed.withColumnRenamed("n", "a")
        if n_removed <= _KCORE_BROADCAST_MAX_ROWS:
            rem = F.broadcast(rem)
        loss = (
            both.join(rem, "a", "left_semi")
            .groupBy(F.col("b").alias("n"))
            .agg(F.count("*").alias("lost"))
        )
        deg = (
            deg.filter(F.col("dg") >= k)
            .join(loss, "n", "left")
            .select(
                "n",
                (
                    F.col("dg")
                    - F.coalesce(F.col("lost"), F.lit(0))
                ).alias("dg"),
            )
            .localCheckpoint(eager=True)
        )
    return deg.filter(F.col("dg") > 0).select(
        F.col("n").cast("long").alias("node"),
        F.col("dg").cast("long").alias("core_degree"),
    )


# =====================================================================
# Matryoshka truncation evaluation (dimension/quality tradeoff)
# =====================================================================

_MRL_DIMS = 16


def _matryoshka_oracle_sql(k: int) -> str:
    cosine_full = """
             ROUND(
               CASE WHEN list_sum(list_transform(q.q_vec,
                    x -> CAST(x AS DOUBLE) * x)) = 0
                 OR list_sum(list_transform(c.embedding,
                    x -> CAST(x AS DOUBLE) * x)) = 0
               THEN CAST(0 AS DOUBLE) ELSE
               list_sum(list_transform(generate_series(1,
                 len(c.embedding)),
                 i -> CAST(q.q_vec[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.q_vec,
                    x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(c.embedding,
                    x -> CAST(x AS DOUBLE) * x))))
               END, 6)
    """
    cosine_tr = f"""
             ROUND(
               CASE WHEN list_sum(list_transform(
                    generate_series(1, {_MRL_DIMS}),
                    i -> CAST(q.q_vec[i] AS DOUBLE) * q.q_vec[i])) = 0
                 OR list_sum(list_transform(
                    generate_series(1, {_MRL_DIMS}),
                    i -> CAST(c.embedding[i] AS DOUBLE)
                         * c.embedding[i])) = 0
               THEN CAST(0 AS DOUBLE) ELSE
               list_sum(list_transform(generate_series(1, {_MRL_DIMS}),
                 i -> CAST(q.q_vec[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(
                    generate_series(1, {_MRL_DIMS}),
                    i -> CAST(q.q_vec[i] AS DOUBLE) * q.q_vec[i])))
                  * sqrt(list_sum(list_transform(
                    generate_series(1, {_MRL_DIMS}),
                    i -> CAST(c.embedding[i] AS DOUBLE)
                         * c.embedding[i])))) END, 6)
    """
    return f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
      WHERE vec_id < 20
    ),
    full_scored AS (
      SELECT q.q_id, c.vec_id, {cosine_full} AS cosine
      FROM embeddings c, q WHERE c.vec_id <> q.q_id
    ),
    full_ranked AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rnk
      FROM full_scored
    ),
    full_k AS (SELECT q_id, vec_id FROM full_ranked WHERE rnk <= {k}),
    tr_scored AS (
      SELECT q.q_id, c.vec_id, {cosine_tr} AS cosine
      FROM embeddings c, q WHERE c.vec_id <> q.q_id
    ),
    tr_ranked AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rnk
      FROM tr_scored
    ),
    tr_k AS (SELECT q_id, vec_id FROM tr_ranked WHERE rnk <= {k}),
    hits AS (
      SELECT f.q_id,
             CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM full_k f LEFT JOIN tr_k t
        ON f.q_id = t.q_id AND f.vec_id = t.vec_id
      GROUP BY f.q_id
    )
    SELECT q_id, n_full, n_hit,
           ROUND(CAST(n_hit AS DOUBLE) / n_full, 6) + 0.0
             AS recall_trunc
    FROM hits
    """


@_q(
    "embed_matryoshka_eval",
    _matryoshka_oracle_sql(5),
    "Matryoshka truncation evaluation (Kusupati et al. 2022,"
    " arXiv:2205.13147): per-query recall@5 of brute-force retrieval"
    " on embeddings TRUNCATED to the first 16 of 64 dims against the"
    " full-dimension baseline — the dimension-vs-quality readout"
    " behind every 'can we store the short prefix' decision (MRL"
    " embeddings are trained so prefixes remain usable; this entry"
    " is the measurement that validates a truncation level on YOUR"
    " corpus before committing 4x less vector memory)."
    " recall_at_k_eval compares a faster CANDIDATE PATH at equal"
    " dims; this compares equal exhaustive search at fewer dims —"
    " together they span the ANN deployment's two knobs. Truncation"
    " is a zero-copy array slice fused into the scan; both rankings"
    " are the shared brute_force_topk WindowGroupLimit plan; the hit"
    " join runs on two (queries x k) frames. Fully hash-checked"
    " (deterministic arithmetic on both paths). Measured at 100x"
    " replication of sf0.1 (local[32]): 12.4s for 20 queries x 200k"
    " vectors, two exhaustive scans.",
)
def embed_matryoshka_eval(spark, sf):
    from ..operators import similarity as sim

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    full_k = sim.brute_force_topk(e, q, k=5).select("q_id", "vec_id")
    tr = e.select(
        "vec_id",
        F.expr(f"slice(embedding, 1, {_MRL_DIMS})").alias("embedding"),
    )
    tr_q = tr.filter(F.col("vec_id") < 20)
    tr_k = (
        sim.brute_force_topk(tr, tr_q, k=5)
        .select(F.col("q_id").alias("tq"), F.col("vec_id").alias("tv"))
    )
    hits = (
        full_k.join(
            tr_k,
            (full_k["q_id"] == tr_k["tq"])
            & (full_k["vec_id"] == tr_k["tv"]),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("*").cast("long").alias("n_full"),
            F.sum(
                F.when(F.col("tv").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_hit"),
        )
    )
    return hits.select(
        "q_id",
        "n_full",
        "n_hit",
        (
            F.round(F.col("n_hit").cast("double") / F.col("n_full"), 6)
            + F.lit(0.0)
        ).alias("recall_trunc"),
    )


# =====================================================================
# Differentially-private noisy count release (Laplace mechanism)
# =====================================================================

_DP_B = 10.0  # Laplace scale b = sensitivity/epsilon = 1/0.1


@_q(
    "dp_noise_count",
    f"""
    WITH c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n,
             (('0x' || substring(md5(event_type || ':dp'), 1, 8))
              ::UBIGINT + 1) * 1.0 / 4294967297.0 AS uu
      FROM c
    )
    SELECT event_type,
           n AS true_n,
           CAST(n + CAST(ROUND(
             -{_DP_B} * (CASE WHEN uu >= 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(1.0 - 2.0 * abs(uu - 0.5))) AS BIGINT) AS BIGINT)
             AS noisy_n,
           0.1 AS epsilon
    FROM u
    """,
    "Laplace-mechanism noisy count release (Dwork et al. 2006) — the"
    " differential-privacy building block that completes the privacy"
    " family (anonymize_events pseudonymizes, k_anonymity_audit"
    " measures re-identification risk, pii_redact masks spans; this"
    " releases AGGREGATES with calibrated noise): per-type event"
    " counts plus Laplace(b = sensitivity/epsilon = 1/0.1) noise via"
    " inverse-CDF sampling, L = -b*sign(U-.5)*ln(1-2|U-.5|). The"
    " uniform is a deterministic md5 draw so the entry is"
    " hash-checkable and the engine's noise addition is"
    " REPRODUCIBLY testable — production swaps a secure RNG for the"
    " coin (and emits only noisy_n; true_n is included here exactly"
    " because this entry's job is verifying the mechanism, not"
    " making a release). Count aggregate map-combines; the noise"
    " arithmetic runs on the |event_type|-row post-aggregate frame —"
    " one shuffle at any corpus size. Fully hash-checked (ln of an"
    " identical double on both engines, the novelty/survival_km"
    " precedent). Measured at 100x replication of sf0.1 (local[32]):"
    " 2.4s — the scan + map-combined count is the whole cost.",
)
def dp_noise_count(spark, sf):
    ev = _t(spark, sf, "events")
    c = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    uu = (
        (
            F.expr(
                "CAST(conv(substring(md5(concat(event_type, ':dp')),"
                " 1, 8), 16, 10) AS BIGINT)"
            )
            + 1
        ).cast("double")
        / F.lit(4294967297.0)
    )
    sign = F.when(uu >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.round(
        F.lit(-_DP_B) * sign * F.log(F.lit(1.0) - 2.0 * F.abs(uu - 0.5))
    ).cast("long")
    return c.select(
        "event_type",
        F.col("n").alias("true_n"),
        (F.col("n") + noise).cast("long").alias("noisy_n"),
        F.lit(0.1).alias("epsilon"),
    )
