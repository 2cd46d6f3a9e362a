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

    # stage 2 — dedup verdict on the kept set (dedup_verdict's rule:
    # exact-before-near, keep-the-smallest-id)
    w = Window.partitionBy(F.md5(F.coalesce(F.col("text"), F.lit(""))))
    ex = kept.withColumn("__rep", F.min("doc_id").over(w))
    near = (
        dd.minhash_pairs(kept, threshold=0.3)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
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
