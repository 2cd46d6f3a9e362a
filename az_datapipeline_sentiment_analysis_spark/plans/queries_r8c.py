"""Round-8 continuation batch: the operator families still absent
after the 332-entry registry — entity-resolution blocking
(sorted-neighborhood), prefix-filtered exact similarity join
(AllPairs/PPJoin candidate generation), split-conformal prediction
intervals, CUPED variance reduction, the URL-parsing surface a web
curation pipeline filters on, and the one Python-UDF shape the matrix
still lacked (``mapInArrow``).

Registers into the shared ``REGISTRY`` (imported at the bottom of
``queries.py``). Conventions (SURVEY §2.3): integer aggregates CAST to
BIGINT in oracle SQL; ROUNDed floats that can be zero get ``+ 0.0``;
all cross-engine float math is scalar arithmetic over EXACT integer
aggregates (sum doubles only where rounding provably absorbs
order-dust); thresholds/prefix lengths in integer arithmetic so no
ceil-of-float boundary exists in either engine.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table as _t
from ..operators import dedup as dd
from .queries import _q

# =====================================================================
# Prefix-filtered exact similarity join (AllPairs / PPJoin)
# =====================================================================

_PFX_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok,
             generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS i
      FROM documents
    ),
    sh AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
      FROM t a
      JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN t c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    ss AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ss GROUP BY doc_id),
    p AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n
      FROM ss x JOIN ss y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(n * 1.0 / (sa.sz + sb.sz - n), 4) AS jaccard
    FROM p
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(n * 1.0 / (sa.sz + sb.sz - n), 4) >= 0.3
"""


@_q(
    "prefix_filter_simjoin",
    _PFX_ORACLE,
    "Exact shingle-Jaccard >= 0.3 pairs via PREFIX FILTERING"
    " (AllPairs — Bayardo/Ma/Srikant WWW'07; PPJoin — Xiao et al."
    " WWW'08): order each doc's shingles by ascending document"
    " frequency, index only the first |d| - ceil(0.3|d|) + 1"
    " (integer arithmetic, no float ceil), join prefix-vs-prefix,"
    " verify candidates exactly. Lossless by the prefix-filtering"
    " principle (Chaudhuri et al. ICDE'06), so the oracle is the"
    " PLAIN all-pairs inverted-index Jaccard — identical final"
    " answer, and the candidate set is provably a subset of the"
    " full-index plan's (pytest-asserted). The scale story vs"
    " ngram_jaccard_neardup: boilerplate shingles shared by k docs"
    " cost k^2 join rows in the full index but sort to the END of"
    " the frequency order and never enter the prefix index — the"
    " exact-copy collapse handles literal copies, prefix filtering"
    " handles the high-df tail. Implementation in"
    " operators/dedup.py:prefix_filter_jaccard_pairs.",
)
def prefix_filter_simjoin(spark, sf):
    return dd.prefix_filter_jaccard_pairs(
        _t(spark, sf, "documents"), t_num=3, t_den=10
    )


# =====================================================================
# Sorted-neighborhood record linkage (entity-resolution blocking)
# =====================================================================

_SNM_W = 5
_SNM_EPS_CENTS = 100


@_q(
    "record_linkage_snm",
    f"""
    WITH r AS (
      SELECT c_custkey, c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT), c_custkey
             ) AS rn
      FROM customer
    )
    SELECT a.c_mktsegment AS segment,
           a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
           b.bal_cents - a.bal_cents AS bal_diff_cents
    FROM r a
    JOIN r b
      ON b.c_mktsegment = a.c_mktsegment
     AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_W}
    WHERE b.bal_cents - a.bal_cents <= {_SNM_EPS_CENTS}
    """,
    "Sorted-neighborhood record linkage (Hernandez & Stolfo, SIGMOD"
    " '95): block on market segment, sort each block by the fuzzy"
    " key (integer-cents balance, id tiebreak), and compare each"
    " record only to its next w=5 neighbors in sort order — candidate"
    " generation is O(n log n + n*w), never the O(n^2) cross join a"
    " naive matcher runs. Spark-side the neighbor pairs come from w"
    " lead() calls over ONE block-partitioned window (bounded frame,"
    " no self-join, no global sort): the sort shuffle is the entire"
    " cost, and blocks — SNM's own blocking key — are the partition"
    " key, so a 100 TB run sorts per block, not globally. Matches ="
    " neighbor pairs within 100 cents. Multi-pass SNM (re-run under a"
    " second sort key, union) composes by re-invoking with a different"
    " key; the oracle mirrors via ROW_NUMBER + banded self-join.",
)
def record_linkage_snm(spark, sf):
    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("bal_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal_cents", "c_custkey")
    nbrs = F.array(
        *[
            F.lead(
                F.struct(
                    F.col("c_custkey").alias("k"),
                    F.col("bal_cents").alias("b"),
                ),
                i,
            ).over(w)
            for i in range(1, _SNM_W + 1)
        ]
    )
    return (
        c.withColumn("nbrs", nbrs)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("custkey_a"),
            F.col("bal_cents").alias("bal_a"),
            F.posexplode("nbrs").alias("pos", "nbr"),
        )
        .filter(F.col("nbr").isNotNull())
        .select(
            "segment", "custkey_a",
            F.col("nbr.k").alias("custkey_b"),
            (F.col("pos") + 1).cast("long").alias("rank_gap"),
            (F.col("nbr.b") - F.col("bal_a")).alias("bal_diff_cents"),
        )
        .filter(F.col("bal_diff_cents") <= _SNM_EPS_CENTS)
    )


# =====================================================================
# Split-conformal prediction intervals (Mondrian by event_type)
# =====================================================================

@_q(
    "conformal_interval",
    """
    WITH base AS (
      SELECT event_type, value,
             ((event_id % 100) * 61) % 100 AS c
      FROM events
    ),
    pred AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_train,
             ROUND(AVG(value), 6) AS pred
      FROM base WHERE c < 60 GROUP BY event_type
    ),
    cal AS (
      SELECT b.event_type,
             ROUND(ABS(b.value - p.pred), 6) AS absres
      FROM base b JOIN pred p USING (event_type)
      WHERE b.c >= 60 AND b.c < 80
    ),
    ncal AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
             LEAST((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*)) AS k
      FROM cal GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type, absres,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY absres) AS rn
      FROM cal
    ),
    q AS (
      SELECT r.event_type, CAST(n.k AS BIGINT) AS k,
             r.absres AS q_resid, n.n_cal
      FROM ranked r JOIN ncal n USING (event_type)
      WHERE r.rn = n.k
    ),
    test AS (
      SELECT b.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ROUND(ABS(b.value - p.pred), 6)
                           <= q.q_resid THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM base b
      JOIN pred p USING (event_type)
      JOIN q USING (event_type)
      WHERE b.c >= 80
      GROUP BY b.event_type
    )
    SELECT p.event_type, p.n_train, q.n_cal, q.k, q.q_resid,
           t.n_test, t.n_covered,
           ROUND(t.n_covered * 1.0 / t.n_test, 6) AS coverage
    FROM pred p JOIN q USING (event_type) JOIN test t USING (event_type)
    """,
    "Split-conformal prediction intervals, Mondrian-stratified by"
    " event_type (Vovk et al.; the distribution-free coverage"
    " guarantee eval pipelines attach to any point predictor):"
    " deterministic 60/20/20 train/calibration/test split via the"
    " modular coin, per-type mean as the point model, calibration"
    " |residual| order statistic at rank k = ceil(0.9*(n+1))"
    " (integer arithmetic: (9*(n+1)+9) div 10 — no float-ceil"
    " boundary), coverage audited on the held-out test split;"
    " guarantee: E[coverage] >= 0.9. Cross-engine float discipline:"
    " the per-type mean is rounded FIRST, residuals are rounded"
    " before ranking, so the rank-k selection and every <= compare"
    " operate on identically-quantized doubles. The rank selection"
    " is a per-type window (5 bounded groups here; a corpus with"
    " millions of strata stays per-group); everything else is two"
    " broadcast joins of 5-row frames against the fact scan.",
)
def conformal_interval(spark, sf):
    ev = _t(spark, sf, "events")
    base = ev.select(
        "event_type", "value",
        (((F.col("event_id") % 100) * 61) % 100).alias("c"),
    )
    pred = (
        base.filter(F.col("c") < 60)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_train"),
            F.round(F.avg("value"), 6).alias("pred"),
        )
    )
    cal = (
        base.filter((F.col("c") >= 60) & (F.col("c") < 80))
        .join(F.broadcast(pred.select("event_type", "pred")), "event_type")
        .select(
            "event_type",
            F.round(F.abs(F.col("value") - F.col("pred")), 6).alias("absres"),
        )
    )
    ncal = cal.groupBy("event_type").agg(
        F.count("*").alias("n_cal"),
        F.expr("LEAST((9 * (COUNT(*) + 1) + 9) div 10, COUNT(*))").alias("k"),
    )
    ranked = cal.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("absres")
        ),
    )
    q = (
        ranked.join(F.broadcast(ncal), "event_type")
        .filter(F.col("rn") == F.col("k"))
        .select(
            "event_type", "n_cal",
            F.col("k").cast("long").alias("k"),
            F.col("absres").alias("q_resid"),
        )
    )
    test = (
        base.filter(F.col("c") >= 80)
        .join(F.broadcast(pred.select("event_type", "pred")), "event_type")
        .join(F.broadcast(q.select("event_type", "q_resid")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(
                    F.round(F.abs(F.col("value") - F.col("pred")), 6)
                    <= F.col("q_resid"),
                    1,
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        pred.select("event_type", "n_train")
        .join(q, "event_type")
        .join(test, "event_type")
        .select(
            "event_type", "n_train", "n_cal", "k", "q_resid",
            "n_test", "n_covered",
            F.round(
                F.col("n_covered") * F.lit(1.0) / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


# =====================================================================
# CUPED variance reduction (pre-period covariate adjustment)
# =====================================================================

_CUPED_MOMENTS = """
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      CAST(SUM(x * x) AS BIGINT) AS sxx,
      CAST(SUM(y * y) AS BIGINT) AS syy,
      CAST(SUM(x * y) AS BIGINT) AS sxy
"""

# scalar double algebra shared VERBATIM by both engines (the same
# strings are interpolated into the oracle SQL and into F.expr): the
# operands are exact int64 moments CAST explicitly to DOUBLE — a bare
# `x * 1.0` would be DECIMAL arithmetic in BOTH Spark and DuckDB, with
# engine-specific precision rules — so every derived double is
# bit-identical across engines.
_CU_VY = (
    "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0"
)
_CU_CXY = (
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0"
)
_CU_VX = (
    "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0"
)
_CU_VADJ = f"{_CU_VY} - 2 * theta * ({_CU_CXY}) + theta * theta * ({_CU_VX})"
_CU_THETA = (
    "ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)"
)
_CU_MEANY = "ROUND(CAST(sy AS DOUBLE) / n / 100.0, 4)"
_CU_REDPCT = f"ROUND((1.0 - ({_CU_VADJ}) / ({_CU_VY})) * 100.0, 4) + 0.0"


@_q(
    "cuped_adjustment",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
               THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
               THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y,
             CASE WHEN ((user_id % 100) * 61) % 100 < 50
                  THEN 'treat' ELSE 'control' END AS arm
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT {_CUPED_MOMENTS}
      FROM per_user
    ),
    theta AS (
      SELECT {_CU_THETA} AS theta
      FROM g
    ),
    arms AS (
      SELECT arm, {_CUPED_MOMENTS}
      FROM per_user GROUP BY arm
    )
    SELECT arm, n AS n_users, theta,
           {_CU_MEANY} AS mean_y,
           ROUND({_CU_VY}, 4) AS var_y,
           ROUND({_CU_VADJ}, 4) AS var_adj,
           {_CU_REDPCT} AS var_reduction_pct
    FROM arms, theta
    """,
    "CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —"
    " the standard pre-experiment covariate adjustment): per-user"
    " pre-period spend x and experiment-period spend y in EXACT"
    " integer cents, theta = cov(x,y)/var(x) from pooled int64"
    " moments, adjusted metric y - theta*(x - E[x]) whose per-arm"
    " variance shrinks by the x,y correlation^2. All aggregation is"
    " over int64 (one user shuffle, one 2-row arm rollup; theta is a"
    " 1-row broadcast); every double is derived AFTERWARD by scalar"
    " algebra both engines evaluate on identical integer operands —"
    " bit-identical, no float-sum order anywhere. Moment magnitude"
    " bound (docstring contract, same discipline as autocorr_daily):"
    " SUM(x*x) stays exact while n_users * max_user_cents^2 < 2^63"
    " (~1e18 — 150k users at $30k each here is 1.4e18; corpora past"
    " that cast the per-user products to DOUBLE symmetrically).",
)
def cuped_adjustment(spark, sf):
    ev = _t(spark, sf, "events")
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cutoff, cents)), F.lit(0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cutoff, cents)), F.lit(0)
        ).alias("y"),
    ).select(
        "x", "y",
        F.when(((F.col("user_id") % 100) * 61) % 100 < 50, "treat")
        .otherwise("control").alias("arm"),
    )

    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )

    glob = moments(per_user, []).select(F.expr(_CU_THETA).alias("theta"))
    arms = moments(per_user, ["arm"])
    return arms.crossJoin(F.broadcast(glob)).select(
        "arm",
        F.col("n").alias("n_users"),
        "theta",
        F.expr(_CU_MEANY).alias("mean_y"),
        F.expr(f"ROUND({_CU_VY}, 4)").alias("var_y"),
        F.expr(f"ROUND({_CU_VADJ}, 4)").alias("var_adj"),
        F.expr(_CU_REDPCT).alias("var_reduction_pct"),
    )


# =====================================================================
# URL parsing surface (web-curation domain/query stats)
# =====================================================================

@_q(
    "url_parse_stats",
    """
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             'https://' || source || '.example.com/' || lang || '/doc-'
               || CAST(doc_id AS VARCHAR) || '?ref=r'
               || CAST(doc_id % 7 AS VARCHAR) || '&page='
               || CAST(doc_id % 13 AS VARCHAR) AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'ref=([^&]+)', 1) AS ref,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT regexp_extract(url, 'page=([0-9]+)', 1))
                AS BIGINT) AS n_pages,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM u
    GROUP BY 1, 2
    """,
    "The URL-decomposition surface a web-corpus curation pipeline"
    " filters on (domain blocklists, per-host caps, campaign-parameter"
    " stripping): Spark's parse_url (HOST / QUERY key extraction —"
    " JVM expression, codegen, zero Python) over deterministic URLs"
    " synthesized from the documents table, rolled up per (host, ref"
    " param) with doc counts, distinct page params, and mean length."
    " The oracle re-derives the same components with regexes — the"
    " entry pins that parse_url's HOST/QUERY semantics agree with the"
    " RFC-shaped patterns a non-Spark pipeline would use. Map-only"
    " until the single rollup shuffle; at 100 TB a per-host cap joins"
    " this output back broadcast.",
)
def url_parse_stats(spark, sf):
    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit("?ref=r"),
        (F.col("doc_id") % 7).cast("string"), F.lit("&page="),
        (F.col("doc_id") % 13).cast("string"),
    )
    u = d.select(
        F.col("n_chars"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
    )
    return u.groupBy("host", "ref").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("page").alias("n_pages"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# =====================================================================
# mapInArrow (the last UDF-surface shape: raw Arrow batches)
# =====================================================================

_ARROW_OUT = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("dim", T.LongType()),
        T.StructField("l2_norm", T.DoubleType()),
        T.StructField("max_abs", T.DoubleType()),
    ]
)


def _arrow_norm_batches(batches):
    """Per-batch vectorized kernel: float32 -> float64 cast, squared
    L2 norm and max |component|, emitted as a new Arrow batch. Runs
    on the raw Arrow data — no pandas materialization at all."""
    import numpy as np

    for batch in batches:
        ids = batch.column(batch.schema.get_field_index("vec_id"))
        col = batch.column(batch.schema.get_field_index("embedding"))
        lengths = np.asarray(
            [len(v) if v is not None else 0 for v in col], dtype=np.int64
        )
        obj = col.to_numpy(zero_copy_only=False)
        mat = (
            np.stack(obj).astype(np.float64)
            if len(obj)
            else np.zeros((0, 0))
        )
        norm = np.round(np.sqrt((mat * mat).sum(axis=1)), 6)
        mx = (
            np.round(np.abs(mat).max(axis=1), 6)
            if mat.shape[1]
            else np.zeros(len(obj))
        )
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(lengths, type=pa.int64()),
                pa.array(norm, type=pa.float64()),
                pa.array(mx, type=pa.float64()),
            ],
            names=["vec_id", "dim", "l2_norm", "max_abs"],
        )


@_q(
    "mapinarrow_transform",
    """
    SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * x))), 6) AS l2_norm,
           ROUND(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
    FROM embeddings
    """,
    "DataFrame.mapInArrow — the one Python-UDF shape the surface"
    " matrix still lacked (pandas_udf / mapInPandas / applyInPandas"
    " (+State) / cogrouped / UDTF are all registry entries): the"
    " kernel receives RAW pyarrow RecordBatches, so there is no"
    " pandas Block consolidation or object boxing on either side of"
    " the exchange — for numeric array kernels this is the leanest"
    " Python path Spark has. Computes per-vector L2 norm and max"
    " |component| in float64 numpy from the float32 Arrow buffers;"
    " value-identical to the JVM higher-order-function formulation"
    " (embed_norms) and to the DuckDB list-lambda oracle (64-element"
    " float sums: order dust ~1e-13 << the 1e-6 rounding). Map-only,"
    " zero shuffle, embarrassingly parallel at any scale; the honest"
    " caveat stays in force — a pure-JVM expression (embed_norms)"
    " still beats any Python worker exchange, so mapInArrow is for"
    " kernels Catalyst genuinely cannot express.",
)
def mapinarrow_transform(spark, sf):
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(_arrow_norm_batches, _ARROW_OUT)
