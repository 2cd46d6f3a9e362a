"""Training-data curation operators: round-3 widening batch.

The operations a large-scale LLM training-data pipeline runs between
"raw crawl" and "training shards", each expressed Spark-first and
paired with a DuckDB oracle (same column names, same rounding):

* corpus vocabulary profiling (``vocab_topk``);
* per-document salient terms (``tfidf_topterms``) and ranked retrieval
  (``bm25_search``) — the relevance primitives behind quality
  classifiers and nearest-query mining;
* Gopher-style repetition quality signals (``quality_repetition``);
* benchmark-contamination detection via n-gram collision
  (``contamination_check``) and boilerplate detection via global
  document-frequency thresholds (``boilerplate_ngrams``);
* deterministic domain/language rebalancing (``domain_mix_rebalance``);
* PII-style pseudonymization + generalization (``anonymize_events``);
* quality-aware canonical selection within exact-duplicate groups
  (``dedup_keep_best``).

Scale notes applying to the whole family: tokenization is a JVM
``regexp_extract_all`` projection (no UDF, no shuffle); every
"explode tokens then aggregate" pattern map-side combines before its
one hash shuffle; global statistics (vocabulary document frequency,
corpus size, average document length) are tiny aggregates broadcast
back to the fact side, never driver-side loops. Generalizes the
reference's per-review text handling
(``FunctionApp2/process_data/__init__.py:49-52``) the way BASELINE.json
directs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import spread as _sp
from ..catalog import table as _t
from ..functions.text import alpha_ratio_expr
from .queries import _q

# Word tokenizer shared by this module — identical semantics in Spark
# (third arg = group index) and DuckDB (no group arg).
_TOKS = "regexp_extract_all(lower(text), '[a-z]+', 0)"
_TOKS_DD = "regexp_extract_all(lower(text), '[a-z]+')"


# =====================================================================
# Corpus profiling
# =====================================================================

@_q(
    "vocab_topk",
    f"""
    WITH t AS (
      SELECT doc_id, unnest({_TOKS_DD}) AS term FROM documents
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM t GROUP BY term
    ORDER BY tf DESC, term LIMIT 20
    """,
    "Corpus vocabulary profile: global term + document frequency,"
    " top-20. One explode (flatMap projection, no shuffle) then one"
    " hash shuffle on term with map-side partials; top-k is a"
    " TakeOrdered, never a full sort.",
)
def vocab_topk(spark, sf):
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
        .orderBy(F.desc("tf"), "term")
        .limit(20)
    )


@_q(
    "tfidf_topterms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_DD}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * ln((n + 1.0) / (df + 1.0)), 4) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
    "Per-document top-3 TF-IDF terms (smoothed idf = ln((N+1)/(df+1)))."
    " Document frequency is a vocabulary-sized aggregate joined back"
    " broadcast; ranking sorts on the ROUNDED score (term tiebreak) so"
    " both engines pick identical term sets despite last-ulp ln()"
    " differences.",
)
def tfidf_topterms(spark, sf):
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    # no broadcast hint on dfreq: the vocabulary is small here but
    # grows to ~1e8 terms on a web corpus, where a forced broadcast
    # would OOM the executors — AQE picks broadcast vs shuffle from
    # the runtime size (it still broadcasts at test scale)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", "rk")
    )


@_q(
    "bm25_search",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_DD}) AS term FROM documents
    ),
    lens AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n, AVG(dl) AS avgdl
      FROM lens
    ),
    qt AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN ('merge', 'window', 'stream')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM qt GROUP BY term),
    w AS (
      SELECT qt.doc_id,
             ln(1.0 + (n - df + 0.5) / (df + 0.5))
               * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS wt
      FROM qt JOIN dfreq USING (term)
      JOIN lens ON qt.doc_id = lens.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 20
    """,
    "BM25 ranked retrieval (k1=1.2, b=0.75) for the fixed query"
    " {merge, window, stream}: the term filter collapses the explode"
    " to matching postings before any shuffle, global stats (N, avgdl)"
    " and per-term df are broadcast scalars, and the final top-20 is a"
    " TakeOrdered on the rounded score with doc_id tiebreak.",
)
def bm25_search(spark, sf):
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("term"))
    lens = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n = d.agg(F.count("*").alias("n"))
    stats = lens.agg(F.avg("dl").alias("avgdl")).crossJoin(F.broadcast(n))
    qt = (
        toks.filter(F.col("term").isin("merge", "window", "stream"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = qt.groupBy("term").agg(F.count("*").alias("df"))
    wt = (
        F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf") * 2.2
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    return (
        qt.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


# =====================================================================
# Quality / contamination / boilerplate
# =====================================================================

@_q(
    "quality_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DD} AS toks FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_uniq,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    ),
    bg AS (SELECT doc_id, unnest(bigrams) AS bg FROM base),
    c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    s AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM c GROUP BY doc_id
    )
    SELECT base.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           COALESCE(ROUND(n_uniq * 1.0 / nullif(n_tokens, 0), 4), 0.0)
             AS uniq_frac,
           COALESCE(ROUND(top_c * 1.0 / nullif(n_bg, 0), 4), 0.0)
             AS top_bigram_frac
    FROM base LEFT JOIN s USING (doc_id)
    """,
    "Gopher-style repetition signals per document: distinct-token"
    " fraction and most-frequent-bigram mass. Bigrams are built by a"
    " JVM transform() lambda over the token array (no shuffle); the"
    " per-doc mode needs two doc-keyed shuffles with map-side partials."
    " Null-safe for empty documents (frac = 0).",
)
def quality_repetition(spark, sf):
    d = _t(spark, sf, "documents")
    # Tokens materialized ONCE as a column: textually inlining the
    # regex into every element_at/size reference re-runs it per token
    # (CollapseProject keeps a separate project for a non-cheap alias
    # referenced multiple times, so the column form is evaluated once —
    # same pitfall documented at operators/dedup.py with_shingles).
    base = d.withColumn("__toks", F.expr(_TOKS)).select(
        "doc_id",
        F.expr("size(__toks)").alias("n_tokens"),
        F.expr("size(array_distinct(__toks))").alias("n_uniq"),
        F.expr(
            "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
            " (x, i) -> concat(x, ' ', element_at(__toks, i + 2)))"
        ).alias("bigrams"),
    )
    # explode_outer + isNotNull: plain explode's synthesized
    # size(arr)>0 filter is pushdown-inlined through the projects and
    # re-evaluates the gram build (and regex) once more per row — see
    # operators/dedup.py ngram_jaccard_pairs for the full account.
    bg = base.select(
        "doc_id", F.explode_outer("bigrams").alias("bg")
    ).filter(F.col("bg").isNotNull())
    s = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )
    frac = lambda num, den: F.coalesce(  # noqa: E731
        F.round(num * F.lit(1.0) / F.nullif(den, F.lit(0)), 4), F.lit(0.0)
    )
    return (
        base.join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            frac(F.col("n_uniq"), F.col("n_tokens")).alias("uniq_frac"),
            frac(F.col("top_c"), F.col("n_bg")).alias("top_bigram_frac"),
        )
    )


@_q(
    "contamination_check",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DD} AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, len(toks) - 2),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               || ' ' || toks[i+3]))) AS g
      FROM t
    ),
    bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 = 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM g JOIN bench USING (g)
    WHERE doc_id % 100 <> 0
    GROUP BY doc_id
    """,
    "Benchmark-contamination detector: training docs sharing any"
    " 4-gram with a held-out set (doc_id % 100 = 0 stands in for the"
    " eval suite). An inverted-index equi-join on the shingle — cost"
    " proportional to shared postings, never all-pairs; the distinct"
    " benchmark side is a small fraction of the corpus, so AQE"
    " broadcasts it at moderate scale and skew-splits hot (stopword-"
    "only) shingles beyond that.",
)
def contamination_check(spark, sf):
    d = _t(spark, sf, "documents")
    # Tokens materialized once (see quality_repetition note).
    g = (
        d.withColumn("__toks", F.expr(_TOKS))
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    "array_distinct(transform("
                    "slice(__toks, 1, greatest(size(__toks) - 3, 0)),"
                    " (x, i) -> concat_ws(' ', x,"
                    " element_at(__toks, i + 2), element_at(__toks, i + 3),"
                    " element_at(__toks, i + 4))))"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    bench = g.filter(F.col("doc_id") % 100 == 0).select("g").distinct()
    return (
        g.filter(F.col("doc_id") % 100 != 0)
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


@_q(
    "boilerplate_ngrams",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DD} AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g
      FROM t
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    boiler AS (
      SELECT g FROM g CROSS JOIN n GROUP BY g, n HAVING COUNT(*) * 5 >= n
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_boiler
      FROM g JOIN boiler USING (g) GROUP BY doc_id
    )
    SELECT sizes.doc_id,
           CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
           COALESCE(ROUND(n_boiler * 1.0 / nullif(n_grams, 0), 4), 0.0)
             AS boiler_frac
    FROM sizes LEFT JOIN hits USING (doc_id)
    """,
    "Boilerplate detection: 3-grams present in >= 20% of documents"
    " (integer-exact threshold: df * 5 >= N) and each document's"
    " boilerplate fraction. The df aggregate is vocabulary-sized and"
    " the qualifying set tiny, so the join back is a broadcast; the"
    " per-doc counts reuse the doc-keyed shuffle.",
)
def boilerplate_ngrams(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    # Tokens materialized once (see quality_repetition note).
    g = (
        d.withColumn("__toks", F.expr(_TOKS))
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    "array_distinct(transform("
                    "slice(__toks, 1, greatest(size(__toks) - 2, 0)),"
                    " (x, i) -> concat_ws(' ', x,"
                    " element_at(__toks, i + 2), element_at(__toks, i + 3))))"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    n = d.agg(F.count("*").alias("n"))
    boiler = (
        g.groupBy("g")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") * 5 >= F.col("n"))
        .select("g")
    )
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        g.join(F.broadcast(boiler), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    return sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias("n_boiler"),
        F.coalesce(
            F.round(
                F.col("n_boiler") * F.lit(1.0)
                / F.nullif(F.col("n_grams"), F.lit(0)),
                4,
            ),
            F.lit(0.0),
        ).alias("boiler_frac"),
    )


# =====================================================================
# Mix rebalancing / anonymization / canonical dedup
# =====================================================================

@_q(
    "domain_mix_rebalance",
    """
    WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT MIN(cnt) AS m FROM counts)
    SELECT doc_id, lang
    FROM documents JOIN counts USING (lang) CROSS JOIN m
    WHERE (((doc_id % 10000) * 5761) % 10000) * cnt < m * 10000
    """,
    "Deterministic domain/language rebalancing: downsample every"
    " language to (approximately) the smallest class via a"
    " multiplicative-hash keep rule. The hash is computed in modular"
    " form — ((doc_id % 10000) * (2654435761 % 10000)) % 10000, equal"
    " to (doc_id * 2654435761) % 10000 by modular arithmetic — so the"
    " intermediate product is bounded by 10000^2 and can never wrap"
    " int64 (the naive product overflows for doc_id >~ 3.5e9, i.e."
    " exactly at the corpus sizes this targets). Pure integer"
    " arithmetic, bit-identical across engines, no float rate"
    " rounding. Per-class counts are a 5-row broadcast; the filter"
    " itself runs in the codegen stage over the scan, so the whole"
    " rebalance is one tiny agg plus a map-only pass.",
)
def domain_mix_rebalance(spark, sf):
    d = _t(spark, sf, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(m))
        .filter(
            (((F.col("doc_id") % 10000) * 5761) % 10000) * F.col("cnt")
            < F.col("m") * 10000
        )
        .select("doc_id", "lang")
    )


@_q(
    "anonymize_events",
    """
    SELECT event_id,
           sha256('pepper:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
           date_trunc('hour', ts) AS hour_bucket,
           CAST(floor(value) AS BIGINT) AS value_band
    FROM events
    """,
    "PII-style pseudonymization + generalization before sharing a"
    " training corpus: salted SHA-256 of the user key (consistent"
    " join-able pseudonym, original not recoverable without the"
    " pepper), timestamps coarsened to the hour, measures banded to"
    " integers. Pure projection — map-only, no shuffle; at 100 TB this"
    " runs at scan speed.",
)
def anonymize_events(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.sha2(
            F.concat(F.lit("pepper:"), F.col("user_id").cast("string")), 256
        ).alias("user_pseudo"),
        F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
        F.floor("value").cast("long").alias("value_band"),
    )


@_q(
    "dedup_keep_best",
    """
    WITH f AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(
               regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
      FROM documents
    ),
    r AS (
      SELECT fp, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY fp) AS grp
      FROM f
    )
    SELECT fp, doc_id AS kept_id, CAST(grp AS BIGINT) AS group_size
    FROM r WHERE rk = 1
    """,
    "Quality-aware canonical selection: within each exact-duplicate"
    " group (same normalized-text fingerprint as dedup_fingerprint,"
    " `operators/dedup.py`), keep the longest document (doc_id"
    " tiebreak) instead of an arbitrary survivor. One hash shuffle on"
    " the fingerprint; group sizes are bounded by copy multiplicity,"
    " so the window state stays small per key.",
)
def dedup_keep_best(spark, sf):
    d = _t(spark, sf, "documents")
    f = d.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.expr("array_join(regexp_extract_all(lower(text),"
                   " '[a-z0-9]+', 0), ' ')")
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(F.desc("n_chars"), "doc_id")
    wc = Window.partitionBy("fp")
    return (
        f.withColumn("rk", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(wc).cast("long"))
        .filter(F.col("rk") == 1)
        .select("fp", F.col("doc_id").alias("kept_id"), "group_size")
    )


@_q(
    "char_entropy",
    r"""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
      FROM documents
    ),
    freq AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
    ),
    ent AS (
      SELECT doc_id,
             ROUND(-SUM((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS entropy
      FROM (SELECT doc_id, ch, c, SUM(c) OVER (PARTITION BY doc_id) AS n
            FROM freq)
      GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(e.entropy, 0.0) AS entropy
    FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
    """,
    "Character-level Shannon entropy per document — the cheap"
    " gibberish/compression-quality signal (low entropy = repeated"
    " filler, very high = binary junk in a text field). Char explode"
    " (flatMap, no shuffle) then two doc-keyed hash aggs with map-side"
    " partials; at 100 TB this is one linear pass plus shuffles"
    " proportional to distinct (doc, char) pairs (~doc_count * 60).",
)
def char_entropy(spark, sf):
    d = _t(spark, sf, "documents")
    ch = d.select(
        "doc_id",
        F.explode_outer(F.expr(r"regexp_extract_all(text, '[\\s\\S]', 0)"))
        .alias("ch"),
    ).filter(F.col("ch").isNotNull())
    freq = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    ent = (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"))
    )
    return d.select("doc_id").join(ent, "doc_id", "left").select(
        "doc_id", F.coalesce("entropy", F.lit(0.0)).alias("entropy")
    )


@_q(
    "dataset_split",
    """
    SELECT doc_id, lang,
           CASE WHEN ((doc_id % 100) * 61) % 100 < 80 THEN 'train'
                WHEN ((doc_id % 100) * 61) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    "Deterministic train/val/test assignment (80/10/10) by"
    " multiplicative hash — reproducible across runs, engines, and"
    " re-shuffles of the input (unlike randomSplit, whose assignment"
    " depends on partitioning). Computed in modular form"
    " (((doc_id % 100) * 61) % 100 == (doc_id * 2654435761) % 100 by"
    " modular arithmetic) so the intermediate never exceeds 100^2 —"
    " the naive int64 product wraps for doc_id >~ 3.5e9, silently in"
    " Spark and as an error in ANSI/DuckDB. Evaluates in the codegen"
    " stage over the scan: zero shuffle, the split of a 100 TB corpus"
    " costs one map-only pass.",
)
def dataset_split(spark, sf):
    d = _t(spark, sf, "documents")
    h = ((F.col("doc_id") % 100) * 61) % 100
    return d.select(
        "doc_id",
        "lang",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
        .alias("split"),
    )


@_q(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, tok,
             SUM(tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id,
           CAST(tok AS BIGINT) AS n_tokens,
           CAST((cum - tok) // 2048 AS BIGINT) AS bin_id,
           CAST((cum - tok) % 2048 AS BIGINT) AS bin_offset
    FROM c
    """,
    "Sequence packing for training shards: concatenate the corpus in"
    " doc_id order and chop into fixed 2048-token bins — each doc gets"
    " the bin and offset where it starts (docs may straddle bins, like"
    " pretraining concat-and-chunk). The global running sum is a"
    " DISTRIBUTED two-phase prefix-sum, not a single-partition window:"
    " per-range-bucket local cumsums (window partitioned by bucket)"
    " plus bucket base offsets from a bucket-count-sized cumulative"
    " join — an orderBy-only window would serialize the whole corpus"
    " through one task at 100 TB. Measured scaling (local[32],"
    " key-shifted replication of sf0.1): base 0.47s / 5k docs, 10x"
    " 1.40s / 50k, 100x 6.08s / 500k — 4.3x time for the last 10x of"
    " data, i.e. sublinear all the way (fixed stage overhead still"
    " amortizing).",
)
def pack_sequences(spark, sf):
    d = _t(spark, sf, "documents")
    # Bucket width scales with corpus size so the phase-1 bucket table
    # stays ~thousands of rows at any scale (a FIXED width would grow
    # it linearly until its ordered window became a single-task
    # bottleneck). Any width yields the same global cumsum, so the
    # output — and oracle parity — is width-invariant.
    n_docs = d.count()
    width = max(100, n_docs // 4096)
    t = d.select(
        "doc_id",
        F.expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
        .alias("tok"),
        (F.col("doc_id") / width).cast("long").alias("bkt"),
    )
    # phase 1: per-bucket totals -> cumulative base offset per bucket
    # (bucket table is |docs|/100 rows; its own ordered window is tiny)
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        t.groupBy("bkt")
        .agg(F.sum("tok").alias("btok"))
        .withColumn("base", F.coalesce(F.sum("btok").over(wb), F.lit(0)))
        .select("bkt", "base")
    )
    # phase 2: local cumsum within each bucket + broadcast base join
    wl = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        t.withColumn("lcum", F.sum("tok").over(wl))
        .join(F.broadcast(bases), "bkt")
        .withColumn("cum", F.col("base") + F.col("lcum"))
    )
    start = F.col("cum") - F.col("tok")
    return cum.select(
        "doc_id",
        F.col("tok").cast("long").alias("n_tokens"),
        (start / 2048).cast("long").alias("bin_id"),
        (start % 2048).cast("long").alias("bin_offset"),
    )


@_q(
    "quality_filter_gate",
    f"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             {_TOKS_DD} AS toks
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             ROUND(CASE WHEN n = 0 THEN 0.0 ELSE alpha * 1.0 / n END, 6)
               AS alpha_ratio,
             len(toks) AS n_tokens,
             COALESCE(ROUND(len(list_distinct(toks)) * 1.0
                            / nullif(len(toks), 0), 4), 0.0) AS uniq_frac
      FROM t
    )
    SELECT doc_id,
           (n_tokens >= 10 AND n_tokens <= 100000
            AND alpha_ratio >= 0.5 AND uniq_frac >= 0.2) AS keep,
           CASE WHEN n_tokens < 10 THEN 'too_short'
                WHEN n_tokens > 100000 THEN 'too_long'
                WHEN alpha_ratio < 0.5 THEN 'low_alpha'
                WHEN uniq_frac < 0.2 THEN 'repetitive'
                ELSE 'ok' END AS reason
    FROM sig
    """,
    "The keep/drop decision a curation pipeline actually materializes:"
    " length, alpha-ratio and distinct-token-fraction rules composed"
    " into a boolean gate plus a first-failing-rule reason column (for"
    " drop-rate dashboards per reason). Single scan, one tokenizer"
    " pass, no shuffle — the map-only filter stage in front of every"
    " training-shard writer.",
)
def quality_filter_gate(spark, sf):
    d = _t(spark, sf, "documents")
    sig = d.withColumn("__toks", F.expr(_TOKS)).select(
        "doc_id",
        alpha_ratio_expr("text").alias("alpha_ratio"),
        F.expr("size(__toks)").alias("n_tokens"),
        F.coalesce(
            F.round(
                F.expr("size(array_distinct(__toks))") * F.lit(1.0)
                / F.nullif(F.expr("size(__toks)"), F.lit(0)),
                4,
            ),
            F.lit(0.0),
        ).alias("uniq_frac"),
    )
    nt, ar, uf = F.col("n_tokens"), F.col("alpha_ratio"), F.col("uniq_frac")
    return sig.select(
        "doc_id",
        ((nt >= 10) & (nt <= 100000) & (ar >= 0.5) & (uf >= 0.2))
        .alias("keep"),
        F.when(nt < 10, "too_short")
        .when(nt > 100000, "too_long")
        .when(ar < 0.5, "low_alpha")
        .when(uf < 0.2, "repetitive")
        .otherwise("ok")
        .alias("reason"),
    )


@_q(
    "bpe_merge_pairs",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ), t2 AS (
      SELECT tok FROM toks WHERE length(tok) >= 2
    ), pos AS (
      SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
      FROM t2
    )
    SELECT substr(tok, CAST(i AS INT), 2) AS pair,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 50
    """,
    "BPE merge-candidate mining: the first iteration of byte-pair"
    " encoding — count every adjacent symbol pair across the token"
    " stream (occurrence-weighted, which is exactly the"
    " frequency-weighted pair count BPE training uses) and rank the"
    " top merges. This is the corpus-wide statistics pass a tokenizer"
    " trainer runs before each merge; at 100 TB it is the expensive"
    " step, so the plan matters: tokenization and pair expansion are"
    " one map-only JVM projection (regexp_extract_all + a"
    " higher-order transform over sequence(1, len-1) — no Python"
    " workers, no intermediate shuffle), and the single shuffle is"
    " the pair hash-aggregate, which map-side combines into at most"
    " 26x26 partial rows per task before anything moves. The top-50"
    " is a TakeOrdered over the <=676-row aggregate. Ties rank"
    " lexicographically so the cut is engine-deterministic. Measured"
    " at 100x replication of sf0.1 (local[32]): 9.9s over 500k docs"
    " (~0.9 GB of text expanded to ~1.4B pairs) — pure scan+combine"
    " throughput, no shuffle growth.",
)
def bpe_merge_pairs(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    pairs = d.select(
        F.explode(
            F.expr(
                "flatten(transform("
                " filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
                "        t -> length(t) >= 2),"
                " tok -> transform(sequence(1, length(tok) - 1),"
                "                  i -> substring(tok, i, 2))))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(50)
    )


@_q(
    "domain_mix_temperature",
    """
    WITH c AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), m AS (SELECT MIN(cnt) AS m FROM c)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               ::UBIGINT % 1000000 AS DOUBLE) / 1000000
          < sqrt(CAST(m.m AS DOUBLE) / c.cnt)
    """,
    "Temperature-based language rebalancing (alpha = 0.5): keep each"
    " doc of language l with probability (cnt_l / min_cnt)^(alpha-1)"
    " = sqrt(min/cnt) — the published multilingual sampling move"
    " (mT5/XLM-R style) that INTERPOLATES between the raw mix"
    " (alpha=1) and domain_mix_rebalance's full equalization"
    " (alpha->0): high-resource languages are downsampled"
    " sub-linearly so they still contribute more data, low-resource"
    " ones keep everything. Deterministic md5 coin per doc (same"
    " doc -> same verdict across runs/engines, the sample_weighted"
    " pattern); the keep threshold is sqrt of an int64 ratio — one"
    " correctly-rounded IEEE division + sqrt, so both engines compute"
    " the identical double and the comparison is hash-exact. Plan:"
    " the per-language count frame (|langs| rows) and the 1-row min"
    " broadcast onto a map-only filter — the fact table never"
    " shuffles; at 100 TB this is scan-speed like the equalizing"
    " form. Measured at 100x replication of sf0.1 (local[32]): 8.0s"
    " over 500k docs -> 407k kept.",
)
def domain_mix_temperature(spark, sf):
    d = _t(spark, sf, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    draw = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) % 1000000"
        ).cast("double")
        / 1000000
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(m))
        .filter(
            draw < F.sqrt(F.col("m").cast("double") / F.col("cnt"))
        )
        .select("doc_id", "lang")
    )


@_q(
    "upsample_epochs",
    """
    WITH c AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), m AS (SELECT MAX(cnt) AS mx FROM c)
    SELECT d.doc_id, d.lang,
           CAST(e.epoch AS BIGINT) AS epoch
    FROM documents d
    JOIN c ON d.lang = c.lang
    CROSS JOIN m,
    LATERAL unnest(generate_series(1,
        LEAST(4, (m.mx + c.cnt - 1) // c.cnt))) AS e(epoch)
    """,
    "Deterministic minority oversampling — the complement of the"
    " downsampling entries: low-resource languages are replicated"
    " ceil(max_cnt / cnt) times (capped at 4 epochs, the published"
    " practice bound beyond which repetition stops helping) so every"
    " language approaches the head language's volume, and each"
    " replica carries an explicit epoch index so shard writers and"
    " dedup stay aware of intentional repetition. All arithmetic is"
    " integer ((mx + cnt - 1) / cnt is exact ceil-division in int64),"
    " so the replication factors are hash-exact across engines. Plan:"
    " the |langs|-row count frame and 1-row max broadcast onto a"
    " map-only explode(sequence(...)) — a controlled fan-out"
    " projection, never a shuffle; at 100 TB output volume is the"
    " only cost and it is bounded by 4x the input. Measured at 100x"
    " replication of sf0.1 (local[32]): 4.2s, 500k docs -> 1.09M"
    " replicas.",
)
def upsample_epochs(spark, sf):
    d = _t(spark, sf, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    m = counts.agg(F.max("cnt").alias("mx"))
    epochs = F.least(
        F.lit(4).cast("long"),
        F.expr("(mx + cnt - 1) div cnt"),
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(m))
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), epochs)).alias(
                "epoch"
            ),
        )
    )


@_q(
    "shard_manifest",
    f"""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             len({_TOKS_DD}) AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::UBIGINT % 64 AS BIGINT) AS shard_id,
             CAST(('0x' || substr(md5(concat_ws('|',
                    CAST(doc_id AS VARCHAR), lang,
                    CAST(n_chars AS VARCHAR))), 1, 15))::UBIGINT
               AS BIGINT) AS row_hash
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
           bit_xor(row_hash) AS content_checksum
    FROM s GROUP BY shard_id ORDER BY shard_id
    """,
    "Shard manifest: the accounting artifact a training-shard writer"
    " emits next to the data — per-shard doc count, char and token"
    " totals (the training-budget units downstream schedulers read),"
    " and an order-independent XOR-folded content checksum (the"
    " integrity_checksum fold, per shard) so a re-run or a replica"
    " can prove shard-level bit equality without rereading payloads."
    " Shard assignment is the deterministic md5 route (same doc ->"
    " same shard across runs, the global_shuffle_order key family),"
    " 64 shards here, sized by corpus/target-file-size in production."
    " Plan: one map-only projection (token count, row hash, shard"
    " route fused into the scan) and ONE 64-group hash aggregate with"
    " map-side partials — at 100 TB this is the scan plus a"
    " 64-row reduce; XOR's commutativity makes the checksum"
    " independent of row order and partial-aggregation layout."
    " Measured at 100x replication of sf0.1 (local[32]): 8.6s over"
    " 500k docs -> 64 manifest rows.",
)
def shard_manifest(spark, sf):
    d = _t(spark, sf, "documents")
    s = d.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) % 64"
        ).alias("shard_id"),
        F.col("n_chars"),
        F.size(F.expr(_TOKS)).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(conv(substr(md5(concat_ws('|', CAST(doc_id AS STRING),"
            " lang, CAST(n_chars AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("row_hash"),
    )
    return (
        s.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
            F.expr("bit_xor(row_hash)").alias("content_checksum"),
        )
        .orderBy("shard_id")
    )


@_q(
    "k_anonymity_audit",
    """
    WITH klass AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour_bucket,
             CAST(floor(value) AS BIGINT) AS value_band,
             COUNT(*) AS sz
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS risky_classes,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           ROUND(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1.0
                 / SUM(sz), 6) AS risk_fraction
    FROM klass
    GROUP BY event_type
    ORDER BY event_type
    """,
    "k-anonymity audit (k=5) — the verification twin of"
    " anonymize_events: after generalization, every"
    " (type, hour-bucket, value-band) quasi-identifier equivalence"
    " class should hold >= k rows, or its members are re-identifiable"
    " by joining the published coarsened table against outside"
    " knowledge. Reports per event type the class count, classes"
    " below k, rows exposed in them, and the at-risk fraction — the"
    " numbers a privacy review signs off on before a corpus ships."
    " Plan: two stacked hash aggregates (the class-size frame, then a"
    " |types|-row rollup of it), both map-side combined; the integer"
    " CASE sums make every column exact, and the one float (the"
    " fraction) is a single rounded division. At 100 TB the class"
    " frame is bounded by the generalization grid, not row volume —"
    " coarser bands mean a smaller audit frame, the same knob that"
    " raises k. Measured at 100x replication of sf0.1 (local[32]):"
    " 7.4s over 10M events.",
)
def k_anonymity_audit(spark, sf):
    e = _t(spark, sf, "events")
    klass = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.floor("value").cast("long").alias("value_band"),
    ).agg(F.count("*").alias("sz"))
    risky = F.when(F.col("sz") < 5, F.col("sz")).otherwise(F.lit(0))
    return (
        klass.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
            .cast("long")
            .alias("risky_classes"),
            F.sum(risky).cast("long").alias("rows_at_risk"),
            F.round(F.sum(risky) * 1.0 / F.sum("sz"), 6).alias(
                "risk_fraction"
            ),
        )
        .orderBy("event_type")
    )


@_q(
    "negative_sampling",
    """
    WITH np AS (SELECT COUNT(*) AS n FROM part),
    pos AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    cand AS (
      SELECT c.c_custkey, i,
             CAST(('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)
                   || ':' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT
                  % np.n AS BIGINT) AS neg_partkey
      FROM customer c
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i)
      CROSS JOIN np
    ),
    neg AS (
      SELECT c_custkey, i, neg_partkey,
             ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY i)
               AS slot
      FROM cand
      WHERE NOT EXISTS (SELECT 1 FROM pos
                        WHERE pos.o_custkey = cand.c_custkey
                          AND pos.l_partkey = cand.neg_partkey)
    )
    SELECT c_custkey, CAST(slot AS BIGINT) AS slot, neg_partkey
    FROM neg WHERE slot <= 4
    """,
    "Deterministic negative sampling for recommender / retrieval"
    " training pairs: for every customer, 4 parts they have NEVER"
    " purchased, drawn by an md5 coin over the contiguous part-key"
    " domain and anti-joined against the positive (customer, part)"
    " set — the standard contrastive-training data generator, made"
    " reproducible across runs, engines, and partitionings (rand()-"
    " based samplers are none of these). 8 candidates are drawn so"
    " collisions with positives still leave 4 survivors (a customer"
    " whose basket covers > 4 of the 8 draws keeps fewer — honest,"
    " deterministic truncation, never a resample loop). Plan: the"
    " positive set is ONE distinct (cust, part) shuffle off the"
    " orders-lineitem join; candidates are a map-only 8-way explode"
    " over customer with a broadcast one-row part count; the"
    " anti-join shuffles candidates on the SAME (cust, part) key; the"
    " final slot window sees <= 8 rows per customer. Measured at 100x"
    " replication of sf0.1 (local[32]): 54.3s for 6M emitted pairs —"
    " output-bound plus the distinct (cust, part) shuffle over 60M"
    " lineitems.",
)
def negative_sampling(spark, sf):
    np_ = _t(spark, sf, "part").agg(F.count("*").alias("n"))
    pos = (
        _t(spark, sf, "orders")
        .join(
            _t(spark, sf, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    cand = (
        _t(spark, sf, "customer")
        .select(
            "c_custkey",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"),
        )
        .crossJoin(F.broadcast(np_))
        .select(
            "c_custkey",
            "i",
            (
                F.expr(
                    "CAST(conv(substring(md5(CAST(c_custkey AS STRING)"
                    " || ':' || CAST(i AS STRING)), 1, 8), 16, 10)"
                    " AS BIGINT)"
                )
                % F.col("n")
            ).alias("neg_partkey"),
        )
    )
    neg = cand.join(
        pos,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("neg_partkey") == F.col("l_partkey")),
        "left_anti",
    )
    w = Window.partitionBy("c_custkey").orderBy("i")
    return (
        neg.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= 4)
        .select(
            "c_custkey",
            F.col("slot").cast("long").alias("slot"),
            "neg_partkey",
        )
    )


@_q(
    "dataset_split_time",
    """
    SELECT event_id, user_id, event_type, ts,
           CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00'
                THEN 'train' ELSE 'test' END AS split
    FROM events
    WHERE ts < TIMESTAMP '2024-01-22 00:00:00'
       OR ts >= TIMESTAMP '2024-01-24 00:00:00'
    """,
    "Time-based train/test split with a 2-day EMBARGO gap: train is"
    " everything before the cutoff, test starts only after the"
    " embargo, and rows inside the gap are dropped — the forecasting-"
    " eval split rule (hash splits like dataset_split leak temporal"
    " signal: a model trained on Monday's rows must not be tested on"
    " Monday's neighbors when labels/features carry multi-day memory,"
    " the de Prado purged-split argument). Completes the split"
    " family: dataset_split (hash), dataset_split_leakproof"
    " (content-canonical), this (temporal). Map-only, zero shuffle,"
    " both predicates pushed to the scan; timestamp literals compare"
    " at microsecond precision identically in both engines. Measured"
    " at 100x replication of sf0.1 (local[32]): 49.2s for 9.3M"
    " emitted rows — pure output materialization.",
)
def dataset_split_time(spark, sf):
    ev = _t(spark, sf, "events")
    cut = F.lit("2024-01-22 00:00:00").cast("timestamp")
    resume = F.lit("2024-01-24 00:00:00").cast("timestamp")
    return ev.filter(
        (F.col("ts") < cut) | (F.col("ts") >= resume)
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(F.col("ts") < cut, "train").otherwise("test").alias(
            "split"
        ),
    )


@_q(
    "distinct_ngram_ratio",
    f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKS_DD}) AS w,
             generate_subscripts({_TOKS_DD}, 1) AS pos
      FROM documents
    ),
    big AS (
      SELECT a.source, a.w || ' ' || b.w AS bigram
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(DISTINCT bigram) AS BIGINT) AS distinct_bigrams,
           ROUND(COUNT(DISTINCT bigram) * 1.0 / COUNT(*), 6)
             AS distinct_ratio
    FROM big GROUP BY source
    """,
    "Distinct-bigram ratio per source — the corpus-level DIVERSITY"
    " metric (distinct-n, the self-BLEU complement) that flags"
    " template-generated or mode-collapsed feeds: a source whose"
    " bigram stream is mostly repeats scores near 0, natural text"
    " near 1. quality_repetition scores each DOC's internal"
    " repetition; this scores each FEED's cross-document diversity —"
    " the signal that catches a thousand distinct-looking documents"
    " all stamped from one template. Plan: tokenization is one"
    " map-only JVM projection; bigrams come from a positional"
    " self-join co-keyed on doc_id (never a corpus-wide pair join);"
    " the distinct aggregate shuffles on (source, bigram) with"
    " map-side partials. The Spark side builds bigrams with a"
    " zero-join array zip: the token array is materialized ONCE per"
    " row and the slice/transform indexes it — inlining the regex"
    " into the lambda re-ran it 3x per row (measured 26.7s; the"
    " single-tokenization form is 9.8s at 100x replication of sf0.1,"
    " local[32], the (source, bigram) distinct shuffle over ~100M"
    " bigrams being the remaining cost). The SQL twin reproduces the"
    " zip with a positional self-join.",
)
def distinct_ngram_ratio(spark, sf):
    d = _t(spark, sf, "documents")
    # materialize the token array ONCE per row; the zip then indexes
    # it instead of re-running the regex per lambda reference
    toked = d.select("source", F.expr(_TOKS).alias("toks"))
    bigrams = F.expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        " (w, i) -> concat(w, ' ', toks[i + 1]))"
    )
    big = toked.select(
        "source", F.explode(bigrams).alias("bigram")
    )
    return big.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.count_distinct("bigram").cast("long").alias("distinct_bigrams"),
        F.round(
            F.count_distinct("bigram") * 1.0 / F.count("*"), 6
        ).alias("distinct_ratio"),
    )
