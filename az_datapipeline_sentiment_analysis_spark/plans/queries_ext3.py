"""Round-5 second widening: sequence analytics, token accounting,
distribution diagnostics.

Registers into the shared ``REGISTRY`` (imported at the bottom of
``queries.py``). The batch covers the remaining north-star text
operator (BPE-ish token counting — the budget unit every training-data
pipeline reports in), event-sequence analytics the reference's Grafana
read path implies (transition matrices, OHLC rollups, rolling active
users — applications/applications.tf:135-145), and two distribution
diagnostics (per-group entropy, chi-square independence) that a
curation pass runs before committing to a domain mix.

Conventions (round-4 lessons, see SURVEY §2.3): every integer
aggregate in oracle SQL is CAST to BIGINT (DuckDB SUM/COUNT windows
return HUGEINT which renders float64 through fetchdf), and every
ROUNDed float that can be zero gets ``+ 0.0`` on both engines to
collapse IEEE signed zero. Everything is JVM-side built-ins — no
Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import spread as _sp
from ..catalog import table as _t
from .queries import _q


# =====================================================================
# BPE-ish token counting (training-budget accounting)
# =====================================================================

# GPT-2-style pre-tokenizer shape, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookaround, no backrefs. Order matters — alternation is first-match
# in both engines.
_BPE_PAT = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s"


@_q(
    "token_bpe_count",
    """
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
             AS ws_tokens,
           CAST(length(regexp_extract_all(text,
             '{pat}')) AS BIGINT) AS bpe_tokens,
           CASE WHEN length(regexp_extract_all(text, '{pat}')) = 0
                THEN NULL
                ELSE ROUND(CAST(n_chars AS DOUBLE)
                     / length(regexp_extract_all(text, '{pat}')), 4)
                     + 0.0
           END AS chars_per_tok
    FROM documents
    """.replace("{pat}", _BPE_PAT.replace("'", "''")),
    "Token counting with a whitespace baseline and a BPE-ish"
    " pre-tokenizer regex (GPT-2 shape: contractions, letter runs,"
    " digit runs, punctuation runs, single whitespace) — the unit"
    " every training-data budget is denominated in. The pattern uses"
    " only constructs with identical semantics in Java regex and RE2"
    " so the oracle is exact. chars-per-token is the compression"
    " diagnostic curation dashboards track per source. Map-only —"
    " one scan, zero shuffles, linear at any corpus size; regexp_count"
    " is codegen'd JVM work, no Python workers. Measured at 100x"
    " replication of sf0.1 (local[32]): 3.8s for 500k docs.",
)
def token_bpe_count(spark, sf):
    d = _t(spark, sf, "documents")
    bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PAT))
    return d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit(r"\S+"))
        .cast("long")
        .alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.when(bpe == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("n_chars").cast("double") / bpe, 4) + F.lit(0.0)
        )
        .alias("chars_per_tok"),
    )


# =====================================================================
# Event-type Markov transition matrix
# =====================================================================

@_q(
    "markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    cells AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
             PARTITION BY prev_type) AS DOUBLE), 6) + 0.0 AS p
    FROM cells
    """,
    "First-order Markov transition matrix over per-user event"
    " sequences: LAG pairs each event with its predecessor, a"
    " co-keyed group-by counts (prev, next) cells, and the row-"
    " normalized probability comes from a window over the"
    " |event_types|^2-row cell frame (25 rows here — the windowed"
    " normalization runs on the POST-aggregate frame, never the raw"
    " stream). One shuffle on user_id shared by the sort and nothing"
    " else; the cell aggregation is map-side-combined into a tiny"
    " frame. The sessionize_events partitioning would be reusable"
    " here on a warm exchange. Measured at 100x replication of sf0.1"
    " (local[32]): 2.3s over 10M events.",
)
def markov_transitions(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cells = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return cells.select(
        "prev_type",
        "next_type",
        "n",
        (
            F.round(
                F.col("n").cast("double")
                / F.sum("n").over(wp).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("p"),
    )


# =====================================================================
# Hourly OHLC bars (open/high/low/close time-series rollup)
# =====================================================================

@_q(
    "ohlc_bars",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bar_hour,
           ROUND(arg_min(value, epoch_ms(ts) * 1000000 + event_id), 4)
             + 0.0 AS open,
           ROUND(MAX(value), 4) + 0.0 AS high,
           ROUND(MIN(value), 4) + 0.0 AS low,
           ROUND(arg_max(value, epoch_ms(ts) * 1000000 + event_id), 4)
             + 0.0 AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    "Hourly OHLC bars per event type — the classic time-series"
    " downsample behind every metrics dashboard. Open/close are"
    " argmin/argmax over a composite (epoch-millis, event_id) int64"
    " ordering key (ms * 1e6 + id keeps lexicographic order exact"
    " while event_id < 1e6; larger id domains widen the multiplier),"
    " so the bar is deterministic even under equal timestamps. ONE"
    " hash aggregate — min_by/max_by/min/max/count all fold into the"
    " same partial+final pass, no window, no sort, no second scan;"
    " cardinality out is types x hours, bounded regardless of row"
    " count. Measured at 100x replication of sf0.1 (local[32]): 1.2s"
    " over 10M events.",
)
def ohlc_bars(spark, sf):
    e = _t(spark, sf, "events")
    ordk = F.unix_millis("ts") * F.lit(1_000_000) + F.col("event_id")
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bar_hour"))
        .agg(
            (F.round(F.min_by("value", ordk), 4) + F.lit(0.0)).alias("open"),
            (F.round(F.max("value"), 4) + F.lit(0.0)).alias("high"),
            (F.round(F.min("value"), 4) + F.lit(0.0)).alias("low"),
            (F.round(F.max_by("value", ordk), 4) + F.lit(0.0)).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


# =====================================================================
# Per-group label-distribution entropy (domain-mix diagnostic)
# =====================================================================

@_q(
    "entropy_by_group",
    """
    WITH lc AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    shares AS (
      SELECT source, n,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY source)
               AS DOUBLE) AS p
      FROM lc
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(SUM(-p * log2(p)), 6) + 0.0 AS lang_entropy
    FROM shares
    GROUP BY source
    """,
    "Shannon entropy of the language distribution within each source"
    " — the domain-mix diagnostic a curation pass reports before"
    " rebalancing (domain_mix_rebalance is the acting twin; this is"
    " the measuring one). Two stacked aggregations: the raw scan"
    " collapses to a (source, lang) count frame (map-side combined,"
    " one shuffle), and the entropy reduction runs entirely on that"
    " tiny frame. A single-language source yields -(1*log2(1)) ="
    " IEEE -0.0 — exactly the render hazard class round 4 exposed —"
    " so both engines append + 0.0.",
)
def entropy_by_group(spark, sf):
    d = _t(spark, sf, "documents")
    lc = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    ws = Window.partitionBy("source")
    p = F.col("n").cast("double") / F.sum("n").over(ws).cast("double")
    terms = lc.select(
        "source", "n", (-p * F.log2(p)).alias("term")
    )
    return terms.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_langs"),
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("lang_entropy"),
    )


# =====================================================================
# Chi-square independence test (segment x region contingency)
# =====================================================================

@_q(
    "chi2_independence",
    """
    WITH obs AS (
      SELECT c_mktsegment AS segment, n.n_regionkey AS regionkey,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c_mktsegment, n.n_regionkey
    ),
    m AS (
      SELECT segment, regionkey, obs,
             CAST(SUM(obs) OVER (PARTITION BY segment) AS BIGINT) AS rs,
             CAST(SUM(obs) OVER (PARTITION BY regionkey) AS BIGINT) AS cs,
             CAST(SUM(obs) OVER () AS BIGINT) AS n
      FROM obs
    )
    SELECT segment, regionkey, obs,
           ROUND(CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS expected,
           ROUND(
             POW(CAST(obs AS DOUBLE) - CAST(rs AS DOUBLE)
                 * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE), 2)
             / (CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE)
                / CAST(n AS DOUBLE)), 6) + 0.0 AS chi2_cell
    FROM m
    """,
    "Pearson chi-square independence cells for the market-segment x"
    " region contingency (the A/B-test / drift-detection primitive):"
    " observed counts from ONE broadcast-joined aggregate over the"
    " fact table, then expected counts and per-cell chi-square"
    " contributions derived from the segments x regions cell frame"
    " ITSELF via windows (the margins are re-aggregations of the 25"
    " cells — no second scan of customer). The test statistic is"
    " SUM(chi2_cell) with (|seg|-1)(|reg|-1) dof; cells are emitted"
    " so the oracle checks every intermediate, not one opaque scalar."
    " Expected/chi2 arithmetic is pinned to double-by-double in both"
    " engines (BIGINT margins would otherwise go HUGEINT in DuckDB)."
    " Measured at 100x replication of sf0.1 (local[32]): 3.2s.",
)
def chi2_independence(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    obs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_regionkey").alias("regionkey"),
        )
        .agg(F.count("*").alias("obs"))
    )
    rs = F.sum("obs").over(Window.partitionBy("segment")).cast("double")
    cs = F.sum("obs").over(Window.partitionBy("regionkey")).cast("double")
    tot = F.sum("obs").over(
        Window.partitionBy()
    ).cast("double")
    exp = rs * cs / tot
    return obs.select(
        "segment",
        "regionkey",
        "obs",
        F.round(exp, 6).alias("expected"),
        (
            F.round(
                F.pow(F.col("obs").cast("double") - exp, 2) / exp, 6
            )
            + F.lit(0.0)
        ).alias("chi2_cell"),
    )


# =====================================================================
# Rolling 7-day active users (sliding distinct over time)
# =====================================================================

@_q(
    "rolling_wau",
    """
    WITH days AS (
      SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    ),
    ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT d.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN ud ON ud.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    "Rolling 7-day active users per calendar day — the sliding"
    " COUNT(DISTINCT) that naive SQL writes as a distinct-over-range-"
    " window (quadratic state, unbounded at scale). The scale-safe"
    " rewrite: collapse the stream to distinct (user, day) pairs"
    " (bounded by users x days, map-side combined), EXPLODE each pair"
    " into the <=7 future days it keeps the user active for"
    " (sequence + explode, a fixed x7 expansion of the already-tiny"
    " frame), semi-join against observed days so synthetic trailing"
    " days vanish, then one count-distinct per day. Every shuffle"
    " runs on user x day cardinality, never raw events; the same"
    " shape computes MAU with a 30-wide kernel. Same first-touch"
    " philosophy as cumulative_distinct_users: rewrite the windowed"
    " distinct into set algebra the engine can partial-aggregate."
    " Measured at 100x replication of sf0.1 (local[32]): 6.6s over"
    " 10M events / 1.5M users.",
)
def rolling_wau(spark, sf):
    e = _t(spark, sf, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("interval 6 days"),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


# =====================================================================
# Welch's t-test (one-vs-rest per region: the A/B significance shape)
# =====================================================================

@_q(
    "welch_ttest",
    """
    WITH cells AS (
      SELECT n.n_regionkey AS regionkey, c.c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(AVG(c.c_acctbal), 6) AS m,
             ROUND(var_samp(c.c_acctbal), 4) AS v
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, c.c_mktsegment
    ),
    tot AS (
      SELECT regionkey, segment, n, m, v,
             CAST(SUM(n) OVER (PARTITION BY regionkey) AS BIGINT) - n
               AS n2,
             ROUND((SUM(n * m) OVER (PARTITION BY regionkey) - n * m)
               / (SUM(n) OVER (PARTITION BY regionkey) - n), 6) AS m2,
             ROUND((SUM((n - 1) * v + n * m * m) OVER (
                     PARTITION BY regionkey)
                    - ((n - 1) * v + n * m * m)
                    - (SUM(n * m) OVER (PARTITION BY regionkey) - n * m)
                      * (SUM(n * m) OVER (PARTITION BY regionkey)
                         - n * m)
                      / (SUM(n) OVER (PARTITION BY regionkey) - n))
                   / (SUM(n) OVER (PARTITION BY regionkey) - n - 1),
                   4) AS v2
      FROM cells
    )
    SELECT regionkey, segment, n, m, v, n2, m2, v2,
           ROUND((m - m2) / sqrt(v / n + v2 / n2), 6) + 0.0 AS t_stat,
           ROUND(POW(v / n + v2 / n2, 2)
                 / (POW(v / n, 2) / (n - 1)
                    + POW(v2 / n2, 2) / (n2 - 1)), 4) + 0.0 AS dof
    FROM tot
    """,
    "Welch's unequal-variance t-test, one segment vs the rest of its"
    " region, over customer account balances — the A/B-significance"
    " primitive next to chi2_independence's categorical test. ONE"
    " broadcast-joined aggregate collapses the fact table to 25"
    " (region, segment) moment cells; the complement group's"
    " mean/variance come from the pooled-moments identity over that"
    " cell frame (windows on 25 rows — customer is scanned once)."
    " Cross-engine float discipline: cell means/variances are rounded"
    " FIRST on both engines, then t and the Welch-Satterthwaite dof"
    " are deterministic functions of identical quantized inputs — no"
    " compounding of last-ulp aggregate dust through the division."
    " Measured at 100x replication of sf0.1 (local[32]): 3.9s.",
)
def welch_ttest(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 6).alias("m"),
            F.round(F.var_samp("c_acctbal"), 4).alias("v"),
        )
    )
    w = Window.partitionBy("regionkey")
    nn = F.col("n")
    sum_n = F.sum("n").over(w)
    sum_nm = F.sum(nn * F.col("m")).over(w)
    # pooled sum of squares: (n-1)v + n m^2 reconstructs each cell's
    # raw sum-of-squares from its quantized moments
    ss_cell = (nn - 1) * F.col("v") + nn * F.col("m") * F.col("m")
    sum_ss = F.sum(ss_cell).over(w)
    n2 = sum_n - nn
    s2 = sum_nm - nn * F.col("m")  # complement sum of values
    m2 = F.round(s2 / n2, 6)
    v2 = F.round((sum_ss - ss_cell - s2 * s2 / n2) / (n2 - 1), 4)
    se2 = F.col("v") / nn + F.col("v2") / F.col("n2")
    return (
        cells.select(
            "regionkey", "segment", "n", "m", "v",
            n2.alias("n2"), m2.alias("m2"), v2.alias("v2"),
        )
        .select(
            "*",
            (
                F.round(
                    (F.col("m") - F.col("m2")) / F.sqrt(se2), 6
                )
                + F.lit(0.0)
            ).alias("t_stat"),
            (
                F.round(
                    F.pow(se2, 2)
                    / (
                        F.pow(F.col("v") / F.col("n"), 2) / (F.col("n") - 1)
                        + F.pow(F.col("v2") / F.col("n2"), 2)
                        / (F.col("n2") - 1)
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("dof"),
        )
    )


# =====================================================================
# Day-of-week seasonality profile
# =====================================================================

@_q(
    "dow_seasonality",
    """
    WITH cells AS (
      SELECT event_type, isodow(ts) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value) AS s
      FROM events GROUP BY event_type, isodow(ts)
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow, n,
           ROUND(s / n, 4) AS avg_value,
           ROUND((s / n) / (SUM(s) OVER (PARTITION BY event_type)
                            / SUM(n) OVER (PARTITION BY event_type)),
                 4) + 0.0 AS seasonal_index
    FROM cells
    """,
    "Day-of-week seasonality profile per event type: each (type, ISO"
    " weekday) cell's average value expressed as an index against the"
    " type's overall weighted average (1.0 = flat week) — the"
    " pre-forecasting diagnostic every metrics pipeline runs. The"
    " overall average is reconstructed from the 35-cell frame's own"
    " sums via windows, so the raw stream is aggregated exactly once;"
    " ISO weekday (Spark weekday()+1 == DuckDB isodow) avoids the"
    " engines' conflicting Sunday-origin conventions. Measured at"
    " 100x replication of sf0.1 (local[32]): 1.3s over 10M events.",
)
def dow_seasonality(spark, sf):
    e = _t(spark, sf, "events")
    cells = e.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    w = Window.partitionBy("event_type")
    overall = F.sum("s").over(w) / F.sum("n").over(w)
    return cells.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "n",
        F.round(F.col("s") / F.col("n"), 4).alias("avg_value"),
        (
            F.round((F.col("s") / F.col("n")) / overall, 4) + F.lit(0.0)
        ).alias("seasonal_index"),
    )


# =====================================================================
# Interval-overlap join (sessions x incident windows, bucketed form)
# =====================================================================

@_q(
    "interval_overlap_join",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN (epoch_us(ts) // 1000000)
                       - (epoch_us(LAG(ts) OVER w) // 1000000) <= 1800
                  THEN 0 ELSE 1 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    ), sessions AS (
      SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_no
    ), hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE event_type = 'error'
      GROUP BY date_trunc('hour', ts)
    ), incidents AS (
      SELECT hr FROM hourly
      QUALIFY cnt * (COUNT(*) OVER ()) * 10 >= 13 * (SUM(cnt) OVER ())
    )
    SELECT s.user_id, s.session_no,
           CAST(SUM(
             LEAST((epoch_us(s.s_end) // 1000000),
                   (epoch_us(i.hr) // 1000000) + 3600)
             - GREATEST((epoch_us(s.s_start) // 1000000),
                        (epoch_us(i.hr) // 1000000))
           ) AS BIGINT) AS overlap_s,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM sessions s
    JOIN incidents i
      ON LEAST((epoch_us(s.s_end) // 1000000),
               (epoch_us(i.hr) // 1000000) + 3600)
         - GREATEST((epoch_us(s.s_start) // 1000000),
                    (epoch_us(i.hr) // 1000000)) > 0
    WHERE (epoch_us(s.s_end) // 1000000) > (epoch_us(s.s_start) // 1000000)
    GROUP BY s.user_id, s.session_no
    """,
    "Interval x interval overlap join: per user session, the seconds"
    " spent inside system 'incident windows' (hours whose error count"
    " is >= 1.3x the active-hour mean, integer-exact cross-multiplied"
    " threshold — scale-invariant like heavy_hitters). The textbook"
    " form is a non-equi theta join (start < end' AND start' < end),"
    " which Spark can only execute as a broadcast-nested-loop; the"
    " scale-safe rewrite here BUCKETS time: each session explodes into"
    " the calendar hours it spans (gap-30min sessions span few hours,"
    " a bounded expansion), the incident set keys by the same hour,"
    " and the overlap becomes an EQUI-join on the bucket plus exact"
    " integer-second arithmetic per bucket — shuffle-partitionable on"
    " both sides at any scale, where the theta join is quadratic."
    " Zero-length (single-event) sessions are excluded — an instant"
    " has no duration to attribute. All overlap math is int64 epoch"
    " seconds: no float render hazard exists in this query. Measured"
    " at 100x replication of sf0.1 (local[32], 48g driver): 10.2s"
    " over 10M events -> 45.9k overlapping sessions (the shared"
    " sessionization sort dominates; the bucket join adds little).",
)
def interval_overlap_join(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_s = F.when(gap_s <= 1800, F.lit(0)).otherwise(F.lit(1))
    sess_no = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        e.select("user_id", "ts", "event_id", sess_no.alias("session_no"))
        .groupBy("user_id", F.col("session_no").cast("long").alias("session_no"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
        .filter(F.col("s_end").cast("long") > F.col("s_start").cast("long"))
    )
    hourly = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("cnt"))
    )
    wall = Window.partitionBy()
    incidents = hourly.withColumn(
        "__keep",
        F.col("cnt") * F.count("*").over(wall) * 10
        >= 13 * F.sum("cnt").over(wall),
    ).filter(F.col("__keep")).select("hr")
    spanned = sessions.select(
        "user_id",
        "session_no",
        F.col("s_start").cast("long").alias("a"),
        F.col("s_end").cast("long").alias("b"),
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("interval 1 hour"),
            )
        ).alias("hr"),
    )
    ov = F.least(F.col("b"), F.col("hr").cast("long") + 3600) - F.greatest(
        F.col("a"), F.col("hr").cast("long")
    )
    # per-bucket positive-overlap filter: a session ending exactly on
    # an hour boundary spans that bucket with 0 seconds inside it.
    # Bucket membership is DEFINED in truncated (floor-epoch-second)
    # arithmetic on both engines — events carry microseconds, and a
    # full-precision theta condition would admit a bucket the
    # truncated overlap rounds to zero (session ending 0.3s into an
    # incident hour), so the oracle joins on the same truncated
    # LEAST/GREATEST overlap > 0 rather than the raw theta predicate
    return (
        spanned.join(incidents, "hr")
        .withColumn("__ov", ov)
        .filter(F.col("__ov") > 0)
        .groupBy("user_id", "session_no")
        .agg(F.sum("__ov").alias("overlap_s"), F.count("*").alias("n_hours"))
    )


# =====================================================================
# Theta-sketch set algebra (audience overlap via mergeable partials)
# =====================================================================

@_q(
    "sketch_theta_setops",
    """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1996)
    SELECT
      CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_1995,
      CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_1996,
      CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
        AS BIGINT) AS n_union,
      CAST((SELECT COUNT(*) FROM a WHERE o_custkey IN (SELECT * FROM b))
        AS BIGINT) AS n_both,
      CAST((SELECT COUNT(*) FROM a WHERE o_custkey NOT IN (SELECT * FROM b))
        AS BIGINT) AS n_only_1995
    """,
    "Audience-overlap set algebra on Theta sketches: distinct buyers"
    " of 1995 vs 1996, their union, intersection, and difference —"
    " the retention/overlap question COUNT(DISTINCT) cannot answer"
    " from pre-aggregated partials (distinct counts don't compose;"
    " sketches do). Built TWO-LEVEL to prove mergeability: per-month"
    " theta partials are first aggregated (the daily-rollup shape a"
    " 100 TB pipeline materializes), then theta_union_agg merges each"
    " year's 12 partials, and the set operators run sketch-vs-sketch"
    " — the fact table is scanned once, and every reaggregation"
    " moves only fixed-size sketch bytes, never raw keys. In exact"
    " mode (lgK=16, 65536 retained hashes — sized so every test"
    " scale stays exact) all five counts hash-match the"
    " DuckDB set-algebra oracle; above capacity the identical plan"
    " returns bounded-error estimates.",
)
def sketch_theta_setops(spark, sf):
    o = _t(spark, sf, "orders")
    # level 1: per-(year, month) partial sketches — one fact scan
    monthly = (
        o.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.expr("theta_sketch_agg(o_custkey, 16)").alias("sk"))
    )
    # level 2: merge each year's monthly partials into one sketch
    yearly = monthly.groupBy("yr").agg(
        F.expr("theta_union_agg(sk, 16)").alias("sk")
    )
    # collapse the 2-row yearly frame to one row with conditional
    # first() aggregates — two filter branches would fork the lineage
    # and scan orders twice (plan-guarded against)
    pair = yearly.agg(
        F.first(F.when(F.col("yr") == 1995, F.col("sk")), ignorenulls=True)
        .alias("sk_a"),
        F.first(F.when(F.col("yr") == 1996, F.col("sk")), ignorenulls=True)
        .alias("sk_b"),
    )
    return pair.select(
        F.expr("theta_sketch_estimate(sk_a)").cast("long").alias("n_1995"),
        F.expr("theta_sketch_estimate(sk_b)").cast("long").alias("n_1996"),
        F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b, 16))")
        .cast("long")
        .alias("n_union"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
        .cast("long")
        .alias("n_both"),
        F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
        .cast("long")
        .alias("n_only_1995"),
    )


# =====================================================================
# Text-lines source (log-file ingest shape)
# =====================================================================

_TEXT_STAGED: dict[str, str] = {}


@_q(
    "scan_text_lines",
    """
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           split_part(text, ' ', 1) AS first_token
    FROM documents
    """,
    "Line-oriented text source (the log-file / JSONL-adjacent ingest"
    " shape, reference S18's rawest landing format): documents staged"
    " once as tab-separated lines, read back with spark.read.text and"
    " parsed with ONE split into typed columns. Text files are"
    " splittable, so the read parallelizes by byte range at any file"
    " size; like CSV this is ingest-only at 100 TB — no pruning or"
    " pushdown exists, so bronze rewrites to parquet immediately."
    " The tab separator is safe by corpus construction (word-soup"
    " text, no tabs); a production parser would quarantine malformed"
    " lines like scan_json_corrupt does.",
)
def scan_text_lines(spark, sf):
    import tempfile

    path = _TEXT_STAGED.get(sf)
    if path is None:
        path = tempfile.mkdtemp(prefix="sg_text_docs_")
        _t(spark, sf, "documents").select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("lang"),
                F.col("text"),
            ).alias("value")
        ).coalesce(1).write.mode("overwrite").text(path)
        _TEXT_STAGED[sf] = path
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 3)
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        F.length(parts.getItem(2)).cast("long").alias("n_chars"),
        F.split_part(parts.getItem(2), F.lit(" "), F.lit(1)).alias(
            "first_token"
        ),
    )


# =====================================================================
# KLL quantile sketch merging (two-level rollup)
# =====================================================================

@_q(
    "sketch_kll_merge",
    """
    SELECT event_type,
           quantile_disc(value, 0.25) AS q25,
           quantile_disc(value, 0.5) AS q50,
           quantile_disc(value, 0.75) AS q75
    FROM events GROUP BY event_type
    """,
    "Two-level KLL quantile rollup: per-(type, day) sketch partials"
    " (the daily materialization a 100 TB metrics pipeline stores)"
    " merged with kll_merge_agg_double into per-type sketches, then"
    " probed for quartiles — proving quantile MERGEABILITY, the"
    " property percentile/ntile lack and the reason the daily rollup"
    " can answer monthly quantiles without rescanning raw data."
    " k=32768 retains every test-scale group outright (largest type"
    " group at sf0.1 is ~20k values), so the merged quartiles are"
    " exact data values hash-matching quantile_disc; beyond capacity"
    " the identical plan degrades to ~1%% rank error with O(k) state"
    " per group. Reaggregation moves only sketch bytes, never raw"
    " values.",
)
def sketch_kll_merge(spark, sf):
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.expr("kll_sketch_agg_double(value, 32768)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.expr("kll_merge_agg_double(sk, 32768)").alias("sk")
    )
    return merged.select(
        "event_type",
        F.expr("kll_sketch_get_quantile_double(sk, 0.25)").alias("q25"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("q50"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.75)").alias("q75"),
    )


# =====================================================================
# Train/test split leakage check (canonical-fingerprint cross-split)
# =====================================================================

@_q(
    "split_leakage_check",
    """
    WITH s AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp,
             CASE WHEN ((doc_id % 100) * 61) % 100 < 80 THEN 'train'
                  WHEN ((doc_id % 100) * 61) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_test
    FROM s
    GROUP BY fp
    HAVING COUNT(DISTINCT split) >= 2
    """,
    "Train/test leakage audit: documents whose CANONICAL form (the"
    " bag-of-words fingerprint — sorted distinct tokens, order- and"
    " repetition-insensitive) lands in more than one split of"
    " dataset_split's deterministic 80/10/10 assignment. Exact-string"
    " dedup misses permuted near-copies, which is exactly how eval"
    " contamination ships; this is the audit run between splitting"
    " and shard-writing. One map-only fingerprint pass, one shuffle"
    " on the fingerprint (the same partitioning exact dedup uses) —"
    " the leaked set is output, small by construction. The MinHash"
    " pair graph (minhash_neardup) is the recall-heavier rows-only"
    " big sibling; this entry is the fully oracle-checked exact-"
    " canonical tier. Measured at 100x replication of sf0.1"
    " (local[32]): 8.0s over 500k docs -> 129 leaked groups.",
)
def split_leakage_check(spark, sf):
    d = _t(spark, sf, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
            " ",
        )
    )
    h = ((F.col("doc_id") % 100) * 61) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    s = d.select(fp.alias("fp"), split.alias("split"))
    return (
        s.groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("split").alias("n_splits"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .alias("n_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
            .alias("n_val"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .alias("n_test"),
        )
        .filter(F.col("n_splits") >= 2)
    )


# =====================================================================
# Weighted median (integer-exact cumulative weight selection)
# =====================================================================

@_q(
    "weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT flag,
           ROUND(MIN(price), 4) AS wmedian,
           CAST(MIN(tot) AS BIGINT) AS total_weight
    FROM w
    WHERE 2 * cum >= tot
    GROUP BY flag
    """,
    "Quantity-weighted median price per return flag: the order"
    " statistic where half the total WEIGHT (not half the rows) lies"
    " on each side — the robust 'typical traded price' a plain median"
    " misrepresents when line sizes vary. The naive form (one"
    " cumulative window per flag) has parallelism = |flags| = 3:"
    " measured 112s at 100x replication (60M rows through 3 sort"
    " tasks) — a genuine scale-killer. This implementation is the"
    " distributed two-phase SELECTION instead: (1) one hash aggregate"
    " builds per-(flag, price-bucket) weight sums (a tiny frame), a"
    " cumulative pass over that frame finds the single bucket"
    " containing the weighted median and the integer weight"
    " accumulated BEFORE it; (2) only that bucket's rows (~1/1024 of"
    " the data) are window-sorted to finish the sweep. Selection"
    " arithmetic is integer-exact end to end (int64 quantities,"
    " threshold 2*(before+cum) >= tot), so the chosen row — and the"
    " oracle parity — are identical to the naive form at any scale;"
    " bucket edges are float but only route rows, monotonically, so"
    " they cannot change the selected element. Measured at 100x:"
    " 20.9s vs the naive form's 112s (5.4x; remaining cost is the"
    " two fact scans + the routing broadcast join).",
)
def weighted_median(spark, sf):
    NB = 1024  # price buckets per flag; phase-2 sorts ~1/NB of rows
    li = _t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    # bucket edges per flag (3-row broadcast). Edges are float but only
    # ROUTE rows into monotone buckets — equal prices always share a
    # bucket, so the integer selection below is unaffected by edge
    # rounding.
    stats = li.groupBy("flag").agg(
        F.min("price").alias("lo"), F.max("price").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / NB
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(1)).otherwise(
        F.least(
            F.lit(NB),
            F.floor((F.col("price") - F.col("lo")) / width).cast("int") + 1,
        )
    )
    fact = li.join(F.broadcast(stats), "flag").withColumn("b", bucket)
    # phase 1: per-bucket weight sums (tiny frame), cumulative sweep to
    # locate the bucket holding the weighted median
    bw = fact.groupBy("flag", "b").agg(F.sum("qty").alias("w"))
    wc = Window.partitionBy("flag").orderBy("b")
    cumw = F.sum("w").over(
        wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("w").over(Window.partitionBy("flag"))
    marked = bw.select(
        "flag", "b", "w", cumw.alias("cumw"), tot.alias("tot")
    ).filter(2 * F.col("cumw") >= F.col("tot"))
    target = marked.groupBy("flag").agg(
        F.min("b").alias("tb"),
        F.min("tot").alias("tot"),
        # weight accumulated strictly before the target bucket
        (F.min_by(F.col("cumw") - F.col("w"), F.col("b"))).alias("before"),
    )
    # phase 2: window-sort ONLY the target bucket's rows
    tgt = target.select(
        F.col("flag").alias("tflag"), "tb", "tot", "before"
    )
    sel = fact.join(
        F.broadcast(tgt),
        (F.col("flag") == F.col("tflag")) & (F.col("b") == F.col("tb")),
    ).select("flag", "price", "qty", "ok", "ln", "tot", "before")
    wo = Window.partitionBy("flag").orderBy("price", "ok", "ln")
    local = F.sum("qty").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sel.withColumn("cum", F.col("before") + local)
        .filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.round(F.min("price"), 4).alias("wmedian"),
            F.min("tot").alias("total_weight"),
        )
    )


# =====================================================================
# Last-touch attribution (carry-forward over per-user timelines)
# =====================================================================

@_q(
    "attribution_last_touch",
    """
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS prior_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN ts END IGNORE NULLS)
               OVER w AS prior_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN prior_ts IS NOT NULL
                 AND (epoch_us(ts) // 1000 - epoch_us(prior_ts) // 1000)
                     <= 3600000
                THEN prior_type END AS channel,
           CASE WHEN prior_ts IS NOT NULL
                 AND (epoch_us(ts) // 1000 - epoch_us(prior_ts) // 1000)
                     <= 3600000
                THEN CAST((epoch_us(ts) // 1000 - epoch_us(prior_ts) // 1000)
                     AS BIGINT) END AS ms_since
    FROM marked
    WHERE event_type = 'purchase'
    """,
    "Last-touch attribution: each purchase credits the user's most"
    " recent non-purchase event within the prior hour (its type ="
    " the channel, plus the latency in integer milliseconds; NULL"
    " when no touch exists inside the window). Two last(ignorenulls)"
    " carries share ONE window frame ending at 1 PRECEDING (the"
    " purchase cannot attribute to itself), so the physical plan is"
    " a single sort per user_id hash partition — the same"
    " one-shuffle shape as sessionize_events, and the carried state"
    " is two registers regardless of timeline length. The 1h cutoff"
    " is applied AFTER the carry in integer epoch-ms arithmetic,"
    " identical in both engines. Measured at 100x replication of"
    " sf0.1 (local[32], 48g driver): 12.6s over 10M events -> 2.0M"
    " attributed purchases (r6 re-measure; r5 recorded 20.1s).",
)
def attribution_last_touch(spark, sf):
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nonp_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    nonp_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(nonp_type, ignorenulls=True).over(w).alias("prior_type"),
        F.last(nonp_ts, ignorenulls=True).over(w).alias("prior_ts"),
    ).filter(F.col("event_type") == "purchase")
    ms = F.unix_millis("ts") - F.unix_millis("prior_ts")
    in_window = F.col("prior_ts").isNotNull() & (ms <= 3_600_000)
    return marked.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_window, F.col("prior_type")).alias("channel"),
        F.when(in_window, ms).cast("long").alias("ms_since"),
    )


# =====================================================================
# Rare-category collapse (feature-prep cardinality control)
# =====================================================================

@_q(
    "group_rare_collapse",
    """
    WITH freq AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN f.n * 20 >= f.total THEN d.lang
                ELSE 'OTHER' END AS lang_collapsed
    FROM documents d JOIN freq f ON d.lang = f.lang
    """,
    "Rare-category collapse: languages holding < 5% of the corpus"
    " fold into 'OTHER' — the cardinality-control step before"
    " one-hot/embedding feature prep, where tail categories add"
    " parameters without signal. The threshold is scale-invariant"
    " and integer-exact (n * 20 >= total — no float share, so no"
    " rounding boundary exists at any corpus size). One aggregate"
    " produces the language frequency frame (vocabulary-sized), the"
    " verdict broadcasts back onto the corpus, and the rewrite"
    " itself is map-only — the same broadcast-stats shape as"
    " unigram_logprob. Measured at 100x replication of sf0.1"
    " (local[32]): 3.2s over 500k docs.",
)
def group_rare_collapse(spark, sf):
    d = _t(spark, sf, "documents")
    freq = d.groupBy(F.col("lang").alias("fl")).agg(
        F.count("*").alias("n")
    )
    tot = freq.select(F.sum("n").alias("total"))
    freq = freq.crossJoin(F.broadcast(tot))
    return (
        d.join(F.broadcast(freq), d.lang == freq.fl)
        .select(
            "doc_id",
            "lang",
            F.when(F.col("n") * 20 >= F.col("total"), F.col("lang"))
            .otherwise(F.lit("OTHER"))
            .alias("lang_collapsed"),
        )
    )


# =====================================================================
# Group-mean imputation (co-keyed stats join, sibling of LOCF)
# =====================================================================

@_q(
    "impute_mean_group",
    """
    WITH stats AS (
      SELECT user_id, AVG(value) AS mean_valid
      FROM events WHERE event_type <> 'error'
      GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           ROUND(CASE WHEN e.event_type = 'error' THEN s.mean_valid
                      ELSE e.value END, 4) + 0.0 AS value_filled,
           CAST(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END
             AS BIGINT) AS was_imputed
    FROM events e LEFT JOIN stats s ON e.user_id = s.user_id
    """,
    "Group-mean imputation: 'error' readings (the missing-value"
    " convention locf_impute established) are replaced by the user's"
    " mean over valid readings — the order-independent sibling of"
    " LOCF, for features where temporal carry-forward is wrong. The"
    " per-user stats frame is user-cardinality-sized, so unlike the"
    " 5-row broadcasts elsewhere it joins CO-KEYED on user_id (at"
    " 100 TB a users-sized frame does not broadcast; both sides"
    " hash-partition on the same key and the join adds no extra"
    " fact shuffle beyond that partitioning). LEFT join keeps users"
    " with no valid readings (filled stays NULL, honestly missing)."
    " Measured at 100x replication of sf0.1 (local[32], 48g driver):"
    " 31.4s — output-bound like sessionize_events (all 10M rows"
    " materialize to the driver; the join itself is a small fraction).",
)
def impute_mean_group(spark, sf):
    e = _t(spark, sf, "events")
    stats = (
        e.filter(F.col("event_type") != "error")
        .groupBy(F.col("user_id").alias("su"))
        .agg(F.avg("value").alias("mean_valid"))
    )
    j = e.join(stats, e.user_id == stats.su, "left")
    filled = F.when(
        F.col("event_type") == "error", F.col("mean_valid")
    ).otherwise(F.col("value"))
    return j.select(
        "event_id",
        "user_id",
        (F.round(filled, 4) + F.lit(0.0)).alias("value_filled"),
        F.when(F.col("event_type") == "error", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("was_imputed"),
    )


# =====================================================================
# Time-range window frame (rolling last-hour stats per event)
# =====================================================================

@_q(
    "win_time_range",
    """
    SELECT event_id, event_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(SUM(value) OVER w, 4) + 0.0 AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "Per-event trailing-hour statistics via a TIME-range window frame"
    " (RANGE BETWEEN 3600 PRECEDING, ordered by integer epoch"
    " seconds) — the 'how busy was the last hour at this moment'"
    " per-row signal that tumbling bars cannot give. RANGE frames"
    " bound by VALUE distance, so bursty minutes widen the row set;"
    " equal-timestamp peers are included identically in both engines"
    " by RANGE semantics. The naive plan partitions the window by"
    " event_type alone — parallelism = |types| = 5, measured 81.7s"
    " at 100x replication (2M-row timelines through 5 sort tasks),"
    " the same low-cardinality pathology weighted_median's naive"
    " form had. This implementation uses the BOUNDED-HISTORY bucket"
    " rewrite instead: rows partition by (type, day), and each day's"
    " final hour is duplicated into the NEXT day's partition as"
    " context-only carry rows — exactly the history a 3600s frame"
    " can reach across the boundary — so every frame is complete"
    " inside its bucket, context rows are dropped after the sweep,"
    " and parallelism scales with types x days (with the calendar,"
    " i.e. with the data). Measured at 100x: 50.7s vs 81.7s naive"
    " — and the residual is materializing the 10M result rows (the"
    " sessionize collect-bound class), while the sort itself now"
    " spreads across types x days tasks instead of 5.",
)
def win_time_range(spark, sf):
    e = _t(spark, sf, "events").select(
        "event_id", "event_type", "value",
        F.col("ts").cast("long").alias("sec"),
        F.date_trunc("day", "ts").alias("__bucket"),
    )
    main = e.withColumn("__ctx", F.lit(0))
    # carry-in: each day's final hour is ALSO visible to the next
    # day's early frames; duplicate exactly those rows forward as
    # context (evaluated in frames, never emitted)
    carry = (
        e.filter(
            F.col("sec")
            >= F.col("__bucket").cast("long") + 86400 - 3600
        )
        .withColumn(
            "__bucket", F.col("__bucket") + F.expr("interval 1 day")
        )
        .withColumn("__ctx", F.lit(1))
    )
    w = (
        Window.partitionBy("event_type", "__bucket")
        .orderBy("sec")
        .rangeBetween(-3600, 0)
    )
    return (
        main.unionByName(carry)
        .select(
            "event_id",
            "event_type",
            "__ctx",
            F.count("*").over(w).cast("long").alias("n_last_hour"),
            (F.round(F.sum("value").over(w), 4) + F.lit(0.0)).alias(
                "sum_last_hour"
            ),
        )
        .filter(F.col("__ctx") == 0)
        .drop("__ctx")
    )


# =====================================================================
# Top session paths (ordered event-sequence mining)
# =====================================================================

@_q(
    "session_paths_topk",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN (epoch_us(ts) // 1000000)
                       - (epoch_us(LAG(ts) OVER w) // 1000000) <= 1800
                  THEN 0 ELSE 1 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sno
      FROM flagged
    ), capped AS (
      SELECT * FROM sess
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, sno
                                 ORDER BY ts, event_id) <= 64
    ), paths AS (
      SELECT user_id, sno,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM capped GROUP BY user_id, sno
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths
    WHERE path LIKE '%>%'
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    "Top multi-step session paths: the gap-30min sessions"
    " (sessionize_events' exact rule) rendered as ordered"
    " 'view>click>purchase' strings and ranked by frequency — the"
    " path-analysis staple behind every product-analytics funnel"
    " explorer. Single-event sessions are filtered (no transition ="
    " no path). EVERYTHING shares the one user_id partitioning:"
    " session flagging, numbering, and the ordered path assembly"
    " (array_sort over (ts, event_id, type) structs makes the"
    " within-session order explicit and engine-stable, matching"
    " DuckDB's ORDER BY inside string_agg); only the final tiny"
    " path-frequency frame reshuffles. Sessions are TRUNCATED to"
    " their first 64 events BEFORE the per-session collect — an"
    " always-active bot whose events never gap 30 minutes would"
    " otherwise accumulate one corpus-spanning array in a single"
    " task; the row_number cap runs on the same user_id shuffle"
    " (partition subset => no new exchange) so per-session state is"
    " bounded by the cap, and the gap rule compares floor-epoch"
    " seconds on both engines (events carry microseconds). Top-k"
    " ties break on the path string, so the LIMIT is deterministic"
    " across engines. Measured at 100x replication of sf0.1"
    " (local[32]): 7.5s over 10M events (the shared sessionization"
    " sort dominates, as in interval_overlap_join).",
)
def session_paths_topk(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_s = F.when(gap_s <= 1800, F.lit(0)).otherwise(F.lit(1))
    sess_no = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = e.select(
        "user_id", "ts", "event_id", "event_type",
        sess_no.alias("sno"),
    )
    # bound per-session state: keep only each session's first 64
    # events. partitionBy(user_id, sno) is a superset of the existing
    # user_id clustering, so this window adds a within-partition sort
    # but NO new shuffle; the later collect_list array is then capped
    # at 64 entries per group regardless of pathological users.
    wcap = Window.partitionBy("user_id", "sno").orderBy("ts", "event_id")
    sess = sess.withColumn("__rn", F.row_number().over(wcap)).filter(
        F.col("__rn") <= 64
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    paths = (
        sess.groupBy("user_id", "sno")
        .agg(F.array_join(ordered, ">").alias("path"))
        .filter(F.col("path").contains(">"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# =====================================================================
# Pareto frontier (dominance test as sort + running max)
# =====================================================================

@_q(
    "pareto_frontier",
    """
    SELECT p.p_brand AS brand, p.p_partkey AS partkey,
           ROUND(p.p_retailprice, 4) AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part y
      WHERE y.p_brand = p.p_brand
        AND y.p_retailprice <= p.p_retailprice
        AND y.p_size >= p.p_size
        AND (y.p_retailprice < p.p_retailprice OR y.p_size > p.p_size)
    )
    """,
    "Per-brand Pareto frontier of (cheaper, bigger): parts no other"
    " part of the brand dominates on both axes — the skyline query"
    " behind best-tradeoff pickers. The textbook form is the NOT"
    " EXISTS self-join (quadratic per brand, the oracle keeps it);"
    " the engine rewrite is sort + running max: collapse to one row"
    " per (brand, price) carrying the max size at that price, sweep"
    " prices ascending with a ROWS-frame running max ending at 1"
    " PRECEDING (one row per distinct price makes the strictly-"
    " cheaper set a row frame — no value-offset trickery), then a"
    " part is frontier iff its size beats every strictly-cheaper"
    " price's best AND ties its own price's best. Equal (price,"
    " size) duplicates survive together, matching the strict"
    " dominance definition. Cost: one (brand, price) aggregate, a"
    " per-brand sort of DISTINCT prices, one co-keyed join back —"
    " linearithmic where the naive form is quadratic.",
)
def pareto_frontier(spark, sf):
    p = _t(spark, sf, "part")
    per_price = p.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("price"),
    ).agg(F.max("p_size").alias("pmax"))
    w = (
        Window.partitionBy("brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = per_price.select(
        "brand",
        "price",
        "pmax",
        F.max("pmax").over(w).alias("cheaper_best"),
    )
    j = p.join(
        marked,
        (p.p_brand == marked.brand) & (p.p_retailprice == marked.price),
    )
    return (
        j.filter(
            (F.col("p_size") == F.col("pmax"))
            & (
                F.col("cheaper_best").isNull()
                | (F.col("p_size") > F.col("cheaper_best"))
            )
        )
        .select(
            "brand",
            F.col("p_partkey").alias("partkey"),
            F.round("p_retailprice", 4).alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
    )


# =====================================================================
# Forward as-of join (next-touch) + exact decimal aggregation
# =====================================================================

@_q(
    "asof_join_forward",
    """
    SELECT p.event_id, MIN(c.ts) AS next_ts
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    "Forward as-of join: the EARLIEST click strictly after each"
    " purchase (does buying lead to more browsing?) — the"
    " next-touch twin of asof_join's nearest-prior lookup. Same"
    " union-and-carry plan (operators/asof.py:asof_join_forward)"
    " with the carry running over the FOLLOWING frame: both sides"
    " union, sort once per user_id partition, first(ignorenulls)"
    " pulls the next right-side timestamp back — one shuffle, while"
    " the naive range join + MIN the oracle uses is quadratic per"
    " key. Strict-inequality ties handled by side ordering, exactly"
    " like the backward twin.",
)
def asof_forward_q(spark, sf):
    from ..operators.asof import asof_join_forward

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join_forward(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        strict=True,
    )
    return out.select("event_id", "next_ts")


@_q(
    "agg_decimal_exact",
    """
    SELECT l_returnflag AS flag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS revenue_exact,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR)
             AS discount_amount_exact,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "Exact decimal money aggregation: prices fixed to DECIMAL(18,2)"
    " and discounts to DECIMAL(4,2) BEFORE summing, so the per-flag"
    " revenue and discount totals are exact integers-of-cents — no"
    " float summation-order dust exists at ANY scale or parallelism,"
    " which is why the outputs need no ROUND and render identically"
    " as strings in both engines (the doubles-based TPC-H twins"
    " round to 4 digits instead). Spark's decimal aggregate runs in"
    " Tungsten with overflow checking at precision 38; the partial/"
    " final split is exact by associativity of integer addition."
    " This is the bookkeeping-grade path a billing pipeline uses"
    " where q1_pricing_summary's float path is the analytics-grade"
    " one.",
)
def agg_decimal_exact(spark, sf):
    li = _t(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(price).cast("string").alias("revenue_exact"),
            F.sum(price * disc).cast("string").alias("discount_amount_exact"),
            F.count("*").alias("n"),
        )
    )


# =====================================================================
# Incremental view maintenance (delta-aggregation, no base rescan)
# =====================================================================

@_q(
    "incremental_view_maintenance",
    """
    WITH changes AS (
      SELECT c_custkey, 'D' AS op, CAST(NULL AS DOUBLE) AS new_acctbal
      FROM customer WHERE c_custkey % 100 < 5
      UNION ALL
      SELECT c_custkey, 'U', ROUND(c_acctbal + 1000.0, 2)
      FROM customer WHERE c_custkey % 100 BETWEEN 5 AND 9
      UNION ALL
      SELECT -100 - n_nationkey, 'I', CAST(n_nationkey AS DOUBLE) * 10
      FROM nation
    ),
    merged AS (
      SELECT s.c_custkey,
             CASE WHEN ch.op = 'U' THEN ch.new_acctbal
                  ELSE s.c_acctbal END AS acctbal,
             s.c_mktsegment AS segment
      FROM customer s LEFT JOIN changes ch ON s.c_custkey = ch.c_custkey
      WHERE ch.op IS NULL OR ch.op = 'U'
      UNION ALL
      SELECT c_custkey, new_acctbal, 'NEW'
      FROM changes WHERE op = 'I'
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           ROUND(SUM(CAST(ROUND(acctbal * 100, 0) AS BIGINT)) / 100.0
                 / COUNT(*), 4) + 0.0 AS avg_bal
    FROM merged
    GROUP BY segment
    """,
    "Incremental view maintenance: the per-segment gold aggregate"
    " (count, balance total in exact integer cents) is updated from"
    " the SAME deterministic I/U/D change batch cdc_apply uses —"
    " WITHOUT re-aggregating the merged snapshot. The Spark side"
    " computes base gold + per-segment DELTAS (deletes contribute"
    " -1/-old_cents from their before-image, updates +100000 cents"
    " each, inserts +1/+new_cents) and merges the two"
    " segment-cardinality frames with one outer join; the oracle"
    " aggregates the FULLY-MERGED snapshot, so the value hash"
    " PROVES the maintenance identity base+delta == recompute."
    " Integer-cents state makes the merge exact (no float"
    " accumulation to drift); counts/sums are the canonical"
    " self-maintainable aggregates — the same delta algebra"
    " maintains avg (derived) but NOT median, which is why gold"
    " views stick to decomposable aggregates. Cost: one base scan"
    " (amortized — the gold view persists in production), one"
    " change-batch pass, and a segment-sized join; the snapshot is"
    " never rescanned.",
)
def incremental_view_maintenance(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    base = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("key"),
        cents.alias("cents"),
    )
    # the persisted gold view (production keeps this materialized;
    # the one-time build scan is the only full-table read here)
    gold = base.groupBy("segment").agg(
        F.count("*").alias("n0"), F.sum("cents").alias("s0")
    )
    # per-segment deltas from the change batch + before-images
    d_del = (
        base.filter(F.col("key") % 100 < 5)
        .groupBy("segment")
        .agg(
            (-F.count("*")).alias("dn"),
            (-F.sum("cents")).alias("ds"),
        )
    )
    d_upd = (
        base.filter((F.col("key") % 100 >= 5) & (F.col("key") % 100 <= 9))
        .groupBy("segment")
        .agg(
            F.lit(0).cast("long").alias("dn"),
            (F.count("*") * 100000).alias("ds"),
        )
    )
    d_ins = n.groupBy(F.lit("NEW").alias("segment")).agg(
        F.count("*").alias("dn"),
        F.sum(F.col("n_nationkey").cast("long") * 1000).alias("ds"),
    )
    deltas = (
        d_del.unionByName(d_upd)
        .unionByName(d_ins)
        .groupBy("segment")
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
    )
    merged = gold.join(F.broadcast(deltas), "segment", "full_outer").select(
        "segment",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("s0", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias(
            "sum_cents"
        ),
    )
    return merged.filter(F.col("n") > 0).select(
        "segment",
        "n",
        "sum_cents",
        (
            F.round(F.col("sum_cents") / 100.0 / F.col("n"), 4) + F.lit(0.0)
        ).alias("avg_bal"),
    )


# =====================================================================
# Vocabulary coverage / OOV rate (tokenizer-fit diagnostic)
# =====================================================================

@_q(
    "vocab_oov_rate",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM tok WHERE term <> ''
      GROUP BY term
      ORDER BY COUNT(*) DESC, term
      LIMIT 50
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) + 0.0 AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.term = v.term
    WHERE t.term <> ''
    GROUP BY t.doc_id
    """,
    "Out-of-vocabulary rate per document against the corpus's own"
    " top-50 term vocabulary — the tokenizer-fit diagnostic run"
    " before committing to a vocab size (high OOV = wasted UNK"
    " tokens). The vocabulary is one term-frequency aggregate with a"
    " deterministic (count, term) tie-break, broadcast back onto the"
    " exploded token stream; the per-doc rollup shares the doc_id"
    " grouping with every other per-doc signal. At 100 TB the"
    " explode is the dominant cost and is map-side only — the same"
    " shape as vocab_topk/unigram_logprob, whose broadcast-stats"
    " pattern this completes.",
)
def vocab_oov_rate(spark, sf):
    d = _t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "term")
        .limit(50)
        .select(F.col("term").alias("vterm"))
    )
    j = tok.join(F.broadcast(vocab), tok.term == vocab.vterm, "left")
    oov = F.when(F.col("vterm").isNull(), 1).otherwise(0)
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(oov).alias("n_oov"),
        (
            F.round(F.sum(oov).cast("double") / F.count("*"), 6)
            + F.lit(0.0)
        ).alias("oov_rate"),
    )


# =====================================================================
# Cross-source duplication matrix (inter-source contamination)
# =====================================================================

@_q(
    "cross_source_overlap",
    """
    WITH fp AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS f
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
    FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    "Inter-source duplication matrix: for each source pair, how many"
    " canonical bag-of-words fingerprints (split_leakage_check's"
    " order/repetition-insensitive form) appear in BOTH — the"
    " source-level contamination report that decides which feeds are"
    " redundant before paying to process them. Distinct (source,"
    " fingerprint) pairs first (bounded by docs, map-side combined),"
    " then a self-join ON THE FINGERPRINT — candidate pairs exist"
    " only inside fingerprint groups, so the join is dedup-shaped,"
    " never |sources|x|docs| quadratic; the a.source < b.source"
    " predicate keeps each unordered pair once. Output is"
    " |sources|^2-bounded regardless of corpus size.",
)
def cross_source_overlap(spark, sf):
    d = _t(spark, sf, "documents")
    fp = d.select(
        "source",
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.split(F.col("text"), " "))
                ),
                " ",
            )
        ).alias("f"),
    ).distinct()
    a = fp.select(F.col("source").alias("source_a"), "f")
    b = fp.select(F.col("source").alias("source_b"), "f")
    return (
        a.join(b, "f")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_fingerprints"))
    )


# =====================================================================
# Order-fulfillment latency percentiles (join -> derive -> percentile)
# =====================================================================

@_q(
    "fulfillment_latency",
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', o.o_orderdate, MIN(l.l_shipdate))
               AS days_to_ship
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(median(days_to_ship), 4) AS p50_days,
           ROUND(quantile_cont(days_to_ship, 0.9), 4) AS p90_days,
           CAST(MAX(days_to_ship) AS BIGINT) AS max_days
    FROM lat
    GROUP BY priority
    """,
    "Order-fulfillment latency: days from order date to FIRST"
    " shipment per order, summarized as p50/p90/max per priority —"
    " the SLA dashboard behind reference S20's read workload. Two"
    " stacked aggregations: the orderkey-co-keyed join + MIN"
    " collapses lineitem to one latency row per order (the join and"
    " the first group-by share the orderkey partitioning — one fact"
    " shuffle), then the priority rollup runs on the orders-sized"
    " frame. Latencies are integer days (datediff), so the exact"
    " median/quantile interpolation is identical in both engines"
    " (the agg_median pairing); round 5 computes the p50/p90 with"
    " operators/quantiles' two-phase bucketed selection instead of"
    " the buffering exact-percentile aggregate, so per-task state is"
    " bounded even when the per-order frame is billions of rows;"
    " the per-order frame is persisted so the orderkey join runs"
    " once across the selection passes. 100x (60M lineitem, 48g"
    " driver): 19.9s (31.5s before the r6 broadcast-side swap).",
)
def fulfillment_latency(spark, sf):
    from ..operators.quantiles import exact_group_quantiles

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    # the per-order frame feeds multiple selection passes — persist so
    # the orderkey join runs once (MEMORY_AND_DISK, spills gracefully)
    lat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff("first_ship", "o_orderdate").alias("days_to_ship"),
        )
        .persist()
    )
    q = exact_group_quantiles(
        lat, "days_to_ship", {"p50_days": 0.5, "p90_days": 0.9},
        ["priority"],
        keep={"n_orders": "count", "max_days": "max"},
    )
    # exact_group_quantiles materializes eagerly, so the per-order
    # cache can be released before returning
    lat.unpersist()
    return q.select(
        "priority",
        "n_orders",
        F.round("p50_days", 4).alias("p50_days"),
        F.round("p90_days", 4).alias("p90_days"),
        F.col("max_days").cast("long").alias("max_days"),
    )


# =====================================================================
# Per-source duplication-rate report
# =====================================================================

@_q(
    "dup_rate_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(array_to_string(list_sort(
             list_distinct(string_split(text, ' '))), ' ')))
             AS BIGINT) AS n_canonical,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(array_to_string(
             list_sort(list_distinct(string_split(text, ' '))), ' ')))
             AS DOUBLE) / COUNT(*), 6) + 0.0 AS dup_rate
    FROM documents
    GROUP BY source
    """,
    "Per-source duplication report: documents vs distinct canonical"
    " bag-of-words fingerprints, and the implied duplication rate —"
    " the per-feed quality summary a curation pass publishes next to"
    " cross_source_overlap's pair matrix (that one says which feeds"
    " overlap; this one says how redundant each feed is internally)."
    " One count-distinct aggregate keyed on source (Expand +"
    " partial aggregation — the distinct is per fingerprint, bounded"
    " by docs); the fingerprint is computed map-side in the same"
    " pass. At 100 TB this is the cheap pre-screen that decides"
    " which sources are worth the full MinHash pass.",
)
def dup_rate_by_source(spark, sf):
    d = _t(spark, sf, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
            " ",
        )
    )
    return (
        d.select("source", fp.alias("f"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("f").alias("n_canonical"),
            (
                F.round(
                    1.0
                    - F.count_distinct("f").cast("double") / F.count("*"),
                    6,
                )
                + F.lit(0.0)
            ).alias("dup_rate"),
        )
    )


# =====================================================================
# Exact-k stratified sampling (deterministic hash ranking)
# =====================================================================

@_q(
    "sample_stratified_exact_k",
    """
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
    "Exactly-k-per-stratum sampling: 10 documents per language,"
    " selected by ranking on a deterministic md5 of the key — the"
    " 'fixed-size eval slice per language' draw that fractional"
    " sampling (sample_stratified) cannot promise (Bernoulli gives"
    " binomial counts). The hash makes the draw reproducible across"
    " runs, engines, and input order; the doc_id tie-break pins the"
    " md5-collision case. Physically one rank window per stratum"
    " hash partition, and Spark's WindowGroupLimit pushes the rk<=10"
    " cut below the shuffle, so each map task forwards at most k"
    " rows per stratum — the window never materializes a full"
    " stratum at 100 TB.",
)
def sample_stratified_exact_k(spark, sf):
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id", "lang", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= 10)
    )


# =====================================================================
# Time-weighted average (duration-weighted signal mean per user)
# =====================================================================

@_q(
    "time_weighted_average",
    """
    WITH seg AS (
      SELECT user_id, value,
             LEAD(epoch_us(ts) // 1000000) OVER w
               - (epoch_us(ts) // 1000000) AS dt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(dt) AS BIGINT) AS span_s,
           ROUND(SUM(value * dt) / SUM(dt), 4) + 0.0 AS twa
    FROM seg
    WHERE dt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dt) > 0
    """,
    "Time-weighted average of each user's signal: every reading"
    " holds until the next one, so its weight is the integer-second"
    " duration it was in force — the billing/metrics aggregation a"
    " plain AVG misstates whenever sampling is irregular (a value"
    " held for an hour counts 3600x one held for a second). LEAD"
    " over the per-user timeline supplies the holding duration (the"
    " final reading has none and is excluded, as are zero-span"
    " users); weights are int64 seconds so the weighted sum's only"
    " float is the value itself. One sort per user_id hash"
    " partition feeding a map-side-combined aggregate — the same"
    " single-shuffle class as sessionize_events.",
)
def time_weighted_average(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    dt = F.lead(sec).over(w) - sec
    seg = e.select("user_id", "value", dt.alias("dt")).filter(
        F.col("dt").isNotNull()
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dt").alias("span_s"),
            (
                F.round(
                    F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4
                )
                + F.lit(0.0)
            ).alias("twa"),
        )
        .filter(F.col("span_s") > 0)
    )


# =====================================================================
# Bidirectional nearest-event join (completes the as-of family)
# =====================================================================

@_q(
    "asof_join_nearest",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), prevt AS (
      SELECT p.event_id, MAX(c.ts) AS pts
      FROM p JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts < p.ts
      GROUP BY p.event_id
    ), nxt AS (
      SELECT p.event_id, MIN(c.ts) AS nts
      FROM p JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts > p.ts
      GROUP BY p.event_id
    )
    SELECT p.event_id,
           CASE WHEN nts IS NULL OR (pts IS NOT NULL AND
                     epoch_us(p.ts) - epoch_us(pts)
                     <= epoch_us(nts) - epoch_us(p.ts))
                THEN pts ELSE nts END AS near_ts,
           CAST(CASE WHEN nts IS NULL OR (pts IS NOT NULL AND
                     epoch_us(p.ts) - epoch_us(pts)
                     <= epoch_us(nts) - epoch_us(p.ts))
                THEN epoch_us(p.ts) - epoch_us(pts)
                ELSE epoch_us(nts) - epoch_us(p.ts) END AS BIGINT)
             AS near_dist_us
    FROM p LEFT JOIN prevt USING (event_id) LEFT JOIN nxt USING (event_id)
    """,
    "Bidirectional nearest-event join: for each purchase, the click"
    " nearest in time in EITHER direction (equidistant ties resolve"
    " to the prior click), with the exact distance in integer"
    " microseconds — completes the as-of family (backward r1,"
    " forward r5, nearest r6). operators/asof.py:asof_join_nearest"
    " runs BOTH carries in one pass: the tagged union shuffles once"
    " on user_id and the prior/next frames are two in-partition"
    " sorts over the same exchange (side-order flipped so equal-ts"
    " clicks are invisible to both strict frames) — one Exchange"
    " total, where the oracle's two range joins are quadratic per"
    " key. All distance arithmetic is int64 microseconds: no float"
    " render hazard. Measured at 100x replication of sf0.1"
    " (local[32]): 13.4s over 10M events -> 2.0M purchases, the"
    " same cost class as the one-directional twins.",
)
def asof_nearest_q(spark, sf):
    from ..operators.asof import asof_join_nearest

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join_nearest(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts"
    )
    return out.select("event_id", "near_ts", "near_dist_us")


# =====================================================================
# Triangle counting (degree-ordered wedge closure)
# =====================================================================

@_q(
    "graph_triangles",
    """
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT n, COUNT(*) AS dg FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
      ) GROUP BY n
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM e ab JOIN e bc ON ab.v = bc.u
                JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    w AS (SELECT SUM(dg * (dg - 1) // 2) AS wedges FROM deg)
    SELECT CAST(t AS BIGINT) AS n_triangles,
           CAST(wedges AS BIGINT) AS n_wedges,
           ROUND((3.0 * t) / wedges, 6) + 0.0 AS clustering
    FROM tri, w
    """,
    "Triangle count + global clustering coefficient of the part"
    " co-occurrence graph (same edge derivation as graph_pagerank /"
    " graph_degree_hist). The oracle closes wedges under the u<v ID"
    " ordering; the engine uses the DEGREE ordering (orient every"
    " edge from its lower-(degree, id) endpoint) — both count each"
    " triangle exactly once, but degree orientation bounds every"
    " node's out-degree by ~sqrt(m), so per-edge intersection work"
    " is O(m^1.5) worst case instead of the hub-quadratic blowup"
    " ID ordering suffers on power-law graphs — THE at-scale"
    " triangle algorithm (rank comparison is a struct"
    " (degree, id) Catalyst comparison, no UDF). Wedges close via"
    " per-edge intersection of bounded out-neighbor lists; the"
    " clustering coefficient 3*triangles/wedges comes from the"
    " bounded deg frame. All counts int64-exact. Measured"
    " (local[32], key-shifted replication of sf0.1): the first"
    " formulation enumerated wedges through a self-join + semi"
    " probe — 8.8s base / 208s at 10x, linear in the 1.48B wedges"
    " SHUFFLED twice; this adjacency-intersect form builds each"
    " node's sorted out-neighbor array once (state bounded by the"
    " orientation's ~sqrt(2m) out-degree cap — the reason the"
    " collect is safe), joins the two arrays onto every edge"
    " co-keyed, and counts array_intersect sizes JVM-side: the"
    " wedge set is never materialized or shuffled, only edges and"
    " m total list entries move. Same counts, measured base"
    " 8.8s -> 5.2s and 10x 208s -> 19.0s (11x). 100x (round 7,"
    " stride-shifted ids so the graph itself scales): 420.3s — the"
    " 22x step from 10x matches the ~m^1.5 degree-orientation bound"
    " (sqrt(10)*10 ~ 31 upper bound; wedge fan-out stays bounded,"
    " no hub blowup), where the unoriented wedge form's 1.48B-wedge"
    " quadratic would not have finished.",
)
def graph_triangles(spark, sf):
    und = _part_cooccurrence_edges(spark, sf)
    deg, tri = _oriented_triangle_count(und)
    wsum = deg.agg(
        F.sum((F.col("dg") * (F.col("dg") - 1) / 2).cast("long")).alias(
            "wedges"
        )
    )
    return tri.crossJoin(F.broadcast(wsum)).select(
        F.col("t").cast("long").alias("n_triangles"),
        F.col("wedges").cast("long").alias("n_wedges"),
        (
            F.round((F.lit(3.0) * F.col("t")) / F.col("wedges"), 6)
            + F.lit(0.0)
        ).alias("clustering"),
    )


def _part_cooccurrence_edges(spark, sf, edge_filter=None):
    """Distinct undirected (u < v) part co-occurrence edges — the graph
    every graph_* entry runs on. Shared with graph_triangles_approx.

    ``edge_filter`` (a Column over u/v) applies BEFORE the distinct:
    for a filter that is a pure function of (u, v) — the DOULION edge
    coin — filter and distinct commute, and filtering first shrinks
    the pair-dedup shuffle by the keep rate (the dominant cost of the
    edge derivation at scale: pairs enter the distinct once per
    co-occurring ORDER, not once per edge).

    The (l_orderkey, l_partkey) projection is deliberately NOT
    distinct'd before the self-join (optimization round 12): the
    final pair ``distinct`` subsumes it (same-order duplicate parts
    only re-emit pairs the dedup drops anyway, and a pure (u, v)
    edge_filter keeps/drops all copies together), so the output SET
    is identical while the inner distinct's full-width shuffle + two
    aggregate passes disappear — measured 59 993 500 distinct of
    60M raw rows at 100x (dup rate ~1e-4), i.e. it deduplicated
    nothing worth a shuffle. The self-join's one exchange on
    l_orderkey is planned once and reused for both sides.
    """
    li = _t(spark, sf, "lineitem")
    d = li.select("l_orderkey", "l_partkey")
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
    )
    if edge_filter is not None:
        pairs = pairs.filter(edge_filter)
    return pairs.distinct()


def _oriented_triangle_count(und):
    """(deg, tri): degree frame + one-row exact triangle count of the
    edge set via degree-ordered adjacency intersection (the
    graph_triangles plan, verbatim — shared by the DOULION twin so the
    sampled count uses the identical at-scale machinery)."""
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("dg"))
    )
    e1 = und.join(
        deg.select(F.col("n").alias("u"), F.col("dg").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("dg").alias("dv")), "v")
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = e1.select(
        F.when(ru < rv, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(ru < rv, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # out-neighbor lists under the degree orientation: array length is
    # capped by the orientation (every neighbor outranks the node, so
    # out-degree <= ~sqrt(2m)) — bounded state, unlike a raw
    # adjacency collect
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    per_edge = (
        oriented.join(
            adj.select(F.col("src").alias("u2"), F.col("nbrs").alias("nu")),
            F.col("src") == F.col("u2"),
        )
        .join(
            adj.select(F.col("src").alias("v2"), F.col("nbrs").alias("nv")),
            F.col("dst") == F.col("v2"),
            "left",
        )
        .select(
            F.coalesce(
                F.size(F.array_intersect("nu", "nv")), F.lit(0)
            ).alias("tc")
        )
    )
    return deg, per_edge.agg(F.sum("tc").alias("t"))


# =====================================================================
# CUSUM changepoint detection (recursion-free rewrite)
# =====================================================================

@_q(
    "anomaly_cusum",
    """
    WITH cells AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), z AS (
      SELECT event_type, hr, n,
             (n - AVG(n) OVER (PARTITION BY event_type))
               / stddev_samp(n) OVER (PARTITION BY event_type) AS z
      FROM cells
    ), c AS (
      SELECT event_type, hr, n,
             SUM(z - 0.5) OVER (PARTITION BY event_type ORDER BY hr
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM z
    ), s AS (
      SELECT event_type, hr, n,
             cum - LEAST(0.0, MIN(cum) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS UNBOUNDED PRECEDING)) AS s
      FROM c
    )
    SELECT event_type, hr, n,
           ROUND(s, 4) + 0.0 AS cusum,
           ROUND(s, 4) > 5.0 AS breach
    FROM s
    """,
    "One-sided CUSUM changepoint detector over hourly event volumes:"
    " standardize each (type, hour) count against the type's mean/"
    " stddev, then S_t = max(0, S_{t-1} + z_t - k) with slack k=0.5"
    " and alarm h=5. The recursion is NOT window-expressible, so"
    " both engines use the exact prefix identity S_t = C_t -"
    " min(0, min_{j<=t} C_j) with C the running sum of (z - k) —"
    " two stacked windows on the POST-aggregate cell frame (types x"
    " hours rows, never the raw stream; the same partitioning"
    " serves both, zero extra shuffles). The raw stream is touched"
    " by exactly one map-side-combined hash aggregate, so the plan"
    " is flat-cost at any event volume; every window runs on a"
    " frame bounded by the calendar. Measured at 100x replication"
    " of sf0.1 (local[32]): 6.4s over 10M events, aggregate-scan"
    " bound as designed.",
)
def anomaly_cusum(spark, sf):
    e = _t(spark, sf, "events")
    cells = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    wt = Window.partitionBy("event_type")
    z = (F.col("n") - F.mean("n").over(wt)) / F.stddev_samp("n").over(wt)
    wo = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = cells.select(
        "event_type", "hr", "n", F.sum(z - 0.5).over(wo).alias("cum")
    )
    s = c.select(
        "event_type",
        "hr",
        "n",
        (
            F.col("cum")
            - F.least(F.lit(0.0), F.min("cum").over(wo))
        ).alias("s"),
    )
    return s.select(
        "event_type",
        "hr",
        "n",
        (F.round("s", 4) + F.lit(0.0)).alias("cusum"),
        (F.round("s", 4) > 5.0).alias("breach"),
    )


# =====================================================================
# Document chunking (overlapping token windows, map-only)
# =====================================================================

@_q(
    "doc_chunking",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE CAST(CEIL((len(toks) - 64) / 48.0) AS BIGINT) + 1
             END AS nc
      FROM t
    ), e AS (
      SELECT doc_id, toks, n, unnest(range(0, nc)) AS ci FROM c
    )
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, ci * 48 + 1,
                               least(ci * 48 + 64, n))) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(list_slice(toks, ci * 48 + 1,
                                          least(ci * 48 + 64, n)), ' '))
             AS chunk_md5
    FROM e
    """,
    "Overlapping-window document chunking (window 64 tokens, stride"
    " 48 => 16-token overlap): the map every RAG index and"
    " long-document pretraining pipeline runs before embedding —"
    " pack_sequences' complement (that op concatenates short docs"
    " up to a budget; this one splits long docs down to one)."
    " Chunk count is 1 + ceil((n-64)/48) so the final window is"
    " allowed to run short rather than dropping tail tokens, ids"
    " are positional (deterministic, idempotent re-runs), and the"
    " emitted column is the chunk's md5 (plus exact token count)"
    " so parity checks every chunk's CONTENT without shipping"
    " text. Plan: split -> sequence -> explode -> slice, all"
    " Catalyst array expressions fused into the parquet scan's"
    " projection — ZERO shuffles at any corpus size; the explode"
    " factor is ~n_tokens/48 per doc, bounded by document length,"
    " and output partitioning inherits the scan's, so a downstream"
    " embed/dedup stage starts from well-sized splits. Measured at"
    " 100x replication of sf0.1 (local[32]): 8.1s over 500k docs ->"
    " 692k chunks, scan-bound as a map-only plan should be.",
)
def doc_chunking(spark, sf):
    W, S = 64, 48
    d = _t(spark, sf, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    n = F.size("toks")
    nc = F.when(n <= W, F.lit(1)).otherwise(
        F.ceil((n - W) / F.lit(float(S))).cast("long") + 1
    )
    e = d.select(
        "doc_id",
        "toks",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0).cast("long"), nc - 1)).alias("ci"),
    )
    chunk = F.slice(
        "toks",
        (F.col("ci") * S + 1).cast("int"),
        F.least(F.lit(W), F.col("n") - F.col("ci") * S).cast("int"),
    )
    return e.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# =====================================================================
# Join-key skew report (the pre-join salting decision input)
# =====================================================================

@_q(
    "join_key_skew_report",
    """
    WITH c AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt
      FROM orders GROUP BY o_custkey
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
             ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt
      FROM c
    ), t AS (
      SELECT CAST(MIN(k) AS BIGINT) AS top_key
      FROM c WHERE cnt = (SELECT MAX(cnt) FROM c)
    )
    SELECT n_keys, total_rows, max_cnt, p50_cnt, p99_cnt,
           ROUND(max_cnt * n_keys * 1.0 / total_rows, 4) AS skew_ratio,
           top_key
    FROM s, t
    """,
    "Join-key skew report for orders.o_custkey: per-key row counts"
    " summarized as key count, max, exact p50/p99, the heaviest key"
    " (deterministic min-id tiebreak), and the skew ratio"
    " max/(mean) — the diagnostic a pipeline runs BEFORE a big join"
    " to decide between plain shuffle, AQE skew splitting, and"
    " manual salting (skew_salted_join is the treatment; this is"
    " the test — the key-distribution sibling of graph_degree_hist)."
    " One map-side-combined fact shuffle builds the keys-sized count"
    " frame; the exact count quantiles come from operators/quantiles'"
    " two-phase bounded-state selection over that frame, and every"
    " other pass (max, total, argmin-of-max) runs on keys-sized or"
    " 1-row frames. Counts are integers so the interpolated"
    " quantiles are exact halves — no cross-engine float dust; the"
    " ratio is (int64 * int64) / int64 in one double division on"
    " both engines. Measured at 100x replication of sf0.1"
    " (local[32]): 14.8s over 15M orders -> 1.5M keys.",
)
def join_key_skew_report(spark, sf):
    from ..operators.quantiles import exact_group_quantiles

    o = _t(spark, sf, "orders")
    c = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("cnt")
    )
    q = exact_group_quantiles(
        c, "cnt", {"p50_cnt": 0.5, "p99_cnt": 0.99}, [],
        keep={"n_keys": "count", "max_cnt": "max", "total_probe": "min"},
    ).select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("max_cnt").cast("long").alias("max_cnt"),
        F.round("p50_cnt", 4).alias("p50_cnt"),
        F.round("p99_cnt", 4).alias("p99_cnt"),
    )
    tot = c.agg(F.sum("cnt").cast("long").alias("total_rows"))
    mx = c.agg(F.max("cnt").alias("__mx"))
    top = (
        c.crossJoin(F.broadcast(mx))
        .filter(F.col("cnt") == F.col("__mx"))
        .agg(F.min("k").cast("long").alias("top_key"))
    )
    return (
        q.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(top))
        .select(
            "n_keys",
            "total_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.round(
                (F.col("max_cnt") * F.col("n_keys")) * F.lit(1.0)
                / F.col("total_rows"),
                4,
            ).alias("skew_ratio"),
            "top_key",
        )
    )


# =====================================================================
# Leakage-proof dataset split (assignment by canonical fingerprint)
# =====================================================================

@_q(
    "dataset_split_leakproof",
    """
    WITH f AS (
      SELECT doc_id, lang,
             substring(md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')), 1, 2) AS fp2
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN fp2 < 'cc' THEN 'train'
                WHEN fp2 < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM f
    """,
    "Leakage-proof train/val/test split: assignment hashes the"
    " CANONICAL bag-of-words fingerprint instead of the doc id, so"
    " every verbatim copy AND every permuted near-copy of a document"
    " lands in the same split by construction — the prevention to"
    " split_leakage_check's detection (dataset_split, hashing ids,"
    " is exactly the splitter whose cross-split contamination that"
    " audit catches). Buckets come from the fingerprint's first hex"
    " byte compared lexicographically ('cc'=204/256=79.7% train,"
    " 'e6' adds 26/256=10.2% val, rest test) — fixed-width lowercase"
    " hex makes the string compare equal the numeric compare in both"
    " engines with no hex->int conversion. Map-only over the scan:"
    " zero shuffle at any corpus size, and re-running on a grown"
    " corpus never reassigns an existing document.",
)
def dataset_split_leakproof(spark, sf):
    d = _t(spark, sf, "documents")
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
    return d.select(
        "doc_id",
        "lang",
        F.when(fp2 < "cc", "train")
        .when(fp2 < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


# =====================================================================
# k-NN majority-vote classification (embedding auto-labeling)
# =====================================================================

@_q(
    "knn_classify",
    """
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec
      FROM embeddings WHERE vec_id < 50
    ), c AS (
      SELECT vec_id, embedding AS c_vec, label
      FROM embeddings WHERE vec_id >= 50
    ), scored AS (
      SELECT q.q_id, c.vec_id, c.label,
             ROUND(
               CASE WHEN list_sum(list_transform(q.q_vec,
                    x -> CAST(x AS DOUBLE) * x)) = 0
                 OR list_sum(list_transform(c.c_vec,
                    x -> CAST(x AS DOUBLE) * x)) = 0
               THEN CAST(0 AS DOUBLE) ELSE
               list_sum(list_transform(generate_series(1, len(c.c_vec)),
                 i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(c.c_vec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.q_vec,
                    x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(c.c_vec,
                    x -> CAST(x AS DOUBLE) * x))))
               END, 6) AS cosine
      FROM c, q
    ), ranked AS (
      SELECT q_id, label,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rnk
      FROM scored
    ), votes AS (
      SELECT q_id, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM ranked WHERE rnk <= 5
      GROUP BY q_id, label
    ), best AS (
      SELECT q_id, label, votes,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY votes DESC, label) AS rn
      FROM votes
    )
    SELECT q_id, CAST(label AS BIGINT) AS pred_label, votes
    FROM best WHERE rn = 1
    """,
    "k-NN majority-vote classification: label the unlabeled slice of"
    " the embedding table from its 5 nearest labeled neighbors — the"
    " auto-labeling / label-propagation pass training pipelines run"
    " to extend a small seed of human labels across a corpus. Built"
    " as a composition over operators/similarity.brute_force_topk"
    " (the exact baseline; the 100-TB path swaps the candidate"
    " generator for embed_ann_lsh/_ann_ivf buckets, identical vote"
    " stage): queries broadcast into a shuffle-free corpus scan, the"
    " per-query top-k is a q_id-partitioned WindowGroupLimit, the"
    " tiny (queries x k) neighbor frame broadcasts back onto the"
    " label lookup, and the vote is a (q_id, label) count with"
    " deterministic ties (votes DESC, then smallest label). Ranking"
    " uses the ROUNDED double cosine with vec_id tiebreak, so the"
    " k-cut and therefore the vote is engine-stable. Measured at"
    " 100x replication of sf0.1 (local[32]): 14.2s for 50 queries"
    " against 6.4M labeled vectors (19.6s before the norm"
    " precompute in brute_force_topk — corpus norms were being"
    " recomputed once per query) — the exact-scan baseline cost"
    " the ANN candidate generators exist to amortize.",
)
def knn_classify(spark, sf):
    from ..operators import similarity as sim

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 50)
    c = e.filter(F.col("vec_id") >= 50)
    nn = sim.brute_force_topk(c, q, k=5).select("q_id", "vec_id")
    return sim.majority_vote(c.select("vec_id", "label"), nn)


def _knn_ann_oracle_sql() -> str:
    """knn_classify's vote stage over LSH candidates: the fixed-seed
    hyperplane bucket arithmetic from embed_ann_lsh's oracle, with
    multiprobe=1 candidacy (Hamming <= 1), feeding the identical
    rank<=5 majority vote."""
    from ..operators import similarity as sim

    planes = sim._planes(64, sim.N_PLANES)
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
        dot = (
            "list_sum(list_transform(generate_series(1, len(embedding)),"
            f" j -> CAST(embedding[j] AS DOUBLE) * ({arr})[j]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, label,
             CAST({bucket} AS BIGINT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket AS q_bucket
          FROM b WHERE vec_id < 50),
    cand AS (
      SELECT q.q_id, c.vec_id, c.label, q.q_vec, c.embedding AS c_vec
      FROM b c, q
      WHERE c.vec_id >= 50
        AND bit_count(xor(c.bucket, q.q_bucket)) <= 1
    ),
    scored AS (
      SELECT q_id, vec_id, label,
             ROUND(
               CASE WHEN list_sum(list_transform(q_vec,
                    x -> CAST(x AS DOUBLE) * x)) = 0
                 OR list_sum(list_transform(c_vec,
                    x -> CAST(x AS DOUBLE) * x)) = 0
               THEN CAST(0 AS DOUBLE) ELSE
               list_sum(list_transform(generate_series(1, len(c_vec)),
                 i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q_vec,
                    x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(c_vec,
                    x -> CAST(x AS DOUBLE) * x))))
               END, 6) AS cosine
      FROM cand
    ),
    ranked AS (
      SELECT q_id, label,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rnk
      FROM scored
    ),
    votes AS (
      SELECT q_id, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM ranked WHERE rnk <= 5
      GROUP BY q_id, label
    ),
    best AS (
      SELECT q_id, label, votes,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY votes DESC, label) AS rn
      FROM votes
    )
    SELECT q_id, CAST(label AS BIGINT) AS pred_label, votes
    FROM best WHERE rn = 1
    """


@_q(
    "knn_classify_ann",
    _knn_ann_oracle_sql(),
    "knn_classify's documented 100-TB path, PROVEN as a registry"
    " entry (round-7 verdict item #3): the exact brute-force"
    " candidate generator is swapped for embed_ann_lsh's"
    " random-hyperplane buckets (multiprobe=1) while the vote stage"
    " is reused UNCHANGED — candidate generation touches only"
    " Hamming<=1 buckets (~(1+n_planes)/2^n_planes of the corpus"
    " per query) instead of every corpus row, which is the"
    " difference between a full scan per batch and a bucket probe"
    " at 100 TB. Fully oracle-checked end to end (fixed-seed"
    " hyperplanes make candidacy deterministic SQL, the LSH-oracle"
    " precedent), and tests assert prediction agreement vs the"
    " brute-force knn_classify — the recall envelope for the vote"
    " layer, not just the neighbor layer. Measured at 100x"
    " replication of sf0.1 (local[32], warm, alternated runs): 2.2s"
    " vs 4.7s for the brute-force knn_classify — the bucket probe"
    " replaces the 50-query dot fan-out on every corpus row with 8"
    " hyperplane dots plus a tiny candidate re-rank.",
)
def knn_classify_ann(spark, sf):
    from ..operators import similarity as sim

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 50)
    c = e.filter(F.col("vec_id") >= 50)
    nn = sim.lsh_topk(c, q, k=5).select("q_id", "vec_id")
    return sim.majority_vote(c.select("vec_id", "label"), nn)


# =====================================================================
# AUC / Mann-Whitney U per cohort (rank-based model evaluation)
# =====================================================================

@_q(
    "auc_by_cohort",
    """
    WITH s AS (
      SELECT user_id % 10 AS cohort,
             value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ), ranked AS (
      SELECT cohort, label,
             RANK() OVER (PARTITION BY cohort ORDER BY score)
               + (COUNT(*) OVER (PARTITION BY cohort, score) - 1) / 2.0
               AS avg_rank
      FROM s
    ), agg AS (
      SELECT cohort,
             SUM(CASE WHEN label = 1 THEN avg_rank ELSE 0 END) AS rpos,
             SUM(label) AS npos,
             COUNT(*) - SUM(label) AS nneg
      FROM ranked GROUP BY cohort
    )
    SELECT CAST(cohort AS BIGINT) AS cohort,
           CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           ROUND((rpos - npos * (npos + 1) / 2.0) / (npos * nneg), 6)
             AS auc
    FROM agg
    WHERE npos > 0 AND nneg > 0
    ORDER BY cohort
    """,
    "Distributed AUC (equivalently the Mann-Whitney U statistic) per"
    " cohort: the standard ranking-model evaluation metric, computed"
    " exactly via the rank-sum identity AUC = (R+ - n+(n+ + 1)/2) /"
    " (n+ n-) with midrank tie correction (RANK + (ties-1)/2 is the"
    " average rank of a tied score group — the same correction both"
    " engines' statistical libraries apply). Labels are"
    " purchase-vs-rest, scores are the event value, cohorts a"
    " deterministic user hash. The rank sums are computed on the"
    " (cohort, score)-AGGREGATED frame — all rows tied at a score"
    " share one midrank, so the per-cohort sorted sweep touches only"
    " DISTINCT scores while the fact-side work is a fully-parallel"
    " map-combined hash aggregate; with quantized model scores (the"
    " realistic eval input) the swept frame is orders of magnitude"
    " smaller than the event stream, and for continuous near-unique"
    " scores the win_ntile two-phase value-bucket move applies to the"
    " sweep itself. Arithmetic stays"
    " in integers-and-halves until the final division, so the AUC is"
    " hash-exact across engines. Degenerate cohorts (all-positive /"
    " all-negative) are excluded — AUC is undefined there. Measured"
    " at 100x replication of sf0.1 (local[32]): 13.5s over 10M"
    " events. The synthetic scores are fully continuous — the WORST"
    " case for this form, since the tie-group aggregate shrinks"
    " nothing and costs a shuffle (the raw-row-window form measured"
    " 7.5s here); with realistically quantized model scores the"
    " swept frame collapses by orders of magnitude and the"
    " aggregated form dominates, while the raw-window form's"
    " per-cohort single-task sort of the full stream is the"
    " win_ntile pathology at any score distribution.",
)
def auc_by_cohort(spark, sf):
    e = _t(spark, sf, "events")
    s = e.select(
        (F.col("user_id") % 10).alias("cohort"),
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    # rank-sum on the (cohort, score)-AGGREGATED frame, not raw rows:
    # all rows tied at a score share the midrank prefix + (cnt+1)/2,
    # and positives contribute pos * that — algebraically identical to
    # ranking every row, but the fact-side work is a fully-parallel
    # hash aggregate and the per-cohort sorted sweep touches only
    # DISTINCT scores (model scores are typically quantized, so this
    # frame is orders of magnitude smaller than the event stream)
    g = s.groupBy("cohort", "score").agg(
        F.count("*").alias("cnt"), F.sum("label").alias("pos")
    )
    wp = Window.partitionBy("cohort").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    avg_rank = (
        F.coalesce(F.sum("cnt").over(wp), F.lit(0))
        + (F.col("cnt") + 1) / 2.0
    )
    agg = (
        g.select("cohort", "cnt", "pos", avg_rank.alias("avg_rank"))
        .groupBy("cohort")
        .agg(
            F.sum(F.col("pos") * F.col("avg_rank")).alias("rpos"),
            F.sum("pos").alias("npos"),
            (F.sum("cnt") - F.sum("pos")).alias("nneg"),
        )
    )
    npos, nneg = F.col("npos"), F.col("nneg")
    return (
        agg.filter((npos > 0) & (nneg > 0))
        .select(
            F.col("cohort").cast("long").alias("cohort"),
            npos.cast("long").alias("n_pos"),
            nneg.cast("long").alias("n_neg"),
            F.round(
                (F.col("rpos") - npos * (npos + 1) / 2.0) / (npos * nneg),
                6,
            ).alias("auc"),
        )
        .orderBy("cohort")
    )


# =====================================================================
# Higher-order MAP lambdas (the map half of the Catalyst lambda surface)
# =====================================================================

@_q(
    "map_lambda_funcs",
    """
    WITH b AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             SUM(CAST(round(value * 1000000) AS BIGINT)) AS s_micro
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_freq_types,
           CAST(MAX(CASE WHEN event_type = 'click' THEN s_micro END)
                // MAX(CASE WHEN event_type = 'click' THEN n END)
                AS BIGINT) AS click_avg_micro,
           array_to_string(list_sort(list(upper(event_type))), ',')
             AS types_upper
    FROM b GROUP BY user_id
    """,
    "Higher-order MAP lambdas — the map half of the Catalyst lambda"
    " surface (array_lambda_funcs covers the array half): per-user"
    " event profiles built as map<type, count> / map<type, sum> via"
    " map_from_entries over sorted entry structs, then reduced with"
    " map_filter (frequent types), map_zip_with (per-type averages ="
    " sums-map zipped with counts-map), transform_keys (case"
    " normalization), map_keys and element_at — all JVM-side Catalyst"
    " expressions, no Python. Outputs are FLAT scalars (the round-3"
    " lesson: array/map-typed outputs break the driver canonicalizer),"
    " so the oracle is conventional conditional aggregation. Plan: one"
    " (user, type) hash aggregate then a per-user rollup — the maps"
    " live only inside the second aggregate's projection, bounded by"
    " |types| entries per user. Averages are integer micro-units end"
    " to end (agg_decimal_exact's move): per-row int64 quantization"
    " before summing makes the sums exact and order-free and the"
    " per-type average a floor division — two float formulations both"
    " landed summation-order ulps exactly on a ROUND render boundary"
    " at one scale or another, which no post-hoc rounding fixes."
    " (value is nonnegative in the fixtures; signed data would need"
    " the floor-vs-truncate division convention pinned explicitly.)",
)
def map_lambda_funcs(spark, sf):
    e = _t(spark, sf, "events")
    # integer micro-units end to end (the agg_decimal_exact move):
    # each row's value quantizes to an int64 micro-amount BEFORE any
    # aggregation, so the per-type sums are exact and order-free and
    # the per-type average is an integer division — two float forms
    # (raw, and 6-decimal-prequantized) both landed summation-order
    # ulps exactly on a ROUND boundary at one scale or another
    b = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(
            F.round(F.col("value") * 1000000).cast("long")
        ).alias("s"),
    )
    per_user = b.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("counts"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "s")))
        ).alias("sums"),
    )
    avg_map = F.map_zip_with(
        "counts", "sums", lambda k, c, s: s.cast("long") / c
    )
    return per_user.select(
        "user_id",
        F.size("counts").cast("long").alias("n_types"),
        F.size(
            F.map_filter("counts", lambda k, v: v >= 10)
        ).cast("long").alias("n_freq_types"),
        F.floor(F.element_at(avg_map, F.lit("click")))
        .cast("long")
        .alias("click_avg_micro"),
        F.array_join(
            F.array_sort(
                F.map_keys(
                    F.transform_keys("counts", lambda k, v: F.upper(k))
                )
            ),
            ",",
        ).alias("types_upper"),
    )


# =====================================================================
# Spark-4 collation surface (case-insensitive compare without lower())
# =====================================================================

@_q(
    "collation_funcs",
    """
    WITH t AS (
      SELECT source, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS term
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_distinct_binary,
           CAST(COUNT(DISTINCT lower(term)) AS BIGINT) AS n_distinct_ci,
           CAST(COUNT(*) FILTER (WHERE lower(term) = 'the') AS BIGINT)
             AS n_the_ci
    FROM t GROUP BY source
    """,
    "Spark-4 COLLATION surface: case-insensitive distinct counting and"
    " equality via collate(term, 'UTF8_LCASE') — the engine-native"
    " alternative to wrapping every comparison in lower(). Counts the"
    " CASE-PRESERVING token stream per source three ways: binary"
    " distinct, collation distinct (The/the/THE collapse), and a"
    " collated equality filter. Collation-aware grouping hashes the"
    " collation key directly, so the plan is the same map-combined"
    " aggregate as the lower() twin (which is exactly what the DuckDB"
    " oracle uses — collation semantics over ASCII equal lower()"
    " semantics, making the entry hash-checkable) but keeps original"
    " strings intact for downstream use; at 100 TB the shuffle shape"
    " is identical, the win is expressiveness and avoided projections."
    " Measured at 100x replication of sf0.1 (local[32]): 15.9s over"
    " 500k docs (two distinct-aggregates over ~90M tokens).",
)
def collation_funcs(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    toks = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")
        ).alias("term"),
    )
    return toks.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_distinct_binary"),
        F.expr("count(DISTINCT collate(term, 'UTF8_LCASE'))")
        .cast("long")
        .alias("n_distinct_ci"),
        F.expr(
            "count_if(collate(term, 'UTF8_LCASE') ="
            " collate('the', 'UTF8_LCASE'))"
        )
        .cast("long")
        .alias("n_the_ci"),
    )
