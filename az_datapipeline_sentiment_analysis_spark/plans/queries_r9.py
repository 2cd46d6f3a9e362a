"""Round-9 batch: retiring the registry's last known-quadratic entry
(``embed_neardup`` rebuilt on corpus-refining cluster blocking), real
pixel-level PNG decode for the multimodal path, multi-pass
sorted-neighborhood linkage, and the streaming twin of the composed
curation pipeline.

Registers into the shared ``REGISTRY`` (imported at the bottom of
``queries.py``). Conventions (SURVEY §2.3): integer aggregates CAST to
BIGINT in oracle SQL; ROUNDed floats that can be zero get ``+ 0.0``;
thresholds in exact arithmetic wherever a boundary could diverge
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import spread as _sp
from ..catalog import table as _t
from ..operators import similarity as sim
from .queries import _q
from ..operators.similarity import (
    cluster_pairs_ctes as _cluster_pairs_ctes,
)

# =====================================================================
# embed_neardup, rebuilt on corpus-refining cluster blocking
# =====================================================================

_NEARDUP_N_LISTS = 64
_NEARDUP_TAU = 0.35


@_q(
    "embed_neardup",
    f"""{_cluster_pairs_ctes(_NEARDUP_N_LISTS)}
    SELECT u AS left_id, v AS right_id, cosine
    FROM pairs WHERE cosine >= {_NEARDUP_TAU}
    """,
    "Embedding-cosine near-dup candidate pairs — REBUILT (VERDICT r8"
    " #1) on the fixed-quantizer cluster blocking of semdedup_prune"
    " (operators/similarity.cluster_blocked_pairs) instead of the"
    " original label blocks. The label-blocked form had a FIXED block"
    " count, so per-block pair work grew quadratically with the"
    " corpus ('intractable at 100x' by its own docstring); cluster"
    " blocking refines WITH the corpus — n_lists (here 64, matching"
    " semdedup_prune_sized) is the production knob that grows with n"
    " so sum-of-cluster-sizes^2, and with it total pair cost, stays"
    " flat (SemDeDup, Abbas et al. 2023, uses ~1e5 clusters at web"
    " scale). Assignment is deterministic arithmetic (no training"
    " pass), so the WHOLE pipeline is hash-checked cross-engine."
    " Same output contract as before: (left_id, right_id, cosine)"
    " with left_id < right_id and round(cosine, 6) >= 0.35; the"
    " candidate SCOPE changes from same-label to same-cluster —"
    " learned-geometry buckets, which is what a production near-dup"
    " pass actually wants (labels are not available on unlabeled"
    " corpora). Measured at 100x replication of sf0.1 (local[32],"
    " scale_timing harness, optimization round 11): completes in"
    " 130.9s for 200k vectors /"
    " 13.48M emitted pairs at n_lists=64 (the round-10 JVM-HOF pair"
    " stage measured 984.8s) — the datapoint the"
    " label-blocked form could not produce at all ('intractable at"
    " 100x' by its own docstring). The wall is OUTPUT-bound, not"
    " join-bound: stride-replication makes every original vector"
    " ~100 exact copies, so each original near-pair expands"
    " quadratically in the replica count into the emitted set, while"
    " the pair-GENERATION cost is the same cluster-keyed equi-join"
    " semdedup_prune_sized measured at 118.3s on the identical data"
    " — and its 16->64 n_lists sweep (341.9s->118.3s) is the proof"
    " the knob tracks sum-of-cluster-sizes^2.",
)
def embed_neardup(spark, sf):
    e = _t(spark, sf, "embeddings")
    pairs = sim.cluster_blocked_pairs(
        e, n_lists=_NEARDUP_N_LISTS, tau=_NEARDUP_TAU
    )
    return pairs.select(
        F.col("u").alias("left_id"),
        F.col("v").alias("right_id"),
        "cosine",
    )

# =====================================================================
# Real pixel-level PNG decode (VERDICT r8 #2)
# =====================================================================

from ..operators import multimodal as mm  # noqa: E402

_PIXEL_ORACLE = f"""
    WITH dims AS (
      SELECT doc_id,
             {mm.PIXEL_W_BASE} + doc_id % {mm.PIXEL_W_MOD} AS w,
             {mm.PIXEL_H_BASE} + doc_id % {mm.PIXEL_H_MOD} AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, x.x AS x, y.y AS y
      FROM dims, unnest(generate_series(0, w - 1)) AS x(x),
           unnest(generate_series(0, h - 1)) AS y(y)
    ),
    vals AS (
      SELECT doc_id, w, h, c.channel,
        CASE c.channel
          WHEN 'r' THEN (7*doc_id + 3*x + 5*y) % 256
          WHEN 'g' THEN (11*doc_id + x + 2*y) % 256
          ELSE (13*doc_id + 4*x + y) % 256 END AS v
      FROM px, (VALUES ('r'),('g'),('b')) c(channel)
    ),
    agg AS (
      SELECT doc_id, channel,
             CAST(ANY_VALUE(w) AS BIGINT) AS width,
             CAST(ANY_VALUE(h) AS BIGINT) AS height,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS px_sum,
             CAST(SUM(v*v) AS BIGINT) AS px_sqsum,
             CAST(MIN(v) AS BIGINT) AS px_min,
             CAST(MAX(v) AS BIGINT) AS px_max,
             CAST(SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS BIGINT) AS bin0,
             CAST(SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bin1,
             CAST(SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bin2,
             CAST(SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS BIGINT)
               AS bin3
      FROM vals GROUP BY doc_id, channel
    )
    SELECT doc_id, channel, width, height, px_sum, px_sqsum, px_min,
           px_max, bin0, bin1, bin2, bin3,
           ROUND(px_sum / CAST(n AS DOUBLE), 6) AS mean,
           ROUND(sqrt((px_sqsum - (px_sum * px_sum) / CAST(n AS DOUBLE))
                      / n), 6) AS std
    FROM agg
"""


@_q(
    "media_pixel_stats",
    _PIXEL_ORACLE,
    "REAL pixel-level image decode (VERDICT r8 #2, retiring the last"
    " multimodal decode gap a PNG corpus would hit): each document"
    " carries a fully valid PNG (8-bit RGB, per-row filter type"
    " cycling 0-4, chunk CRCs) whose pixels come from a closed-form"
    " formula of (doc_id, x, y); the operator decodes the bytes with"
    " the stdlib-only codec in operators/multimodal.py —"
    " zlib IDAT inflate + all five scanline unfilters, CRC-verified —"
    " and reduces every channel to integer-exact aggregates"
    " (sum/sumsq/min/max/4-bin histogram) plus mean/std from those"
    " sums. The oracle recomputes the statistics from the PIXEL"
    " FORMULA, not from the codec, so an encode OR decode bug"
    " anywhere (filter arithmetic, CRC, inflate framing) breaks the"
    " value hash — the same pinning strategy scan_binary_files uses"
    " for md5. Decode+reduce is one map-only Arrow-batched"
    " mapInPandas pass: no shuffle, embarrassingly parallel, and the"
    " binary column is pruned after the stats projection — the"
    " 100 TB shape for media feature extraction. JPEG/video stay"
    " behind the declared NotImplementedError stub (entropy decode"
    " genuinely needs PIL/ffmpeg); PNG no longer does."
    " Measured at 100x replication of sf0.1 (local[32]): 39.1s for"
    " 500k images decoded to 1.5M channel rows (~180M pixels through"
    " encode+decode) — linear in image count, as map-only predicts.",
)
def media_pixel_stats(spark, sf):
    d = mm.with_png_payload(_t(spark, sf, "documents").select("doc_id"))
    return mm.png_pixel_stats(d)

# =====================================================================
# Multi-pass sorted-neighborhood linkage (VERDICT r8 #8)
# =====================================================================

from pyspark.sql import Window  # noqa: E402
from ..operators.dedup import (  # noqa: E402
    SNM_EPS_CENTS as _SNM_EPS_CENTS,
    SNM_W as _SNM_W,
)


def _snm_pass_sql(block_col: str) -> str:
    """One SNM pass as a DuckDB SQL fragment ending in
    (ka, kb, d) — banded self-join over the block-partitioned rank."""
    return f"""
      SELECT a.c_custkey AS ka, b.c_custkey AS kb,
             b.bal_cents - a.bal_cents AS d
      FROM (
        SELECT c_custkey, {block_col},
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
               ROW_NUMBER() OVER (
                 PARTITION BY {block_col}
                 ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                          c_custkey
               ) AS rn
        FROM customer
      ) a
      JOIN (
        SELECT c_custkey, {block_col},
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
               ROW_NUMBER() OVER (
                 PARTITION BY {block_col}
                 ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                          c_custkey
               ) AS rn
        FROM customer
      ) b
        ON b.{block_col} = a.{block_col}
       AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_W}
      WHERE b.bal_cents - a.bal_cents <= {_SNM_EPS_CENTS}
    """


def _snm_pass_frame(c, block_col: str):
    """One SNM pass Spark-side: w lead() calls over ONE
    block-partitioned window (same shape as record_linkage_snm)."""
    w = Window.partitionBy(block_col).orderBy("bal_cents", "c_custkey")
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
            F.col("c_custkey").alias("ka"),
            F.col("bal_cents").alias("bal_a"),
            F.explode("nbrs").alias("nbr"),
        )
        .filter(F.col("nbr").isNotNull())
        .select(
            "ka",
            F.col("nbr.k").alias("kb"),
            (F.col("nbr.b") - F.col("bal_a")).alias("d"),
        )
        .filter(F.col("d") <= _SNM_EPS_CENTS)
    )


@_q(
    "record_linkage_snm_multipass",
    f"""
    WITH p1 AS ({_snm_pass_sql("c_mktsegment")}),
    p2 AS ({_snm_pass_sql("c_nationkey")}),
    u AS (
      SELECT ka, kb, d, 1 AS pass FROM p1
      UNION ALL
      SELECT ka, kb, d, 2 AS pass FROM p2
    )
    SELECT ka AS custkey_a, kb AS custkey_b,
           CAST(MIN(d) AS BIGINT) AS bal_diff_cents,
           CAST(COUNT(*) AS BIGINT) AS n_passes
    FROM u GROUP BY ka, kb
    """,
    "MULTI-PASS sorted-neighborhood linkage (Hernandez & Stolfo,"
    " SIGMOD '95, §multi-pass; the composition record_linkage_snm's"
    " docstring promised, shipped as its own entry per VERDICT r8"
    " #8): run the w=5 windowed neighbor scan under TWO independent"
    " blocking keys — market segment (pass 1, the single-pass entry)"
    " and nation key (pass 2) — then union and dedup pairs. The"
    " multi-pass trick is SNM's answer to blocking misses: a true"
    " match split across segment blocks can still collide inside a"
    " nation block, and vice versa; each pass stays O(n log n + nw)"
    " so k passes cost k sorted scans, never a cross join. The pair"
    " dedup is a groupBy on the pair key emitting n_passes (1 or 2),"
    " so overlap between passes is visible in the output and"
    " pytest-pinned. Spark plan: two block-partitioned window passes"
    " (each one sort shuffle keyed on ITS block — no global sort),"
    " one union, one pair-keyed aggregate; bal_diff_cents is"
    " pass-invariant (b - a under the same orientation-defining sort"
    " key) so MIN is a no-op dedup, asserted in pytest. At 100 TB:"
    " cost = 2 sorted scans + an aggregate on the (bounded, n*w)"
    " candidate set. Measured at 100x replication of sf0.1"
    " (local[32]): 70.5s for 7.35M deduped pairs — ~1.6x the 42.9s"
    " single-pass entry for two passes plus the pair-dedup"
    " aggregate, output-bound like its parent.",
)
def record_linkage_snm_multipass(spark, sf):
    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("bal_cents"),
    )
    p1 = _snm_pass_frame(c, "c_mktsegment")
    p2 = _snm_pass_frame(c, "c_nationkey")
    return (
        p1.unionByName(p2)
        .groupBy("ka", "kb")
        .agg(
            F.min("d").cast("long").alias("bal_diff_cents"),
            F.count("*").cast("long").alias("n_passes"),
        )
        .select(
            F.col("ka").alias("custkey_a"),
            F.col("kb").alias("custkey_b"),
            "bal_diff_cents",
            "n_passes",
        )
    )

# =====================================================================
# Iterative BPE tokenizer training (k merge rounds)
# =====================================================================

# Training CTEs + rounds live in operators/bpe.py, shared verbatim
# with the r10 encoder entry so the two can never drift.
from ..operators.bpe import (  # noqa: E402
    BPE_ROUNDS as _BPE_ROUNDS,
    train_oracle_sql as _bpe_oracle_sql,
)


@_q(
    "bpe_train_merges",
    _bpe_oracle_sql(_BPE_ROUNDS),
    "BPE tokenizer TRAINING, not just the statistics pass: the first"
    f" {_BPE_ROUNDS} merge rounds of byte-pair encoding (Sennrich et"
    " al. 2016, ACL) run as an iterative distributed computation —"
    " bpe_merge_pairs mines round-1 candidates; this entry LEARNS the"
    " merge table. Classic trainer shape: collapse the corpus to the"
    " distinct-word frequency table first (the standard BPE trick —"
    " pair statistics are word-frequency-weighted, so each round"
    " scans |vocab| rows, not the corpus), encode each word as"
    " |sym||sym|...|, then per round: adjacent-pair weighted count"
    " (one small hash aggregate), argmax by (count desc, pair asc),"
    " and merge application as a LITERAL string replace — leftmost"
    " non-overlapping continue-after-replacement, which is exactly"
    " BPE's single-pass greedy merge, and the |a||b| -> |ab| encoding"
    " makes the pattern self-delimiting (no symbol-boundary false"
    " matches, no consumed-delimiter miss; proven on the a,b,a,b,bc"
    " fixture in pytest). Both engines run the IDENTICAL replace"
    " semantics so the full k-round trajectory is hash-checked. The"
    " per-round argmax is ONE row to the driver (the k-means/"
    "graph_kcore iterative pattern) parameterizing the next round's"
    " expression; everything else is distributed. At 100 TB the"
    " corpus scan happens ONCE (the word-frequency aggregate,"
    " map-combined); rounds then cost |vocab| each — the reason real"
    " tokenizer trainers run exactly this collapse. Emits one row"
    " per learned merge: (merge_rank, left_sym, right_sym, merged,"
    " pair_count). Measured at 100x replication of sf0.1 (local[32]):"
    " 64.4s — the one-time corpus-scan word-frequency aggregate over"
    " 500k docs dominates; the three merge rounds themselves run on"
    " the (tiny) vocabulary frame, so more rounds cost almost"
    " nothing — exactly the cost profile real BPE trainers have.",
)
def bpe_train_merges(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    toks = d.select(
        F.explode(
            F.expr(
                "filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
                " t -> length(t) >= 2)"
            )
        ).alias("word")
    )
    # ONE corpus scan: the distinct-word frequency table (map-side
    # combined), then every round runs on this small frame
    w = (
        toks.groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "s",
            F.expr(
                "concat('|', array_join(split(word, ''), '||'), '|')"
            ),
        )
        .select("s", "n")
        .localCheckpoint(eager=True)
    )
    merges = []
    cur = w
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            cur.select(
                F.expr("split(trim(BOTH '|' FROM s), '\\\\|\\\\|')")
                .alias("a"),
                "n",
            )
            # A word can collapse to ONE symbol once a merge equals the
            # whole word (e.g. the round-1 merge is 'an' and 'an' is a
            # vocab word): sequence(1, 0) DESCENDS in Spark ([1,0]) and
            # element_at(a, 0) throws. Single-symbol encodings carry no
            # adjacent pairs, so dropping them is exact (DuckDB's
            # generate_series(1,0) is empty — same semantics).
            .filter(F.expr("size(a) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " i -> struct(element_at(a, i) AS l,"
                        " element_at(a, i + 1) AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").cast("long").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        l, rr, c = top[0].l, top[0].r, top[0].c
        merges.append((r, l, rr, l + rr, c))
        find, repl = f"|{l}||{rr}|", f"|{l}{rr}|"
        cur = cur.select(
            F.expr(
                "replace(s, "
                + "'" + find.replace("'", "''") + "', "
                + "'" + repl.replace("'", "''") + "')"
            ).alias("s"),
            "n",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string,"
        " merged string, pair_count long",
    )

# =====================================================================
# PII redaction (curation scrub pass)
# =====================================================================

# Alternation-free patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB) with identical leftmost-longest-free matching: no
# backtracking constructs, so the two engines find the same spans.
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\+[0-9]-[0-9]{3}-[0-9]{4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# deterministic PII fabrication from doc_id (same expression text on
# both engines, CASTs explicit)
_PII_ENRICH = (
    "concat(text, ' contact user', CAST(doc_id AS {str}), '@mail',"
    " CAST(doc_id % 7 AS {str}), '.com or +1-555-',"
    " lpad(CAST(doc_id % 10000 AS {str}), 4, '0'), ' from 10.',"
    " CAST(doc_id % 256 AS {str}), '.0.',"
    " CAST((doc_id * 3) % 256 AS {str}))"
)


@_q(
    "pii_redact_audit",
    f"""
    WITH enriched AS (
      SELECT doc_id,
             {_PII_ENRICH.format(str="VARCHAR")} AS t
      FROM documents
    ),
    red AS (
      SELECT doc_id, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS clean
      FROM enriched
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(clean, '{_PII_IP}')) AS BIGINT)
             AS n_ips_probe,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT)
             AS n_ips,
           CAST(length(clean) AS BIGINT) AS clean_len,
           md5(clean) AS clean_md5
    FROM red
    """,
    "PII redaction, AUDITED — extends pii_redact (queries_eng.py, the round-4 email/phone scrubber) with the IPv4 class, the md5 of the redacted text in the hash, and a leftover-PII self-audit column (complements pii_density_report, which only MEASURES): emails, phone numbers and IPv4 addresses"
    " replaced by typed placeholders via three chained"
    " regexp_replace passes (email first — its span contains dots"
    " and digits the later patterns could partially match),"
    " emitting per-doc match counts, redacted length, and the md5"
    " of the REDACTED text so the transform itself — not just the"
    " counts — is value-hash-checked cross-engine. The corpus has"
    " no organic PII, so deterministic PII is fabricated from"
    " doc_id first (the multimodal fabricate-then-operate"
    " convention) — every doc carries exactly one email, one phone,"
    " one IP, and the md5 proves the redactor removed precisely"
    " those spans. Patterns are alternation/backtracking-free so"
    " Java regex (Spark) and RE2 (DuckDB) match identical spans."
    " Map-only: one scan, three fused regex passes, no shuffle —"
    " the 100 TB scrub shape. n_ips_probe recomputes the IP count on"
    " the REDACTED text — leftover PII after redaction, 0 by"
    " construction — folded into the hash as a self-audit column."
    " Measured at 100x replication of sf0.1 (local[32]): 64.7s for"
    " 500k docs — six regex passes over ~0.9 GB of text, scan-bound.",
)
def pii_redact_audit(spark, sf):
    # Spark SQL single-quoted literals consume one level of backslash
    # escaping (DuckDB's do not), so the shared raw patterns are
    # re-escaped for the Spark expressions only.
    em = _PII_EMAIL.replace("\\", "\\\\")
    ph = _PII_PHONE.replace("\\", "\\\\")
    ip = _PII_IP.replace("\\", "\\\\")
    d = _t(spark, sf, "documents")
    enriched = d.select(
        "doc_id",
        F.expr(_PII_ENRICH.format(str="STRING")).alias("t"),
    )
    clean = F.expr(
        f"regexp_replace(regexp_replace(regexp_replace(t,"
        f" '{em}', '<EMAIL>'),"
        f" '{ph}', '<PHONE>'),"
        f" '{ip}', '<IP>')"
    )
    red = enriched.withColumn("clean", clean)
    return red.select(
        "doc_id",
        F.expr(f"regexp_count(t, '{em}')").cast("long")
        .alias("n_emails"),
        F.expr(f"regexp_count(t, '{ph}')").cast("long")
        .alias("n_phones"),
        F.expr(f"regexp_count(clean, '{ip}')").cast("long")
        .alias("n_ips_probe"),
        F.expr(f"regexp_count(t, '{ip}')").cast("long")
        .alias("n_ips"),
        F.length("clean").cast("long").alias("clean_len"),
        F.md5("clean").alias("clean_md5"),
    )

# =====================================================================
# ViT patchify over REAL decoded pixels (decode -> patch -> project)
# =====================================================================

from ..operators.multimodal import (  # noqa: E402
    PATCH_BYTES as _PATCH_BYTES,
    PATCH_EDIM as _PATCH_EDIM,
    VIT_SCHEMA as _VIT_SCHEMA,
    patch_weights as _patch_weights,
)


def _vitpix_oracle_sql() -> str:
    """The full decode->patchify->project chain recomputed from the
    PIXEL FORMULA: byte position p of doc i maps to channel p%3,
    x=(p//3)%w, y=(p//3)//w in row-major RGB order — the exact layout
    png_decode_rgb(...).ravel() produces."""
    wm = _patch_weights()

    def val(d: int) -> str:
        pos = f"(patch_idx * {_PATCH_BYTES} + {d})"
        q = f"({pos} // 3)"
        x, y = f"({q} % w)", f"({q} // w)"
        return (
            f"(CASE WHEN {pos} < n THEN (CASE {pos} % 3"
            f" WHEN 0 THEN (7*doc_id + 3*{x} + 5*{y}) % 256"
            f" WHEN 1 THEN (11*doc_id + {x} + 2*{y}) % 256"
            f" ELSE (13*doc_id + 4*{x} + {y}) % 256 END)"
            f" ELSE 0 END)"
        )

    ecols = []
    for k in range(_PATCH_EDIM):
        terms = " + ".join(
            f"{val(d)} * ({wm[k][d]})" for d in range(_PATCH_BYTES)
        )
        ecols.append(f"CAST({terms} AS BIGINT) AS e{k}")
    es = ",\n           ".join(ecols)
    return f"""
    WITH dims AS (
      SELECT doc_id,
             {mm.PIXEL_W_BASE} + doc_id % {mm.PIXEL_W_MOD} AS w,
             {mm.PIXEL_H_BASE} + doc_id % {mm.PIXEL_H_MOD} AS h
      FROM documents
    ),
    d2 AS (SELECT doc_id, w, h, CAST(w * h * 3 AS BIGINT) AS n
           FROM dims),
    p AS (
      SELECT doc_id, w, h, n,
             unnest(range(CAST(ceil(n / {_PATCH_BYTES}.0) AS BIGINT)))
               AS patch_idx
      FROM d2
    )
    SELECT doc_id,
           CAST(patch_idx AS BIGINT) AS patch_idx,
           LEAST({_PATCH_BYTES}, n - patch_idx * {_PATCH_BYTES})
             AS n_patch_bytes,
           {es}
    FROM p
    """


@_q(
    "vit_patchify_pixels",
    _vitpix_oracle_sql(),
    "The ViT ingest front end over REAL DECODED PIXELS — composing"
    " the two halves that previously existed separately:"
    " media_pixel_stats' stdlib PNG codec (zlib IDAT inflate +"
    " unfilter 0-4) feeds vit_patchify's 16-byte patchify + fixed"
    " integer 4x16 linear projection, all inside ONE Arrow-batched"
    " mapInPandas pass (decode -> ravel to row-major RGB bytes ->"
    " zero-padded patch matrix -> one vectorized int64 matmul per"
    " batch; the binary never round-trips a JVM explode). This is"
    " the actual image-ingest shape a multimodal training pipeline"
    " runs: decode, patchify, embed, all fused map-side — no"
    " shuffle, embarrassingly parallel, payload pruned after the"
    " projection. The oracle recomputes every patch coordinate from"
    " the closed-form pixel formula (channel p%3, x=(p//3)%w,"
    " y=(p//3)//w — the ravel layout), so the hash check covers the"
    " codec, the layout convention, AND the projection arithmetic"
    " end to end. Measured at 100x replication of sf0.1 (local[32]):"
    " 245.0s for 500k images -> 12.5M patch rows — ~4.5x the"
    " text-byte vit_patchify (54.3s) because each row ADDS the full"
    " PNG decode (inflate + unfilter) before patchify; per-image"
    " decode+patchify+project is ~0.5ms, embarrassingly parallel,"
    " output-bound on the collect like its parent.",
)
def vit_patchify_pixels(spark, sf):
    import numpy as np
    import pandas as pd

    wmat = np.array(_patch_weights(), dtype=np.int64)  # (4, 16)

    def run(batches):
        for pdf in batches:
            ids, idxs, sizes, mats = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pix = mm.png_decode_rgb(bytes(payload))
                b = pix.ravel().tobytes()  # row-major RGB byte stream
                n = len(b)
                npatch = (n + _PATCH_BYTES - 1) // _PATCH_BYTES
                padded = b + b"\0" * (npatch * _PATCH_BYTES - n)
                m = np.frombuffer(padded, dtype=np.uint8).reshape(
                    npatch, _PATCH_BYTES
                )
                ids.extend([doc_id] * npatch)
                idxs.extend(range(npatch))
                sizes.extend(
                    min(_PATCH_BYTES, n - i * _PATCH_BYTES)
                    for i in range(npatch)
                )
                mats.append(m)
            if not ids:
                continue
            emb = np.vstack(mats).astype(np.int64) @ wmat.T
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "patch_idx": pd.Series(idxs, dtype="int64"),
                "n_patch_bytes": pd.Series(sizes, dtype="int64"),
            }
            for k in range(_PATCH_EDIM):
                out[f"e{k}"] = pd.Series(emb[:, k], dtype="int64")
            yield pd.DataFrame(out)

    d = mm.with_png_payload(_t(spark, sf, "documents").select("doc_id"))
    return d.select("doc_id", "payload").mapInPandas(
        run, schema=_VIT_SCHEMA
    )

# =====================================================================
# HTML -> text extraction (the crawl-ingest front door)
# =====================================================================

_HTML_WRAP = (
    "concat('<html><head><title>Doc ', CAST(doc_id AS {str}),"
    " '</title></head><body><nav>home | about | contact</nav><p>',"
    " text, '</p><div class=ad>BUY NOW</div><footer>copyright'"
    " , ' example com</footer></body></html>')"
)
# strip order: block-level boilerplate elements first (non-greedy
# bounded spans), then every remaining tag; both Java regex and RE2
# support lazy quantifiers with identical leftmost semantics
_HTML_NAV = "<nav>.*?</nav>"
_HTML_FOOTER = "<footer>.*?</footer>"
_HTML_AD = "<div class=ad>.*?</div>"
_HTML_TAG = "<[^>]*>"


@_q(
    "html_text_extract",
    f"""
    WITH pages AS (
      SELECT doc_id, {_HTML_WRAP.format(str="VARCHAR")} AS html
      FROM documents
    ),
    ext AS (
      SELECT doc_id, html,
             regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(html,
                 '{_HTML_NAV}', ' ', 'g'),
                 '{_HTML_FOOTER}', ' ', 'g'),
                 '{_HTML_AD}', ' ', 'g'),
                 '{_HTML_TAG}', ' ', 'g'),
                 ' +', ' ', 'g')) AS body
      FROM pages
    )
    SELECT doc_id, title,
           CAST(len(regexp_extract_all(html, '{_HTML_TAG}')) AS BIGINT)
             AS n_tags,
           CAST(length(body) AS BIGINT) AS body_len,
           md5(body) AS body_md5
    FROM ext
    """,
    "HTML-to-text extraction — the crawl-ingest front door every web"
    " curation pipeline runs before any quality/dedup stage"
    " (trafilatura/jusText's job, reduced to its deterministic core):"
    " strip block-level boilerplate elements (nav, footer, ad divs —"
    " lazy-quantifier bounded spans) before the generic tag strip, so"
    " chrome never leaks into the body text; extract the title"
    " separately; normalize whitespace; emit per-page tag count, body"
    " length and the md5 of the EXTRACTED text so the transform"
    " itself is value-hash-checked. Pages are fabricated"
    " deterministically around the corpus text (the fabricate-then-"
    "operate convention — the synthetic corpus ships no HTML), with"
    " title derived from doc_id so extraction is oracle arithmetic."
    " Lazy quantifiers and character-class tags behave identically"
    " in Java regex and RE2 (no backtracking constructs). Map-only:"
    " one scan, five fused regex passes, no shuffle — at 100 TB this"
    " is pure scan throughput, the same cost class as pii_redact."
    " Measured at 100x replication of sf0.1 (local[32]): 16.4s for"
    " 500k pages, scan-bound.",
)
def html_text_extract(spark, sf):
    d = _sp(_t(spark, sf, "documents"))
    nav = _HTML_NAV
    foot = _HTML_FOOTER
    ad = _HTML_AD
    tag = _HTML_TAG
    pages = d.select(
        "doc_id",
        F.expr(_HTML_WRAP.format(str="STRING")).alias("html"),
    )
    body = F.expr(
        f"trim(regexp_replace(regexp_replace(regexp_replace("
        f"regexp_replace(regexp_replace(html,"
        f" '{nav}', ' '),"
        f" '{foot}', ' '),"
        f" '{ad}', ' '),"
        f" '{tag}', ' '),"
        f" ' +', ' '))"
    )
    ext = pages.select(
        "doc_id",
        F.expr("regexp_extract(html, '<title>([^<]*)</title>', 1)")
        .alias("title"),
        F.expr(f"regexp_count(html, '{tag}')").cast("long")
        .alias("n_tags"),
        body.alias("body"),
    )
    return ext.select(
        "doc_id",
        "title",
        "n_tags",
        F.length("body").cast("long").alias("body_len"),
        F.md5("body").alias("body_md5"),
    )

# =====================================================================
# Perceptual image hash over decoded pixels (image-dedup primitive)
# =====================================================================

# The formula-oracle text lives in operators/multimodal.py, shared
# verbatim with the composed image curation pipeline (r10).
_PHASH_ORACLE = mm.PHASH_FORMULA_SQL


@_q(
    "image_phash",
    _PHASH_ORACLE,
    "Perceptual image hashing (dHash — the difference-hash variant of"
    " pHash): the IMAGE near-dup primitive, closing the modality gap"
    " in the dedup family (text has minhash/simhash/prefix-filter,"
    " embeddings have cluster blocking; images had nothing). Each"
    " document's PNG is DECODED (the stdlib codec), integer luma"
    " (299R+587G+114B) is area-binned to a 9x8 grid via pure integer"
    " division, and 64 gradient bits compare horizontally adjacent"
    " cell MEANS as cross-multiplied integer sums — no float"
    " anywhere, so the hash is bit-identical cross-engine and the"
    " oracle recomputes it from the pixel formula through the exact"
    " same arithmetic (covering codec + binning + comparison)."
    " Emitted as two nonnegative 32-bit halves (bit 63 would wrap a"
    " signed BIGINT). Gradient hashes are brightness-invariant"
    " (pytest-pinned): a global exposure shift flips no comparison —"
    " the property that makes dHash the standard crawl-image dedup"
    " key; near-dup JOINS then reuse the SimHash banding machinery"
    " verbatim (16-bit chunks, Hamming verify — simhash_neardup)."
    " 226 distinct hashes over the 500-doc corpus (the synthetic"
    " gradient images collide exactly when no channel wraps 256 —"
    " honest for this corpus; real photos spread further). Map-only"
    " decode+hash, embarrassingly parallel — the 100 TB shape."
    " Measured at 100x replication of sf0.1 (local[32]): 34.5s for"
    " 500k images, linear like media_pixel_stats.",
)
def image_phash(spark, sf):
    d = mm.with_png_payload(_t(spark, sf, "documents").select("doc_id"))
    return mm.png_phash(d)


# =====================================================================
# Image dedup verdict over the perceptual hash (banded Hamming join)
# =====================================================================

_PHASH_HAM = 6  # max Hamming distance across the 64 gradient bits


@_q(
    "image_dedup_verdict",
    f"""
    WITH ph AS ({_PHASH_ORACLE}),
    g AS (
      SELECT phash_lo, phash_hi,
             CAST(MIN(doc_id) AS BIGINT) AS rep
      FROM ph GROUP BY phash_lo, phash_hi
    ),
    {mm.phash_band_ctes("g")},
    {mm.phash_best_ctes("g", _PHASH_HAM)}
    SELECT p.doc_id, g.rep AS canonical_id,
           CAST(p.doc_id <> g.rep AS BOOLEAN) AS is_exact_dup,
           b.near_canonical, b.near_hamming
    FROM ph p
    JOIN g ON g.phash_lo = p.phash_lo AND g.phash_hi = p.phash_hi
    LEFT JOIN best b ON b.rep = g.rep
    """,
    "IMAGE DEDUP VERDICT — the end-to-end image near-dup pipeline"
    " image_phash's docstring promised, in the LINEAR-OUTPUT verdict"
    " form (dedup_verdict's shape): decode -> dHash -> exact-copy"
    " collapse on the 64-bit hash -> SimHash-style 4x16-bit banded"
    " candidate join at REP level only -> integer bit_count Hamming"
    " <= 6 verify -> per-image verdict row (its hash-group canonical,"
    " an exact-dup flag, and the smallest lower-id rep within the"
    " Hamming budget, if any). The first cut emitted all member PAIRS"
    " and died at 100x: replication makes the dominant identical-hash"
    " group ~40%% of the corpus, so within-group pairs are quadratic"
    " in the duplication rate — billions of rows, Java heap OOM."
    " The verdict form is what a production image-dedup pass"
    " materializes anyway: one row per image, pair work bounded by"
    " DISTINCT-hash band buckets (a few hundred reps regardless of"
    " corpus size), output exactly n rows. Candidate policy (r10):"
    " TWO 4x16-bit window partitions of the 64 hash bits — the"
    " aligned chunks plus an 8-bit-rotated second partition (pure"
    " div/mod integer arithmetic, no 64-bit composition, identical"
    " values both engines). Each partition guarantees recall for"
    " d <= 3 by pigeonhole; the d in 4..6 shell is the standard LSH"
    " trade, MEASURED against all-pairs ground truth at sf0.001"
    " (226 reps, pinned in tests/test_r10.py): aligned-only banding"
    " missed 61/1105 shell pairs (94.5% recall, worst 49/509 at"
    " d=6); adding the rotation recovers to 13/1105 missed (98.8% —"
    " d=4 exact, 2/361 missed at d=5, 11/509 at d=6). The oracle"
    " replicates the identical candidate policy so parity holds by"
    " construction. All arithmetic integer, fully hash-checked at"
    " three scales. Measured at 100x replication of sf0.1"
    " (local[32]): 48.2s for 500k images -> 500k verdict rows with"
    " aligned-only banding (r9 session); 56.3s with both partitions"
    " (r10 session, different host window — band rows double but"
    " pair work stays rep-level and the entry stays decode-bound) —"
    " linear, the scale-safe shape the pair form could never have.",
)
def image_dedup_verdict(spark, sf):
    from ..operators.dedup import _persist_generation

    hashes = mm.png_phash(
        mm.with_png_payload(_t(spark, sf, "documents").select("doc_id"))
    ).select("doc_id", "phash_lo", "phash_hi")
    # the hash frame feeds both the group aggregate and the member
    # join — persist one generation so decode runs once, not twice
    (hashes,) = _persist_generation("image_dedup_verdict", hashes)
    g = hashes.groupBy("phash_lo", "phash_hi").agg(
        F.min("doc_id").cast("long").alias("rep")
    )
    # banding + Hamming verify shared with the composed image
    # curation pipeline (operators/multimodal.phash_band_best)
    best = mm.phash_band_best(g, _PHASH_HAM)
    members = hashes.join(g, ["phash_lo", "phash_hi"]).select(
        "doc_id", F.col("rep").alias("canonical_id")
    )
    return (
        members.join(
            best.withColumnRenamed("rep", "canonical_id"),
            "canonical_id",
            "left",
        )
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_exact_dup"),
            "near_canonical",
            "near_hamming",
        )
    )
