"""Bounded-state proof for the dedup copy-group path (round 8).

The r7 verdict's named state hazard: the pair generators used to
``collect_list`` every member id into ONE array per md5 fingerprint,
so a boilerplate page copied 10M times became a single hot
aggregation group (per-group state linear in copy multiplicity).
Round 8 replaced the array with a persisted map-only (fp, id)
projection — the rep aggregate now holds constant state (min(id) +
first(text)) per group regardless of skew.

Two proofs here:
  1. PLAN: no collect_list / ObjectHashAggregate appears anywhere in
     the physical plan of either generator — the aggregation is a
     plain hash aggregate whose per-group state is a fixed struct.
  2. SKEWED FIXTURE: one copy-group ~50x larger than every other
     still produces the exact expected pair set (intra pairs =
     n*(n-1)/2 at jaccard 1.0 / hamming 0, cross pairs expand the
     verified rep pair to every member combination).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from az_datapipeline_sentiment_analysis_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def skewed(spark):
    """201-doc corpus: one 150-copy group (the "boilerplate page"),
    one 3-copy near-dup partner group, 48 distinct fillers."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    near = (
        "the quick brown fox jumps over the lazy dog again and once more"
    )
    rows = [(i, boiler) for i in range(150)]
    rows += [(1000 + i, near) for i in range(3)]
    # letter-distinct filler words: the shingle tokenizer is [a-z]+,
    # so digit-suffixed words would all collapse to the same token
    rows += [
        (2000 + i, f"unique filler document {'ax' * (i + 1)} with "
                   f"{'be' * (i + 1)} and {'cy' * (i + 1)} plus "
                   f"{'dz' * (i + 1)} tail words here")
        for i in range(48)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_pairs_plan_has_no_copy_group_collect(skewed):
    plan = _plan(dd.minhash_pairs(skewed, threshold=0.3))
    assert "collect_list" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_simhash_pairs_plan_has_no_copy_group_collect(skewed):
    plan = _plan(dd.simhash_pairs(skewed))
    assert "collect_list" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_minhash_pairs_exact_on_skewed_copy_groups(skewed):
    pairs = dd.minhash_pairs(skewed, threshold=0.3)
    rows = pairs.collect()
    # intra-group pairs: C(150,2) + C(3,2) at jaccard 1.0
    exact = [r for r in rows if r.jaccard == 1.0]
    assert len(exact) == 150 * 149 // 2 + 3
    # the boiler<->near rep pair must expand to every member combo
    cross = [
        r for r in rows
        if r.doc_a < 1000 and 1000 <= r.doc_b < 2000
    ]
    assert len(cross) == 150 * 3
    # no pair involves two distinct fillers
    assert not any(r.doc_a >= 2000 and r.doc_b >= 2000 for r in rows)


def test_simhash_pairs_exact_on_skewed_copy_groups(skewed):
    rows = dd.simhash_pairs(skewed).collect()
    zero = [r for r in rows if r.hamming == 0 and (
        (r.doc_a < 1000 and r.doc_b < 1000)
        or (1000 <= r.doc_a < 2000 and 1000 <= r.doc_b < 2000)
    )]
    assert len(zero) == 150 * 149 // 2 + 3
    cross = [
        r for r in rows
        if r.doc_a < 1000 and 1000 <= r.doc_b < 2000
    ]
    # ALL-OR-NOTHING member expansion: whether the boiler/near rep
    # pair qualifies depends on the simhash bit flips of the tail
    # edit, but if the rep pair qualifies it must expand to every
    # member combination — a partial expansion would mean the
    # members projection lost rows under skew
    sigs = {
        r.id: r.simhash
        for r in dd.simhash_signatures(
            skewed.filter(F.col("doc_id").isin(0, 1000)),
            id_col="doc_id",
        ).collect()
    }
    x = (sigs[0] ^ sigs[1000]) & ((1 << 64) - 1)
    rep_ham = bin(x).count("1")
    # candidacy = >=1 identical 16-bit chunk (the banding heuristic),
    # verification = hamming <= max; both must hold for the rep pair
    shares_chunk = any(
        (x >> (16 * c)) & 0xFFFF == 0 for c in range(dd.SIMHASH_CHUNKS)
    )
    expected = (
        150 * 3 if (shares_chunk and rep_ham <= dd.HAMMING_MAX) else 0
    )
    assert len(cross) == expected, (rep_ham, len(cross))
    assert all(r.hamming <= dd.HAMMING_MAX for r in rows)


def test_members_projection_is_map_only(skewed):
    # the members frame the expansion joins on must be a scan-side
    # projection: no Exchange (shuffle) and no Aggregate in its plan
    keyed = skewed.select(
        F.col("doc_id").alias("id"),
        "text",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
    )
    plan = _plan(keyed.select("fp", "id"))
    assert "Exchange" not in plan, plan
    assert "Aggregate" not in plan, plan
