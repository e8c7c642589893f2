"""Minhash shingle-cache lifecycle (r12 — VERDICT r11 #3): the
module-global single-slot cache evicted the PREVIOUS call's live
shingle table on entry, so under the exercised concurrent-driver
pattern a second funnel call forced the first to recompute its
corpus-sized shingle table. The cache is now a bounded FIFO
(depth 2): two interleaved near_dedup_minhash calls both keep
their caches; a third evicts only the oldest, keeping session
storage bounded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _docs(spark, seed: int, n: int = 30):
    rows = []
    for i in range(n):
        base = f"s{seed} doc {i} " + " ".join(
            f"w{seed}x{i}y{j}" for j in range(12)
        )
        rows.append((i, base, "en"))
    # one planted near-dup pair per corpus
    rows.append((n, rows[0][1] + " tail", "en"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_two_interleaved_funnel_calls_keep_both_caches(spark):
    d1, d2 = _docs(spark, 1), _docs(spark, 2)
    # singleton references for the expected results
    want1 = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(d1).collect()
    }
    want2 = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(d2).collect()
    }
    assert want1 and want2  # the planted pairs were found
    # interleave: issue both, materialize both afterwards
    r1 = dedup.near_dedup_minhash(d1)
    r2 = dedup.near_dedup_minhash(d2)
    assert len(dedup._minhash_sh_cache) == 2
    assert all(df.is_cached for df in dedup._minhash_sh_cache)
    got1 = {(r.doc_a, r.doc_b) for r in r1.collect()}
    got2 = {(r.doc_a, r.doc_b) for r in r2.collect()}
    assert got1 == want1 and got2 == want2
    # both caches still live at materialization time (neither call
    # evicted the other's)
    assert all(df.is_cached for df in dedup._minhash_sh_cache)


def test_third_call_evicts_only_the_oldest(spark):
    d1, d2, d3 = _docs(spark, 5), _docs(spark, 6), _docs(spark, 7)
    dedup.near_dedup_minhash(d1)
    first = dedup._minhash_sh_cache[0]
    dedup.near_dedup_minhash(d2)
    second = dedup._minhash_sh_cache[-1]
    dedup.near_dedup_minhash(d3)
    assert len(dedup._minhash_sh_cache) == dedup._MINHASH_SH_KEEP
    assert not first.is_cached  # oldest released
    assert second.is_cached  # the newer survivor stays live


def test_blocked_pipeline_ckpt_fifo_keeps_constructed_results_live(spark):
    """r12: the blocked set-overlap pipeline (ngram/containment)
    shares its shingle table through an EAGER localCheckpoint in a
    bounded FIFO (_sh_ckpt_cache). Unlike a persist, an evicted
    checkpoint cannot recompute — so the depth must cover every
    construct-ahead pattern: two results constructed before either
    materializes must both stay collectable, and the FIFO must stay
    bounded at _SH_CKPT_KEEP across further calls."""
    # drain residue from earlier tests in the shared session — the
    # FIFO is now fed by every ckpt-sharing pipeline (blocked
    # set-overlap AND the indexed probe), so suite order would
    # otherwise leak entries into the count below
    while dedup._sh_ckpt_cache:
        dedup._sh_ckpt_cache.pop(0).unpersist()
    docs = [_docs(spark, 20 + i) for i in range(dedup._SH_CKPT_KEEP + 1)]
    r1 = dedup.ngram_jaccard_dupes(docs[0])
    r2 = dedup.containment_dupes(docs[1])
    assert len(dedup._sh_ckpt_cache) == 2
    # construct-ahead: both materialize AFTER both were constructed
    assert {(r.doc_a, r.doc_b) for r in r1.collect()}
    assert r2.count() >= 0  # containment may legitimately be empty
    for d in docs[2:]:
        dedup.ngram_jaccard_dupes(d).collect()
    assert len(dedup._sh_ckpt_cache) == dedup._SH_CKPT_KEEP


def test_probe_corpus_sh_path_matches_inline_derivation(spark, tmp_path):
    """r12: incremental_near_dups_indexed can take a pre-materialized
    corpus shingle table (corpus_sh) so probe-per-micro-batch streams
    shingle the static corpus once instead of 3x per batch. The
    corpus_sh path must be value-identical to the inline derivation,
    and the inline path's ckpt must enter the bounded FIFO."""
    base = _docs(spark, 30)
    batch = spark.createDataFrame(
        [(200, base.collect()[0].text + " tail tail", "en"),
         (201, "completely unrelated fresh content words here", "en")],
        "doc_id long, text string, lang string",
    )
    idx = str(tmp_path / "bidx")
    dedup.write_band_index(base, idx, tokenizer="whitespace")

    inline = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.incremental_near_dups_indexed(
            spark, idx, base, batch
        ).collect()
    }
    # the inline path registered its checkpoint in the bounded FIFO
    # (is_cached is persist-only — a checkpoint does not set it)
    assert dedup._sh_ckpt_cache

    corpus_sh = dedup._band_shingles(base, "whitespace").localCheckpoint(
        eager=True
    )
    try:
        shared = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups_indexed(
                spark, idx, base, batch, corpus_sh=corpus_sh
            ).collect()
        }
    finally:
        corpus_sh.unpersist()
    assert inline == shared and inline  # planted pair found, values equal
