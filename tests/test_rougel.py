"""ROUGE-L instruction near-dup (r12 wave 10 — the self-instruct
hygiene rule): LCS-based F-measure over candidate instruction pairs,
rare-gram blocked. Pins the two planted quadrants (light paraphrase
flags at ≈0.83; diverging-tail variant blocks into the candidate set
but fails the 0.7 verify) and the ORDER-sensitivity claim that
justifies the tier next to Jaccard/minhash: a same-multiset token
reshuffle has Jaccard 1.0 but ROUGE-L below the cutoff."""

from __future__ import annotations

import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _instr(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, instruction string")


BASE = "write a short formal email to the team about the launch"


def test_paraphrase_flags_and_divergent_tail_fails_verify(spark):
    para = "write a short formal pls email to the kindly team about the launch"
    tail = "write a short formal email plus totally unrelated new content here now"
    instr = _instr(
        spark,
        [(1, BASE), (2, para), (3, tail)],
    )
    out = {
        (r.doc_a, r.doc_b): (r.lcs, r.rouge_l)
        for r in text.rougel_instruction_dupes(instr).collect()
    }
    # paraphrase: 11-token LCS vs 11/13 lengths → 2*11/24 = 0.9167
    assert (1, 2) in out
    lcs, f = out[(1, 2)]
    assert lcs == 11 and f >= 0.7
    # diverging tail shares the opening 4-gram (a blocking candidate)
    # but its F-measure stays below the cutoff
    assert (1, 3) not in out


def test_reshuffle_same_multiset_scores_below_cutoff(spark):
    """The order axis: identical token MULTISET, tail reshuffled —
    exact Jaccard is 1.0 and the intact opening 4-gram makes it a
    CANDIDATE, but LCS sees the broken order and the verify drops
    it."""
    shuffled = "write a short formal launch the about team the to email"
    instr = _instr(spark, [(1, BASE), (2, BASE + " x"), (3, shuffled)])
    got = text.rougel_instruction_dupes(instr).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (1, 2) in pairs  # near-identical control still flags
    assert (1, 3) not in pairs  # the same-multiset reshuffle does not
    # the reshuffle really is a same-multiset permutation (Jaccard 1)
    assert sorted(BASE.split()) == sorted(shuffled.split())


def test_blocking_requires_shared_rare_gram(spark):
    """Two unrelated instructions share no 4-gram — never a
    candidate pair, regardless of any incidental token overlap."""
    other = "summarize the quarterly report for the board in bullet points"
    instr = _instr(spark, [(1, BASE), (2, other)])
    assert text.rougel_instruction_dupes(instr).count() == 0


def test_instruction_corpus_plants_both_quadrants(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = text.instruction_corpus(docs)
    flagged = text.rougel_instruction_dupes(corpus)
    rows = flagged.collect()
    pairs = {(r.doc_a, r.doc_b): r.rouge_l for r in rows}
    # every paraphrase variant flags against its base ...
    bases = [
        r.doc_id
        for r in docs.select("doc_id").collect()
        if r.doc_id % text.INSTR_PARA_MOD == text.INSTR_PARA_RESIDUE
    ]
    assert bases
    for b in bases:
        assert (b, b + text.INSTR_PARA_ID_OFFSET) in pairs
    # ... and no diverging-tail variant does
    assert not any(
        b - a == text.INSTR_TAIL_ID_OFFSET
        and a % text.INSTR_PARA_MOD == text.INSTR_TAIL_RESIDUE
        for (a, b) in pairs
    )
