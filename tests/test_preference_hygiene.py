"""Preference-pair (RLHF/reward-model) hygiene widening (VERDICT r9
ask #6): chosen≈rejected NEAR-degenerate detection via the
content-addressed Jaccard verify on the pair relation, and
cross-pair prompt dedup via the SFT prefix-digest device with the
keep-one rule priced."""

from __future__ import annotations

import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)

pytestmark = pytest.mark.filterwarnings("ignore")


def _pairs(spark):
    rows = [
        # healthy
        (0, 100, "what is spark sql good for", "a full clear answer here",
         "a vague wrong answer here"),
        # exact degenerate
        (1, 200, "how do windows work in spark", "the identical answer text",
         "the identical answer text"),
        # NEAR degenerate: one hedging token appended
        (2, 300, "explain shuffle partitions please",
         "partitions split the shuffled data across executors evenly",
         "partitions split the shuffled data across executors evenly though"),
        # shared prompt group (3 pairs, one prompt)
        (3, 400, "shared canned prompt here", "answer three", "worse three"),
        (4, 500, "shared canned prompt here", "answer four", "worse four"),
        (5, 600, "shared canned prompt here", "answer five", "worse five"),
    ]
    return spark.createDataFrame(
        rows,
        "pair_id long, src_doc_id long, prompt string, chosen string, "
        "rejected string",
    )


def test_near_dup_audit_counts_planted_defects(spark):
    row = text.preference_pair_near_dup_audit(_pairs(spark)).collect()[0]
    assert row.n_pairs == 6
    assert row.n_exact_degenerate == 1  # pair 1 only
    assert row.n_near_degenerate == 1  # pair 2 only — hedge suffix
    # one shared-prompt group of 3; keep-one drops 2
    assert row.n_shared_prompt_pairs == 3
    assert row.n_shared_prompt_groups == 1
    assert row.n_dropped_by_prompt_dedup == 2
    assert row.degenerate_any_ppm == 333333


def test_near_degenerate_planting_is_byte_inequal_but_near(spark):
    """The fixture's planted mode must be exactly the one the exact
    check misses: byte-inequal, Jaccard ≥ 0.6."""
    base = text.with_preference_pairs(
        spark.createDataFrame(
            [(i, " ".join(f"w{i}t{j}" for j in range(10)))
             for i in range(0, 300, 5)],
            "doc_id long, text string",
        )
    )
    planted = text.with_near_degenerate_pairs(base)
    near = planted.filter(
        (planted.pair_id % text.PREF_NEAR_DEGEN_MOD == 2)
    ).collect()
    assert near
    for r in near:
        if r.pair_id % text.PREF_DEGENERATE_MOD == 1:
            continue  # already exact-degenerate: planting skips it
        assert r.rejected == r.chosen + " though"
        assert r.rejected != r.chosen
    # the audit classifies them as near, not exact
    row = text.preference_pair_near_dup_audit(planted).collect()[0]
    n_near_expected = sum(
        1
        for r in near
        if r.pair_id % text.PREF_DEGENERATE_MOD != 1
    )
    assert row.n_near_degenerate == n_near_expected > 0


def test_prompt_dedup_keys_on_full_prompt_despite_markers(spark):
    """ADVICE r10: prompts CONTAINING dialogue-marker tokens
    ('u:'/'a:') must not merge — the audit keys prompt dedup on
    md5(prompt), not on a prefix-chain digest that truncates at the
    first marker. These two prompts share the pre-marker head and
    would collide under a depth-1 prefix digest."""
    rows = [
        (0, 1, "explain this trace\na: first variant tail",
         "good answer", "bad answer"),
        (1, 2, "explain this trace\na: second different tail",
         "good answer two", "bad answer two"),
        # a genuine duplicate prompt group, markers included
        (2, 3, "same prompt\nu: with marker", "x", "y"),
        (3, 4, "same prompt\nu: with marker", "p", "q"),
    ]
    pairs = spark.createDataFrame(
        rows,
        "pair_id long, src_doc_id long, prompt string, chosen string, "
        "rejected string",
    )
    row = text.preference_pair_near_dup_audit(pairs).collect()[0]
    # only the byte-identical prompt pair groups; the marker-headed
    # distinct prompts stay distinct
    assert row.n_shared_prompt_groups == 1
    assert row.n_shared_prompt_pairs == 2
    assert row.n_dropped_by_prompt_dedup == 1
