"""Multi-turn prompt-prefix dedup (round-9 ask #3): conversations
sharing a user-turn PREFIX with divergent tails — the dominant
chat-data duplication mode — are invisible to byte hashing AND to
the whole-user-content digest (sft_user_dedup). The planted fixtures
prove both misses and the prefix chain's catch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def convs(spark):
    rows = [
        # A and C: identical FULL user content, different assistant
        (1, "u: how do i sort a list a: use sorted u: and reversed"),
        (3, "u: how do i sort a list a: try dot sort u: and reversed"),
        # B: shares only the FIRST user turn with A/C (prefix fork)
        (2, "u: how do i sort a list a: use sorted u: now explain big o"),
        # D: unrelated conversation
        (4, "u: what is a monad a: a monoid in disguise"),
        # E: not a dialogue at all
        (5, "plain prose document with no markers"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_byte_and_user_digest_both_miss_the_fork(spark, convs):
    # byte level: all five texts are distinct
    assert (
        convs.groupBy(F.md5("text")).count().filter("count >= 2").count()
        == 0
    )
    # whole-user-content digest: finds A~C, MISSES the fork B
    groups = text.sft_user_dedup(convs).collect()
    assert len(groups) == 1
    assert groups[0].keeper_doc_id == 1 and groups[0].n_copies == 2


def test_prefix_chain_finds_fork_and_separates_depths(spark, convs):
    rows = {r.doc_id: r for r in text.sft_prefix_dedup(convs).collect()}
    # A and C share the full 2-turn prefix — deepest depth 2, pair
    assert rows[1].shared_depth == 2 and rows[1].n_sharers == 2
    assert rows[3].shared_depth == 2 and rows[3].n_sharers == 2
    assert rows[1].is_keeper == 1 and rows[3].is_keeper == 0
    assert rows[1].keeper_doc_id == rows[3].keeper_doc_id == 1
    # the fork B shares only depth 1 — with ALL THREE openers
    assert rows[2].shared_depth == 1 and rows[2].n_sharers == 3
    assert rows[2].keeper_doc_id == 1 and rows[2].is_keeper == 0
    # unrelated and non-dialogue docs emit nothing
    assert 4 not in rows and 5 not in rows


def test_fixture_generator_plants_both_modes(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    fixture = text.with_prefix_fork_docs(docs)
    report = text.sft_prefix_dedup(fixture)
    forks = report.filter(
        F.col("doc_id") >= text.PREFIX_FORK_ID_OFFSET
    ).collect()
    assert forks  # the fixture planted prefix forks
    # every fork shares exactly its first user turn with its base,
    # which is also its keeper
    for r in forks:
        assert r.shared_depth == 1
        assert r.keeper_doc_id == r.doc_id - text.PREFIX_FORK_ID_OFFSET
        assert r.is_keeper == 0
    # dialogue variants (full user content shared) sit at depth 2
    variants = report.filter(
        (F.col("doc_id") >= 400000)
        & (F.col("doc_id") < text.PREFIX_FORK_ID_OFFSET)
    ).collect()
    assert variants and all(r.shared_depth == 2 for r in variants)
    # the whole-content digest finds the variants but NOT the forks
    ud = text.sft_user_dedup(fixture)
    fork_bases = {r.keeper_doc_id for r in forks}
    caught = {
        r.keeper_doc_id
        for r in ud.collect()
        if r.keeper_doc_id in fork_bases
    }
    # a fork's base is caught by sft_user_dedup only via its OWN
    # depth-2 variant (doc%8==6 bases have none: variants need %8==2)
    assert not caught
