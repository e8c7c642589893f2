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


def test_streaming_prefix_gate_replay_and_cross_batch(spark, tmp_path):
    """The streaming prefix gate's ledger discipline: (a) a
    conversation sharing a prefix only with an EARLIER BATCH (not the
    corpus) is still flagged — batch adds segments are live for later
    batches; (b) a checkpoint-reset replay reproduces the identical
    flags — batch-keyed overwrite + own-segment exclusion mean a
    replayed batch never sees its own prefixes as prior content."""
    import glob
    import os
    import shutil
    import time as _time

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        build_sft_prefix_index,
        run_sft_prefix_gate_stream,
    )

    corpus = spark.createDataFrame(
        [
            (1, "u: corpus question one a: answer u: follow one"),
            (2, "u: corpus question two a: answer u: follow two"),
        ],
        "doc_id long, text string",
    )
    # b0 doc 10 forks corpus doc 1 (depth 1); b0 doc 11 is NEW
    b0 = spark.createDataFrame(
        [
            (10, "u: corpus question one a: other reply u: divergent tail"),
            (11, "u: brand new topic a: reply u: more"),
        ],
        "doc_id long, text string",
    )
    # b1 doc 20 shares its FULL user content with b0's doc 11 —
    # flagged only because batch 0's segment is probed
    b1 = spark.createDataFrame(
        [(20, "u: brand new topic a: different answer u: more")],
        "doc_id long, text string",
    )
    pidx = str(tmp_path / "pidx")
    build_sft_prefix_index(corpus, pidx)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base_t = _time.time()
    for i, b in enumerate((b0, b1)):
        stage = str(tmp_path / f"stage_{i}")
        b.coalesce(1).write.parquet(stage)
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        os.utime(dst, (base_t + 10 * i, base_t + 10 * i))

    def run(ckpt, out):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = run_sft_prefix_gate_stream(
            spark, stream, pidx, str(tmp_path / out), str(tmp_path / ckpt)
        )
        assert q.awaitTermination(300)
        return sorted(
            (r.doc_id, r.shared_depth, r.n_partners)
            for r in spark.read.option(
                "basePath", str(tmp_path / out / "flags")
            )
            .parquet(str(tmp_path / out / "flags"))
            .collect()
        )

    flags = run("ck1", "out1")
    # doc 10: depth-1 fork of corpus doc 1; doc 11 clean;
    # doc 20: depth-2 (full user content) partner = b0's doc 11
    assert flags == [(10, 1, 1), (20, 2, 1)]
    # checkpoint-reset replay: identical flags, no self-collision
    assert run("ck2", "out2") == flags


def test_prefix_index_erase_serve_and_fenced_compaction(
    spark, tmp_path, monkeypatch
):
    """The prefix index is the SIXTH maintained artifact: erased
    subjects' prompt chains must never surface as partners (tombstone
    anti-join at serve), compaction folds them out physically, and
    the compactor is crash-fenced like every other artifact."""
    import json
    import os

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        artifact_lifecycle as alc,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        build_sft_prefix_index,
        read_sft_prefix_index,
        sft_prefix_index_compact,
        sft_prefix_index_erase,
    )

    convs = spark.createDataFrame(
        [
            (i, f"u: shared opening prompt a: reply {i} u: tail {i}")
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pfx")
    build_sft_prefix_index(convs, path)
    # a later batch segment too, so compaction folds adds as well
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        sft_prefix_digests,
    )

    extra = spark.createDataFrame(
        [(100, "u: shared opening prompt a: r u: different tail")],
        "doc_id long, text string",
    )
    sft_prefix_digests(extra).write.parquet(
        os.path.join(path, "adds", "batch_id=1")
    )

    st = sft_prefix_index_erase(
        spark, path, spark.createDataFrame([(2,), (3,)], "doc_id long")
    )
    assert st["n_ids"] == 2
    served = {
        r.doc_id for r in read_sft_prefix_index(spark, path).collect()
    }
    assert served == {0, 1, 4, 5, 6, 7, 100}  # tombstoned gone, add live

    # fenced compaction: crash between publish and retirement must
    # not re-apply tombstones or double-union the adds segment
    def crash(*_a, **_k):
        raise RuntimeError("simulated crash")

    with monkeypatch.context() as m:
        m.setattr(alc, "finish_compaction", crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            sft_prefix_index_compact(spark, path)
    marker = json.load(
        open(os.path.join(path, alc.PENDING_MARKER))
    )
    assert marker["segments"]
    served2 = {
        r.doc_id for r in read_sft_prefix_index(spark, path).collect()
    }
    assert served2 == served  # recovery rolled forward, fold exact
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    # physical exclusion after the fold
    base = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(path, "base")).collect()
    }
    assert base == served
    # a fresh gate run over the compacted index never pairs against
    # the erased subjects
    probe = sft_prefix_digests(
        spark.createDataFrame(
            [(200, "u: shared opening prompt a: x u: y")],
            "doc_id long, text string",
        )
    )
    partners = {
        r.doc_id
        for r in read_sft_prefix_index(spark, path)
        .join(
            probe.select("u_idx", "prefix_digest"),
            ["u_idx", "prefix_digest"],
        )
        .collect()
    }
    assert partners and not partners & {2, 3}


def test_turn_digests_are_deliberately_token_exact_on_cjk(spark):
    """VERDICT r10 ask #4, the choice pinned: the prefix chain is the
    EXACT tier of the chat-dedup funnel — a de-spaced CJK user turn
    and its segmented twin (same characters, different spacing) do
    NOT chain-match (precision at the admission gate; a false merge
    drops a novel prompt), while the funnel's lang-aware NEAR-DUP
    tier catches exactly that pair (the miss is covered one tier up,
    not silently)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        sft_prefix_digests,
    )

    zh = "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    seg = zh[:4] + " " + zh[4:10] + " " + zh[10:]
    convs = spark.createDataFrame(
        [
            (1, f"u: {zh} a: ok"),
            (2, f"u: {seg} a: ok"),  # segmentation-only variant
            (3, f"u: {zh} a: ok"),  # byte-identical twin of 1
        ],
        "doc_id long, text string",
    )
    d = {
        r.doc_id: r.prefix_digest
        for r in sft_prefix_digests(convs).filter(F.col("u_idx") == 1).collect()
    }
    assert d[1] == d[3]  # exact twins chain-match
    assert d[1] != d[2]  # segmentation variant does NOT (deliberate)
    # the near-dup tier (lang-aware default) catches what the exact
    # tier passes: a CJK near-dup pair (tail variant — a pure
    # segmentation variant de-spaces to byte-equal, which exact
    # dedup upstream already catches)
    docs = spark.createDataFrame(
        [(1, zh, "zh"), (2, zh + "再见", "zh")],
        "doc_id long, text string, lang string",
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(docs).collect()
    }
    assert (1, 2) in pairs or (2, 1) in pairs
