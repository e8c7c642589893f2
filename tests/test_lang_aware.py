"""Language-aware tokenization tier (round-9 ask #7): whitespace
word shingles treat a no-whitespace document as ONE word — near-dup
detection and token-based quality stats are blind on CJK-like text.
The lang-keyed char n-gram tier restores both."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
)

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def corpus(spark):
    zh_a = "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", "en"),
        (2, "the quick brown fox jumps over the lazy dog tonight", "en"),
        (3, "completely different english text about spark plans", "en"),
        (4, zh_a, "zh"),
        (5, zh_a + "再见", "zh"),  # near-dup tail variant
        (6, "另外一段毫不相关的中文内容讲的是机器学习训练数据去重的问题与方法", "zh"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_whitespace_shingles_are_blind_on_nonws_text(spark, corpus):
    pairs = dedup.near_dedup_minhash(
        corpus, tokenizer="whitespace"
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (4, 5) not in found  # the planted zh near-dup is invisible
    # and the zh docs each carry exactly ONE whitespace token
    zh_tokens = (
        corpus.filter(F.col("lang") == "zh")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert zh_tokens == 3


def test_lang_aware_tier_finds_planted_pair_and_keeps_en_results(
    spark, corpus
):
    sh = dedup.lang_aware_shingles(corpus).persist()
    try:
        cands = dedup.lsh_candidate_pairs(corpus, sh=sh)
        pairs = (
            dedup.ngram_jaccard_pairs(corpus, cands, sh=sh)
            .filter(F.col("jaccard") >= 0.6)
            .collect()
        )
    finally:
        sh.unpersist()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (4, 5) in found  # planted zh near-dup caught
    assert not any(6 in p for p in found)  # unrelated zh stays clean
    # en docs shingle identically under both tokenizers
    en = corpus.filter(F.col("lang") == "en")
    a = {
        (r.doc_id, r.shingle)
        for r in dedup.lang_aware_shingles(en).collect()
    }
    b = {(r.doc_id, r.shingle) for r in dedup.shingles(en).collect()}
    assert a == b


def test_fixture_generator_delta(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    rep = {
        r.tokenizer: r
        for r in dedup.lang_dedup_delta_report(
            dedup.with_cjk_docs(docs)
        ).collect()
    }
    ws, la = rep["whitespace"], rep["lang_aware"]
    # whitespace: zero non-ws pairs, ~one token per de-spaced doc
    assert ws.n_nonws_pairs == 0 and ws.n_nonws_docs_flagged == 0
    n_zh = docs.filter(F.col("lang") == "zh").count()
    n_variants = docs.filter(
        (F.col("lang") == "zh") & (F.col("doc_id") % 2 == 1)
    ).count()
    assert ws.nonws_token_units == n_zh + n_variants
    # lang-aware: catches planted pairs, token units scale with chars
    assert la.n_nonws_pairs > 0
    assert la.n_nonws_docs_flagged >= la.n_nonws_pairs
    assert la.nonws_token_units > 100 * ws.nonws_token_units
    # whitespace-language results are identical in both modes
    assert la.n_pairs - la.n_nonws_pairs == ws.n_pairs - ws.n_nonws_pairs


def test_funnel_default_is_lang_aware(spark, corpus):
    """VERDICT r9 ask #3: the corpus-hygiene DEFAULT is the honest
    tokenizer — near_dedup_minhash with no flags catches the planted
    CJK near-dup the whitespace compat form provably misses, and the
    whitespace-language results are unchanged between the modes."""
    default_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(corpus).collect()
    }
    ws_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(
            corpus, tokenizer="whitespace"
        ).collect()
    }
    assert (4, 5) in default_pairs and (4, 5) not in ws_pairs
    assert not any(6 in p for p in default_pairs)
    en_ids = {1, 2, 3}
    assert {p for p in default_pairs if set(p) <= en_ids} == {
        p for p in ws_pairs if set(p) <= en_ids
    }
    # corpora without a lang column fall back to whitespace (total)
    nolang = corpus.drop("lang")
    assert (4, 5) not in {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dedup_minhash(nolang).collect()
    }


def test_honest_funnel_drives_delta_to_zero(spark, corpus):
    """The lang_dedup_delta_report acceptance check inverted: once
    the funnel default IS lang-aware, re-running the delta comparison
    with the default as the 'whitespace' arm would find nothing extra
    — i.e. default-mode pairs == lang-aware-mode pairs exactly."""
    default_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.near_dedup_minhash(corpus).collect()
    }
    sh = dedup.lang_aware_shingles(corpus).persist()
    try:
        explicit = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs_content_addressed(
                corpus,
                dedup.lsh_candidate_pairs(corpus, sh=sh),
                sh,
                0.6,
            ).collect()
        }
    finally:
        sh.unpersist()
    assert default_pairs == explicit


def test_gopher_length_gates_key_on_lang_aware_units(spark):
    """VERDICT r9 ask #3 (second half): the Gopher length gates run
    on lang-aware units — a long de-spaced zh doc (ONE whitespace
    token, many chars) passes the short-gate instead of being
    rejected as a one-word doc; a genuinely short zh doc still
    flags; the mean-word-length rule never fires without word
    boundaries."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        text,
    )

    long_zh = "天气很好我们去公园散步喝茶聊天看书写字" * 3  # 60 chars
    docs = spark.createDataFrame(
        [
            (0, long_zh, "zh", "web", len(long_zh)),
            (1, "短文", "zh", "web", 2),  # 2 chars < 20-unit floor
            (
                2,
                "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu",
                "en",
                "web",
                60,
            ),
            (3, "tiny doc here", "en", "web", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = text.gopher_quality_report(docs).collect()[0]
    # zh short doc + en short doc flag; the LONG zh doc does not
    assert row.n_docs == 4 and row.n_short == 2
    # no wordlen flags: the zh docs are exempt, the en docs are sane
    assert row.n_wordlen == 0
    # whitespace gating would have flagged the long zh doc too:
    ws_tokens = docs.filter(F.col("doc_id") == 0).select(
        F.size(F.split("text", " ")).alias("n")
    ).collect()[0].n
    assert ws_tokens == 1


def test_band_artifact_tokenizer_is_recorded_and_honored(
    spark, tmp_path
):
    """r10: the banding tokenizer is an artifact parameter — a
    lang-aware index finds the planted CJK batch pair a whitespace
    index provably misses; adds and probes read the meta so
    cross-batch discovery stays mode-consistent; the meta survives
    erase + fenced compaction."""
    zh_a = "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    zh_c = "另外一段毫不相关的中文内容讲的是机器学习训练数据去重的问题与方法"
    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "en"),
            (4, zh_a, "zh"),
            (6, zh_c, "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    batch = spark.createDataFrame(
        [
            (104, zh_a + "再见", "zh"),  # near-dup of 4
            (101, "the quick brown fox jumps over the lazy dog soon", "en"),
        ],
        "doc_id long, text string, lang string",
    )

    ws = str(tmp_path / "ws")
    dedup.write_band_index(base, ws, tokenizer="whitespace")
    assert dedup.band_index_tokenizer(ws) == "whitespace"
    found_ws = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_near_dups_indexed(
            spark, ws, base, batch
        ).collect()
    }
    assert (4, 104) not in found_ws  # whitespace mode is blind
    assert (1, 101) in found_ws  # en pair found either way

    la = str(tmp_path / "la")
    dedup.write_band_index(base, la, tokenizer="lang_aware")
    assert dedup.band_index_tokenizer(la) == "lang_aware"
    found_la = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_near_dups_indexed(
            spark, la, base, batch
        ).collect()
    }
    assert (4, 104) in found_la and (1, 101) in found_la
    assert not any(6 in p for p in found_la)

    # adds honor the mode: batch lands as a segment, a LATER batch
    # near-dups against it through the segment
    dedup.band_index_add(spark, la, batch, 1)
    b2 = spark.createDataFrame(
        [(204, zh_a + "再见了", "zh")],
        "doc_id long, text string, lang string",
    )
    store = base.unionByName(batch)
    found_b2 = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_near_dups_indexed(
            spark, la, store, b2
        ).collect()
    }
    assert (4, 204) in found_b2 and (104, 204) in found_b2

    # meta survives erase + fenced compaction
    dedup.band_index_erase(spark, la, base.filter(F.col("doc_id") == 6))
    dedup.band_index_compact(spark, la)
    assert dedup.band_index_tokenizer(la) == "lang_aware"
    after = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_near_dups_indexed(
            spark, la, store, b2
        ).collect()
    }
    assert (4, 204) in after and not any(6 in p for p in after)

    # a lang_aware build without a lang column refuses loudly
    with pytest.raises(ValueError, match="lang column"):
        dedup.write_band_index(
            base.drop("lang"), str(tmp_path / "x"), tokenizer="lang_aware"
        )
    with pytest.raises(ValueError, match="unknown band tokenizer"):
        dedup.write_band_index(base, str(tmp_path / "y"), tokenizer="bogus")


def test_lang_aware_band_index_through_cluster_stream(spark, tmp_path):
    """The streaming closure of the tokenizer story: the cluster-
    update stream probes and appends through the meta-aware band
    paths, so a LANG-AWARE artifact discovers CJK near-dups across
    micro-batches (batch 1 vs base through the artifact, batch 2 vs
    batch 1 through the adds segment) that the whitespace stream
    provably cannot see. Final labels equal the full lang-aware
    recompute, and a checkpoint-reset replay changes nothing
    (algebraic CC idempotence, unchanged by the tokenizer)."""
    import glob as _glob
    import os
    import shutil
    import time as _time

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        run_cluster_update_stream,
    )

    zh_a = "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    zh_c = "另外一段毫不相关的中文内容讲的是机器学习训练数据去重的问题与方法"
    schema = "doc_id long, text string, lang string"
    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "en"),
            (4, zh_a, "zh"),
            (6, zh_c, "zh"),
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [(104, zh_a + "再见", "zh")], schema  # near-dup of base 4
    )
    b2 = spark.createDataFrame(
        [(204, zh_a + "再见了", "zh")], schema  # near-dup of 4 AND 104
    )
    every = base.unionByName(b1).unionByName(b2)

    def la_pairs(docs):
        sh = dedup.lang_aware_shingles(docs).persist()
        try:
            return dedup.jaccard_pairs_content_addressed(
                docs, dedup.lsh_candidate_pairs(docs, sh=sh), sh, 0.6
            ).localCheckpoint(eager=True)
        finally:
            sh.unpersist()

    bidx = str(tmp_path / "bidx")
    dedup.write_band_index(base, bidx, tokenizer="lang_aware")
    lab = str(tmp_path / "lab")
    os.makedirs(lab)
    dedup.near_dup_clusters(base, pairs=la_pairs(base)).write.parquet(
        f"{lab}/labels"
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base_t = _time.time()
    for i, b in enumerate((b1, b2)):
        stage = str(tmp_path / f"stage_{i}")
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        part = _glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (base_t + 10 * i, base_t + 10 * i))

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = run_cluster_update_stream(
            spark, stream, bidx, base, lab, str(tmp_path / ckpt)
        )
        assert q.awaitTermination(300)

    run("ck1")
    streamed = {
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(f"{lab}/labels").collect()
    }
    expected = {
        (r.doc_id, r.cluster_id)
        for r in dedup.near_dup_clusters(
            every, pairs=la_pairs(every)
        ).collect()
    }
    assert streamed == expected
    # the planted CJK chain is ONE cluster rooted at the base doc —
    # cross-batch discovery (104↔204) went through the adds segment
    assert {(4, 4), (104, 4), (204, 4)} <= streamed
    assert not any(d == 6 for d, _ in streamed)

    # checkpoint-reset replay: no change
    run("ck2")
    again = {
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(f"{lab}/labels").collect()
    }
    assert again == streamed
