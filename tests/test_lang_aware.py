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
    pairs = dedup.near_dedup_minhash(corpus).collect()
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
