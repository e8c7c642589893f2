"""Token-budget honest-unit migration (r12 — VERDICT r11 #1): the
budget/packing tiers (chunk_documents, pack_documents, the packing
plans/curves, the shard manifest's n_tokens) counted whitespace
tokens, so a de-spaced CJK document was ONE "token" — context
budgets under-filled ~300x and epoch/token accounting lied on the
no-whitespace partition. The lang-aware unit counts CHARS there
(lang_aware_token_stats' unit); the MAINTAINED manifest artifact
records its unit in `_tokenizer.json` (the band/chunk-index
recorded-parameter discipline) and every add/erase/verify path
reads the recorded mode; meta-less (pre-r12) manifests read as
whitespace."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    pipeline,
)

pytestmark = pytest.mark.filterwarnings("ignore")

# ~300 chars, zero spaces — whitespace counting sees ONE token
_ZH = (
    "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    "另外一段内容讲的是机器学习训练数据去重的问题与方法模型评估指标"
    "以及大规模语料清洗流程中的分块指纹去重策略和增量维护机制设计细节"
) * 3


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "english words repeated here " * 8, "en"),
        (2, _ZH, "zh"),
        (3, "null lang stays on the word path " * 4, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_whitespace_unit_provably_underbudgets_despaced_cjk(
    spark, corpus
):
    """The migration's reason to exist: under the whitespace unit
    the de-spaced zh doc is ONE token; lang_aware counts its chars."""
    ws = {
        r.doc_id: r.n_tokens
        for r in text.pack_documents(
            corpus, tokenizer="whitespace"
        ).collect()
    }
    la = {
        r.doc_id: r.n_tokens
        for r in text.pack_documents(corpus).collect()  # default=la
    }
    zh_len = len(_ZH)
    assert ws[2] == 1  # the lie
    assert la[2] == zh_len  # the honest unit
    assert zh_len > 100  # under-budgeting by >100x on this doc
    # whitespace-script and null-lang docs count identically
    assert la[1] == ws[1] and la[3] == ws[3]


def test_chunk_documents_lang_aware_char_windows(spark, corpus):
    ws = text.chunk_documents(corpus, tokenizer="whitespace")
    la = text.chunk_documents(corpus)  # lang column -> lang_aware
    # whitespace mode: the de-spaced doc yields ONE whole-doc chunk
    assert ws.filter(F.col("doc_id") == 2).count() == 1
    # lang-aware: char windows, ~len/stride chunks
    n_la = la.filter(F.col("doc_id") == 2).count()
    assert n_la >= len(_ZH) // 32 - 1
    chunks = la.filter(F.col("doc_id") == 2).orderBy("chunk_id")
    first = chunks.first()
    assert first.chunk == _ZH[:64]
    # en + null-lang docs chunk identically in both modes
    for did in (1, 3):
        a = {
            (r.chunk_id, r.start_token, r.chunk)
            for r in ws.filter(F.col("doc_id") == did).collect()
        }
        b = {
            (r.chunk_id, r.start_token, r.chunk)
            for r in la.filter(F.col("doc_id") == did).collect()
        }
        assert a == b


def test_resolve_budget_tokenizer_contract(spark):
    no_lang = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    assert text.resolve_budget_tokenizer(no_lang, None) == "whitespace"
    with pytest.raises(ValueError, match="lang column"):
        text.resolve_budget_tokenizer(no_lang, "lang_aware")
    with pytest.raises(ValueError, match="unknown budget tokenizer"):
        text.resolve_budget_tokenizer(no_lang, "bpe")


def test_manifest_records_unit_and_maintains_in_it(spark, corpus, tmp_path):
    """The recorded-parameter migration end to end: build lang_aware,
    add + erase count in the recorded unit, and the served fold
    equals a from-scratch lang-aware rebuild (incremental == rebuild
    in the honest unit)."""
    path = str(tmp_path / "m")
    base = corpus.filter(F.col("doc_id") != 2)
    pipeline.build_manifest_artifact(base, path, tokenizer="lang_aware")
    assert pipeline.manifest_tokenizer(path) == "lang_aware"
    # the zh doc arrives via the batch door (recorded unit read there)
    pipeline.manifest_add_batch(
        spark, path, corpus.filter(F.col("doc_id") == 2), 1
    )
    served = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, path).collect()
    }
    rebuilt = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            corpus, tokenizer="lang_aware"
        ).collect()
    }
    assert served == rebuilt
    # consumer closure green in the recorded unit
    report = pipeline.manifest_packing_verify(spark, path, corpus).collect()
    assert report and all(
        r.counts_match == 1 and r.xor_match == 1 for r in report
    )
    # erase the zh doc: the delta is char-counted (recorded unit) so
    # the fold lands exactly back on the zh-less rebuild
    pipeline.manifest_erase(
        spark, path, corpus.filter(F.col("doc_id") == 2), seg_id=1
    )
    after = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline.read_manifest_serving(spark, path).collect()
    }
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            base, tokenizer="lang_aware"
        ).collect()
    }
    assert after == want


def test_metaless_manifest_reads_as_whitespace(spark, corpus, tmp_path):
    """Pre-r12 manifests have no `_tokenizer.json`: they were built
    whitespace and must keep verifying in that unit."""
    path = str(tmp_path / "m")
    pipeline.build_manifest_artifact(corpus, path)  # default whitespace
    os.remove(os.path.join(path, pipeline.MANIFEST_TOKENIZER_FILE))
    assert pipeline.manifest_tokenizer(path) == "whitespace"
    report = pipeline.manifest_packing_verify(spark, path, corpus).collect()
    assert report and all(
        r.counts_match == 1 and r.xor_match == 1 for r in report
    )


def test_manifest_rebuild_refuses_live_segments(spark, corpus, tmp_path):
    """A rebuild (possibly with a different unit) over live segments
    would mix words and chars in the additive n_tokens fold."""
    path = str(tmp_path / "m")
    pipeline.build_manifest_artifact(corpus, path)
    pipeline.manifest_add_batch(
        spark, path, corpus.filter(F.col("doc_id") == 1), 7
    )
    with pytest.raises(ValueError, match="live segment"):
        pipeline.build_manifest_artifact(
            corpus, path, tokenizer="lang_aware"
        )


def test_shard_manifest_update_lang_aware_patch_equals_rebuild(
    spark, corpus
):
    v1 = corpus.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 1,
            F.concat(F.col("text"), F.lit(" revised")),
        ).otherwise(F.col("text")),
    )
    patched = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in text.shard_manifest_update(corpus, v1).collect()
    }
    rebuilt = {
        r.shard: (r.n_docs, r.n_tokens, r.content_xor)
        for r in pipeline._manifest_shard_rows(
            v1, tokenizer="lang_aware"
        ).collect()
    }
    assert patched == rebuilt


def test_budget_family_extensions_count_honest_units(spark):
    """r12 extension sweep: the mixture/epoch/curriculum/card tiers
    allocate or report token mass — a de-spaced zh source must enter
    those folds at its char mass, not as one-token-per-doc."""
    zh_text = "今天天气很好" * 20  # 120 chars, no spaces
    rows = [
        (i, "english words here " * 10, "en", "web", 190)
        for i in range(10)
    ] + [(100 + i, zh_text, "zh", "cjk", 120) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # mixture weights: zh source mass = 10 * 120 chars, not 10 * 1
    w = {
        r.source: r.n_tokens
        for r in text.temperature_mixture_weights(docs).collect()
    }
    assert w["cjk"] == 10 * 120
    ws_mode = {
        r.source: r.n_tokens
        for r in text.temperature_mixture_weights(
            docs, tokenizer="whitespace"
        ).collect()
    }
    assert ws_mode["cjk"] == 10  # the lie, preserved under the flag
    # epoch budget: honest zh mass keeps implied epochs sane
    ep = {
        r.source: r.n_tokens
        for r in text.epoch_budget_report(docs).collect()
    }
    assert ep["cjk"] == 10 * 120
    # curriculum: total phase-0 token mass includes zh chars
    cur = text.curriculum_phase_plan(docs).collect()
    phase0 = [r for r in cur if r.min_decile == 0][0]
    assert phase0.n_tokens == sum(
        len(t.split(" ")) for _, t, lang, _, _ in rows if lang == "en"
    ) + 10 * 120
    # dataset card: both units reported, la > ws on this corpus
    card = text.dataset_card_report(docs).collect()[0]
    assert card.total_la_tokens > card.total_ws_tokens
    assert card.total_la_tokens - card.total_ws_tokens == 10 * (120 - 1)
