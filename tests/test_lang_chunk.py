"""Language-aware CDC chunk tier (VERDICT r10 #1): whitespace-split
chunking sees a de-spaced CJK document as ONE word — (almost always)
one whole-doc chunk — so content_defined_chunks /
chunk_dedup_report / the maintained chunk-digest index silently
degrade to exact whole-doc dedup on no-whitespace scripts. The char
rolling-hash tier restores content-defined boundaries, and the
chunk-digest artifact records its tokenizer (`_tokenizer.json`, the
band-index discipline) so add/probe/erase can never mix modes."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
    cdc_chunk_table,
    content_defined_chunks,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
    build_chunk_digest_index,
    chunk_index_tokenizer,
    read_chunk_digest_index,
)

pytestmark = pytest.mark.filterwarnings("ignore")

# long enough that char rolling-hash boundaries (mod 16, k=6) fire
_ZH = (
    "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    "另外一段内容讲的是机器学习训练数据去重的问题与方法模型评估指标"
    "以及大规模语料清洗流程中的分块指纹去重策略和增量维护机制设计细节"
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, _ZH, "zh"),
        # PREFIX-SHIFTED duplicate: the CDC virtue — everything after
        # the insertion re-aligns; fixed-width or whole-doc chunking
        # shares nothing
        (2, "前面插入了一段新的开头" + _ZH, "zh"),
        (3, "the quick brown fox jumps over the lazy dog " * 8, "en"),
        (4, "completely different english text about spark plans", "en"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def _shared_digests(chunks, a, b):
    da = {
        r.digest
        for r in chunks.filter(F.col("doc_id") == a)
        .select("digest")
        .collect()
    }
    db = {
        r.digest
        for r in chunks.filter(F.col("doc_id") == b)
        .select("digest")
        .collect()
    }
    return da & db, da, db


def test_whitespace_chunker_blind_to_shifted_cjk(spark, corpus):
    chunks = cdc_chunk_table(corpus, tokenizer="whitespace")
    shared, da, db = _shared_digests(chunks, 1, 2)
    # each de-spaced doc is ONE word -> one chunk; the prefix changes
    # its digest, so the duplicate is invisible
    assert len(da) == 1 and len(db) == 1
    assert shared == set()


def test_lang_aware_chunker_reclaims_shifted_cjk(spark, corpus):
    chunks = cdc_chunk_table(corpus, tokenizer="lang_aware")
    shared, da, db = _shared_digests(chunks, 1, 2)
    # boundaries re-align past the insertion: multiple chunks, most
    # of them shared
    assert len(da) > 3
    assert len(shared) >= len(da) - 2
    # en docs keep word-unit chunking: doc 3's repeated sentence
    # still dedupes against itself under both modes
    ws = cdc_chunk_table(corpus, tokenizer="whitespace")
    en_la = chunks.filter(F.col("doc_id").isin(3, 4)).collect()
    en_ws = ws.filter(F.col("doc_id").isin(3, 4)).collect()
    assert sorted(map(tuple, en_la)) == sorted(map(tuple, en_ws))


def test_default_is_lang_aware_with_graceful_fallback(spark, corpus):
    la = cdc_chunk_table(corpus, tokenizer="lang_aware").collect()
    default = cdc_chunk_table(corpus).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, la))
    # no lang column -> whitespace fallback, not an error
    nolang = corpus.select("doc_id", "text")
    ws = cdc_chunk_table(nolang, tokenizer="whitespace").collect()
    fb = cdc_chunk_table(nolang).collect()
    assert sorted(map(tuple, fb)) == sorted(map(tuple, ws))
    # content_defined_chunks inherits the contract
    assert content_defined_chunks(corpus).collect()[0].n_chunks > 0


def test_tokenizer_validation(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="unknown cdc tokenizer"):
        cdc_chunk_table(corpus, tokenizer="lang-aware")  # typo
    with pytest.raises(ValueError, match="lang column"):
        cdc_chunk_table(
            corpus.select("doc_id", "text"), tokenizer="lang_aware"
        )
    with pytest.raises(ValueError, match="unknown cdc tokenizer"):
        build_chunk_digest_index(
            corpus, str(tmp_path / "x"), tokenizer="charz"
        )


def test_chunk_index_records_tokenizer_and_backcompat(
    spark, corpus, tmp_path
):
    la = str(tmp_path / "la")
    build_chunk_digest_index(corpus, la, tokenizer="lang_aware")
    assert chunk_index_tokenizer(la) == "lang_aware"
    ws = str(tmp_path / "ws")
    build_chunk_digest_index(corpus, ws)
    assert chunk_index_tokenizer(ws) == "whitespace"
    # meta-less artifact (pre-r11) reads as whitespace — its actual
    # build mode — and stays probe-consistent
    os.remove(os.path.join(ws, "_tokenizer.json"))
    assert chunk_index_tokenizer(ws) == "whitespace"
    idx = read_chunk_digest_index(spark, ws)
    probe = dedup.chunk_dedup_batch_ledger(
        idx, corpus, tokenizer=chunk_index_tokenizer(ws)
    ).collect()
    # every doc is already in the index: fully corpus-dup
    assert all(r.w_kept == 0 and r.w_corpus_dup == r.w_total for r in probe)


def test_lang_aware_index_catches_planted_pair_ws_misses(
    spark, corpus, tmp_path
):
    base = corpus.filter(F.col("doc_id") == 1)
    batch = corpus.filter(F.col("doc_id") == 2)
    for mode, expect_hit in (("whitespace", False), ("lang_aware", True)):
        path = str(tmp_path / f"idx_{mode}")
        build_chunk_digest_index(base, path, tokenizer=mode)
        row = (
            dedup.chunk_dedup_batch_ledger(
                read_chunk_digest_index(spark, path),
                batch,
                tokenizer=chunk_index_tokenizer(path),
            )
            .collect()[0]
        )
        if expect_hit:
            assert row.w_corpus_dup > 0, "lang-aware index missed the dup"
            assert row.w_corpus_dup >= row.w_total // 2
        else:
            assert row.w_corpus_dup == 0, (
                "whitespace index should be blind to the shifted dup"
            )


def test_erase_uses_recorded_tokenizer(spark, corpus, tmp_path):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        chunk_index_compact,
        chunk_index_erase,
    )

    path = str(tmp_path / "laidx")
    build_chunk_digest_index(corpus, path, tokenizer="lang_aware")
    n0 = spark.read.parquet(f"{path}/base").count()
    # erase doc 4 (unique content): its digests must actually die —
    # possible only if the erase delta chunks with the recorded mode
    chunk_index_erase(spark, path, corpus.filter(F.col("doc_id") == 4))
    stats = chunk_index_compact(spark, path)
    assert stats["n_dead"] > 0
    n1 = spark.read.parquet(f"{path}/base").count()
    assert n1 == n0 - stats["n_dead"]
    # the tokenizer meta lives at the artifact root, outside the
    # base/segment lifecycle — the fenced compaction must not touch it
    assert chunk_index_tokenizer(path) == "lang_aware"
    # doc 4's digests are gone from serving
    d4 = (
        cdc_chunk_table(
            corpus.filter(F.col("doc_id") == 4), tokenizer="lang_aware"
        )
        .select("digest")
        .distinct()
    )
    idx = read_chunk_digest_index(spark, path)
    assert idx.join(d4, "digest", "left_semi").count() == 0


def test_rebuild_refuses_stale_segments(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_chunk_digest_index(corpus, path)
    os.makedirs(os.path.join(path, "adds", "batch_id=0"))
    with open(
        os.path.join(path, "adds", "batch_id=0", "x.parquet"), "w"
    ) as fh:
        fh.write("")
    with pytest.raises(ValueError, match="live segment"):
        build_chunk_digest_index(corpus, path, tokenizer="lang_aware")
    # band index: same discipline (ADVICE r10, medium)
    bpath = str(tmp_path / "bidx")
    dedup.write_band_index(corpus.withColumn("lang", F.lit("en")), bpath)
    os.makedirs(os.path.join(bpath, "tombstones", "seg_id=a"))
    with open(
        os.path.join(bpath, "tombstones", "seg_id=a", "x.parquet"), "w"
    ) as fh:
        fh.write("")
    with pytest.raises(ValueError, match="live segment"):
        dedup.write_band_index(
            corpus.withColumn("lang", F.lit("en")), bpath
        )
