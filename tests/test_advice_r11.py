"""ADVICE r11 regression guards: (1) NULL/unknown lang must route
to the WORD partition in every lang-aware partition-pair tier —
`~isin` is NULL for a NULL lang, so both partition filters excluded
the row and null-lang docs silently vanished from chunk ledgers and
shingle tables; (2) a request that COMPLETED but carries a legacy
no-timestamp marker must not flag as a permanent live SLA breach;
(3) the erase-request intake stamp must survive a crash between the
subject-set overwrite and the stamp re-publish (it is now published
to the `requests_meta/` sibling BEFORE the overwrite)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    dedup,
    governance as gov,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
    cdc_chunk_table,
)

pytestmark = pytest.mark.filterwarnings("ignore")

_ZH = (
    "今天天气很好我们去公园散步然后喝茶聊天看书写字画画唱歌跳舞运动休息"
    "另外一段内容讲的是机器学习训练数据去重的问题与方法模型评估指标"
)


@pytest.fixture()
def null_lang_corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 6, "en"),
        (2, _ZH, "zh"),
        # the ADVICE medium's lost row: lang was never identified
        (3, "unidentified language words repeated " * 6, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_cdc_lang_aware_keeps_null_lang_docs(spark, null_lang_corpus):
    chunks = cdc_chunk_table(null_lang_corpus, tokenizer="lang_aware")
    got_ids = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
    assert got_ids == {1, 2, 3}  # null-lang doc no longer vanishes
    # and it takes the WORD path: its chunks are exactly the
    # whitespace-mode chunks of the same doc
    null_doc = null_lang_corpus.filter(F.col("doc_id") == 3)
    want = {
        (r.chunk_id, r.n_words, r.digest)
        for r in cdc_chunk_table(
            null_doc, tokenizer="whitespace"
        ).collect()
    }
    got = {
        (r.chunk_id, r.n_words, r.digest)
        for r in chunks.filter(F.col("doc_id") == 3).collect()
    }
    assert got == want


def test_cdc_null_lang_oracle_mirror_matches(spark, null_lang_corpus):
    """The DuckDB `_cdc_ctes` mirror routes NULL lang identically
    (the gate can now CATCH a drop instead of mirroring it)."""
    import duckdb

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.registry import (
        _cdc_ctes,
    )

    pdf = null_lang_corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {
        (r[0], r[1], r[2], r[3])
        for r in con.execute(
            f"WITH {_cdc_ctes('documents', tokenizer='lang_aware')} "
            "SELECT doc_id, chunk_id, n_words, digest FROM ch"
        ).fetchall()
    }
    got = {
        (r.doc_id, r.chunk_id, r.n_words, r.digest)
        for r in cdc_chunk_table(
            null_lang_corpus, tokenizer="lang_aware"
        ).collect()
    }
    assert got == oracle


def test_lang_aware_shingles_keep_null_lang_docs(
    spark, null_lang_corpus
):
    sh = dedup.lang_aware_shingles(null_lang_corpus)
    got_ids = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert got_ids == {1, 2, 3}
    null_doc = null_lang_corpus.filter(F.col("doc_id") == 3)
    want = {
        r.shingle for r in dedup.shingles(null_doc).collect()
    }
    got = {
        r.shingle
        for r in sh.filter(F.col("doc_id") == 3).collect()
    }
    assert got == want  # word shingles, not char shingles


def _subjects(spark, ids):
    return spark.createDataFrame(
        [(int(i),) for i in ids], "doc_id long"
    )


def test_completed_with_legacy_marker_is_time_unknown(spark, tmp_path):
    """ADVICE r11 low (governance:300): all markers present but one
    carries a legacy no-timestamp body -> completed=1 and overdue
    NULL (time unknown), never a permanent live-breach flag."""
    led = str(tmp_path / "led")
    t0 = 1_700_000_000
    arts = list(gov.ERASURE_ARTIFACTS)
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, [1, 2]), intake_ts=t0
    )
    for a in arts[:-1]:
        gov.erase_request_mark_applied(led, "r1", a, applied_ts=t0 + 10)
    gov.erase_request_mark_applied(led, "r1", arts[-1])  # legacy "1"
    row = gov.erase_request_sla_report(
        spark, led, deadline_seconds=3_600, as_of_ts=t0 + 999_999
    ).collect()[0]
    assert row.completed == 1
    assert row.completed_ts is None and row.latency_seconds is None
    assert row.overdue is None  # unknown, NOT a breach
    # a genuinely stuck request still flags at the same as_of
    gov.erase_request_open(
        spark, led, "r2", _subjects(spark, [3]), intake_ts=t0
    )
    rows = {
        r.request_id: r.overdue
        for r in gov.erase_request_sla_report(
            spark, led, deadline_seconds=3_600, as_of_ts=t0 + 999_999
        ).collect()
    }
    assert rows["r2"] == 1


def test_intake_stamp_survives_overwrite_crash(spark, tmp_path):
    """ADVICE r11 low (governance:97): the stamp is published to
    requests_meta/ BEFORE the parquet overwrite, so the worst-case
    crash state (request dir wiped, nothing re-published) keeps the
    SLA clock."""
    led = str(tmp_path / "led")
    t0 = 1_700_000_000
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, [1]), intake_ts=t0
    )
    # simulate the old hazard's crash state: the overwrite wiped the
    # request dir and the process died before any re-publish
    import shutil

    shutil.rmtree(
        os.path.join(led, "requests", "request_id=r1")
    )
    assert gov.read_intake_ts(led, "r1") == t0
    # resume re-open with a later clock: first intake still wins
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, [1]), intake_ts=t0 + 500
    )
    assert gov.read_intake_ts(led, "r1") == t0


def test_legacy_in_dir_intake_stamp_reads_and_migrates(
    spark, tmp_path
):
    """Pre-r12 ledgers stamped `_intake_ts` inside the request dir;
    the reader falls back to it and the next re-open migrates it to
    the crash-safe meta location."""
    import json

    led = str(tmp_path / "led")
    t0 = 1_700_000_000
    gov.erase_request_open(spark, led, "r1", _subjects(spark, [1]))
    # plant a legacy in-dir stamp (what an r11 ledger looks like)
    req_dir = os.path.join(led, "requests", "request_id=r1")
    with open(os.path.join(req_dir, "_intake_ts"), "w") as fh:
        json.dump({"intake_ts": t0}, fh)
    assert gov.read_intake_ts(led, "r1") == t0
    gov.erase_request_open(
        spark, led, "r1", _subjects(spark, [1]), intake_ts=t0 + 77
    )
    assert gov.read_intake_ts(led, "r1") == t0  # migrated, not reset
    assert os.path.isfile(
        os.path.join(led, "requests_meta", "request_id=r1", "_intake_ts")
    )
