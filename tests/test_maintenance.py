"""Serving-store maintenance operators (merge_upsert / scd2_history)
and the round-2 widening ops (incremental dedup, HLL mergeability,
per-stratum sampling, quality deciles)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    analytics,
    dedup,
    maintenance,
    text,
)


def test_merge_upsert_latest_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id long, v string, _version int"
    )
    upd = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 2)], "id long, v string, _version int"
    )
    got = {
        r["id"]: (r["v"], r["_version"])
        for r in maintenance.merge_upsert(base, upd, ["id"]).collect()
    }
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1), 4: ("d", 2)}


def test_merge_upsert_equal_version_prefers_update(spark):
    base = spark.createDataFrame([(1, "old", 5)], "id long, v string, _version int")
    upd = spark.createDataFrame([(1, "new", 5)], "id long, v string, _version int")
    [row] = maintenance.merge_upsert(base, upd, ["id"]).collect()
    assert row["v"] == "new"


def test_scd2_history_runs_and_intervals(spark):
    d = dt.date
    rows = [
        # key 1: A A B A  -> runs A, B, A
        Row(k=1, ts=d(2024, 1, 1), ob=1, s="A"),
        Row(k=1, ts=d(2024, 1, 2), ob=2, s="A"),
        Row(k=1, ts=d(2024, 1, 3), ob=3, s="B"),
        Row(k=1, ts=d(2024, 1, 4), ob=4, s="A"),
        # key 2: single row -> one current run
        Row(k=2, ts=d(2024, 2, 1), ob=5, s="Z"),
    ]
    hist = maintenance.scd2_history(
        spark.createDataFrame(rows), key="k", ts_col="ts", tracked="s", tiebreak="ob"
    ).collect()
    by_key = {}
    for r in sorted(hist, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(r)
    k1 = by_key[1]
    assert [(r["s"], r["valid_from"], r["valid_to"]) for r in k1] == [
        ("A", d(2024, 1, 1), d(2024, 1, 3)),
        ("B", d(2024, 1, 3), d(2024, 1, 4)),
        ("A", d(2024, 1, 4), None),
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert by_key[2][0]["is_current"] is True


def test_incremental_new_docs_drops_known_content(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta")], "doc_id long, text string"
    )
    got = dedup.incremental_new_docs(corpus, batch).collect()
    assert [r["doc_id"] for r in got] == [11]
    assert got[0].asDict().keys() == {"doc_id", "text"}  # hash col dropped


def test_hll_mergeability_check(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    [row] = analytics.hll_mergeability_check(
        load_table(spark, sf_dir, "events")
    ).collect()
    assert row["parts_equal_direct"] is True
    assert row["within_tolerance"] is True
    assert row["exact_users"] > 0


def test_sample_per_source_deterministic(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, text.sample_per_source(docs, k=5).collect()))
    b = sorted(map(tuple, text.sample_per_source(docs, k=5).collect()))
    assert a == b
    per_src = {}
    for _, src, rank in a:
        per_src.setdefault(src, []).append(rank)
    for ranks in per_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_quality_deciles_partition_the_corpus(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = text.quality_deciles(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # deciles are ordered, non-overlapping score ranges
    ordered = sorted(rows, key=lambda r: r["decile"])
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["max_score"] <= hi["min_score"]
