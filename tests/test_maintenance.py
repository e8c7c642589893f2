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


# ---------------------------------------------------------------
# Round-3 third wave: unigram LM quality, weighted sampling, RI audit
# ---------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_unigram_logprob_rare_tokens_score_lower(spark):
    # doc 0 repeats the corpus-common token; doc 1 is all hapaxes.
    docs = _docs(
        spark,
        ["the the the the", "zq xv wk jm", "the of and is", "the to in of"],
    )
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.unigram_logprob_quality(docs).collect()
    }
    assert len(got) == 4
    assert all(v < 0 for v in got.values())
    assert got[0] > got[1]  # common-token doc beats hapax doc


def test_unigram_logprob_token_counts(spark):
    docs = _docs(spark, ["a b c", "a a"])
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in text.unigram_logprob_quality(docs).collect()
    }
    assert got == {0: 3, 1: 2}


def test_weighted_sample_deterministic_and_biased(spark):
    # 100 low-quality (punctuation soup) + 100 high-quality (English
    # with stopwords) docs; sample 50.
    low = [".,;:!? .,;:!? .,;:!?" for _ in range(100)]
    high = [
        "the quick brown fox is of the essence and runs to the den in peace"
        for _ in range(100)
    ]
    docs = _docs(spark, low + high)
    s1 = text.weighted_sample_docs(docs, k=50).collect()
    s2 = text.weighted_sample_docs(docs, k=50).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 50
    n_high = sum(1 for r in s1 if r["doc_id"] >= 100)
    assert n_high > 30  # importance-weighted toward high quality


def test_referential_integrity_clean_and_violations(spark):
    customer = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    part = spark.createDataFrame([(10,)], "p_partkey long")
    supplier = spark.createDataFrame([(20,)], "s_suppkey long")
    orders_clean = spark.createDataFrame(
        [(100, 1), (101, 2)], "o_orderkey long, o_custkey long"
    )
    li_clean = spark.createDataFrame(
        [(100, 10, 20)], "l_orderkey long, l_partkey long, l_suppkey long"
    )
    rep = {
        r["check_name"]: r
        for r in maintenance.referential_integrity_report(
            customer, orders_clean, li_clean, part, supplier
        ).collect()
    }
    assert len(rep) == 8
    assert all(r["ok"] for r in rep.values())

    orders_bad = spark.createDataFrame(
        [(100, 1), (100, 99), (102, None)],
        "o_orderkey long, o_custkey long",
    )
    li_bad = spark.createDataFrame(
        [(999, 11, 21)], "l_orderkey long, l_partkey long, l_suppkey long"
    )
    rep = {
        r["check_name"]: r
        for r in maintenance.referential_integrity_report(
            customer, orders_bad, li_bad, part, supplier
        ).collect()
    }
    # orphan o_custkey=99; NULL o_custkey kept by anti-join too
    assert rep["fk_orders_custkey"]["n_violations"] == 2
    assert rep["fk_lineitem_orderkey"]["n_violations"] == 1
    assert rep["fk_lineitem_partkey"]["n_violations"] == 1
    assert rep["fk_lineitem_suppkey"]["n_violations"] == 1
    assert rep["unique_orders_orderkey"]["n_violations"] == 1
    assert rep["notnull_orders_custkey"]["n_violations"] == 1
    assert not rep["fk_orders_custkey"]["ok"]


def test_ngram_novelty_curve_recrawl_reuse(spark, sf_dir):
    """The exact re-crawl wave (doc_id // 100000 == 1) must show full
    13-gram reuse against the original wave; the original wave's own
    reuse stays at the corpus's natural floor (< the re-crawl's)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    dupes = dedup.with_synthetic_dupes(load_table(spark, sf_dir, "documents"))
    curve = {r.bucket: r for r in text.ngram_novelty_curve(dupes).collect()}
    b = text.NOVELTY_BUCKETS_PER_WAVE
    wave0 = [curve[i] for i in range(b) if i in curve]
    wave1 = [curve[b + i] for i in range(b) if b + i in curve]
    assert wave0 and wave1
    # exact copies: every gram already seen in wave 0
    assert all(r.reuse_ppm == 1000000 for r in wave1)
    assert all(r.n_novel_grams == 0 for r in wave1)
    # originals: natural reuse strictly below the re-crawl's
    assert all(r.reuse_ppm < 1000000 for r in wave0)
    assert sum(r.n_novel_grams for r in wave0) > 0


def test_sft_user_dedup_sees_what_exact_dedup_cannot(spark, sf_dir):
    """Role-aware dedup must group the same-prompt variants (user
    turns identical, assistant replies differ) that byte-level
    hashing cannot: every variant pair is found, full-text digests
    inside each group DIFFER, and the keeper is the original (lower
    doc_id)."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as FF

    docs = load_table(spark, sf_dir, "documents")
    ddocs = text.with_dialogue_docs(docs)
    groups = text.sft_user_dedup(ddocs).collect()
    n_variants = docs.filter(
        FF.col("doc_id") % text.DIALOGUE_VARIANT_MOD == 2
    ).count()
    assert len(groups) == n_variants > 0
    assert all(g.n_copies == 2 for g in groups)
    assert all(g.keeper_doc_id < 400000 for g in groups)
    # full-text hashing finds ZERO of these pairs
    dialogue_ids = {g.keeper_doc_id for g in groups} | {
        g.keeper_doc_id + 400000 for g in groups
    }
    full = (
        ddocs.filter(FF.col("doc_id").isin([int(i) for i in dialogue_ids]))
        .groupBy(FF.md5("text"))
        .count()
        .filter(FF.col("count") >= 2)
        .count()
    )
    assert full == 0


def test_dialogue_turns_attribution(spark):
    """The marker device parses arbitrary turn structures: counts and
    roles per turn, markers excluded from word counts."""
    ddocs = spark.createDataFrame(
        [(1, "u: hello there a: hi u: more words here", "en", "s", 0),
         (2, "plain document no markers", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    turns = {
        (r.doc_id, r.turn_idx, r.role): r.n_words
        for r in text.dialogue_turns(ddocs).collect()
    }
    assert turns == {
        (1, 1, "u:"): 2,
        (1, 2, "a:"): 1,
        (1, 3, "u:"): 3,
    }
