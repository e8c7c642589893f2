"""BPE trainer loop: fold semantics, trajectory consistency with the
single-iteration bpe_pair_counts, and fertility-from-learned-merges
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_merge_fold_leftmost_nonoverlapping(spark):
    """The rewrite fold must merge leftmost-first without re-merging
    freshly created symbols: 'aaaa' + (a,a) -> [aa, aa]; 'aaa' ->
    [aa, a]; 'aab' + (a,b) -> [a, ab]."""
    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["a", "a", "b"],)],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            F.expr(text._bpe_fold("a", "a")).alias("m")
        ).collect()
    ]
    assert out[0] == ["aa", "aa"]
    assert out[1] == ["aa", "a"]
    ab = df.select(F.expr(text._bpe_fold("a", "b")).alias("m")).collect()
    assert ab[2]["m"] == ["a", "ab"]


def test_first_merge_matches_pair_counts_top1(spark, sf_dir):
    """Round 1 of the trainer must pick exactly the pair the
    single-iteration bpe_pair_counts ranks first (same weighting:
    per-occurrence, overlap-inclusive, (count desc, pair asc))."""
    top1 = text.bpe_pair_counts(_docs(spark, sf_dir), top_k=1).collect()[0]
    merges = text.bpe_learned_merges(_docs(spark, sf_dir)).collect()
    assert merges[0]["merged"] == top1["pair"]
    assert merges[0]["pair_count"] == top1["n"]
    # steps are 1..K in order
    assert [m["step"] for m in merges] == list(
        range(1, text.BPE_MERGE_ROUNDS + 1)
    )


def test_fertility_from_learned_merges_invariants(spark, sf_dir):
    rows = text.bpe_fertility_report(_docs(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        # merges only ever shrink the symbol count
        assert r["learned_tokens"] <= r["base_symbols"]
        assert 0 < r["compression"] <= 1.0
        # fertility must sit between 1 token/word and chars/word
        assert 1.0 <= r["fertility"] <= r["base_symbols"] / r["n_words"] + 1e-9


def test_bpe_degenerate_corpus_terminates_cleanly(spark):
    """ADVICE r5: a corpus whose words are all single symbols has no
    mergeable pair — the trainer must stop with an empty merge list,
    not raise on the NULL argmax."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators.text import (
        _bpe_chain,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c a")], "doc_id long, text string"
    )
    learned, words, base = _bpe_chain(docs, 3)
    base.unpersist()
    assert learned == []
    assert words.count() == 3  # the distinct-word table survives
