"""Property-based tests (SURVEY §5.5): random envelopes → pipeline
invariants. One Spark job per case would be minutes; instead
hypothesis generates the corpus and ONE job checks all invariants
over it."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    etl,
)

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), max_size=12
)
_maybe_text = st.one_of(st.none(), _text)

_user = st.fixed_dictionaries(
    {
        "gender": st.sampled_from(["male", "female", None]),
        "name": st.fixed_dictionaries(
            {"title": _maybe_text, "first": _maybe_text, "last": _maybe_text}
        ),
        "dob": st.fixed_dictionaries(
            {
                "date": st.one_of(
                    st.none(),
                    st.dates(dt.date(1920, 1, 1), dt.date(2024, 1, 1)).map(
                        lambda d: d.isoformat() + "T00:00:00.000Z"
                    ),
                ),
                "age": st.one_of(st.none(), st.integers(0, 120)),
            }
        ),
        "location": st.fixed_dictionaries(
            {
                "street": st.fixed_dictionaries(
                    {"number": st.one_of(st.none(), st.integers(0, 10**6)), "name": _maybe_text}
                ),
                "city": _maybe_text,
                "state": _maybe_text,
                "country": _maybe_text,
                "postcode": st.one_of(st.none(), st.integers(0, 10**6)),
            }
        ),
        "email": _maybe_text,
        "login": st.fixed_dictionaries({"uuid": _maybe_text, "username": _maybe_text}),
        "registered": st.fixed_dictionaries({"date": _maybe_text}),
    }
)

_envelope = st.one_of(
    st.just("not json at all {{{"),
    st.fixed_dictionaries(
        {"results": st.one_of(st.none(), st.lists(_user, max_size=3))}
    ).map(json.dumps),
)


@settings(max_examples=3, deadline=None)
@given(st.lists(_envelope, min_size=60, max_size=120))
def test_pipeline_invariants(spark, envelopes):
    df = spark.createDataFrame([(e,) for e in envelopes], ["value"])
    out = etl.curate_profiles(etl.parse_envelopes(df))
    # invariants: no null id, no row at or under the age threshold
    assert out.filter(F.col("id").isNull() | (F.col("age") <= 18)).count() == 0
    # full_name is never null (concat_ws of nulls yields ""), and
    # output schema is exactly the declared contract
    assert out.filter(F.col("full_name").isNull()).count() == 0
    assert out.columns == [
        "id", "username", "gender", "title", "age",
        "email", "inscription", "full_name", "full_address",
    ]
    # every output row must correspond to a parseable input user with
    # a non-null uuid (no manufactured rows)
    n_valid_users = sum(
        1
        for e in envelopes
        if _is_json(e)
        for u in (json.loads(e).get("results") or [])
        if u.get("login", {}).get("uuid") is not None
    )
    assert out.count() <= n_valid_users


def _is_json(s: str) -> bool:
    try:
        json.loads(s)
        return True
    except Exception:
        return False


@given(
    keys=st.lists(st.integers(1, 10**9), min_size=5, max_size=60, unique=True)
)
@settings(max_examples=8, deadline=None)
def test_bloom_never_false_negative(spark, keys):
    """Bloom invariant: every inserted member MUST pass — for any key
    set. (FPs are allowed; FNs never.)"""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        analytics,
    )

    cust = spark.createDataFrame([(k,) for k in keys], "c_custkey long")
    orders = spark.createDataFrame([(k,) for k in keys], "o_custkey long")
    got = analytics.bloom_membership_audit(cust, orders).collect()[0]
    assert got.n_false_neg == 0
    assert got.n_member_probes == len(keys)


@given(
    prices=st.lists(
        st.floats(1.0, 1e6, allow_nan=False, allow_infinity=False),
        min_size=20,
        max_size=120,
    )
)
@settings(max_examples=8, deadline=None)
def test_ks_statistic_bounded_and_self_consistent(spark, prices):
    """KS invariants on arbitrary price distributions: D ∈ [0, 1],
    halves partition the corpus, critical value positive."""
    from pyspark.sql import Row

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        analytics,
    )

    rows = [
        Row(o_orderkey=i + 1, o_custkey=1, o_orderstatus="F",
            o_totalprice=float(p), o_orderdate=dt.datetime(2000, 1, 1),
            o_orderpriority="1")
        for i, p in enumerate(prices)
    ]
    got = analytics.ks_two_sample_drift(spark.createDataFrame(rows)).collect()
    if not got or got[0].n_first_half == 0 or got[0].n_second_half == 0:
        return  # degenerate split: no statistic defined
    r = got[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.crit_value_95 > 0
    assert r.n_first_half + r.n_second_half == len(prices)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=3, max_size=30,
        ).map(" ".join),
        min_size=2, max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_cdc_chunks_partition_every_word(spark, texts):
    """CDC invariant: chunk instances partition the corpus exactly —
    total == distinct + redundant, and the weighted mean chunk size
    times total chunks reproduces the word count."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = text_ops.content_defined_chunks(docs).collect()[0]
    assert got.n_chunks == got.n_distinct_chunks + got.n_redundant_chunks
    total_words = sum(len(t.split(" ")) for t in texts)
    # mean is 2dp-floored, so reconstruct within rounding slack
    assert abs(got.mean_chunk_words * got.n_chunks - total_words) <= (
        0.005 * got.n_chunks * 2 + 1
    )


def test_chunk_dedup_conservation_and_duplication_properties(spark):
    """Invariants of chunk-substring dedup on randomized corpora:
    (1) kept + removed == total always; (2) an all-unique corpus
    removes nothing; (3) appending an exact copy of any doc removes
    exactly that doc's words."""
    import random

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )

    rng = random.Random(1234)
    for trial in range(3):
        n_docs = rng.randint(3, 8)
        rows = []
        for d in range(n_docs):
            n = rng.randint(20, 60)
            words = [f"t{trial}d{d}w{i}" for i in range(n)]  # globally unique
            rows.append((d, " ".join(words), "en", "s", 0))
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rep = dedup.chunk_dedup_report(docs).collect()[0]
        assert rep.kept_words + rep.removed_words == rep.total_words
        assert rep.removed_words == 0  # all-unique corpus

        # duplicate one doc: exactly its words disappear
        dup_id = rng.randrange(n_docs)
        dup_words = len(rows[dup_id][1].split(" "))
        docs2 = spark.createDataFrame(
            rows + [(1000, rows[dup_id][1], "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rep2 = dedup.chunk_dedup_report(docs2).collect()[0]
        assert rep2.removed_words == dup_words
        assert rep2.fully_dup_docs == 1
