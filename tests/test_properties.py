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
