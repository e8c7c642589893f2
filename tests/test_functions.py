from __future__ import annotations

from pyspark.sql import Row, functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions.columns import (
    email_domain,
    email_domain_ps,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.sinks import (
    create_curated_table,
)


def test_email_domain_public_suffix_parity(spark):
    cases = {
        "a@example.com": "example",
        "b@mail.example.com": "example",  # ps-aware picks registrable
        "c@foo.co.uk": "foo",
        "d@a.b.foo.co.uk": "foo",
        "e@proton.me": "proton",
        "f@x.org.uk": "x",
    }
    df = spark.createDataFrame([Row(email=e) for e in cases])
    got = {
        r.email: r.d
        for r in df.select("email", email_domain_ps(F.col("email")).alias("d")).collect()
    }
    assert got == cases
    # the fast regex form agrees on single-suffix hosts
    regex_got = {
        r.email: r.d
        for r in df.select("email", email_domain(F.col("email")).alias("d")).collect()
    }
    assert regex_got["a@example.com"] == "example"
    assert regex_got["c@foo.co.uk"] == "foo"


def test_create_curated_table_ddl(spark, tmp_path):
    create_curated_table(spark, "t_profiles", str(tmp_path / "t"))
    cols = [f.name for f in spark.table("t_profiles").schema.fields]
    assert cols == [
        "id", "username", "gender", "title", "age",
        "email", "inscription", "full_name", "full_address",
    ]
    spark.sql("DROP TABLE t_profiles")


def test_psl_registrable_domain_tldextract_truth(spark):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions.psl import (
        with_registrable_domain,
    )

    # (host, public_suffix, registrable_domain, domain) — expected
    # values match tldextract/the PSL algorithm for each rule class
    cases = [
        ("example.com", "com", "example.com", "example"),
        ("a.b.example.co.uk", "co.uk", "example.co.uk", "example"),
        ("example.tokyo.jp", "tokyo.jp", "example.tokyo.jp", "example"),
        ("city.kobe.jp", "kobe.jp", "city.kobe.jp", "city"),  # exception
        ("foo.kobe.jp", "foo.kobe.jp", None, None),  # wildcard: all-suffix host
        ("x.foo.kobe.jp", "foo.kobe.jp", "x.foo.kobe.jp", "x"),  # wildcard
        ("www.ck", "ck", "www.ck", "www"),  # exception beats *.ck
        ("a.www.ck", "ck", "www.ck", "www"),
        ("b.foo.ck", "foo.ck", "b.foo.ck", "b"),  # TLD wildcard
        ("foo.bar.k12.ca.us", "k12.ca.us", "bar.k12.ca.us", "bar"),  # 3-label
        ("sub.site.ca.us", "ca.us", "site.ca.us", "site"),
        ("weird.unknown-tld", "unknown-tld", "weird.unknown-tld", "weird"),
        ("singleton", "singleton", None, None),
    ]
    df = spark.createDataFrame([(h,) for h, *_ in cases], "host string")
    got = {
        r.host: (r.public_suffix, r.registrable_domain, r.domain)
        for r in with_registrable_domain(df, "host").collect()
    }
    for host, ps, reg, dom in cases:
        assert got[host] == (ps, reg, dom), f"{host}: {got[host]} != {(ps, reg, dom)}"


def test_psl_plan_has_no_shuffle(spark):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions.psl import (
        with_registrable_domain,
    )

    df = spark.createDataFrame([("a.example.co.uk",)], "host string")
    plan = (
        with_registrable_domain(df, "host")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # broadcast joins only — BroadcastExchange is expected, but no
    # shuffle (hash-partitioning) exchange may appear
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan
