from __future__ import annotations

from pyspark.sql import Row, functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions.columns import (
    email_domain,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions.psl import (
    with_registrable_domain,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.sinks import (
    create_curated_table,
)


def test_email_domain_public_suffix_parity(spark):
    """tldextract-parity domain extraction via the full-PSL broadcast
    table (functions/psl.py), including suffixes the pre-round-3
    curated subset did NOT carry (co.bw, sch.uk wildcard parent,
    gov.mw) — proves the snapshot is the complete ICANN section, not
    the curated list."""
    cases = {
        "a@example.com": "example",
        "b@mail.example.com": "example",  # ps-aware picks registrable
        "c@foo.co.uk": "foo",
        "d@a.b.foo.co.uk": "foo",
        "e@proton.me": "proton",
        "f@x.org.uk": "x",
        # beyond the old curated subset:
        "g@shop.co.bw": "shop",        # Botswana — absent pre-round-3
        "h@x.gov.mw": "x",             # Malawi — absent pre-round-3
        "i@a.b.gouv.sn": "b",          # Senegal gouv.sn — absent
    }
    df = spark.createDataFrame([Row(email=e) for e in cases])
    hosts = df.withColumn("host", F.substring_index("email", "@", -1))
    got = {
        r.email: r.domain
        for r in with_registrable_domain(hosts, "host").collect()
    }
    assert got == cases
    # the fast regex form agrees on single-suffix hosts
    regex_got = {
        r.email: r.d
        for r in df.select("email", email_domain(F.col("email")).alias("d")).collect()
    }
    assert regex_got["a@example.com"] == "example"
    assert regex_got["c@foo.co.uk"] == "foo"


def test_full_psl_snapshot_loaded(spark):
    """The rule data is the full ICANN section: thousands of rules,
    depth-4 keys present, unicode rules intact."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.functions import (
        psl,
    )

    assert len(psl.PSL_SNAPSHOT) > 7000
    assert psl.MAX_RULE_DEPTH == 4
    assert "co.bw" in psl.PSL_SNAPSHOT          # not in the old subset
    assert any(not r.isascii() for r in psl.PSL_SNAPSHOT)  # IDN rules
    # wildcard + exception semantics survive the full-list swap
    df = spark.createDataFrame(
        [Row(host=h) for h in [
            "foo.bar.kawasaki.jp",   # *.kawasaki.jp wildcard
            "city.kawasaki.jp",      # !city.kawasaki.jp exception
            "a.b.unknowntld",        # default '*' rule
        ]]
    )
    got = {r.host: (r.public_suffix, r.registrable_domain)
           for r in with_registrable_domain(df, "host").collect()}
    assert got["foo.bar.kawasaki.jp"] == ("bar.kawasaki.jp", "foo.bar.kawasaki.jp")
    assert got["city.kawasaki.jp"] == ("kawasaki.jp", "city.kawasaki.jp")
    assert got["a.b.unknowntld"] == ("unknowntld", "b.unknowntld")


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
