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
