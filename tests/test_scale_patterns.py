"""Scale-pattern tests: salted join equivalence, rate-source feeder."""

from __future__ import annotations

import time

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    analytics,
    etl,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources import (
    readers,
    streams,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    lineitem = readers.load_table(spark, sf_dir, "lineitem")
    orders = readers.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
    salted = analytics.salted_join(lineitem, orders, "l_orderkey", "o_orderkey")
    assert salted.count() == plain.count()
    # spot-check content equivalence on an aggregate
    a = plain.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    b = salted.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    assert a == b


def test_rate_envelope_feeder_curates(spark, tmp_path):
    source = streams.rate_envelope_stream(spark, rows_per_second=500)
    curated = etl.curate_profiles(etl.parse_envelopes(source))
    q = (
        curated.writeStream.format("memory")
        .queryName("rate_curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_curated").collect()[0].n
            if n > 0:
                break
            time.sleep(1)
        assert n > 0, "rate feeder produced no curated rows in 60s"
        # streamed content matches the batch feeder derivation
        row = spark.sql(
            "SELECT * FROM rate_curated WHERE username = 'user1'"
        ).collect()
        if row:  # k=1: Mr, male per derivation
            assert row[0].gender == "male" and row[0].title == "Mr"
    finally:
        q.stop()
