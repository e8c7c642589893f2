"""The `userfeed` Python DataSource — the reference's HTTP poll
feeder (producer.py:17-44) as a first-class Spark source."""

from __future__ import annotations

import json

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    etl,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources import (
    synthetic,
    userfeed,
)


def test_batch_wire_parity_and_partitioning(spark):
    df = userfeed.read_envelopes(spark, 200, partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    for r in df.orderBy("k").limit(5).collect():
        assert r.value == json.dumps(synthetic.envelope_dict(r.k))


def test_batch_through_etl_chain(spark):
    envelopes = userfeed.read_envelopes(spark, 500).select("value")
    curated = etl.curate_profiles(etl.parse_envelopes(envelopes))
    rows = {r.username: r for r in curated.collect()}
    # id-null keys (k % 101 == 0) must be filtered out by the GDPR gate
    assert "user101" not in rows and "user202" not in rows
    assert rows["user7"].id is not None and rows["user7"].age > 18


def test_stream_replay_is_deterministic():
    """Exactly-once hinges on readBetweenOffsets replaying a committed
    range bit-for-bit; the generator is pure so any two reads agree."""
    r = userfeed.UserFeedStreamReader({})
    assert r.initialOffset() == {"next_k": 1}
    batch, nxt = r.read({"next_k": 1})
    assert nxt == {"next_k": 101} and len(batch) == 100
    a = list(r.readBetweenOffsets({"next_k": 40}, {"next_k": 60}))
    b = list(r.readBetweenOffsets({"next_k": 40}, {"next_k": 60}))
    assert a == b and len(a) == 20
    assert a[0][0] == 40 and a[0][1] == json.dumps(synthetic.envelope_dict(40))


def test_stream_microbatches_feed_curation(spark, tmp_path):
    import time

    stream = userfeed.read_envelope_stream(spark, rows_per_batch=50)
    curated = etl.curate_profiles(etl.parse_envelopes(stream.select("value")))
    q = (
        curated.writeStream.format("memory")
        .queryName("uf_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) n from uf_test").first().n
            if n >= 90:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n >= 90  # ≥2 micro-batches survived the curation filters
    row = spark.sql("select id, age from uf_test where username = 'user7'").first()
    assert row is not None and row.id is not None
