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


# -- Kafka wire contract (S1 without the broker) ---------------------

KAFKA_WIRE_COLS = [
    ("key", "binary"),
    ("value", "binary"),
    ("topic", "string"),
    ("partition", "int"),
    ("offset", "bigint"),
    ("timestamp", "timestamp"),
    ("timestampType", "int"),
]


def test_kafka_wire_schema_is_exact_kafka_contract(spark):
    """The seven columns and types must match the real
    spark-sql-kafka-0-10 source exactly — this is what lets
    streaming/pipeline.py swap in `.format("kafka")` unchanged."""
    df = userfeed.read_kafka_wire(spark, 10)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == (
        KAFKA_WIRE_COLS
    )


def test_kafka_wire_values_and_offset_model(spark):
    df = userfeed.read_kafka_wire(spark, 30, wire_partitions=3).orderBy(
        "partition", "offset"
    )
    rows = df.collect()
    assert len(rows) == 30
    for r in rows:
        k = json.loads(bytes(r.value))["results"][0]["login"]["username"]
        k = int(k.removeprefix("user"))
        assert r.key is None  # reference producer sends value-only
        assert r.topic == "user_data_topic"
        assert r.partition == (k - 1) % 3
        assert r.offset == (k - 1) // 3
        assert r.timestampType == 0
    # offsets are dense per partition (0..n-1): the Kafka log model
    per_part = {}
    for r in rows:
        per_part.setdefault(r.partition, []).append(r.offset)
    for offs in per_part.values():
        assert offs == list(range(len(offs)))


def test_kafka_wire_keyed_variant(spark):
    df = userfeed.read_kafka_wire(spark, 20, keyed=True)
    r = df.filter("offset = 2 and partition = 0").first()
    assert bytes(r.key).decode() == json.loads(bytes(r.value))["results"][0][
        "login"
    ]["username"].removeprefix("user")


def test_kafka_wire_stream_replay_matches_batch():
    r = userfeed.KafkaWireStreamReader({"rows_per_batch": "25"})
    batch, nxt = r.read({"next_k": 1})
    assert nxt == {"next_k": 26} and len(batch) == 25
    a = list(r.readBetweenOffsets({"next_k": 5}, {"next_k": 15}))
    b = list(r.readBetweenOffsets({"next_k": 5}, {"next_k": 15}))
    assert a == b and len(a) == 10
    key, value, topic, part, off, ts, ts_type = a[0]
    assert key is None and topic == "user_data_topic" and ts_type == 0
    assert part == 4 % 3 and off == 4 // 3
    assert json.loads(value)["results"][0]["login"]["username"] == "user5"


def test_kafka_wire_stream_through_etl(spark, tmp_path):
    """The full reference chain (Real_Time_Data.py:37-109) over the
    wire-exact stream: binary value -> cast -> from_json -> curate."""
    stream = userfeed.read_kafka_wire_stream(spark, rows_per_batch=120)
    curated = etl.curate_profiles(etl.parse_envelopes(stream.select("value")))
    q = (
        curated.writeStream.format("memory")
        .queryName("kw_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.username: r for r in spark.sql("select * from kw_test").collect()}
    assert "user101" not in got  # null-id key filtered
    assert got["user7"].id is not None and got["user7"].age > 18
