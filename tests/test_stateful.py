"""applyInPandasWithState custom stateful operator + vectorized UDF
parity tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    similarity,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    stateful,
)


def test_running_user_totals_across_batches(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "ev")
    # two files → two batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [Row(user_id=1, ts=t0, value=1.0), Row(user_id=1, ts=t0, value=2.0)]
    ).write.parquet(src + "/f1")
    spark.createDataFrame(
        [Row(user_id=1, ts=t0, value=4.0), Row(user_id=2, ts=t0, value=10.0)]
    ).write.parquet(src + "/f2")

    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stateful.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_totals").collect()
    # state accumulates across batches: user 1 ends at n=3, total=7
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[1] == (3, 7.0)
    assert final[2] == (1, 10.0)


def test_stateful_restart_preserves_state(spark, tmp_path):
    """State must survive a query restart from checkpoint: totals keep
    accumulating instead of resetting (the recovery guarantee the
    custom operator inherits from the state store)."""
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"

    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src + "/*")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stateful.running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [Row(user_id=7, ts=t0, value=5.0)]
    ).write.parquet(src + "/f1")
    run_once()
    spark.createDataFrame(
        [Row(user_id=7, ts=t0, value=6.0)]
    ).write.parquet(src + "/f2")
    run_once()
    emitted = spark.read.parquet(out).collect()
    latest = max((r.n_events, r.total_value) for r in emitted if r.user_id == 7)
    assert latest == (2, 11.0)  # 5.0 from before restart + 6.0 after


def test_vectorized_cosine_matches_jvm(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0], label=0),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0], label=0),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0], label=1),
        Row(vec_id=3, embedding=[-1.0, 0.5, 0.0], label=1),
    ]
    df = spark.createDataFrame(rows)
    jvm = {
        r.vec_id: r.cosine for r in similarity.cosine_topk(df, 0, 3).collect()
    }
    vec = {
        r.vec_id: r.cosine
        for r in similarity.cosine_topk_vectorized(
            df.filter("vec_id != 0"), [1.0, 0.0, 0.0], 3
        ).collect()
    }
    assert jvm == vec


def test_streaming_last_touch_state_across_batches(spark, tmp_path):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    import time

    src = str(tmp_path / "attr")
    # batch 1: user1 click -> purchase(10) attributed to click
    spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=t(0), event_type="click", value=0.0),
         Row(event_id=2, user_id=1, ts=t(1), event_type="purchase", value=10.0)]
    ).coalesce(1).write.parquet(src + "/f1")
    time.sleep(1.1)  # file-source ordering is by modification time
    # batch 2: user1 purchase(5) must use the CARRIED click state;
    # then a signup replaces the touch. user2 purchase -> direct.
    spark.createDataFrame(
        [Row(event_id=3, user_id=1, ts=t(2), event_type="purchase", value=5.0),
         Row(event_id=4, user_id=1, ts=t(3), event_type="signup", value=0.0),
         Row(event_id=5, user_id=2, ts=t(2), event_type="purchase", value=7.0)]
    ).coalesce(1).write.parquet(src + "/f2")
    time.sleep(1.1)
    # batch 3: user1 purchase(2) sees the batch-2 signup state
    spark.createDataFrame(
        [Row(event_id=6, user_id=1, ts=t(4), event_type="purchase", value=2.0)]
    ).coalesce(1).write.parquet(src + "/f3")

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stateful.streaming_last_touch(stream)
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: (r.channel, r.value)
           for r in spark.sql("SELECT * FROM attr_out").collect()}
    assert got == {
        2: ("click", 10.0),
        3: ("click", 5.0),   # state carried across the batch boundary
        5: ("direct", 7.0),
        6: ("signup", 2.0),  # state updated by batch 2, read in batch 3
    }


def test_event_time_timeout_emits_churn(spark, tmp_path):
    """EventTimeTimeout eviction: a user silent for longer than the
    gap (on the WATERMARK clock) must be emitted as churned exactly
    once, with their accumulated state, and removed."""
    import time

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = str(tmp_path / "churn")
    # batch 1: user 1 active at 10:00 and 10:05
    spark.createDataFrame(
        [Row(user_id=1, ts=t(10)), Row(user_id=1, ts=t(10, 5))]
    ).coalesce(1).write.parquet(src + "/f1")
    time.sleep(1.1)
    # batch 2: user 2 at 12:00 -> watermark (10 min delay) -> 11:50,
    # past user 1's 10:05 + 30 min timeout
    spark.createDataFrame([Row(user_id=2, ts=t(12))]).coalesce(1).write.parquet(
        src + "/f2"
    )
    time.sleep(1.1)
    # batch 3: advance again so the timeout callback actually fires
    spark.createDataFrame([Row(user_id=2, ts=t(14))]).coalesce(1).write.parquet(
        src + "/f3"
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "10 minutes")
    )
    q = (
        stateful.churn_detector(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("churn_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM churn_out").collect()
    churned = {r.user_id: r for r in rows}
    assert 1 in churned, f"user 1 never churned: {rows}"
    assert churned[1].n_events == 2
    assert churned[1].last_seen == t(10, 5)
