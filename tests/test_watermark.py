"""Event-time semantics: late-data dropping under watermark, and
update-mode streaming aggregate parity with batch."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    aggregates,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.synthetic import (
    write_envelopes_jsonl,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    pipeline,
)


def _write(spark, rows, path):
    spark.createDataFrame(rows).write.parquet(path)


def test_watermark_drops_late_data(spark, tmp_path):
    """A row older than the watermark must not resurrect its window."""
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = str(tmp_path / "ev")
    # batch 1: events 10:00, 10:30, 11:00 -> watermark advances to 10:50
    _write(spark, [Row(user_id=1, ts=t(10)), Row(user_id=1, ts=t(10, 30)),
                   Row(user_id=1, ts=t(11))], src + "/f1")
    # batch 2: 09:30 is LATE (window [9,10) closed) + 11:30 advances wm
    _write(spark, [Row(user_id=1, ts=t(9, 30)), Row(user_id=1, ts=t(11, 30))], src + "/f2")
    # batch 3: far-future row forces all earlier windows to close
    _write(spark, [Row(user_id=1, ts=t(20))], src + "/f3")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.ws: r.n for r in spark.sql("SELECT * FROM wm_out").collect()}
    assert got.get(t(10)) == 2  # 10:00 + 10:30
    assert got.get(t(11)) == 2  # 11:00 + 11:30
    assert t(9) not in got  # the late 09:30 row was dropped, not revived


def test_stream_stream_join_matches_batch(spark, tmp_path, sf_dir):
    """The watermarked stream-stream join must produce exactly the
    pairs the batch banded range join counts."""
    import os

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        analytics,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_pq")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        pipeline.clicks_errors_stream_join(stream)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_pairs_stream = spark.sql("SELECT count(*) AS n FROM ss_join").collect()[0].n
    n_pairs_batch = (
        analytics.clicks_before_errors(events)
        .agg(F.sum("n_preceding_clicks").alias("s"))
        .collect()[0]
        .s
    )
    assert n_pairs_stream == n_pairs_batch


def test_update_mode_aggregate_matches_batch(spark, tmp_path):
    src = str(tmp_path / "srcj")
    import os

    os.makedirs(src)
    write_envelopes_jsonl(os.path.join(src, "a.jsonl"), 250)
    stream_counts = pipeline.streaming_gender_counts(
        pipeline.read_envelope_file_stream(spark, src)
    )
    q = (
        stream_counts.writeStream.format("memory")
        .queryName("gender_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import etl

    batch = {
        r.gender: r["count"]
        for r in aggregates.gender_distribution(
            etl.curate_profiles(etl.parse_envelopes(spark.read.text(src)))
        ).collect()
    }
    streamed = {
        r.gender: r["count"]
        for r in spark.sql("SELECT * FROM gender_stream").collect()
    }
    assert streamed == batch


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: an error with a preceding click
    joins it; an error with none is emitted null-extended once the
    watermark passes the join bound (never before, never dropped)."""
    t = lambda h, m=0: dt.datetime(2024, 3, 1, h, m)  # noqa: E731
    src = str(tmp_path / "ev")
    mk = lambda eid, uid, ts, et: Row(  # noqa: E731
        event_id=eid, user_id=uid, ts=ts, event_type=et
    )
    # batch 1: user 1 clicks 10:00, errors 10:03 (matched);
    #          user 2 errors 10:03 with no click (unmatched)
    _write(
        spark,
        [mk(1, 1, t(10), "click"), mk(2, 1, t(10, 3), "error"),
         mk(3, 2, t(10, 3), "error")],
        src + "/f1",
    )
    # batch 2: far-future rows push both watermarks past the bound
    _write(
        spark,
        [mk(4, 1, t(12), "click"), mk(5, 2, t(12), "error")],
        src + "/f2",
    )
    # batch 3: further advance so batch-2's unmatched error also closes
    _write(
        spark,
        [mk(6, 3, t(15), "click"), mk(7, 3, t(15, 1), "error")],
        src + "/f3",
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = pipeline.clicks_errors_stream_outer_join(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("oj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_oj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM oj_out").collect()
    by_err = {r.error_id: r for r in rows}
    # matched: user-1 error carries its click
    assert by_err[2].click_ts == t(10)
    # unmatched: user-2 error emitted with NULL click side
    assert by_err[3].click_ts is None
    # every error emitted exactly once per match (no dup, no loss)
    assert sorted(r.error_id for r in rows).count(3) == 1


def test_watermark_drop_is_observable_in_progress(spark, tmp_path):
    """Late-data drops must be visible to operators: the streaming
    progress metric numRowsDroppedByWatermark is the production
    monitoring hook for 'the pipeline is silently losing late rows'.

    Timing-sensitive by nature (progress metrics + file-source
    ordering on a loaded box), so the scenario retries once with a
    fresh directory before failing — a persistent mismatch is a real
    bug, a single blip under full-suite load is not."""
    import glob as _glob
    import os as _os
    import time as _time
    import uuid as _uuid

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    def attempt(tag: str):
        src = str(tmp_path / f"ev_{tag}")
        _write(
            spark,
            [Row(user_id=1, ts=t(10)), Row(user_id=1, ts=t(11))],
            src + "/f1",
        )
        _write(
            spark,
            [Row(user_id=1, ts=t(9, 30)), Row(user_id=1, ts=t(11, 30))],
            src + "/f2",
        )
        _write(spark, [Row(user_id=1, ts=t(20))], src + "/f3")
        # FileStreamSource orders pending files by MODIFICATION TIME;
        # on a fast write the three dirs can land in the same ms and
        # the order (hence whether the 09:30 straggler meets an
        # advanced watermark) becomes nondeterministic. Pin strictly
        # increasing mtimes.
        base = _time.time()
        for i, d in enumerate(("f1", "f2", "f3")):
            for f in _glob.glob(f"{src}/{d}/*.parquet"):
                _os.utime(f, (base + 10 * i, base + 10 * i))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(f"wm_metrics_out_{tag}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(600), "availableNow run did not finish"
            dropped = sum(
                op["numRowsDroppedByWatermark"]
                for p in q.recentProgress
                for op in p["stateOperators"]
            )
            n_batches = len(
                [p for p in q.recentProgress if p["numInputRows"] > 0]
            )
        finally:
            q.stop()
        return n_batches, dropped

    n_batches, dropped = attempt("a")
    if not (n_batches >= 3 and dropped == 1):
        n_batches, dropped = attempt(_uuid.uuid4().hex[:6])
    assert n_batches >= 3  # one micro-batch per file — real multi-batch run
    assert dropped == 1  # exactly the 09:30 straggler
