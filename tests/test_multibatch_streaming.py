"""Cross-batch state-merge evidence for the stateful streaming
operators.

The driver-gate streaming queries run availableNow over a single
micro-batch, which collapses to batch semantics — correct, but it
never exercises state surviving a batch boundary. These tests force
>= 3 micro-batches with `maxFilesPerTrigger` and assert the FINAL
emitted state still equals the batch answer (the same relation the
driver's oracle checks), proving the state merge itself:

- applyInPandasWithState running totals: counts accumulate across
  batches (state read-modify-write per key per batch);
- session_window aggregation: sessions started in one batch merge
  with events arriving in later batches;
- dropDuplicates(id): an id seen in batch 1 suppresses its duplicate
  arriving in batch 3.

Watermarks are set far in the past here (3650 days): the split into
files is partition-arbitrary, so event time does not arrive in order
and a tight watermark would (correctly) drop stragglers as late —
late-data semantics are covered separately in test_watermark.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
    load_table,
)

pytestmark = pytest.mark.filterwarnings("ignore")

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 events rewritten as 4 parquet files (normalized ts), so
    maxFilesPerTrigger=1 yields 4 micro-batches."""
    d = tmp_path_factory.mktemp("events_split")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d))
    return str(d)


def _run_multibatch(spark, df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    return spark.table(name), n_batches


def _stream(spark, events_dir, max_files=1):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


def test_running_totals_merge_across_batches(spark, events_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.stateful import (
        running_user_totals,
    )

    out, n_batches = _run_multibatch(
        spark,
        running_user_totals(_stream(spark, events_dir)),
        "mb_totals",
        "update",
    )
    assert n_batches >= 3  # the state genuinely crossed batch boundaries

    # final emission per user = the row with the highest running count
    final = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n"), F.col("s.total_value").alias("tv"))
    )
    expected = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    assert final.count() == expected.count()
    # exact on counts; totals within a cent (running emission rounds
    # per batch; the batch side rounds once — fp addition order differs)
    mismatch = final.join(expected, "user_id", "full").filter(
        F.col("n").isNull()
        | F.col("n_events").isNull()
        | (F.col("n") != F.col("n_events"))
        | (F.abs(F.col("tv") - F.col("total_value")) > 0.011)
    )
    assert mismatch.count() == 0


def test_session_windows_merge_across_batches(spark, events_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        sessionized_stream,
    )

    multi, n_batches = _run_multibatch(
        spark,
        sessionized_stream(
            _stream(spark, events_dir), gap="30 minutes", watermark_delay="3650 days"
        ),
        "mb_sessions",
        "complete",
    )
    assert n_batches >= 3
    single, _ = _run_multibatch(
        spark,
        sessionized_stream(
            _stream(spark, events_dir, max_files=1000),
            gap="30 minutes",
            watermark_delay="3650 days",
        ),
        "sb_sessions",
        "complete",
    )
    # complete-mode final state after 4 batches == single-batch answer
    # (which is the driver-oracle-verified relation)
    assert multi.exceptAll(single).count() == 0
    assert single.exceptAll(multi).count() == 0
    assert multi.count() > 0


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Every envelope is written twice; with 6 text files and
    maxFilesPerTrigger=2 the duplicate of a given id usually lands in
    a LATER batch than its first occurrence — the cross-batch dedup
    state is what suppresses it."""
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        etl,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.synthetic import (
        envelopes_from_customers,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.pipeline import (
        deduped_stream,
        read_envelope_file_stream,
    )

    d = tmp_path / "env_twice"
    env = envelopes_from_customers(
        load_table(spark, "/root/testdata/sf0.001", "customer")
    ).select("value")
    env.repartition(3).write.mode("overwrite").text(str(d))
    env.repartition(3).write.mode("append").text(str(d))

    src = read_envelope_file_stream(spark, str(d), max_files_per_trigger=2)
    out, n_batches = _run_multibatch(
        spark,
        deduped_stream(src, watermark_delay="3650 days").drop("event_time"),
        "mb_dedup",
        "append",
    )
    assert n_batches >= 3

    expected = etl.curate_profiles(
        etl.parse_envelopes(spark.read.text(str(d)).limit(0).union(env))
    )
    assert out.count() == expected.count()  # duplicates fully suppressed
    assert out.select("id").distinct().count() == out.count()
    assert out.exceptAll(expected).count() == 0
