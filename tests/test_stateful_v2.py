"""transformWithStateInPandas (Spark 4 arbitrary-state API) and
RocksDB state store coverage.

transformWithStateInPandas requires the protobuf runtime for its
Python↔JVM state-server protocol; this container doesn't ship
protobuf, so the behavior test skips there (the operator is written
to the public API — streaming/stateful.py). The RocksDB provider is
JVM-side and runs regardless.
"""

from __future__ import annotations

import importlib.util

import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming import (
    stateful,
)

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False


def _totals_via(spark, tmp_path, build, ckpt_name, conf=()):
    spark.createDataFrame(
        [(1, 1.5), (1, 2.5), (2, 4.0), (3, 0.5)], "user_id long, value double"
    ).write.parquet(str(tmp_path / "in"))
    src = spark.readStream.schema("user_id long, value double").parquet(
        str(tmp_path / "in")
    )
    name = f"t_{ckpt_name}"
    writer = (
        build(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / ckpt_name))
        .trigger(availableNow=True)
    )
    for k, v in conf:
        writer = writer.option(k, v)
    q = writer.start()
    q.awaitTermination(120)
    return {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(f"select * from {name}").collect()
    }


EXPECTED = {1: (2, 4.0), 2: (1, 4.0), 3: (1, 0.5)}


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="protobuf runtime absent")
def test_transform_with_state_running_totals(spark, tmp_path):
    got = _totals_via(spark, tmp_path, stateful.running_user_totals_tws, "tws")
    assert got == EXPECTED


def test_transform_with_state_plan_resolves(spark, tmp_path):
    """Even without protobuf the logical plan must build and resolve —
    catches API drift (argument names, output schema) at import cost
    only."""
    src = spark.readStream.schema("user_id long, value double").parquet(
        str(tmp_path)
    )
    df = stateful.running_user_totals_tws(src)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]
    assert df.isStreaming


def test_rocksdb_state_store_running_totals(spark, tmp_path):
    """The same stateful aggregation on the RocksDB state store
    provider — the provider that keeps 100 TB-scale state off-heap
    with changelog checkpointing. Set per-session, restored after."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _totals_via(
            spark, tmp_path, stateful.running_user_totals, "rocksdb"
        )
        assert got == EXPECTED
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
