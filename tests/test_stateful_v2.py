"""transformWithStateInPandas processor (streaming/stateful_v2.py).

The engine-side integration needs the google.protobuf runtime (the
transformWithState worker speaks proto to the JVM state server),
which is absent in this environment — so the processor LOGIC is
verified here against faithful in-memory fakes of the typed state
API, and the full streaming integration auto-enables when protobuf
is present (see PERF.md 'transformWithState status')."""

from __future__ import annotations

import pandas as pd
import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.streaming.stateful_v2 import (
    UserProfileProcessor,
    running_user_profiles,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeMapState:
    def __init__(self):
        self._m = {}

    def exists(self):
        return bool(self._m)

    def containsKey(self, k):
        return tuple(k) in self._m

    def getValue(self, k):
        return self._m[tuple(k)]

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def iterator(self):
        return iter(self._m.items())

    def keys(self):
        return iter(self._m.keys())

    def values(self):
        return iter(self._m.values())

    def removeKey(self, k):
        self._m.pop(tuple(k), None)

    def clear(self):
        self._m.clear()


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeMapState())


def _batch(types_values):
    return pd.DataFrame(
        {
            "event_type": [t for t, _ in types_values],
            "value": [v for _, v in types_values],
        }
    )


def test_processor_accumulates_across_batches():
    proc = UserProfileProcessor()
    proc.init(FakeHandle())
    out1 = pd.concat(
        proc.handleInputRows((7,), iter([_batch([("view", 1.0), ("click", 2.0)])]), None)
    )
    assert out1.iloc[0].n_events == 2
    assert out1.iloc[0].total_value == 3.0
    assert out1.iloc[0].type_counts == "click:1,view:1"

    out2 = pd.concat(
        proc.handleInputRows((7,), iter([_batch([("view", 4.5)])]), None)
    )
    assert out2.iloc[0].n_events == 3
    assert out2.iloc[0].total_value == 7.5
    assert out2.iloc[0].type_counts == "click:1,view:2"


def test_processor_keys_are_independent():
    proc = UserProfileProcessor()
    handle = FakeHandle()
    proc.init(handle)
    list(proc.handleInputRows((1,), iter([_batch([("view", 1.0)])]), None))
    # a second processor instance (as Spark would run per partition)
    # with its own state sees nothing from key 1
    proc2 = UserProfileProcessor()
    proc2.init(FakeHandle())
    out = pd.concat(proc2.handleInputRows((2,), iter([_batch([("buy", 9.0)])]), None))
    assert out.iloc[0].n_events == 1 and out.iloc[0].type_counts == "buy:1"


def test_streaming_integration_when_protobuf_present(spark, sf_dir):
    pytest.importorskip("google.protobuf")
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.registry import (
        _events_stream,
        _run_to_memory,
    )

    out = _run_to_memory(
        running_user_profiles(_events_stream(spark, sf_dir)), output_mode="update"
    )
    truth = spark.sql(
        "SELECT user_id, count(*) n FROM {e} GROUP BY user_id",
        e=spark.read.parquet(f"{sf_dir}/events.parquet"),
    )
    got = {r.user_id: r.n_events for r in out.collect()}
    for r in truth.collect():
        assert got[r.user_id] == r.n
