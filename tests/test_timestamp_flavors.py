"""The testdata corpus's parquet timestamp flavor is not under our
control — it has already shifted once between rounds (nanos-int64 →
naive micros), which silently broke every unix_micros consumer. These
tests pin the adaptive read paths (batch readers.load_table and the
registry's events file-stream) against all three flavors a pandas/
pyarrow writer can produce:

  * ns  naive        (TIMESTAMP(NANOS),  isAdjustedToUTC=false)
  * us  naive        (TIMESTAMP(MICROS), isAdjustedToUTC=false)
  * us  UTC-adjusted (TIMESTAMP(MICROS), isAdjustedToUTC=true)

Every flavor must surface as a plain TimestampType (LTZ) column with
identical wall-clock values — the session timezone is pinned UTC, so
naive == UTC-adjusted by construction.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    analytics,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
    registry,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
    load_table,
)

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 1),
    dt.datetime(2024, 1, 1, 0, 10, 0),
    dt.datetime(2024, 1, 1, 1, 0, 0),
    dt.datetime(2024, 1, 1, 2, 30, 0),
]
FLAVORS = {
    "ns_naive": pa.timestamp("ns"),
    "us_naive": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}


def _write_events(path: str, ts_type: pa.DataType) -> None:
    n = len(TS)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(TS, ts_type),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_load_table_normalizes_every_flavor(spark, tmp_path, flavor):
    d = tmp_path / flavor
    d.mkdir()
    _write_events(str(d / "events.parquet"), FLAVORS[flavor])
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == TS
    # downstream unix_micros consumers must resolve (the round-2
    # regression was an AnalysisException right here)
    assert analytics.sessionize(df).count() > 0


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_events_stream_adapts_schema_per_flavor(spark, tmp_path, flavor):
    d = tmp_path / flavor
    d.mkdir()
    _write_events(str(d / "events.parquet"), FLAVORS[flavor])
    stream = registry._events_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    out = registry._run_to_memory(analytics.events_hourly(stream))
    rows = {(r.hour_start, r.n) for r in out.collect()}
    assert (dt.datetime(2024, 1, 1, 0, 0), 2) in rows
    assert (dt.datetime(2024, 1, 1, 1, 0), 1) in rows


def test_stream_symlink_dir_is_isolated(spark, tmp_path):
    """Two streams over different corpora must not share temp dirs."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write_events(str(a / "events.parquet"), FLAVORS["us_naive"])
    _write_events(str(b / "events.parquet"), FLAVORS["ns_naive"])
    ca = registry._run_to_memory(
        analytics.events_hourly(registry._events_stream(spark, str(a)))
    ).count()
    cb = registry._run_to_memory(
        analytics.events_hourly(registry._events_stream(spark, str(b)))
    ).count()
    assert ca == cb == 3


def _flavor_of(path: str) -> str:
    f = pq.read_schema(path).field("ts")
    return f"{f.type.unit}_{'utc' if f.type.tz else 'naive'}"


def test_corpus_flavor_is_one_we_cover():
    """If the driver regenerates testdata with a new flavor, fail
    loudly here instead of silently inside 60 queries."""
    paths = [
        p
        for sf in ("sf0.001", "sf0.01")
        if os.path.exists(p := f"/root/testdata/{sf}/events.parquet")
    ]
    if not paths:
        pytest.skip("no testdata corpus on this machine — canary cannot run")
    for p in paths:
        assert _flavor_of(p) in {"ns_naive", "us_naive", "us_utc"}
