"""Custom stateful streaming operator on the PySpark 4
`transformWithStateInPandas` API (the successor to
applyInPandasWithState: typed state variables, per-state TTL, timers).

Per-user running profile: a ValueState carries (event count, value
total) and a MapState carries per-event-type counts — the composite
state shape of a streaming feature store (the thing the reference's
dashboard recomputes from scratch off Mongo every 10 s,
dashbord/dashbord.py:85-121, here maintained incrementally with
exactly-once state).

Scale posture: state is keyed by user_id — one shuffle per
micro-batch on the grouping key, then the state store is
partition-local (RocksDB-backed on a real cluster). Memory scales
with distinct users × event types, not event volume; `state_ttl_ms`
bounds it for idle keys (TTL is the modern API's replacement for the
manual timeout bookkeeping in stateful.py)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, type_counts string"
)


class UserProfileProcessor(StatefulProcessor):
    """Running (count, total, per-type counts) per user; emits the
    updated profile once per key per micro-batch."""

    def __init__(self, state_ttl_ms: int | None = None) -> None:
        self._ttl = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, total double", ttlDurationMs=self._ttl
        )
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "n long", ttlDurationMs=self._ttl
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        type_deltas: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for t, c in pdf["event_type"].value_counts().items():
                type_deltas[t] = type_deltas.get(t, 0) + int(c)
        self._totals.update((n, total))
        for t, c in type_deltas.items():
            prev = (
                self._by_type.getValue((t,))[0]
                if self._by_type.containsKey((t,))
                else 0
            )
            self._by_type.updateValue((t,), (prev + c,))
        counts = sorted(
            (k[0], v[0]) for k, v in self._by_type.iterator()
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "type_counts": [",".join(f"{t}:{c}" for t, c in counts)],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """events stream → per-user running profile via
    transformWithStateInPandas (update mode, processing-time time
    mode). Input needs columns user_id, value, event_type."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
