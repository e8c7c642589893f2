"""Custom stateful streaming operator via applyInPandasWithState.

Per-user event-count sessionless state: maintains a running event
count and total value per user across micro-batches, emitting one
row per user per batch with the updated totals — the building block
for streaming feature stores / threshold alerting that built-in
windowed aggregates can't express (state survives across batches
with custom update logic and timeout-based eviction).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user running (count, total value). State is
    keyed by user_id — shuffles once per batch on the key, state store
    is per-partition; scales with distinct users, not event volume."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of :func:`running_user_totals`
    — the Spark 4 arbitrary-state API (typed state handles, timers,
    explicit TTL support) that supersedes applyInPandasWithState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        got = self._state.get()
        n, total = got if got is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the transformWithStateInPandas API.

    Same state/shuffle shape as running_user_totals (one shuffle per
    batch on user_id; state store scales with distinct users), but on
    the newer engine: RocksDB-backed state with changelog
    checkpointing works out of the box, and state TTL / timers are
    available for eviction policies the GroupState API can't express.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


ATTR_OUTPUT_SCHEMA = "event_id long, user_id long, channel string, value double"
ATTR_STATE_SCHEMA = "touch string"


def _attribute(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    touch = state.get[0] if state.exists else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    t = batch["event_type"]
    # last non-purchase type at-or-before each row (purchases are NaN
    # in the source series, so 'at-or-before' == 'strictly before'),
    # seeded with the carried-over touch from previous batches
    seen = t.where(t != "purchase").ffill()
    if touch is not None:
        seen = seen.fillna(touch)
    is_purchase = (t == "purchase").to_numpy()
    purchases = batch[is_purchase]
    non_purchase = seen[~is_purchase]
    new_touch = str(non_purchase.iloc[-1]) if len(non_purchase) else touch
    state.update((new_touch,))
    yield pd.DataFrame(
        {
            "event_id": purchases["event_id"].astype("int64"),
            "user_id": key[0],
            "channel": seen[is_purchase].fillna("direct"),
            "value": purchases["value"].astype("float64"),
        }
    )


def streaming_last_touch(events: DataFrame) -> DataFrame:
    """Streaming twin of analytics.last_touch_attribution: per-user
    last-touch state carried across micro-batches via
    applyInPandasWithState; each purchase is emitted exactly once,
    attributed to the most recent preceding non-purchase event type
    ('direct' when none). Assumes per-user event-time-ordered arrival
    across batches (the file source delivers files in order; a
    watermark-buffered variant would reorder stragglers first — same
    caveat as any order-sensitive state machine).

    Scale shape: one shuffle per batch on user_id; state is ONE
    string per user, so the state store scales with |users|, not
    event volume. Emission is append-like (each purchase once), so
    downstream aggregation re-groups only new rows per batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _attribute,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CHURN_OUTPUT_SCHEMA = "user_id long, last_seen timestamp, n_events long"
CHURN_STATE_SCHEMA = "n long, last_us long"


def churn_detector(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-time timeout eviction: a user with no events for
    `gap_minutes` of EVENT time (watermark clock, not wall clock) is
    emitted as churned and their state removed — the inactivity-alert
    / session-expiry primitive that needs timeout callbacks, which no
    built-in windowed aggregate can express.

    Scale shape: state is (count, last_seen) per user; the timeout
    registry is per-partition in the state store, so eviction scales
    with |users|, not event volume. Requires a watermark on ts — the
    timeout fires when the watermark passes last_seen + gap.
    """
    gap_ms = gap_minutes * 60 * 1000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, last_us = state.get
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            state.remove()
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_last = int(pdf["ts"].max().value // 1000)  # ns -> us
            last_us = max(last_us, batch_last)
        state.update((n, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        yield pd.DataFrame({"user_id": [], "last_seen": [], "n_events": []})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CHURN_OUTPUT_SCHEMA,
        stateStructType=CHURN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
