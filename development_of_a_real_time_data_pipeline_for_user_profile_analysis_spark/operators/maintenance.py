"""Serving-store maintenance operators — upsert merge and SCD2
history builds.

The reference's serving path is a MongoDB collection the streaming
job appends profiles into (reference Real_Time_Data.py:139-160 wires
the curated stream to external stores); an analytics engine that owns
its serving tables needs the two classic maintenance primitives on
top of immutable parquet:

- ``merge_upsert`` — latest-wins key merge of a base snapshot with an
  updates feed (the MERGE INTO / upsert pattern).
- ``scd2_history`` — a type-2 slowly-changing-dimension build from a
  change feed: one row per (key, value-run) with validity interval.

Design for 100 TB:
- ``merge_upsert`` is union + one window shuffle keyed on the merge
  key — the same single-shuffle cost as the groupBy it replaces, no
  driver round-trips, no full-outer join. At petabyte scale the
  window's per-key state is two rows (base + update) per key, so
  there is no skew risk beyond the key distribution itself.
- ``scd2_history`` is one window shuffle keyed on the entity key;
  run-collapse and interval assignment are lag/lead over that single
  sort — no self-join, no second shuffle (lag, lead and row_number
  share one window frame).
- Both write naturally into partitioned parquet via
  ``sinks.write_partitioned`` — the merge key never needs a global
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str = "_version",
) -> DataFrame:
    """Latest-wins upsert: rows from ``updates`` replace same-key rows
    in ``base``; unmatched update rows are inserts.

    Both inputs must share a schema plus ``order_col`` (higher wins;
    ties break toward ``updates``). One shuffle on ``keys``.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    ts_col: str,
    tracked: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 history from a change feed: collapse consecutive rows
    with the same ``tracked`` value per ``key`` (ordered by
    ``ts_col``, ties by ``tiebreak``), then assign
    ``valid_from`` / ``valid_to`` / ``is_current``.

    valid_to is the next run's start (half-open interval), NULL for
    the current run. Single window shuffle on ``key``.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    runs = (
        changes.select(key, ts_col, tiebreak, tracked)
        .withColumn("_prev", F.lag(tracked).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(tracked) != F.col("_prev"))
        )
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return (
        runs.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, tracked, "valid_from", "valid_to", "is_current")
    )
