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
    keep_tiebreak: bool = False,
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
        .select(
            key,
            tracked,
            "valid_from",
            "valid_to",
            "is_current",
            *([tiebreak] if keep_tiebreak else []),
        )
    )


def _morton_terms(b1, b2, bits: int):
    """Interleave two `bits`-wide bucket columns into a Morton
    (Z-order) value: bit i of b1 lands at position 2i+1, bit i of b2
    at 2i. Pure bit arithmetic — portable to any SQL engine."""
    z = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zorder_files(
    orders: DataFrame, bits: int = 8, n_files: int = 16
) -> DataFrame:
    """Z-order (Morton-curve) file layout plan for the orders fact
    over (o_custkey, o_orderdate) — the multi-dimensional clustering
    that makes BOTH `custkey = ?` and `orderdate BETWEEN ?` scans
    prune files, where a linear sort only serves one dimension.

    Each dimension is bucketed to `bits` bits by fixed-width ranges
    over its global min/max (one 1-row broadcast aggregate — no
    quantile pass, deterministic), the buckets interleave into a
    2*bits Morton value, and the top log2(n_files) bits assign the
    file. Returns the per-file manifest: row count plus min/max of
    both dimensions — exactly the footer stats a scan planner prunes
    on; narrow ranges in BOTH columns are the point of the curve.

    At 100 TB this is the write-side layout pass before a sorted-
    within-file parquet write: one broadcast stats join, one map, one
    groupBy(file_id) — a single uniform shuffle on the file key.
    """
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    stats = F.broadcast(
        orders.agg(
            F.min("o_custkey").alias("mn_c"),
            F.max("o_custkey").alias("mx_c"),
            F.min(day).alias("mn_d"),
            F.max(day).alias("mx_d"),
        )
    )
    n = 1 << bits
    bucket = lambda v, mn, mx: F.floor(  # noqa: E731
        (v - mn) * n / (mx - mn + 1)
    ).cast("long")
    with_z = (
        orders.select("o_custkey", "o_orderdate")
        .crossJoin(stats)
        .select(
            "o_custkey",
            "o_orderdate",
            _morton_terms(
                bucket(F.col("o_custkey"), F.col("mn_c"), F.col("mx_c")),
                bucket(day, F.col("mn_d"), F.col("mx_d")),
                bits,
            ).alias("z"),
        )
    )
    shift = 2 * bits - max(n_files.bit_length() - 1, 0)
    return (
        with_z.select(
            F.shiftright(F.col("z"), shift).alias("file_id"),
            "o_custkey",
            "o_orderdate",
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("cust_lo"),
            F.max("o_custkey").alias("cust_hi"),
            F.min("o_orderdate").alias("date_lo"),
            F.max("o_orderdate").alias("date_hi"),
        )
    )


def compaction_plan(
    events: DataFrame, target_rows: int = 500
) -> DataFrame:
    """Partition-compaction planning — the small-file maintenance op:
    given day-partitioned event data, pack adjacent daily partitions
    into rewrite groups of ~`target_rows` rows each, so a year of
    dribble-sized partitions becomes a handful of well-sized files.

    The plan runs on the partition MANIFEST (one row per day — tiny),
    not the data: daily counts aggregate map-side, the exclusive
    cumulative sum runs a window over |days| rows, and group id =
    cum_before // target (first-fit by date order, each group
    overflows by at most one partition — the standard bin contract).
    The expensive part, the rewrite itself, stays a partition-pruned
    scan of only the days in each group.

    Returns one row per rewrite group: partition span, row total, and
    how many source partitions collapse into it (n_partitions > 1 =
    compaction win; = 1 means the day is already target-sized).
    """
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    grouped = daily.select(
        "day",
        "n",
        (F.coalesce(F.sum("n").over(w), F.lit(0)) / target_rows)
        .cast("long")
        .alias("group_id"),
    )
    return grouped.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("day").alias("day_lo"),
        F.max("day").alias("day_hi"),
    )


def referential_integrity_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Warehouse expectations audit (dbt-test style): FK orphan
    counts, key uniqueness, and null-key checks across the core
    tables, one row per check. The data-quality gate a pipeline runs
    before publishing a snapshot — the reference trusts Mongo
    implicitly (Real_Time_Data.py writes unvalidated); an engine that
    owns its tables must verify them.

    Scale shape: each FK check is one left-anti join on the key (AQE
    picks broadcast when the parent side fits, shuffle otherwise)
    feeding a partial-aggregable count; uniqueness and null checks
    are single aggregates over one scan. The report is |checks| rows;
    nothing is collected until the final tiny union.
    """

    def fk(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str):
        viol = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        rows = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        return viol.crossJoin(F.broadcast(rows)).select(
            F.lit(name).alias("check_name"), "n_rows", "n_violations"
        )

    def unique(name: str, df: DataFrame, key: str):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(key) - F.countDistinct(key)).cast("long").alias("n_violations"),
        ).select(F.lit(name).alias("check_name"), "n_rows", "n_violations")

    def notnull(name: str, df: DataFrame, key: str):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col(key).isNull(), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_violations"),
        ).select(F.lit(name).alias("check_name"), "n_rows", "n_violations")

    checks = [
        fk("fk_orders_custkey", orders, "o_custkey", customer, "c_custkey"),
        fk("fk_lineitem_orderkey", lineitem, "l_orderkey", orders, "o_orderkey"),
        fk("fk_lineitem_partkey", lineitem, "l_partkey", part, "p_partkey"),
        fk("fk_lineitem_suppkey", lineitem, "l_suppkey", supplier, "s_suppkey"),
        unique("unique_customer_custkey", customer, "c_custkey"),
        unique("unique_orders_orderkey", orders, "o_orderkey"),
        notnull("notnull_orders_custkey", orders, "o_custkey"),
        notnull("notnull_lineitem_orderkey", lineitem, "l_orderkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Change-data feed between two table snapshots: full-outer join
    on the key, per-row classification into added / removed /
    updated / unchanged (Delta-style CDF computed from immutable
    parquet snapshots — the audit trail for a published-table swap).

    Scale shape: ONE key-partitioned full-outer join (sort-merge on
    the snapshot key, or broadcast for a small delta); the payload
    comparison is a null-safe struct equality — no per-column join
    conditions, no second shuffle.
    """
    pay_old = [c for c in old.columns if c not in keys]
    pay_new = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*pay_old).alias("_o"))
    n = new.select(*keys, F.struct(*pay_new).alias("_n"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_o").isNull(), "added")
        .when(F.col("_n").isNull(), "removed")
        .when(F.col("_o").eqNullSafe(F.col("_n")), "unchanged")
        .otherwise("updated")
    )
    return j.select(*keys, change.alias("change_type"))


def pit_join_strict(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    fact_ts: str,
    hist_ts: str,
    payload: str,
    tiebreak: str,
    out_col: str = "pit_value",
) -> DataFrame:
    """Point-in-time join of a fact table against a versioned (SCD2)
    dimension: each fact row picks the dimension ``payload`` from the
    history row with the greatest (``hist_ts``, ``tiebreak``)
    STRICTLY before the fact's ``fact_ts`` — the bitemporal lookup
    that answers "what did we believe about this entity before this
    transaction happened" without leaking same-instant knowledge
    (the train-data-leakage guard in feature pipelines).
    ``tiebreak`` must exist on both sides (facts: the row id;
    history: the run-starting row id).

    Implemented as the union-asof pattern, NOT a range join: facts
    and history rows interleave in one (key, ts, side) sort where a
    fact at time t sorts BEFORE history rows at the same t, and a
    last_value(ignorenulls) window over the strict-preceding frame
    carries the most recent strictly-earlier payload forward. ONE
    shuffle on the key, no range-predicate pair explosion, no
    broadcast of the history side.
    """
    extra = [c for c in facts.columns if c not in (key, fact_ts, tiebreak)]
    f = facts.select(
        F.col(key),
        F.col(fact_ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(history.schema[payload].dataType).alias("_p"),
        *[F.col(c) for c in extra],
    )
    h = history.select(
        F.col(key),
        F.col(hist_ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(1).alias("_side"),
        F.col(payload).alias("_p"),
        *[
            F.lit(None).cast(facts.schema[c].dataType).alias(c)
            for c in extra
        ],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(
        F.when(F.col("_side") == 1, F.col("_p")), ignorenulls=True
    )
    return (
        f.unionByName(h)
        .withColumn(out_col, carried.over(w))
        .filter(F.col("_side") == 0)
        .select(
            F.col(key),
            F.col("_ts").alias(fact_ts),
            F.col("_tb").alias(tiebreak),
            *[F.col(c) for c in extra],
            F.col(out_col),
        )
    )


def scan_pruning_estimate(
    orders: DataFrame, bits: int = 8, n_files: int = 16, n_probes: int = 8
) -> DataFrame:
    """File-skipping effectiveness of the z-order layout: probe the
    zorder_files manifest with `n_probes` equality predicates spread
    across the custkey range and report how many files each probe
    must scan vs can prune on footer min/max — the measurement that
    justifies (or rejects) the layout before a 100 TB rewrite.

    Probes are deterministic octile points of the key range (no
    sampling RNG). Scale shape: the manifest is n_files rows and the
    probe set is n_probes rows — the estimate is a metadata-only
    crossJoin after the manifest aggregate; cost is the one
    zorder_files pass.
    """
    manifest = zorder_files(orders, bits=bits, n_files=n_files)
    rng = orders.agg(
        F.min("o_custkey").alias("mn"), F.max("o_custkey").alias("mx")
    )
    probes = rng.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_probes - 1))).alias("k"),
        "mn",
        "mx",
    ).select(
        "k",
        (
            F.col("mn")
            + F.floor((F.col("mx") - F.col("mn")) * F.col("k") / n_probes)
        ).cast("long").alias("probe_custkey"),
    )
    hit = (
        (F.col("probe_custkey") >= F.col("cust_lo"))
        & (F.col("probe_custkey") <= F.col("cust_hi"))
    ).cast("int")
    return (
        manifest.crossJoin(F.broadcast(probes))
        .groupBy("k", "probe_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(hit).alias("n_scanned"),
        )
        .select(
            "k",
            "probe_custkey",
            "n_files",
            "n_scanned",
            (
                F.floor(
                    (1 - F.col("n_scanned") / F.col("n_files")) * 10000 + 0.5
                ).cast("long")
                / 100.0
            ).alias("prune_pct"),
        )
    )


def merge_apply_cdc(
    base: DataFrame,
    feed: DataFrame,
    keys: list[str],
    order_col: str = "_version",
    op_col: str = "_op",
) -> DataFrame:
    """Full MERGE semantics over a CDC feed: apply inserts ('I'),
    updates ('U') and deletes ('D') from ``feed`` to ``base`` —
    the missing third of the maintenance surface next to
    merge_upsert (no deletes) and snapshot_diff (derives the feed).
    Per key, the highest (``order_col``, feed-beats-base) row wins;
    if that winner is a delete, the key is dropped from the result.

    One shuffle on ``keys`` (the same single-window plan as
    merge_upsert — WindowGroupLimit prunes to one row per key before
    the delete filter); no join, no driver logic.
    """
    tagged = base.withColumn("_src", F.lit(0)).withColumn(
        op_col, F.lit("I")
    ).unionByName(feed.withColumn("_src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn", "_src", op_col)
    )
