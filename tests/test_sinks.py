"""Storage-layout tests: partition pruning and exchange-free bucketed
joins — the physical-plan guarantees the 100 TB design rests on."""

from __future__ import annotations

import pytest

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources import (
    readers,
    sinks,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = readers.load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    sinks.write_partitioned(orders, path, ["o_orderstatus"])
    pruned = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    # partition filter must appear as PartitionFilters, not a post-scan filter
    scan_line = [
        line for line in _plan(pruned).splitlines() if "PartitionFilters" in line
    ]
    assert scan_line and "o_orderstatus" in scan_line[0]
    assert pruned.count() == orders.filter("o_orderstatus = 'F'").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = readers.load_table(spark, sf_dir, "orders")
    lineitem = readers.load_table(spark, sf_dir, "lineitem")
    sinks.write_bucketed(orders, "b_orders", "o_orderkey", 8)
    sinks.write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)

    joined = (
        spark.table("b_lineitem")
        .hint("merge")  # force sort-merge so broadcast can't hide the exchange
        .join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"] == spark.table("b_orders")["o_orderkey"],
        )
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must be co-located (no shuffle)"
    assert joined.count() == lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    ).count()
