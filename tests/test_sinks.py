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


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP — the runtime complement of static partition pruning: when
    the fact is partitioned on the join key and the dim side carries a
    selective filter, the fact scan must receive a runtime
    dynamicpruning subquery instead of reading every partition."""
    from pyspark.sql import functions as F

    orders = readers.load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_prio")
    sinks.write_partitioned(orders, path, ["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn("is_urgent", F.col("o_orderpriority").startswith("1"))
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = fact.join(
            dim.filter("is_urgent"), "o_orderpriority"
        )
        plan = _plan(joined).lower()
        assert "dynamicpruning" in plan
        assert (
            joined.count()
            == orders.filter("o_orderpriority LIKE '1%'").count()
        )
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )


def test_schema_evolution_merge_nulls(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.sinks import (
        schema_evolution_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {r.batch: r for r in schema_evolution_counts(docs).collect()}
    assert set(rows) == {"old", "new"}
    # old writer lacked lang -> every old row NULL there; new writer
    # lacked source symmetrically
    assert rows["old"].null_lang == rows["old"].n_rows
    assert rows["new"].null_source == rows["new"].n_rows
    assert rows["old"].n_rows + rows["new"].n_rows == docs.count()


def test_csv_malformed_lines_are_dead_lettered(spark, sf_dir):
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.sinks import (
        csv_malformed_audit,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = csv_malformed_audit(docs).collect()[0]
    expected_bad = docs.filter("doc_id % 10 = 0").count()
    assert got.n_corrupt == expected_bad > 0
    assert got.n_good + got.n_corrupt == got.n_lines == docs.count()
