"""Physical-plan contract tests: the properties the 100 TB design
rests on must appear in the executed plans — a perf regression that
drops a pushdown or flips a broadcast to sort-merge fails here, not
in production."""

from __future__ import annotations

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
    QUERIES,
)


def _plan(spark, name, sf_dir) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(spark, "pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_nation_revenue_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, "nation_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_top_email_domains_uses_topk_and_prunes(spark, sf_dir):
    plan = _plan(spark, "top_email_domains", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # nested pruning collapses the synthetic profile derivation to a
    # single-column scan of the customer key
    assert "ReadSchema: struct<c_custkey:bigint>" in plan


def test_jaccard_verify_is_pair_driven(spark, sf_dir):
    plan = _plan(spark, "near_dedup_minhash", sf_dir)
    # the candidate pair set must broadcast into the verify join —
    # a shingle-shingle SortMergeJoin would be the quadratic plan
    assert "BroadcastHashJoin" in plan


def test_etl_chain_is_narrow(spark, sf_dir):
    plan = _plan(spark, "etl_curate_profiles", sf_dir)
    assert "Exchange" not in plan  # no shuffle anywhere in the chain
