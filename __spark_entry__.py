"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
    ORACLES,
    QUERIES,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
