"""SURVEY M2: every engine capability is also reachable through the
spark.sql surface — spot-check that SQL-dialect formulations over the
registered views agree with the DataFrame implementations."""

from __future__ import annotations

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    aggregates,
    analytics,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.sources.readers import (
    load_table,
    register_views,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_equals_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)

    sql_pricing = spark.sql(
        """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
           GROUP BY l_returnflag, l_linestatus"""
    )
    df_pricing = analytics.pricing_summary(load_table(spark, sf_dir, "lineitem"))
    assert _rows(sql_pricing, "l_returnflag", "sum_qty", "count_order") == _rows(
        df_pricing, "l_returnflag", "sum_qty", "count_order"
    )

    sql_sessions = spark.sql(
        """WITH flagged AS (
             SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
           SELECT user_id,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM flagged"""
    )
    df_sessions = analytics.sessionize(load_table(spark, sf_dir, "events"))
    assert sql_sessions.count() == load_table(spark, sf_dir, "events").count()
    assert (
        sql_sessions.groupBy("user_id").max("session_id").count()
        == df_sessions.select("user_id").distinct().count()
    )
