from __future__ import annotations

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
    registry,
)
from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans.dashboard import (
    refresh,
)


def test_dashboard_refresh_consistency(spark, sf_dir):
    profiles = registry.profiles_df(spark, sf_dir)
    views = refresh(profiles)
    total = views["total_users"].collect()[0]["count"]
    assert total == profiles.count()
    assert sum(r["count"] for r in views["gender_distribution"].collect()) == total
    assert sum(r["count"] for r in views["age_histogram"].collect()) == total
    ecdf = views["age_ecdf"].collect()
    assert len(ecdf) == total and ecdf[-1].cum_count == total
    assert len(views["top_email_domains"].collect()) == 5
    for df in views.values():
        df.unpersist()
