from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (  # noqa: E402
    get_spark,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
