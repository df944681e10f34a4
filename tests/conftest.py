import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automation_of_building_a_transactional_data_lake_spark.session import SessionFactory

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "deep: sf0.01 tail-pipeline tier (opt-in: TDL_DEEP_TESTS=1; the "
        "weekly/deep CI lane — demoted composed gates keep "
        "nontrivial-scale coverage, r16)",
    )


@pytest.fixture(scope="session")
def spark():
    spark = SessionFactory(
        master="local[4]",
        app_name="tdl_tests",
        shuffle_partitions=4,
    ).create()
    yield spark
    spark.stop()
