import os

import pytest

from crux_spark import Catalog, get_spark

SF_DIR = os.environ.get("CRUX_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("crux-spark-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def catalog(spark):
    return Catalog(spark, SF_DIR)
