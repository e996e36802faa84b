import os

import pytest

from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("tests", shuffle_partitions=8)
    register_testdata(spark, SF_SMOKE)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
