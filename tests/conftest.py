import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from vectordbindexing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vdbi-tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from vectordbindexing_spark.io.tables import load_tables

    return load_tables(spark, sf_dir)
