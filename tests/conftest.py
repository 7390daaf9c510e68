from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("MCDP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from multichannel_commerce_data_pipeline_spark.session import get_spark

    spark = get_spark("mcdp-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    from multichannel_commerce_data_pipeline_spark.testing import oracle_connection

    con = oracle_connection(SF_DIR)
    yield con
    con.close()
