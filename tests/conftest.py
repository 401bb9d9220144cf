from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from streaming_data_pipeline_capstone_spark.session import get_spark

    # small local session for tests: fewer shuffle partitions = faster
    spark = get_spark(
        app_name="sdpc-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.streaming.schemaInference": "false"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
