from __future__ import annotations

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("engine-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
