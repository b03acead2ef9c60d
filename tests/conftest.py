from __future__ import annotations

import pytest

from splink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="splink_spark_tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "unique_id")
    )
