from __future__ import annotations

import pytest

from splade_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "splade_spark_tests",
        cores=4,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from splade_spark.fixtures import transcripts

    return transcripts(spark, 100, partitions=4).cache()


@pytest.fixture(scope="session")
def tiny_documents(spark, tiny_transcripts):
    from splade_spark.documents import build_documents

    return build_documents(tiny_transcripts, partitions=4).cache()
