import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otel_arrow_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_MASTER", "local[4]")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_spark(app_name="otel-arrow-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_pdf():
    from otel_arrow_spark.fixtures import gen_transcripts_pdf

    return gen_transcripts_pdf(4000)


@pytest.fixture(scope="session")
def transcripts(spark, fixture_pdf):
    return spark.createDataFrame(fixture_pdf).cache()


@pytest.fixture(scope="session")
def catalogs(spark):
    from otel_arrow_spark.fixtures import gen_role_catalog, gen_tool_catalog

    return (
        spark.createDataFrame(gen_tool_catalog()),
        spark.createDataFrame(gen_role_catalog()),
    )
