import sys

import pytest

sys.path.insert(0, "/root/repo")

from jsonschema_rs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="jsonschema-rs-spark-tests", cores=8,
                  shuffle_partitions=8)
    yield s
    s.stop()
