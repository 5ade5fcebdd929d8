import pytest


@pytest.fixture(scope="session")
def spark():
    from sketchy_spark.session import get_spark

    s = get_spark(
        "sketchy-tests",
        master="local[*]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()
