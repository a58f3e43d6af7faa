import pytest

from tafra_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tafra_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tafra(spark):
    """Canonical 6-row fixture (FIXTURES.md F1; reference
    test_tafra.py:79-84)."""
    from tafra_spark import Tafra

    return Tafra(
        {
            "x": [1, 2, 3, 4, 5, 6],
            "y": ["one", "two", "one", "two", "one", "two"],
            "z": [0, 0, 0, 1, 1, 1],
        }
    )
