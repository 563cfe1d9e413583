import pytest


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="session")
def spark():
    from featurewiz_spark import get_spark

    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
