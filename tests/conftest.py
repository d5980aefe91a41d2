import pytest

from relation_graph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="rgs-tests",
        master="local[8]",
        # tiny fixtures: 4 shuffle partitions halves the per-job task count
        # without changing any plan shape the tests assert on
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "10m",
            "spark.default.parallelism": "4",
        },
    )
    yield s
    s.stop()


def triples(df):
    """Collect an (s,p,o) frame to a set of int tuples (order-insensitive)."""
    return {(r.s, r.p, r.o) for r in df.collect()}
