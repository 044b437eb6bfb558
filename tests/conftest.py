import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from georasters_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_t1(spark):
    from georasters_spark import queries as Q
    from georasters_spark.sources import synth

    return Q.images_for(spark, synth.T1)
