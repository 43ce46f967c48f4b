import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from video_stream_processing_spark.session import get_spark

    # local[4], not the bench/driver local[32]: test data is tiny, so
    # more threads only pay scheduling overhead on every stage and every
    # streaming micro-batch's state-store commit — measured 593 s
    # (local[32]) -> 357 s (local[4]) for the identical suite. Scale
    # posture is pinned by plan-shape tests, not by thread count.
    spark = get_spark(
        "vsp-tests",
        master=os.environ.get("VSP_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
