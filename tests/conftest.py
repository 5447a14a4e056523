import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def spark():
    from sen2rts_spark.session import get_spark
    s = get_spark("sen2rts-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
