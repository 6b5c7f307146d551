import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reffy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Recycle the shared SparkSession every N test modules. One
# session-scoped session flaked at ~480 tests: after >1h the Python
# worker daemon died (BrokenPipeError, task-kill noise) and every later
# UDF test failed. Bounding a session's lifetime to N modules caps the
# worker-daemon/fd/memory accumulation while keeping the ~20s JVM spawn
# amortized across modules (the gateway JVM survives stop(), so a
# recycle costs ~2-5s, not a full JVM start).
_RECYCLE_EVERY = int(os.environ.get("SPARK_GRAFT_TEST_RECYCLE_MODULES", "6"))
_state = {"spark": None, "modules_served": 0}


def _fresh_spark():
    return get_spark("reffy_spark_tests", cores=4, shuffle_partitions=8)


@pytest.fixture(scope="module")
def spark():
    if (
        _state["spark"] is not None
        and _state["modules_served"] >= _RECYCLE_EVERY
    ):
        # drop cross-session driver-side state before stopping: these
        # cache globals hold DataFrames of the session being retired
        from reffy_spark.operators import corpus_quality as CQ
        from reffy_spark.operators import frontier as FR

        FR._prev_rank_cache = None
        CQ._prev_pack_cache = None
        try:
            _state["spark"].stop()
        except Exception:
            pass
        _state["spark"] = None
        _state["modules_served"] = 0
    if _state["spark"] is None:
        _state["spark"] = _fresh_spark()
    _state["modules_served"] += 1
    yield _state["spark"]


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
