from __future__ import annotations

import os

import pytest

from fugu_spark.session import get_spark

# The suite shares ONE session JVM across ~50 modules, and most module
# fixtures cache() index frames they never unpersist. Bound the heap
# (the engine default 48g lets RSS balloon over a long suite — the JVM
# died ~25 min in on two full runs) and clear the block store between
# modules so storage memory stays flat. 12g turned out too tight:
# tests/test_serve.py alone OOMs the shared JVM at 12g (exact-count
# distributed comparisons), killing every later test with
# ConnectionRefused; 24g passes it standalone and keeps the suite cap
# half the engine default.
os.environ.setdefault("FUGU_SPARK_DRIVER_MEM", "24g")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fugu_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _clear_spark_cache_between_modules(request):
    yield
    # only touch an already-running session — never start one for a
    # module that didn't use Spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.catalog.clearCache()
        except Exception:
            pass
