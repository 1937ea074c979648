from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from hudi_and_delta_showcase_spark import get_spark

    # default 4 (r14): the suite's fixtures are KB-scale — at local[8]
    # every shuffle/state commit pays twice the task fixed cost for no
    # parallel gain (A/B on the iceberg+cdf modules: 96 s at 8 -> 73 s
    # at 4, same results). Override via SPARK_GRAFT_TEST_CPUS.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
