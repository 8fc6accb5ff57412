from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccspark import get_spark  # noqa: E402
from ccspark.fixtures import make_crawl_fixture  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ccspark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_small(tmp_path_factory):
    """Small deterministic crawl fixture (120 docs) for e2e oracle tests."""
    out = tmp_path_factory.mktemp("fx") / "small"
    return make_crawl_fixture(str(out), n_docs=120, seed=42)


@pytest.fixture(scope="session")
def fx_medium(tmp_path_factory):
    out = tmp_path_factory.mktemp("fx") / "medium"
    return make_crawl_fixture(str(out), n_docs=400, seed=7)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
