"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The implementations live in the ccspark package (see SURVEY.md §2 for the
operator inventory and ccspark.registry for the full list); queries
without an oracle entry are the crawl-engine runs whose exact semantics
are pinned by the pure-Python oracle in tests/test_crawl_e2e.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two crawl scheduling rounds on the sf0.001-scale fixture —
    seed list → canonicalize → dedup (bloom+exact) → politeness budget →
    fetch-sim → link discovery — returning the scheduled rows in crawl
    total order."""
    from ccspark.registry import q_crawl_scheduled
    return q_crawl_scheduled(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ccspark.registry import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from ccspark.registry import oracle_sql as _o
    return _o()
