"""Query registry — the driver-facing surface of the engine.

Merges every module's REG (name → (query_fn, oracle_sql | None)) and adds
the crawl-engine queries, which run on the deterministic interleaved-docs
fixture (fixtures.py) and therefore have no DuckDB twin — their exact
semantics are pinned by the pure-Python oracle tests instead
(tests/test_crawl_e2e.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from . import analytics, dedup, multimodal, similarity, textops
from .extract import extract_links, tag_like_counts
from .fixtures import fixture_for_sf
from .params import CrawlParams
from .scheduler import CrawlEngine

# ---------------------------------------------------------------------------
# crawl-engine queries (fixture-backed; rows-only driver check)
# ---------------------------------------------------------------------------

_CRAWL_PARAMS = CrawlParams(rounds=2)


def q_crawl_scheduled(spark, sf_dir):
    """Two full scheduling rounds on the sf-matched fixture; returns the
    scheduled rows in crawl total order (north_rule's core artifact)."""
    fx = fixture_for_sf(sf_dir)
    state = tempfile.mkdtemp(prefix="ccspark_state_")
    eng = CrawlEngine(spark, state, fx["documents"], fx["seeds"], fx["robots"],
                      params=_CRAWL_PARAMS)
    eng.run()
    return (eng.scheduled_rounds()
            .select("fetch_round", "url", "host_key", "depth", "surt",
                    F.round("priority", 6).alias("priority"),
                    "status", "content_type"))


def q_crawl_extract_links(spark, sf_dir):
    """X3 over the interleaved fixture: spans → candidate links."""
    fx = fixture_for_sf(sf_dir)
    docs = spark.read.parquet(fx["documents"])
    return extract_links(docs, follow_links=True)


def q_crawl_span_kinds(spark, sf_dir):
    """A1 over spans: kind frequencies (tag-counter shape on spans)."""
    fx = fixture_for_sf(sf_dir)
    return tag_like_counts(spark.read.parquet(fx["documents"]))


CRAWL_REG = {
    "crawl_scheduled_2rounds": (q_crawl_scheduled, None),
    "crawl_extract_links": (q_crawl_extract_links, None),
    "crawl_span_kinds": (q_crawl_span_kinds, None),
}

# ---------------------------------------------------------------------------
# merged registry
# ---------------------------------------------------------------------------

ALL: dict[str, tuple] = {}
for mod in (analytics, dedup, similarity, textops, multimodal):
    overlap = ALL.keys() & mod.REG.keys()
    assert not overlap, f"duplicate query names: {overlap}"
    ALL.update(mod.REG)
ALL.update(CRAWL_REG)


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
