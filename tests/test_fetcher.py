"""Production HTTP fetcher: mock-transport unit tests (no network)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccspark.fetcher import fetch_http
from ccspark.fetchsim import with_fetch_sim


def _sched(spark):
    rows = [("http://a.com/x.jpg", "a.com", 0),
            ("http://a.com/y.jpg", "a.com", 150),
            ("http://b.com/z.html", "b.com", 0)]
    return spark.createDataFrame(
        rows, "url string, host_key string, fetch_offset_ms long")


def _mock_transport():
    # defined as a CLOSURE so cloudpickle ships it by value — a module-
    # level function would be pickled by reference and the Spark worker
    # cannot import the tests package
    def mock_transport(url: str, timeout_s: float):
        if url.endswith(".jpg"):
            return 200, "image/jpeg", 1234
        if "z" in url:
            return 404, "", 0
        return 200, "text/html", 10
    return mock_transport


def test_fetch_http_schema_matches_fetchsim(spark):
    """The production fetcher must be a drop-in for with_fetch_sim: same
    appended columns, same dtypes (the CrawlEngine swap contract)."""
    sched = _sched(spark)
    sim = with_fetch_sim(sched)
    real = fetch_http(sched, transport=_mock_transport(),
                      respect_offsets=False)
    assert dict(real.dtypes) == dict(sim.dtypes)


def test_fetch_http_outcomes_and_ids(spark):
    rows = {r.url: r for r in
            fetch_http(_sched(spark), transport=_mock_transport(),
                       respect_offsets=False).collect()}
    assert rows["http://a.com/x.jpg"].status == 200
    assert rows["http://a.com/x.jpg"].content_type == "image/jpeg"
    assert rows["http://a.com/x.jpg"].content_length == 1234
    assert rows["http://b.com/z.html"].status == 404
    # fetch_key/fetch_id use the SAME md5 construction as fetchsim —
    # identical values regardless of transport
    sim = {r.url: r for r in with_fetch_sim(_sched(spark)).collect()}
    for u in rows:
        assert rows[u].fetch_key == sim[u].fetch_key
        assert rows[u].fetch_id == sim[u].fetch_id


def test_fetch_http_failure_sentinel(spark):
    # the default urllib transport maps network failures to status 0
    # instead of raising — emulate that contract here
    def failing(url, timeout_s):
        return 0, "", 0
    out = fetch_http(_sched(spark), transport=failing,
                     respect_offsets=False).collect()
    assert all(r.status == 0 for r in out)


def test_fetch_offsets_respected(spark):
    """Offsets replay per-partition: the row stamped fetch_offset_ms=150
    must be fetched ≥~150 ms after the partition's first fetch. The
    transport records its own wall-clock into content_length (closures
    run in the worker process, so driver-side lists can't observe them)."""
    import time as _t

    def stamping(url, timeout_s):
        return 200, "x", int((_t.monotonic() % 1e6) * 1000)

    rows = {r.url: r.content_length for r in
            fetch_http(_sched(spark).coalesce(1), transport=stamping,
                       respect_offsets=True).collect()}
    delayed = rows["http://a.com/y.jpg"]
    first = min(rows["http://a.com/x.jpg"], rows["http://b.com/z.html"])
    assert delayed - first >= 140   # ms


class TestRobotsFetcher:
    def test_parse_robots_txt_groups(self):
        from ccspark.fetcher import parse_robots_txt
        body = (
            "# comment\n"
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Crawl-delay: 2\n"
            "\n"
            "User-agent: ccspark\n"
            "User-agent: otherbot\n"
            "Disallow: /only-for-us/\n"
            "Disallow:\n"           # empty = allow-all line, ignored
            "Crawl-delay: 0.5\n")
        assert parse_robots_txt(body, "ccspark") == (["/only-for-us/"], 0.5)
        assert parse_robots_txt(body, "otherbot") == (["/only-for-us/"], 0.5)
        assert parse_robots_txt(body, "unknown") == (["/private/"], 2.0)
        assert parse_robots_txt("", "x") == ([], None)

    def test_fetch_robots_builds_cache_schema(self, spark):
        """The produced cache must be directly consumable by the
        scheduler's U12 joins (same columns/types as the fixture cache),
        with permissive defaults for failed fetches."""
        from ccspark.fetcher import fetch_robots
        from ccspark.politeness import robots_admission_filter

        hosts = spark.createDataFrame(
            [("a.com",), ("b.com",), ("down.com",)], "host_key string")

        def transport(url, timeout_s):
            if "a.com" in url:
                return 200, "User-agent: *\nDisallow: /x/\nCrawl-delay: 3\n"
            if "b.com" in url:
                return 200, "User-agent: *\nDisallow:\n"
            return 0, ""

        cache = fetch_robots(hosts, transport=transport,
                             fetched_at_ms=1767225600000)
        rows = {r.host: r for r in cache.collect()}
        assert rows["a.com"].disallow == ["/x/"]
        assert rows["a.com"].crawl_delay == 3.0
        assert rows["b.com"].disallow == []
        assert rows["b.com"].crawl_delay == 0.15     # default
        assert rows["down.com"].disallow == []       # permissive on failure
        # plugs straight into the admission join
        cand = spark.createDataFrame(
            [("a.com", "http://a.com/x/p.jpg"),
             ("a.com", "http://a.com/ok.jpg")],
            "host_key string, url string")
        kept = robots_admission_filter(cand, cache).collect()
        assert [r.url for r in kept] == ["http://a.com/ok.jpg"]
