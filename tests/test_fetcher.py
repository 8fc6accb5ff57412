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


def test_fetch_delay_floor_under_lateness(spark):
    """A slow fetch pushes the partition behind schedule; the per-host
    floor must still keep same-host issue times >= the schedule's
    encoded gap (ADVICE: without it, lateness compresses the spacing
    below crawl_delay). Rows are also given out of order to exercise the
    sortWithinPartitions path."""
    import time as _t

    rows = [("http://a.com/3.jpg", "a.com", 200),
            ("http://a.com/1.jpg", "a.com", 0),
            ("http://a.com/2.jpg", "a.com", 100)]
    sched = spark.createDataFrame(
        rows, "url string, host_key string, fetch_offset_ms long")

    def slow_first(url, timeout_s):
        if url.endswith("1.jpg"):
            _t.sleep(0.3)   # 3x the 100 ms gap: schedule is now behind
        return 200, "x", int((_t.monotonic() % 1e6) * 1000)

    out = {r.url: r.content_length for r in
           fetch_http(sched.coalesce(1), transport=slow_first,
                      respect_offsets=True).collect()}
    # content_length records the transport's wall clock AFTER any fetch
    # sleep, so issue gap >= (stamp gap - fetch duration); fetches 2 and
    # 3 are instant, so their stamps are the issue times.
    assert out["http://a.com/2.jpg"] < out["http://a.com/3.jpg"]
    assert out["http://a.com/3.jpg"] - out["http://a.com/2.jpg"] >= 90


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
        assert parse_robots_txt(body, "ccspark") == (["/only-for-us/"], [], 0.5)
        assert parse_robots_txt(body, "otherbot") == (["/only-for-us/"], [], 0.5)
        assert parse_robots_txt(body, "unknown") == (["/private/"], [], 2.0)
        assert parse_robots_txt("", "x") == ([], [], None)

    def test_parse_robots_longest_prefix_agent_match(self):
        """RFC 9309 §2.2.1: the group whose agent token is the LONGEST
        prefix of our UA wins; '*' only when no named group matches."""
        from ccspark.fetcher import parse_robots_txt
        body = (
            "User-agent: *\n"
            "Disallow: /all/\n"
            "User-agent: cc\n"
            "Disallow: /cc/\n"
            "User-agent: ccspark\n"
            "Disallow: /ccspark/\n")
        # UA 'ccspark-media/0.1' prefix-matches both 'cc' and 'ccspark';
        # the longer token wins
        assert parse_robots_txt(body, "ccspark-media") == (["/ccspark/"], [], None)
        assert parse_robots_txt(body, "ccbot") == (["/cc/"], [], None)
        assert parse_robots_txt(body, "google") == (["/all/"], [], None)
        # prefix match is on the GROUP token, not the UA: a group longer
        # than the UA does not match
        assert parse_robots_txt(body, "c") == (["/all/"], [], None)

    def test_fetch_robots_https_first_http_fallback(self, spark):
        """https:// is authoritative when reachable (even 404); http://
        is tried only when https is unreachable (status 0)."""
        from ccspark.fetcher import fetch_robots

        hosts = spark.createDataFrame(
            [("tls.com",), ("legacy.com",), ("tls404.com",)],
            "host_key string")

        def transport(url, timeout_s):
            if url == "https://tls.com/robots.txt":
                return 200, "User-agent: *\nDisallow: /secure/\n"
            if url == "http://tls.com/robots.txt":
                return 200, "User-agent: *\nDisallow: /WRONG/\n"
            if url == "https://legacy.com/robots.txt":
                return 0, ""        # no TLS endpoint
            if url == "http://legacy.com/robots.txt":
                return 200, "User-agent: *\nDisallow: /old/\n"
            if url == "https://tls404.com/robots.txt":
                return 404, ""      # authoritative: no robots file
            return 200, "User-agent: *\nDisallow: /MUST-NOT-REACH/\n"

        rows = {r.host: r for r in
                fetch_robots(hosts, transport=transport,
                             fetched_at_ms=1767225600000).collect()}
        assert rows["tls.com"].disallow == ["/secure/"]
        assert rows["legacy.com"].disallow == ["/old/"]
        assert rows["tls404.com"].disallow == []   # permissive, no fallback

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
