"""Streaming shell: micro-batch rounds must land in the same snapshot
tables with the same semantics as the batch loop."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ccspark.params import CrawlParams
from ccspark.scheduler import CrawlEngine, seeds_to_candidates
from ccspark.streaming import discovery_rate, run_streaming_rounds


@pytest.fixture()
def landing(spark, fx_small, tmp_path):
    """Write the seed candidates as one landing file (round-0 input)."""
    d = tmp_path / "landing"
    seeds = spark.read.parquet(fx_small["seeds"])
    seeds_to_candidates(seeds).coalesce(1).write.parquet(str(d))
    return str(d)


def test_streaming_round_matches_batch_round(spark, fx_small, tmp_path, landing):
    batch = CrawlEngine(spark, str(tmp_path / "b"), fx_small["documents"],
                        fx_small["seeds"], fx_small["robots"],
                        params=CrawlParams(rounds=1))
    batch.run()

    stream_eng = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                             fx_small["seeds"], fx_small["robots"],
                             params=CrawlParams(rounds=1))
    q = run_streaming_rounds(stream_eng, landing, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    a = [(r.url, r.priority) for r in
         batch.scheduled_rounds().select("url", "priority").collect()]
    b = [(r.url, r.priority) for r in
         stream_eng.scheduled_rounds().select("url", "priority").collect()]
    assert a == b
    sa = {r.url for r in batch.seen.seen_df().collect()}
    sb = {r.url for r in stream_eng.seen.seen_df().collect()}
    assert sa == sb


def test_streaming_redelivery_is_idempotent(spark, fx_small, tmp_path, landing):
    """A batch replayed after a crash between commit_round and the
    streaming checkpoint must be recognized by batch_id and skipped."""
    from ccspark.streaming import process_batch

    eng = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                      fx_small["seeds"], fx_small["robots"],
                      params=CrawlParams(rounds=1))
    batch = seeds_to_candidates(spark.read.parquet(fx_small["seeds"]))
    assert process_batch(eng, batch, batch_id=7) is True
    before = [(r.url, r.fetch_round) for r in
              eng.scheduled_rounds().select("url", "fetch_round").collect()]
    # crash-between-commit-and-checkpoint: same batch_id arrives again
    assert process_batch(eng, batch, batch_id=7) is False
    after = [(r.url, r.fetch_round) for r in
             eng.scheduled_rounds().select("url", "fetch_round").collect()]
    assert before == after
    assert eng.store.last_round()["round"] == 0


def test_streaming_replay_rolls_back_orphan_versions(spark, fx_small, tmp_path,
                                                     landing):
    """Mid-round crash leaves orphan table versions (e.g. a committed
    seen delta with no round log). The replay must discard them — else
    the orphan's URLs would be dup-dropped and never scheduled."""
    from ccspark.streaming import process_batch

    eng = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                      fx_small["seeds"], fx_small["robots"],
                      params=CrawlParams(rounds=1))
    batch = seeds_to_candidates(spark.read.parquet(fx_small["seeds"]))
    # simulate the crashed first attempt: the seen delta committed, then
    # the round died before commit_round
    from ccspark.seen import with_bucket
    from ccspark.scheduler import batch_dedup, canonicalize
    orphan = with_bucket(batch_dedup(canonicalize(batch, 0)),
                         partitions=eng.params.seen_partitions)
    eng.seen.add(orphan, 0)
    assert eng.seen.seen_tbl.latest_version() is not None
    # replay of batch 0 (fresh engine, as after a driver restart)
    eng2 = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                       fx_small["seeds"], fx_small["robots"],
                       params=CrawlParams(rounds=1))
    assert process_batch(eng2, batch, batch_id=0) is True
    # the seeds were scheduled — NOT silently dup-dropped by the orphan
    clean = CrawlEngine(spark, str(tmp_path / "clean"), fx_small["documents"],
                        fx_small["seeds"], fx_small["robots"],
                        params=CrawlParams(rounds=1))
    clean.run()
    a = [(r.url, r.priority) for r in
         eng2.scheduled_rounds().select("url", "priority").collect()]
    b = [(r.url, r.priority) for r in
         clean.scheduled_rounds().select("url", "priority").collect()]
    assert a == b


def test_streaming_restart_restores_frontier_depth(spark, fx_small, tmp_path,
                                                   landing):
    """An engine restart between micro-batches must carry frontier_depth
    forward from the round log, not restart the metric at zero."""
    from ccspark.extract import extract_links
    from ccspark.streaming import process_batch

    params = CrawlParams(rounds=2)
    eng = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                      fx_small["seeds"], fx_small["robots"], params=params)
    batch0 = seeds_to_candidates(spark.read.parquet(fx_small["seeds"]))
    assert process_batch(eng, batch0, batch_id=0) is True
    batch1 = eng.candidates_tbl.read()
    # restart: fresh engine object (prev_depth would naively reset to 0)
    eng2 = CrawlEngine(spark, str(tmp_path / "s"), fx_small["documents"],
                       fx_small["seeds"], fx_small["robots"], params=params)
    assert process_batch(eng2, batch1, batch_id=1) is True

    ref = CrawlEngine(spark, str(tmp_path / "ref"), fx_small["documents"],
                      fx_small["seeds"], fx_small["robots"], params=params)
    ref.run()
    got = [m["frontier_depth"] for m in eng2.store.round_metrics()]
    want = [m["frontier_depth"] for m in ref.store.round_metrics()]
    assert got == want


def _candidate_file(path, events, mtime):
    """One landing parquet file of 'a'-kind candidates with the given
    (url, event_ms) pairs, mtime-stamped so FileStreamSource processes
    files in a deterministic order."""
    import pyarrow as pa

    n = len(events)
    t = pa.table({
        "url_raw": pa.array([u for u, _ in events], pa.string()),
        "page_url": pa.array(["http://s.example.com/"] * n, pa.string()),
        "kind": pa.array(["a"] * n, pa.string()),
        "alt": pa.array([""] * n, pa.string()),
        "parent_txt": pa.array([""] * n, pa.string()),
        "dom_depth": pa.array([0] * n, pa.int32()),
        "dom_sib": pa.array([0] * n, pa.int32()),
        "src_doc_id": pa.array(["d"] * n, pa.string()),
        "offset": pa.array([0] * n, pa.int32()),
        "event_ms": pa.array([e for _, e in events], pa.int64()),
    })
    pq.write_table(t, str(path))
    os.utime(str(path), (mtime, mtime))


def test_discovery_rate_event_time_late_data(spark, tmp_path):
    """Deterministic watermark semantics on the event_ms column: a
    straggler arriving AFTER its window's state was evicted is dropped —
    the window appends exactly once, with the on-time count only.
    (A late row for a still-live window may be aggregated; dropping is
    guaranteed only post-eviction — Spark's documented watermark
    contract, which is what bounds state on an unbounded crawl.)"""
    base = 1767261600000  # 2026-01-01T10:00:00Z
    mins = 60_000
    d = tmp_path / "landing2"
    d.mkdir()
    # file order = watermark evolution, one file per micro-batch:
    # f0 fills window w0=[10:00,10:10); f1 at 11:00 advances the
    # watermark to 10:30 (effective next batch); during f2's batch w0 is
    # finalized+evicted; f3's straggler at 10:05 then hits evicted state
    _candidate_file(d / "f0.parquet",
                    [("http://a.example.com/1", base + 0 * mins),
                     ("http://a.example.com/2", base + 4 * mins),
                     ("http://a.example.com/3", base + 9 * mins)], 1_000)
    _candidate_file(d / "f1.parquet",
                    [("http://a.example.com/4", base + 60 * mins)], 2_000)
    _candidate_file(d / "f2.parquet",
                    [("http://a.example.com/5", base + 65 * mins)], 3_000)
    _candidate_file(d / "f3.parquet",
                    [("http://a.example.com/late", base + 5 * mins)], 4_000)

    from ccspark.streaming import discovery_rate
    q = (discovery_rate(spark, str(d), window="10 minutes",
                        watermark="30 minutes", max_files_per_trigger=1)
         .writeStream.format("memory").queryName("disc_et")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "c3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # the straggler was counted as dropped-by-watermark in its batch
    dropped = sum(s.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress
                  for s in p.get("stateOperators", []))
    assert dropped == 1
    rows = spark.sql("select * from disc_et").collect()
    # w0 appended exactly once with the 3 on-time rows; the 11:00-11:10
    # window is still open (watermark 10:35 < 11:10) so nothing else
    assert len(rows) == 1
    r = rows[0]
    assert r.candidates == 3 and r.kind == "a"
    assert int(r.window.start.timestamp() * 1000) == base


def test_extract_links_carries_event_time(spark):
    """fetch_ms on documents (WARC-Date epoch ms from the ingest) rides
    through extract_links as the candidates' event_ms; docs without the
    column yield nulls."""
    from ccspark.extract import extract_links

    spans = [{"kind": "img", "text": "x", "media_ref":
              "http://m.example.com/a.jpg", "offset": 0}]
    with_ms = spark.createDataFrame(
        [("d1", "http://h.example.com/", spans, 1767261600123)],
        "doc_id string, page_url string, spans array<struct<kind:string,"
        "text:string,media_ref:string,offset:int>>, fetch_ms long")
    assert [r.event_ms for r in extract_links(with_ms).collect()] \
        == [1767261600123]
    without = with_ms.drop("fetch_ms")
    assert [r.event_ms for r in extract_links(without).collect()] == [None]


def test_warc_ingest_stamps_fetch_ms(spark, tmp_path):
    """warc_html_bodies converts WARC-Date to epoch ms, and the
    HTML→spans front door lands it on the documents table."""
    import gzip as _gz

    from ccspark.htmlspans import warc_to_documents
    from ccspark.warc import _record

    rec = _record("response", "http://h.example.com/p.html",
                  "application/http; msgtype=response",
                  b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                  b"<html><body><p>hi</p></body></html>",
                  date="2026-01-01T10:00:00Z")
    p = tmp_path / "one.warc.gz"
    p.write_bytes(_gz.compress(rec))
    docs = warc_to_documents(spark, str(p))
    row = docs.collect()[0]
    assert row.fetch_ms == 1767261600000
    assert row.doc_id == "http://h.example.com/p.html"


def test_discovery_rate_stream_runs(spark, landing, tmp_path):
    out = (discovery_rate(spark, landing)
           .writeStream.format("memory").queryName("disc")
           .outputMode("complete")
           .option("checkpointLocation", str(tmp_path / "c2"))
           .trigger(availableNow=True).start())
    out.awaitTermination(120)
    rows = spark.sql("select * from disc").collect()
    assert sum(r.candidates for r in rows) > 0
    assert all(r.window.start is not None for r in rows)


def _cand_rows(host, n, start=0):
    return [(f"http://{host}/p{i:03d}", f"http://{host}/", "a", "", "",
             1, 0, f"doc-{host}", i, None) for i in range(start, start + n)]


def _append_landing(spark, landing, rows):
    from ccspark.scheduler import CANDIDATE_SCHEMA
    (spark.createDataFrame(rows, CANDIDATE_SCHEMA)
     .coalesce(1).write.mode("append").parquet(landing))


def test_host_budget_stream_cumulative_cap(spark, tmp_path):
    """applyInPandasWithState limiter: per-host admissions accumulate
    ACROSS micro-batches (and across query restarts via the checkpointed
    state store), never exceeding the stream-lifetime cap."""
    from ccspark.streaming import run_host_budget_stream

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    _append_landing(spark, landing, _cand_rows("a.com", 3) + _cand_rows("b.com", 2))
    _append_landing(spark, landing, _cand_rows("a.com", 4, start=3)
                    + _cand_rows("b.com", 1, start=2))

    q = run_host_budget_stream(spark, landing, ckpt, out, max_per_host=5)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    by_host = {r.host_key: r.n for r in
               got.groupBy("host_key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_host == {"a.com": 5, "b.com": 3}   # min(cap, total) per host
    urls = [r.url_raw for r in got.collect()]
    assert len(urls) == len(set(urls))           # no duplicates across batches

    # restart with MORE data and the SAME checkpoint: the state store
    # remembers a.com is exhausted; only the new host is admitted
    _append_landing(spark, landing, _cand_rows("a.com", 3, start=7)
                    + _cand_rows("c.com", 2))
    q2 = run_host_budget_stream(spark, landing, ckpt, out, max_per_host=5)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    by_host2 = {r.host_key: r.n for r in
                got2.groupBy("host_key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_host2 == {"a.com": 5, "b.com": 3, "c.com": 2}


def test_host_budget_stream_admits_in_order(spark, tmp_path):
    """Within one micro-batch the limiter admits in the deterministic
    lineage order (url_raw, src_doc_id, offset) — not arrival order."""
    from ccspark.streaming import run_host_budget_stream

    landing = str(tmp_path / "landing")
    rows = list(reversed(_cand_rows("a.com", 6)))   # arrival order reversed
    _append_landing(spark, landing, rows)
    q = run_host_budget_stream(spark, landing, str(tmp_path / "ck"),
                               str(tmp_path / "out"), max_per_host=3)
    q.awaitTermination(120)
    got = sorted(r.url_raw for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == [f"http://a.com/p{i:03d}" for i in range(3)]


def test_host_budget_stream_multichunk_group_deterministic(spark, tmp_path):
    """A host group spanning several Arrow chunks must still admit in ONE
    deterministic order — the limiter concatenates the state iterator's
    chunks before sorting (per-chunk sorting would admit arrival order
    across chunk boundaries)."""
    from ccspark.streaming import run_host_budget_stream

    landing = str(tmp_path / "landing")
    rows = list(reversed(_cand_rows("a.com", 30)))   # arrival order reversed
    _append_landing(spark, landing, rows)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        q = run_host_budget_stream(spark, landing, str(tmp_path / "ck"),
                                   str(tmp_path / "out"), max_per_host=10)
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = sorted(r.url_raw for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == [f"http://a.com/p{i:03d}" for i in range(10)]


def test_host_budget_stream_host_key_normalization(spark, tmp_path):
    """Case-insensitive host budgets (HTTP://A.COM == http://a.com ==
    http://www.a.com) and per-row fallback keys for unparseable urls —
    schemeless rows must NOT pool under one shared '' budget."""
    from ccspark.streaming import run_host_budget_stream

    landing = str(tmp_path / "landing")
    mk = lambda u, i: (u, "http://s/", "a", "", "", 1, 0, "d", i, None)
    rows = [mk("HTTP://A.COM/x1", 0), mk("http://a.com/x2", 1),
            mk("http://www.A.com/x3", 2),
            mk("not-a-url-1", 3), mk("not-a-url-2", 4)]
    _append_landing(spark, landing, rows)
    q = run_host_budget_stream(spark, landing, str(tmp_path / "ck"),
                               str(tmp_path / "out"), max_per_host=2)
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    by_host = {r.host_key: r.n for r in
               got.groupBy("host_key").agg(F.count(F.lit(1)).alias("n")).collect()}
    # one shared budget for the a.com variants; one budget PER schemeless row
    assert by_host == {"a.com": 2, "not-a-url-1": 1, "not-a-url-2": 1}


def test_session_window_equals_batch_sessionizer(spark, sf_dir):
    """Cross-implementation equivalence: Spark's native F.session_window
    (the streaming sessionizer's core, run here in batch mode) must
    produce the same per-user session multiset {(n_events, duration_ms)}
    as analytics.q_events_sessionize's lag + running-sum construction —
    two independent implementations of the 30-minute-gap semantics."""
    from ccspark.analytics import q_events_sessionize, t as tbl

    batch = {(r.user_id, r.n_events, r.duration_ms)
             for r in q_events_sessionize(spark, sf_dir).collect()}

    ev = tbl(spark, sf_dir, "events").withColumn(
        "ts2", F.col("ts").cast("timestamp"))
    sw = (ev.groupBy("user_id", F.session_window("ts2", "30 minutes"))
          .agg(F.count(F.lit(1)).alias("n_events"),
               (F.unix_millis(F.max("ts2"))
                - F.unix_millis(F.min("ts2"))).alias("duration_ms")))
    native = {(r.user_id, r.n_events, r.duration_ms) for r in sw.collect()}
    assert native == batch


def test_discovery_sessions_stream_finalizes(spark, tmp_path):
    """Streaming sessionization end-to-end: a burst of discoveries within
    the gap forms ONE session; once the watermark passes its close the
    session is finalized and appended exactly once, with the merged
    count and the [first_event, last_event + gap) window."""
    from ccspark.streaming import discovery_sessions

    base = 1767261600000  # 2026-01-01T10:00:00Z
    mins = 60_000
    d = tmp_path / "landing_sess"
    d.mkdir()
    # f0: three events 10:00/10:10/10:25 → one merged session closing at
    # 10:55 (last + 30m gap). f1 at 12:30 advances the watermark to
    # 12:00 (effective next batch); f2's batch then evicts + emits the
    # finalized session.
    _candidate_file(d / "f0.parquet",
                    [("http://a.example.com/1", base + 0 * mins),
                     ("http://a.example.com/2", base + 10 * mins),
                     ("http://a.example.com/3", base + 25 * mins)], 1_000)
    _candidate_file(d / "f1.parquet",
                    [("http://a.example.com/4", base + 150 * mins)], 2_000)
    _candidate_file(d / "f2.parquet",
                    [("http://a.example.com/5", base + 180 * mins)], 3_000)

    q = (discovery_sessions(spark, str(d), gap="30 minutes",
                            watermark="30 minutes", max_files_per_trigger=1)
         .writeStream.format("memory").queryName("disc_sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_sess"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from disc_sess").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.host == "s.example.com" and r.n_candidates == 3
    assert int(r.session_window.start.timestamp() * 1000) == base
    assert int(r.session_window.end.timestamp() * 1000) \
        == base + 55 * mins


def test_dedup_stream_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract, pinned deterministically:
    a duplicate url arriving while the first copy's state is live is
    dropped; after the watermark evicts that state, the same url is
    admitted again (and would then be caught by the persistent URL-seen
    set — the documented division of labor)."""
    base = 1767261600000  # 2026-01-01T10:00:00Z
    mins = 60_000
    d = tmp_path / "landing_dd"
    d.mkdir()
    u = "http://dup.example.com/page"
    # f0: first copy (10:00) + another url; f1: duplicate at 10:05 —
    # state live → dropped; f2: event time jumps to 20:00, watermark
    # (2h) advances well past 10:00+2h → state evicted; f3: same url
    # later → admitted again.
    _candidate_file(d / "f0.parquet",
                    [(u, base + 0 * mins),
                     ("http://other.example.com/x", base + 1 * mins)], 1_000)
    _candidate_file(d / "f1.parquet", [(u, base + 5 * mins)], 2_000)
    _candidate_file(d / "f2.parquet",
                    [("http://far.example.com/y", base + 600 * mins)], 3_000)
    # eviction is lazy (end-of-batch): f3 is the intervening batch run
    # with the advanced watermark that physically clears u's state
    _candidate_file(d / "f3.parquet",
                    [("http://mid.example.com/z", base + 602 * mins)], 4_000)
    _candidate_file(d / "f4.parquet", [(u, base + 605 * mins)], 5_000)

    from ccspark.streaming import dedup_stream
    q = (dedup_stream(spark, str(d), watermark="2 hours",
                      max_files_per_trigger=1)
         .select("url_raw")
         .writeStream.format("memory").queryName("dd_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cdd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = [r.url_raw for r in spark.sql("select * from dd_stream").collect()]
    assert sorted(got) == sorted([
        u, "http://other.example.com/x", "http://far.example.com/y",
        "http://mid.example.com/z", u,
    ]), got


def _result_file(path, rows, mtime):
    """One fetch-results parquet file of (url, status, fetch_ms)."""
    import pyarrow as pa

    t = pa.table({
        "url": pa.array([u for u, _, _ in rows], pa.string()),
        "status": pa.array([s for _, s, _ in rows], pa.int32()),
        "content_type": pa.array(["text/html"] * len(rows), pa.string()),
        "fetch_ms": pa.array([m for _, _, m in rows], pa.int64()),
    })
    pq.write_table(t, str(path))
    os.utime(str(path), (mtime, mtime))


def test_candidate_fetch_interval_join(spark, tmp_path):
    """Stream-stream interval join semantics, deterministically: a
    result inside [cts, cts + horizon] matches with the right latency;
    a result PAST the horizon does not; a never-fetched candidate emits
    nothing (inner join)."""
    from ccspark.streaming import candidate_fetch_join

    base = 1767261600000  # 2026-01-01T10:00:00Z
    mins = 60_000
    cdir, rdir = tmp_path / "cand", tmp_path / "res"
    cdir.mkdir(); rdir.mkdir()
    _candidate_file(cdir / "f0.parquet",
                    [("http://a.example.com/1", base),
                     ("http://a.example.com/2", base + 5 * mins),
                     ("http://a.example.com/3", base)], 1_700_000_000)
    _result_file(rdir / "r0.parquet",
                 [("http://a.example.com/1", 200, base + 10 * mins),
                  # 90 min after discovery: OUTSIDE the 1h horizon
                  ("http://a.example.com/2", 200, base + 95 * mins)],
                 1_700_000_000)
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")
    (candidate_fetch_join(spark, str(cdir), str(rdir), horizon="1 hour")
     .writeStream.format("parquet").option("path", out)
     .option("checkpointLocation", ck)
     .trigger(availableNow=True).start().awaitTermination(120))
    got = {(r.url_raw, r.status, r.latency_ms)
           for r in spark.read.parquet(out).collect()}
    assert got == {("http://a.example.com/1", 200, 10 * mins)}


def test_heavy_hitter_stream_equals_batch(spark, tmp_path):
    """Streaming Misra-Gries (heavy_hitter_stream) ≡ batch heavy
    hitters: candidates from each group's final summary, exact-verified
    against the full corpus, must equal the exact over-threshold set —
    across multi-trigger arrival (one file per micro-batch)."""
    import collections

    import numpy as np
    from pyspark.sql import functions as F

    from ccspark.analytics import HH_M
    from ccspark.streaming import heavy_hitter_stream

    rng = np.random.default_rng(5)
    words = (["hot%d" % i for i in range(4) for _ in range(600 - 110 * i)]
             + ["t%d" % int(x) for x in rng.integers(0, 3000, 4000)])
    rng.shuffle(words)
    d = tmp_path / "hh_landing"
    d.mkdir()
    # three arrival files = three micro-batches
    third = len(words) // 3
    for i in range(3):
        chunk = words[i * third: (i + 1) * third if i < 2 else len(words)]
        spark.createDataFrame([(w,) for w in chunk], "word string") \
            .coalesce(1).write.parquet(str(d / f"f{i}.parquet"))

    stream = (spark.readStream.schema("word string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d) + "/*.parquet"))
    q = (heavy_hitter_stream(stream)
         .writeStream.format("memory").queryName("hh_stream")
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("select * from hh_stream").collect()
    # summary of record per group = its max-n_g (latest) emission
    last_ng = {}
    for r in rows:
        last_ng[r.grp] = max(last_ng.get(r.grp, 0), r.n_g)
    n_total = sum(last_ng.values())
    cands = {r.word for r in rows if r.n_g == last_ng[r.grp]}

    counts = collections.Counter(words)
    want = sorted((w, c) for w, c in counts.items()
                  if c * HH_M > len(words))
    assert want, "fixture must contain heavies"
    assert n_total == len(words)
    # no false negatives in the candidate union
    assert {w for w, _ in want} <= cands
    # exact verification pass reproduces the batch contract exactly
    got = sorted((w, c) for w, c in counts.items()
                 if w in cands and c * HH_M > len(words))
    assert got == want
