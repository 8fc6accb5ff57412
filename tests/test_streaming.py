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
