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
