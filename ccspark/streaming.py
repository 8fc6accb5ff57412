"""Structured Streaming shell over the crawl's batch core.

The reference is purely batch (SURVEY.md §2.8): its 'streaming' is an
in-process producer/consumer pump with backpressure
(CommonCrawlAnalyzer.java:96-139). The engine's equivalent stream shape
is candidate-link micro-batches: a file stream of candidate parquet
feeds the SAME canonicalize → dedup → seen-set round logic through
foreachBatch, so batch and streaming share one code path (and therefore
one oracle). Event-time watermarking handles late candidate batches in
the windowed discovery-rate aggregation.

At scale this is the continuous-crawl deployment mode: extractors append
candidate files to a landing directory (or Kafka topic — swap readStream
source), and each micro-batch is one scheduling round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .scheduler import CANDIDATE_SCHEMA, CrawlEngine


def candidate_stream(spark: SparkSession, landing_dir: str,
                     max_files_per_trigger: int = 10) -> DataFrame:
    """File-based candidate source; maxFilesPerTrigger is the streaming
    analog of the reference's ≤1000-pending backpressure bound (U9,
    ProcessingService.java:44-45)."""
    return (spark.readStream
            .schema(CANDIDATE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(landing_dir))


def run_streaming_rounds(engine: CrawlEngine, landing_dir: str,
                         checkpoint_dir: str,
                         available_now: bool = True):
    """Each micro-batch = one scheduling round via the batch engine —
    foreachBatch keeps exactly-once semantics through the snapshot
    tables' commit log (idempotent: a re-delivered batch re-commits the
    same round id)."""
    stream = candidate_stream(engine.spark, landing_dir)

    def one_round(batch_df: DataFrame, batch_id: int) -> None:
        last = engine.store.last_round()
        next_round = 0 if last is None else last["round"] + 1
        engine.run_round(next_round, batch_df)

    writer = (stream.writeStream
              .foreachBatch(one_round)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def discovery_rate(spark: SparkSession, landing_dir: str,
                   window: str = "10 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Windowed candidate-arrival rate with late-data handling: the
    streaming metrics twin of the round-loop's frontier-depth series.
    Candidates carry no event time in the batch schema, so arrival time
    (current processing time at ingest) stands in — swap for a real
    event-time column when the extractor provides one."""
    return (candidate_stream(spark, landing_dir)
            .withColumn("ts", F.current_timestamp())
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("kind"))
            .agg(F.count(F.lit(1)).alias("candidates")))
