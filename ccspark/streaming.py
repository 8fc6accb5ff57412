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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .scheduler import CANDIDATE_SCHEMA, CrawlEngine

#: deterministic in-batch admission order for the stateful limiter:
#: frontier total order when the stream is canonicalized, lineage order
#: for raw candidate streams
_ADMIT_ORDER = [("priority", False), ("depth", True), ("surt", True),
                ("url", True), ("url_raw", True), ("src_doc_id", True),
                ("offset", True)]


def candidate_stream(spark: SparkSession, landing_dir: str,
                     max_files_per_trigger: int = 10) -> DataFrame:
    """File-based candidate source; maxFilesPerTrigger is the streaming
    analog of the reference's ≤1000-pending backpressure bound (U9,
    ProcessingService.java:44-45)."""
    return (spark.readStream
            .schema(CANDIDATE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(landing_dir))


def process_batch(engine: CrawlEngine, batch_df: DataFrame,
                  batch_id: int) -> bool:
    """One streaming micro-batch = one scheduling round, crash-safe.

    foreachBatch gives at-least-once delivery: after a crash the same
    batch_id is replayed, and the snapshot store may hold orphan table
    versions from the failed attempt (e.g. a seen delta that committed
    before the crash — without rollback its URLs would be silently
    dup-dropped and never scheduled). Two steps make replay exactly-once:

    1. roll every table back to the last COMMITTED round (the same
       rollback the batch path's resume_round uses), which also restores
       the frontier-depth carry after an engine restart;
    2. if that committed round already carries this batch_id, the crash
       happened between commit_round and the streaming checkpoint — the
       work is complete, skip the replay instead of re-running it as a
       spurious new round.

    Returns True when a round ran, False on an idempotent skip."""
    last = engine.rollback_to_last_round()
    if last is not None and last.get("batch_id") == batch_id:
        return False
    next_round = 0 if last is None else last["round"] + 1
    engine.run_round(next_round, batch_df, batch_id=batch_id)
    return True


def run_streaming_rounds(engine: CrawlEngine, landing_dir: str,
                         checkpoint_dir: str,
                         available_now: bool = True):
    """Each micro-batch = one scheduling round via the batch engine —
    process_batch makes redelivery idempotent through the snapshot
    tables' round log (rollback of orphan versions + batch_id skip)."""
    stream = candidate_stream(engine.spark, landing_dir)

    def one_round(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(engine, batch_df, batch_id)

    writer = (stream.writeStream
              .foreachBatch(one_round)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_budget_stream(stream: DataFrame, max_per_host: int) -> DataFrame:
    """Custom stateful streaming operator: a CUMULATIVE per-host
    admission cap across micro-batches via applyInPandasWithState.

    The batch engine's politeness budget (U8) resets every round; a
    continuous deployment also wants a stream-lifetime bound per host —
    the streaming generalization of the reference's backpressure bound
    (U9, ProcessingService.java:44-45 MAX_NUM_PENDING_TASKS, which was
    likewise a cap on total admitted work, not a per-round one). Each
    host's group state carries one long (URLs admitted so far); a
    micro-batch admits rows in deterministic order until the remainder
    of the budget is spent, and later batches resume from the persisted
    count. State is O(#hosts) longs, checkpointed by Spark — at 1e8
    hosts ≈ 800 MB spread over the state-store partitions.

    `stream` must carry `host_key`; all columns pass through unchanged.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream.schema
    cols = set(stream.columns)
    by = [c for c, _ in _ADMIT_ORDER if c in cols]
    asc = [a for c, a in _ADMIT_ORDER if c in cols]

    def limiter(key, pdf_iter, state):
        admitted = state.get[0] if state.exists else 0
        remaining = max_per_host - admitted
        # Concatenate the group's Arrow chunks BEFORE sorting: a host
        # whose micro-batch spans several chunks must still be admitted
        # in ONE deterministic order, not per-chunk arrival order. The
        # group already fits the memory the sort needs; state stays O(1).
        chunks = [pdf for pdf in pdf_iter if len(pdf)]  # consume fully (contract)
        if chunks and remaining > 0:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            if by:
                pdf = pdf.sort_values(by, ascending=asc, kind="mergesort")
            take = pdf.iloc[:remaining]
            remaining -= len(take)
            yield take
        state.update((max_per_host - remaining,))

    return (stream.groupBy("host_key")
            .applyInPandasWithState(limiter, out_schema, "admitted long",
                                    "append", GroupStateTimeout.NoTimeout))


def run_host_budget_stream(spark: SparkSession, landing_dir: str,
                           checkpoint_dir: str, out_dir: str,
                           max_per_host: int,
                           max_files_per_trigger: int = 1):
    """Drive host_budget_stream over a candidate landing directory and
    sink admitted rows to parquet (append). One candidate file per
    trigger by default so per-batch state transitions are observable."""
    # host grouping: lowercase (HTTP://A.COM and http://a.com share one
    # budget) and route unparseable/schemeless urls to a PER-ROW fallback
    # key (the raw url) — pooling them under '' would give all of them
    # one shared budget
    host = F.lower(F.regexp_extract(
        "url_raw", r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:www\.)?([^/?#]*)", 1))
    stream = (candidate_stream(spark, landing_dir, max_files_per_trigger)
              .withColumn("host_key",
                          F.when(host == "", F.col("url_raw")).otherwise(host)))
    admitted = host_budget_stream(stream, max_per_host)
    return (admitted.writeStream
            .outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def discovery_rate(spark: SparkSession, landing_dir: str,
                   window: str = "10 minutes",
                   watermark: str = "30 minutes",
                   max_files_per_trigger: int = 10) -> DataFrame:
    """Windowed candidate-discovery rate with late-data handling: the
    streaming metrics twin of the round-loop's frontier-depth series.

    Event time is the candidate's `event_ms` (extract_links carries the
    source page's fetch time through the candidate schema); rows from
    pre-event-time producers (nulls) fall back to processing time so they
    are counted rather than dropped. The watermark bounds state: a window
    is finalized once the max observed event time passes its end by
    `watermark`, and later-than-that stragglers are discarded — the
    documented trade for bounded aggregation state on an unbounded crawl.
    """
    return (candidate_stream(spark, landing_dir, max_files_per_trigger)
            .withColumn("ts", F.coalesce(F.timestamp_millis("event_ms"),
                                         F.current_timestamp()))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("kind"))
            .agg(F.count(F.lit(1)).alias("candidates")))


def discovery_sessions(spark: SparkSession, landing_dir: str,
                       gap: str = "30 minutes",
                       watermark: str = "2 hours",
                       max_files_per_trigger: int = 10) -> DataFrame:
    """Streaming sessionization: per-source-host discovery sessions via
    `F.session_window` — the streaming twin of the batch
    analytics.q_events_sessionize (identical gap semantics; equivalence
    pinned in test_streaming). Where the batch operator sorts a static
    timeline and splits on lag > gap, the session window MERGES
    dynamically as events arrive in any order, and the watermark
    finalizes a session once event time passes its close by `watermark`
    — which is also what bounds state on an unbounded crawl: open
    sessions only, not history.

    Pre-event-time rows (null event_ms) are excluded: a session is an
    event-time construct, and the discovery_rate query already counts
    those rows on its processing-time fallback path.
    """
    host = F.lower(F.regexp_extract(
        "page_url", r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:www\.)?([^/?#]*)", 1))
    return (candidate_stream(spark, landing_dir, max_files_per_trigger)
            .withColumn("ts", F.timestamp_millis("event_ms"))
            .filter(F.col("ts").isNotNull())
            .withColumn("host", host)
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), F.col("host"))
            .agg(F.count(F.lit(1)).alias("n_candidates")))


FETCH_RESULT_SCHEMA = ("url string, status int, content_type string, "
                       "fetch_ms long")


def fetch_result_stream(spark: SparkSession, results_dir: str,
                        max_files_per_trigger: int = 10) -> DataFrame:
    """Landing-dir stream of fetch OUTCOMES (url, status, content_type,
    fetch_ms) — what a fetcher fleet drops as it drains the frontier
    export; the right side of the discovery→fetch interval join."""
    return (spark.readStream.schema(FETCH_RESULT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(results_dir))


def candidate_fetch_join(spark: SparkSession, landing_dir: str,
                         results_dir: str,
                         horizon: str = "1 hour",
                         watermark: str = "2 hours",
                         max_files_per_trigger: int = 10) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: each discovered
    candidate matched to its fetch outcome arriving within `horizon` of
    the discovery event — the streaming ledger of discovery→fetch
    latency that closes the loop between the frontier export and the
    fetcher fleet's result drops.

    Both sides carry watermarks AND the join predicate carries the
    event-time interval (fts ∈ [cts, cts + horizon]) — the two
    conditions Spark needs to EVICT join state: a candidate's row can
    be dropped once the result-side watermark passes cts + horizon, so
    state holds only the in-horizon window of an unbounded crawl, never
    its history. Without the interval bound this join would buffer
    every candidate forever (the documented stream-stream join trap).
    Inner join: unmatched candidates simply age out — the batch-side
    recrawl policy (CrawlParams.recrawl_after_rounds) is the authority
    for never-fetched URLs; this stream is the observability surface.
    Output adds latency_ms = fetch − discovery (≥ 0 by the interval)."""
    c = (candidate_stream(spark, landing_dir, max_files_per_trigger)
         .withColumn("cts", F.timestamp_millis("event_ms"))
         .filter(F.col("cts").isNotNull())
         .withWatermark("cts", watermark)
         .select("url_raw", "kind", "cts"))
    r = (fetch_result_stream(spark, results_dir, max_files_per_trigger)
         .withColumn("fts", F.timestamp_millis("fetch_ms"))
         .filter(F.col("fts").isNotNull())
         .withWatermark("fts", watermark))
    return (c.join(
                r,
                F.expr(f"url_raw = url AND fts >= cts"
                       f" AND fts <= cts + interval {horizon}"),
                "inner")
            .select("url_raw", "kind", "status", "content_type",
                    "cts", "fts",
                    (F.unix_millis("fts") - F.unix_millis("cts"))
                    .alias("latency_ms")))


def dedup_stream(spark: SparkSession, landing_dir: str,
                 watermark: str = "2 hours",
                 max_files_per_trigger: int = 10) -> DataFrame:
    """Streaming URL dedup: `dropDuplicatesWithinWatermark` on url_raw —
    the streaming twin of the batch first-wins dedup (A3) and the
    URL-seen admission probe (J1) for the IN-FLIGHT window.

    State holds one row per distinct url inside the watermark horizon —
    bounded on an unbounded crawl, unlike plain dropDuplicates whose
    state grows forever. The division of labor at scale: this stage
    absorbs the intra-window duplicate storm (a hot page's link
    re-discovered thousands of times within hours) BEFORE the rows reach
    the persistent URL-seen set (ccspark.seen), which remains the
    cross-round authority; a duplicate re-arriving after its state was
    evicted passes here and is caught there. Pre-event-time rows (null
    event_ms) are passed through undeduplicated rather than pinning the
    watermark."""
    withts = (candidate_stream(spark, landing_dir, max_files_per_trigger)
              .withColumn("ts", F.timestamp_millis("event_ms")))
    return (withts.filter(F.col("ts").isNotNull())
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["url_raw"])
            .unionByName(withts.filter(F.col("ts").isNull())))


def heavy_hitter_stream(words: DataFrame, m: int | None = None,
                        n_groups: int = 8) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter sketch — the continuous twin
    of analytics.q_heavy_hitters' pass 1, as a custom stateful operator
    (applyInPandasWithState).

    Words hash-route to one of `n_groups` sketch groups
    (grp = pmod(xxhash64(word), G)), so every word's entire stream
    lands in exactly ONE group's state; the group keeps an m-counter
    Misra-Gries summary plus its running word total n_g. Soundness is
    therefore STRONGER than the batch per-partition argument: a word
    with global count C > n/m has C_g = C > n/m ≥ n_g/m in its home
    group, so it survives that group's summary — no false negatives,
    ever (equivalence-tested against the batch operator). Each trigger
    the updated groups re-emit their full current summary tagged with
    n_g; n_g is monotone per group, so the consumer takes each group's
    max-n_g emission as the summary of record and exact-verifies the
    candidate union exactly like the batch pass 2.

    State is O(n_groups × m) counters — constant — checkpointed by
    Spark; at web scale n_groups rises with executor count and the
    per-trigger emission stays G·m tiny rows. `words` must carry a
    `word` column.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .analytics import HH_M
    m = m or HH_M

    routed = words.withColumn(
        "grp", F.pmod(F.xxhash64("word"), F.lit(n_groups)))

    def sketcher(key, pdf_iter, state):
        if state.exists:
            ws, cs, n_g = state.get
            counters = dict(zip(ws, cs))
        else:
            counters, n_g = {}, 0
        for pdf in pdf_iter:
            vc = pdf["word"].value_counts()
            n_g += int(vc.sum())
            for wrd, c in vc.items():
                counters[wrd] = counters.get(wrd, 0) + int(c)
            if len(counters) > m:
                cut = sorted(counters.values(), reverse=True)[m]
                counters = {k: v - cut
                            for k, v in counters.items() if v > cut}
        state.update((list(counters), [int(v) for v in counters.values()],
                      n_g))
        yield pd.DataFrame(
            {"grp": key[0], "word": list(counters),
             "est": [int(v) for v in counters.values()], "n_g": n_g})

    return (routed.groupBy("grp")
            .applyInPandasWithState(
                sketcher,
                "grp long, word string, est long, n_g long",
                "word array<string>, est array<long>, n long",
                "append", GroupStateTimeout.NoTimeout))
