"""Per-host politeness: robots gate + crawl-delay budgets + hot-host salting.

The reference's politeness is a single global 150 ms inter-fetch gate
(ProcessingService.java:57,235-240) — it serializes ALL hosts behind one
timestamp. The north_rule generalizes it per host:

    budget(host) = floor(round_seconds / crawl_delay(host))

robots.txt handling is absent in the reference (SURVEY.md U12); here it is
a cache table host → (crawl_delay, disallow[], fetched_at) joined into
admission (disallow) and scheduling (budget).

Skew: one hot host must not serialize a task. Scheduling is an exact
salted top-K-per-key: rows are pre-pruned inside (host, salt) windows —
any row in a host's true top-B is necessarily in the top-B of its salt
group — then the final per-host window ranks at most num_salts × B rows
per host instead of the host's full candidate mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .params import CrawlParams

#: frontier total order (U13) as Spark sort columns
def order_cols():
    return [F.col("priority").desc(), F.col("depth").asc(),
            F.col("surt").asc(), F.col("url").asc()]


def with_robots_blocked_flag(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Attach `_blocked`: URL path starts with a disallowed prefix for the
    host. Plain equi-join on host_key (Catalyst broadcasts a small robots
    table automatically; at 1e8-host scale it becomes a shuffle join on
    the same key the frontier is already partitioned by)."""
    rb = robots.select(F.col("host").alias("host_key"), "disallow")
    joined = candidates.join(rb, "host_key", "left")
    # path per kernels.split_url: after the authority, up to '?'/'#'.
    # (NOT F.parse_url — its java.net.URI backend throws on URLs the
    # reference's java.net.URL semantics accept.)
    path = F.regexp_extract(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    blocked = F.exists("disallow", lambda p: path.startswith(p))
    return (joined
            .withColumn("_blocked", F.coalesce(blocked, F.lit(False)))
            .drop("disallow"))


def robots_admission_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates blocked by robots (filter form of the flag above)."""
    return (with_robots_blocked_flag(candidates, robots)
            .filter(~F.col("_blocked")).drop("_blocked"))


def with_budget(df: DataFrame, robots: DataFrame, params: CrawlParams) -> DataFrame:
    """Attach the per-host budget column from the robots cache."""
    rb = robots.select(F.col("host").alias("host_key"),
                       F.col("crawl_delay").alias("_delay"))
    delay = F.coalesce(F.col("_delay"), F.lit(params.default_crawl_delay))
    return (df.join(rb, "host_key", "left")
            .withColumn("budget",
                        F.floor(F.lit(params.round_seconds) / delay).cast("int"))
            .drop("_delay"))


def schedule_frontier(frontier: DataFrame, robots: DataFrame,
                      params: CrawlParams) -> DataFrame:
    """Exact per-host top-budget selection under the total order, salted
    for hot hosts. Returns the scheduled rows (budget column dropped)."""
    fb = with_budget(frontier, robots, params)
    salt = F.pmod(F.xxhash64("url"), F.lit(params.num_salts)).cast("int")
    fb = fb.withColumn("salt", salt)
    w_salt = Window.partitionBy("host_key", "salt").orderBy(*order_cols())
    pruned = (fb.withColumn("_srn", F.row_number().over(w_salt))
              .filter(F.col("_srn") <= F.col("budget"))
              .drop("_srn", "salt"))
    w_host = Window.partitionBy("host_key").orderBy(*order_cols())
    sched = (pruned.withColumn("_rn", F.row_number().over(w_host))
             .filter(F.col("_rn") <= F.col("budget"))
             .drop("_rn", "budget"))
    if params.max_scheduled_per_round is not None:
        # U9 backpressure: global top-K in total order. TakeOrderedAndProject
        # keeps this a per-partition top-K + single merge, not a full sort.
        sched = (sched.orderBy(*order_cols())
                 .limit(params.max_scheduled_per_round))
    return sched


def with_fetch_offsets(sched: DataFrame, robots: DataFrame,
                       params: CrawlParams) -> DataFrame:
    """Assign each scheduled URL its in-round fetch start offset:
    rank-within-host × crawl_delay(host) — the explicit, per-host form of
    the reference's inter-fetch interval stamping
    (ProcessingService.java:235-240 lastDownLoadCall). Deterministic:
    rank follows the frontier total order."""
    rb = robots.select(F.col("host").alias("host_key"),
                       F.col("crawl_delay").alias("_delay"))
    delay = F.coalesce(F.col("_delay"), F.lit(params.default_crawl_delay))
    w = Window.partitionBy("host_key").orderBy(*order_cols())
    return (sched.join(rb, "host_key", "left")
            .withColumn("fetch_offset_ms",
                        ((F.row_number().over(w) - 1) * delay * 1000)
                        .cast("long"))
            .drop("_delay"))
