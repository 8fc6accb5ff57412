"""Recrawl scheduling analytics: as-of robots joins, change-rate
estimation, and multi-level host rollups.

A production crawler does not fetch every URL every round — it estimates
each page's change rate from its capture history and schedules revisits
accordingly (Cho & Garcia-Molina, "Estimating Frequency of Change", ACM
TOIT 2003), and every fetch decision must consult the robots generation
that was IN FORCE at fetch time, not the latest one (the reference keeps
multi-generation robots rows and picks by timestamp — cc-warc-examples
has no temporal join, so this is a post-reference addition in the same
spirit as politeness.py's U12 generation pick).

Three operators, all single-shuffle and all DuckDB-oracle-backed:

* ``robots_asof`` — event-time AS-OF join: each fetch event is matched to
  the latest robots generation at-or-before its timestamp. Spark has no
  ASOF join operator; the scalable composition is union-and-running-last:
  tag both streams, union them, and take ``last(gen_id, ignorenulls)``
  over an event-time window per host. ONE shuffle on host, no join
  explosion, no per-fetch range probe — the plan a range join
  (``f.ts >= g.ts``) would turn into a broadcast-nested-loop. DuckDB twin
  uses its native ``ASOF LEFT JOIN``.
* ``recrawl_schedule`` — per-page change-rate estimate over the capture
  history (LAG over event time; a change = consecutive captures whose
  state differs), binned into recrawl tiers. All ratios are single IEEE
  divisions of integer-derived doubles, so the values are bit-equal to
  the SQL twin.
* ``host_rollup`` — crawl-stat rollup over (tld, host) via
  ``DataFrame.rollup`` + ``grouping()``: per-host, per-tld, and global
  totals in ONE pass / one shuffle (Spark expands grouping sets
  map-side) instead of three self-unioned aggregations.

Scale story (100 TB): the as-of union shuffles each stream once on the
equi-key (host) — robots generations are tiny next to fetches, so the
window's per-host sort is dominated by the fetch stream it would have to
sort for politeness anyway; skewed hosts can reuse the politeness
salting. Change-rate estimation is a LAG + groupBy on page_id (the
natural partition key of a capture index — cdx.py stores captures
SURT-sorted, so the history of one page is one contiguous range).
Rollup's grouping-set expansion is map-side; output cardinality is
|hosts| + |tlds| + 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analytics import t

N_HOSTS = 400  # synthetic host id space for the as-of fixture streams


# ---------------------------------------------------------------------------
# AS-OF join (event-time latest-at-or-before match)
# ---------------------------------------------------------------------------

def asof_join_latest(left: DataFrame, right: DataFrame, key: str,
                     left_ts: str, right_ts: str, value_col: str) -> DataFrame:
    """Generic AS-OF join: for each ``left`` row, the ``value_col`` of the
    ``right`` row with the greatest ``right_ts`` <= ``left_ts`` within the
    same ``key`` (NULL when none precedes it).

    Implementation: union both streams with a side tag, sort each key
    partition once by (ts, side) — right rows sort BEFORE left rows at
    equal ts, making the match inclusive — and carry the last non-null
    right value forward with an unbounded-preceding window. Equivalent to
    ``LEFT JOIN ... ON l.key = r.key AND r.ts <= l.ts`` + argmax(r.ts),
    but with one hash shuffle instead of a range join.

    ``right`` must be unique per (key, right_ts); pre-aggregate ties
    before calling (ambiguous ties have no defined as-of winner).
    """
    lcols = [c for c in left.columns if c != key]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols])
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_val"),
        *lcols)
    w = (Window.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = r.unionByName(l).withColumn(
        value_col, F.last("_val", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(key, *lcols, value_col)


def fetch_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic fetch-event stream: events projected onto a host space."""
    return t(spark, sf_dir, "events").select(
        (F.col("user_id") % N_HOSTS).alias("host"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("fetch_ms"),
        F.col("event_id").alias("fetch_id"))


def robots_generations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic robots-generation table: orders projected onto the same
    host space, one generation per (host, day) — max orderkey wins the
    tie so the as-of input is unique per (key, ts)."""
    o = t(spark, sf_dir, "orders")
    return (o.select(
        (F.col("o_custkey") % N_HOSTS).alias("host"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ts_ms"),
        F.col("o_orderkey").alias("gen_id"))
        .groupBy("host", "ts_ms").agg(F.max("gen_id").alias("gen_id")))


def q_robots_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each fetch event matched to the robots generation in force at its
    event time (latest gen_id at-or-before fetch_ms per host); fetches
    preceding every generation get the -1 sentinel (LEFT semantics kept
    null-free so the driver's value hash is dtype-stable)."""
    fetches = fetch_stream(spark, sf_dir)
    gens = robots_generations(spark, sf_dir)
    joined = asof_join_latest(fetches, gens, key="host",
                              left_ts="fetch_ms", right_ts="ts_ms",
                              value_col="gen_id")
    return joined.select(
        "fetch_id", "host", "fetch_ms",
        F.coalesce(F.col("gen_id"), F.lit(-1)).alias("gen_id"),
        F.coalesce((F.col("gen_id") % 30).cast("int"), F.lit(-1))
        .alias("crawl_delay_s"))


SQL_ROBOTS_ASOF = """
WITH gens AS (
  SELECT o_custkey % 400 AS host, epoch_ms(o_orderdate) AS ts_ms,
         MAX(o_orderkey) AS gen_id
  FROM orders GROUP BY 1, 2),
fetches AS (
  SELECT user_id % 400 AS host, epoch_ms(ts) AS fetch_ms,
         event_id AS fetch_id
  FROM events)
SELECT f.fetch_id, f.host, f.fetch_ms,
       COALESCE(g.gen_id, -1) AS gen_id,
       COALESCE(CAST(g.gen_id % 30 AS INT), -1) AS crawl_delay_s
FROM fetches f ASOF LEFT JOIN gens g
  ON f.host = g.host AND f.fetch_ms >= g.ts_ms
"""


# ---------------------------------------------------------------------------
# change-rate estimation → recrawl tiers
# ---------------------------------------------------------------------------

def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page change-rate estimate from the capture history: captures
    = events per user_id in event-time order; a CHANGE is a capture whose
    state (event_type, standing in for the content digest a CDX row
    carries) differs from the previous capture's. rate = changes per
    monitored day, binned into fetch tiers. Pages with one capture or a
    zero-length monitoring span have no estimate and are excluded (the
    scheduler keeps them on the default cadence)."""
    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("page_id"), "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        F.col("event_type").alias("state"))
    w = Window.partitionBy("page_id").orderBy("ms", "event_id")
    prev = F.lag("state").over(w)
    cap = ev.withColumn(
        "changed",
        (prev.isNotNull() & (prev != F.col("state"))).cast("long"))
    agg = cap.groupBy("page_id").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum("changed").alias("n_changes"),
        (F.max("ms") - F.min("ms")).alias("span_ms"))
    est = (agg.filter((F.col("n_captures") >= 2) & (F.col("span_ms") > 0))
           .withColumn("span_days", F.col("span_ms") / F.lit(86400000.0))
           .withColumn("change_rate",
                       F.col("n_changes").cast("double") / F.col("span_days")))
    tier = (F.when(F.col("change_rate") >= 4.0, "hourly")
            .when(F.col("change_rate") >= 1.0, "daily")
            .when(F.col("change_rate") >= 0.2, "weekly")
            .otherwise("monthly"))
    return est.select("page_id", "n_captures", "n_changes",
                      "span_days", "change_rate", tier.alias("tier"))


SQL_RECRAWL_SCHEDULE = """
WITH cap AS (
  SELECT user_id AS page_id, event_id, epoch_ms(ts) AS ms,
         event_type AS state,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id) AS prev
  FROM events),
agg AS (
  SELECT page_id,
         CAST(COUNT(*) AS BIGINT) AS n_captures,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> state
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         MAX(ms) - MIN(ms) AS span_ms
  FROM cap GROUP BY page_id),
est AS (
  SELECT page_id, n_captures, n_changes,
         span_ms / 86400000.0 AS span_days,
         CAST(n_changes AS DOUBLE) / (span_ms / 86400000.0) AS change_rate
  FROM agg WHERE n_captures >= 2 AND span_ms > 0)
SELECT page_id, n_captures, n_changes, span_days, change_rate,
       CASE WHEN change_rate >= 4.0 THEN 'hourly'
            WHEN change_rate >= 1.0 THEN 'daily'
            WHEN change_rate >= 0.2 THEN 'weekly'
            ELSE 'monthly' END AS tier
FROM est
"""


# ---------------------------------------------------------------------------
# multi-level host rollup
# ---------------------------------------------------------------------------

def q_host_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-stat rollup: (tld, host) → host rows, per-tld subtotals, and
    a grand total in ONE grouping-sets pass. lvl = number of rolled-up
    key columns (0 host row, 1 tld subtotal, 2 grand total); rolled-up
    keys print as '*'. Integer aggregates only, so the oracle match is
    exact by construction."""
    o = t(spark, sf_dir, "orders").select(
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net"),
                    F.lit("io"), F.lit("dev")),
            F.substring("o_orderpriority", 1, 1).cast("int")).alias("tld"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"))
        .alias("host"),
        "o_custkey", "o_orderkey")
    r = (o.rollup("tld", "host")
         .agg((F.grouping("tld") + F.grouping("host")).cast("int")
              .alias("lvl"),
              F.count(F.lit(1)).alias("pages"),
              F.sum("o_custkey").alias("custsum"),
              F.max("o_orderkey").alias("maxkey")))
    return r.select(
        F.coalesce("tld", F.lit("*")).alias("tld"),
        F.coalesce("host", F.lit("*")).alias("host"),
        "lvl", "pages", "custsum", "maxkey")


SQL_HOST_ROLLUP = """
WITH o AS (
  SELECT (['com','org','net','io','dev'])[CAST(substr(o_orderpriority, 1, 1)
         AS INT)] AS tld,
         concat('h', CAST(o_custkey % 50 AS VARCHAR)) AS host,
         o_custkey, o_orderkey
  FROM orders)
SELECT COALESCE(tld, '*') AS tld, COALESCE(host, '*') AS host,
       CAST(GROUPING(tld) + GROUPING(host) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS pages,
       CAST(SUM(o_custkey) AS BIGINT) AS custsum,
       CAST(MAX(o_orderkey) AS BIGINT) AS maxkey
FROM o GROUP BY ROLLUP (tld, host)
"""


# ---------------------------------------------------------------------------
# per-host fetch-latency quantiles (crawl health / adaptive-politeness
# observability)
# ---------------------------------------------------------------------------
# The adaptive-delay policy keys on the MEAN latency; operators watch the
# TAIL (a host whose p99 blows out while p50 holds is shedding — back off
# before the mean moves). EXACT linear-interpolation percentiles
# (Spark `percentile`, DuckDB `quantile_cont` — same (n−1)·p definition,
# bit-comparable on integer inputs after a 6-dp round), not the t-digest
# approximation: at 10^10 rows/day a deployment flips the same column
# list to `percentile_approx` — the aggregation shape (one map-side
# combinable exchange on host) is identical, which is why the exact form
# is the one worth pinning cross-engine. Latencies are the fetchsim md5
# band (% 500 + 10 ms) over synthesized order URLs — the same
# deterministic latency model the engine's adaptive politeness is
# oracle-tested against.


def q_fetch_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    url = F.concat(F.lit("http://h"), (F.col("o_orderkey") % 20).cast("string"),
                   F.lit(".example.com/order/"),
                   F.col("o_orderkey").cast("string"))
    lat = (F.conv(F.substring(F.md5(url), 1, 15), 16, 10).cast("long")
           % 500 + 10)
    d = o.select(F.concat(F.lit("h"), (F.col("o_orderkey") % 20)
                          .cast("string")).alias("host"),
                 lat.alias("lat"))
    return (d.groupBy("host")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
                 F.round(F.expr("percentile(lat, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(lat, 0.95)"), 6).alias("p95"),
                 F.round(F.expr("percentile(lat, 0.99)"), 6).alias("p99"),
                 F.max("lat").cast("bigint").alias("lat_max")))


SQL_FETCH_LATENCY_QUANTILES = (
    "WITH d AS (SELECT 'h' || CAST(o_orderkey % 20 AS VARCHAR) AS host,"
    "  ('0x' || substr(md5('http://h' || CAST(o_orderkey % 20 AS VARCHAR)"
    "   || '.example.com/order/' || CAST(o_orderkey AS VARCHAR)),"
    "   1, 15))::BIGINT % 500 + 10 AS lat"
    " FROM orders)"
    " SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,"
    "  round(quantile_cont(lat, 0.5), 6) AS p50,"
    "  round(quantile_cont(lat, 0.95), 6) AS p95,"
    "  round(quantile_cont(lat, 0.99), 6) AS p99,"
    "  CAST(max(lat) AS BIGINT) AS lat_max"
    " FROM d GROUP BY host")


REG: dict[str, tuple] = {
    "fetch_latency_quantiles": (q_fetch_latency_quantiles,
                                SQL_FETCH_LATENCY_QUANTILES),
    "robots_asof": (q_robots_asof, SQL_ROBOTS_ASOF),
    "recrawl_schedule": (q_recrawl_schedule, SQL_RECRAWL_SCHEDULE),
    "host_rollup": (q_host_rollup, SQL_HOST_ROLLUP),
}
