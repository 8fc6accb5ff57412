"""Fetcher-shard assignment — rendezvous (highest-random-weight) hashing
of crawl hosts onto a fetcher fleet.

A distributed crawler routes every URL of a host to ONE fetcher process
so per-host politeness is enforced by a single queue (Heritrix's
"assignment" / BUbiNG's agent mapping; the reference is single-process —
ProcessingService.java:57 serializes everything behind one 150 ms gate —
so at cluster scale this operator is what replaces that global lock).
Rendezvous hashing (Thaler & Ravishankar 1998) gives the two properties
the fleet needs, with no coordination state:

* **uniformity** — each host picks the shard maximizing
  H(host, shard), H = the first 15 hex digits of md5(host#shard) as a
  60-bit integer, so load spreads like independent uniform draws;
* **minimal movement** — growing the fleet K → K+1 moves a host only
  if the NEW shard wins its rendezvous, i.e. an expected 1/(K+1) of
  hosts move and every mover lands on the new shard; nothing shuffles
  between surviving shards (asserted row-level in
  tests/test_sharding.py).

Scale story (100 TB): the assignment is a pure map — K md5 evaluations
per DISTINCT host (hosts-sized input, whole-stage codegen, zero
shuffle beyond the host distinct both queries already need). The
frontier then routes by a broadcast-joinable hosts→shard table or by
recomputing the same expression inline at the router. md5 rather than
xxhash64 because the twin must be bit-reproducible in DuckDB (same
precedent as corpus_split's md5-mod split).

Reference anchor: cc-warc-examples has no multi-process fetcher; this
extends U8/U9 (SURVEY.md §2) to the multi-executor deployment the
north_rule targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import t

#: fleet size for the assignment query; the rebalance query grows to +1
N_SHARDS = 16

# ---------------------------------------------------------------------------
# hosts fixture: deterministic recipe over `orders` (same trick as
# url_hosts / crawl_trap_hosts — 160 distinct hosts, enough for the
# uniformity and movement distributions to be non-degenerate)
# ---------------------------------------------------------------------------


def _hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (t(spark, sf_dir, "orders")
            .select(F.concat(F.lit("h"),
                             (F.col("o_orderkey") % 160).cast("string"),
                             F.lit(".example.com")).alias("host"))
            .distinct())


_HOSTS_SQL = ("SELECT DISTINCT concat('h', CAST(o_orderkey % 160 AS VARCHAR),"
              " '.example.com') AS host FROM orders")


def _weight(host, shard):
    """60-bit rendezvous weight H(host, shard): first 15 md5 hex digits.

    15 hex digits < 2^60, so the BIGINT cast is exact in both engines."""
    return F.conv(F.substring(F.md5(F.concat(host, F.lit("#"),
                                             shard.cast("string"))),
                              1, 15), 16, 10).cast("long")


def assign_shards(hosts: DataFrame, n_shards: int,
                  out_col: str = "shard") -> DataFrame:
    """host → argmax_{s<n_shards} H(host, s). One explode over the
    (tiny, literal) shard range, one max_by per host — the explode never
    leaves the row's partition, so the whole op is map-side."""
    sh = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("_s")
    weighted = hosts.select("host", sh).withColumn(
        "_w", _weight(F.col("host"), F.col("_s")))
    # ties (a 60-bit md5 collision between two shards of one host) break
    # to the larger shard id — max over the (weight, shard) pair
    return (weighted.groupBy("host")
            .agg(F.max(F.struct("_w", "_s")).alias("_m"))
            .select("host", F.col("_m._s").cast("int").alias(out_col)))


def _assign_sql(n_shards: int, out_col: str) -> str:
    return (
        " SELECT host, CAST(s AS INT) AS " + out_col +
        " FROM (SELECT host, s,"
        "        ('0x' || substr(md5(concat(host, '#', CAST(s AS VARCHAR))),"
        "                        1, 15))::BIGINT AS w"
        "       FROM hosts, range(0, %d) AS u(s))"
        " QUALIFY row_number() OVER (PARTITION BY host"
        "                            ORDER BY w DESC, s DESC) = 1"
        % n_shards)


def q_fetch_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet assignment at K=N_SHARDS, with the per-shard host load —
    the routing table a frontier broadcast-joins (or inlines) to send
    each host's queue to exactly one fetcher."""
    a = assign_shards(_hosts(spark, sf_dir), N_SHARDS)
    return (a.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
                 F.min("host").alias("first_host"),
                 F.max("host").alias("last_host")))


SQL_FETCH_SHARD_ASSIGN = (
    "WITH hosts AS (" + _HOSTS_SQL + "), a AS (" +
    _assign_sql(N_SHARDS, "shard") + ")"
    " SELECT shard, CAST(count(*) AS BIGINT) AS n_hosts,"
    "  min(host) AS first_host, max(host) AS last_host"
    " FROM a GROUP BY shard")


def q_fetch_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet grows K → K+1: per-host old/new assignment plus the moved
    flag. Rendezvous guarantees every moved host lands on the NEW shard
    (id K) and survivors never reshuffle — the minimal-movement property
    a 1000-fetcher fleet resize depends on (expected moved fraction
    1/(K+1); asserted in tests/test_sharding.py)."""
    hosts = _hosts(spark, sf_dir)
    old = assign_shards(hosts, N_SHARDS, "shard_old")
    new = assign_shards(hosts, N_SHARDS + 1, "shard_new")
    return (old.join(new, "host")
            .select("host", "shard_old", "shard_new",
                    (F.col("shard_old") != F.col("shard_new"))
                    .alias("moved")))


SQL_FETCH_SHARD_REBALANCE = (
    "WITH hosts AS (" + _HOSTS_SQL + "),"
    " old AS (" + _assign_sql(N_SHARDS, "shard_old") + "),"
    " new AS (" + _assign_sql(N_SHARDS + 1, "shard_new") + ")"
    " SELECT old.host AS host, shard_old, shard_new,"
    "  shard_old <> shard_new AS moved"
    " FROM old JOIN new ON old.host = new.host")


REG: dict[str, tuple] = {
    "fetch_shard_assign": (q_fetch_shard_assign, SQL_FETCH_SHARD_ASSIGN),
    "fetch_shard_rebalance": (q_fetch_shard_rebalance,
                              SQL_FETCH_SHARD_REBALANCE),
}
