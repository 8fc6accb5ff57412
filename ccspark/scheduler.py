"""The crawl scheduler — round-based frontier loop (SURVEY.md §3.3).

Spark restatement of the reference's CommonCrawlAnalyzer pipeline
(CommonCrawlAnalyzer.java:96-139 + ProcessingService.java:176-252) and of
its 500-file chunked sequential-job loop (AWSMediaExtractor.java:71-84),
with one scheduling round =

    candidates → canonicalize (Arrow UDFs) → robots admission →
    first-wins dedup (batch window + bloom/exact seen anti-join) →
    priority total order → per-host politeness budget (salted top-K) →
    fetch-sim → discovery join → extract next candidates →
    snapshot commits (seen Δ, bloom, frontier, scheduled, candidates)
    + per-round metrics (frontier-depth, dedup-rate — north_rule)

Every round is resumable: the round log records the table versions a
completed round produced; resume rolls tables back to the last complete
round and continues. Crawl ordering and the URL-seen set match
ccspark.oracle exactly (tested per-round, rows AND order).
"""

from __future__ import annotations

from pyspark.sql import (DataFrame, Observation, SparkSession, Window,
                         functions as F, types as T)

from .extract import extract_links
from .fetchsim import discovered_docs, with_fetch_sim
from .params import CrawlParams
from .politeness import (order_cols, robots_admission_filter,
                         group_delays, schedule_frontier,
                         with_fetch_offsets)
from .seen import SeenSet, with_bucket
from .tables import SnapshotStore
from .udfs import (canon_udf, dual_big_udf, host_udf, normalize_udf,
                   priority_udf, surt_udf)

CANDIDATE_SCHEMA = T.StructType([
    T.StructField("url_raw", T.StringType()),
    T.StructField("page_url", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("alt", T.StringType()),
    T.StructField("parent_txt", T.StringType()),
    T.StructField("dom_depth", T.IntegerType()),
    T.StructField("dom_sib", T.IntegerType()),
    T.StructField("src_doc_id", T.StringType()),
    T.StructField("offset", T.IntegerType()),
    # event time (epoch ms) of the discovery — fetch time of the source
    # page; null for seeds / pre-event-time candidate files. Used only by
    # the streaming watermark path (streaming.discovery_rate).
    T.StructField("event_ms", T.LongType()),
])

FRONTIER_COLS = ["url", "url_hash", "bucket", "host", "host_key", "surt",
                 "priority", "depth", "kind", "alt", "parent_txt",
                 "dom_depth", "dom_sib", "src_doc_id", "offset"]


def span_serial_expr():
    """The document's interleaved span sequence serialized in offset
    order as 'offset:kind:body' lines (body = text, or media_ref for
    media spans) — the canonical fetched representation. Shared by the
    WARC payload (export_warc) and the content-digest dedup
    (params.content_dedup); the pure-Python twin is
    oracle._span_serial — byte-for-byte identical by construction."""
    return F.array_join(
        F.transform(
            F.array_sort(F.expr(
                "transform(spans, s -> struct("
                " s.offset AS offset, s.kind AS kind,"
                " coalesce(nullif(s.text, ''), s.media_ref) AS body))")),
            lambda s: F.concat_ws(":", s["offset"], s["kind"], s["body"])),
        "\n")


def _observed_count(obs: Observation, fallback: DataFrame) -> int:
    """obs.get['n'] with a count() fallback: an optimizer that proves a
    branch empty may eliminate the CollectMetrics node entirely (the AQE
    rule is excluded in get_spark, but sessions built elsewhere — e.g.
    the driver harness — may keep it)."""
    try:
        return obs.get["n"]
    except Exception:
        return fallback.count()


def seeds_to_candidates(seeds: DataFrame) -> DataFrame:
    """Seed list → round-0 candidates (S4; MultithreadedAnalyzer.java:185-202)."""
    return seeds.select(
        F.col("url").alias("url_raw"),
        F.lit("").alias("page_url"),
        F.lit("seed").alias("kind"),
        F.lit("").alias("alt"),
        F.lit("").alias("parent_txt"),
        F.lit(0).alias("dom_depth"),
        F.lit(0).alias("dom_sib"),
        F.lit("seed").alias("src_doc_id"),
        F.lit(0).alias("offset"),
        F.lit(None).cast("long").alias("event_ms"),
    )


def canonicalize(candidates: DataFrame, round_no: int,
                 fused: bool = False) -> DataFrame:
    """U1-U4 + U11: normalize (drop malformed), host, host_key, surt,
    priority, depth. Everything non-UDF is JVM.

    Two physically different but result-identical UDF layouts (A/B'd in
    BENCH.md):
    - chained (default): four pandas UDF stages; Spark pipelines them, so
      per task up to four Python workers overlap — fastest when cores are
      not fully subscribed by task slots (local mode, spare cores).
    - fused: one struct-returning Arrow kernel = one JVM↔Python exchange
      per batch — fewer sockets/workers, the right shape when executors
      are exactly sized (dense clusters) or socket syscalls are expensive.
    """
    if fused:
        out = (candidates
               .withColumn("_c", canon_udf(
                   "url_raw", "page_url", "kind", "alt", "parent_txt",
                   "dom_depth", "dom_sib"))
               .select("*", "_c.url", "_c.host", "_c.surt", "_c.priority")
               .drop("_c")
               .filter(F.col("url").isNotNull())
               .filter(F.col("host").isNotNull() & (F.col("host") != "")))
    else:
        out = (candidates
               .withColumn("url", normalize_udf("url_raw", "page_url"))
               .filter(F.col("url").isNotNull())
               .withColumn("host", host_udf("url"))
               .filter(F.col("host").isNotNull() & (F.col("host") != ""))
               .withColumn("surt", surt_udf("url"))
               .withColumn("priority", priority_udf(
                   "url", "page_url", "kind", "alt", "parent_txt",
                   "dom_depth", "dom_sib")))
    return (out
            # case-sensitive www-strip (ProcessingService.java:403-405), then
            # lowercase for robots/politeness grouping
            .withColumn("host_key",
                        F.lower(F.regexp_replace("host", r"^www\.", "")))
            .withColumn("depth", F.lit(round_no)))


def batch_dedup(candidates: DataFrame) -> DataFrame:
    """First-wins dedup inside one round's batch (A3, MediaReduce.java:12-19
    made deterministic): winner = best by total order, then lineage
    (src_doc_id, offset)."""
    w = Window.partitionBy("url").orderBy(
        *order_cols(), F.col("src_doc_id").asc(), F.col("offset").asc())
    return (candidates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


class CrawlEngine:
    def __init__(self, spark: SparkSession, state_dir: str, documents_path: str,
                 seeds_path: str, robots_path: str,
                 params: CrawlParams = CrawlParams(), use_bloom: bool = True,
                 bits_per_bucket: int = 1 << 20,
                 filter_kind: str | None = None, cuckoo_buckets: int = 1 << 14,
                 sitemaps_path: str | None = None):
        """filter_kind selects the URL-seen accelerator per the
        north_rule's 'bloom/cuckoo': None → 'bloom' when use_bloom (the
        default), or 'cuckoo' for the deletable-filter backend (recrawl
        via SeenSet.remove)."""
        self.spark = spark
        self.params = params
        self.documents_path = documents_path
        self.store = SnapshotStore(spark, state_dir)
        self.seen = SeenSet(self.store, partitions=params.seen_partitions,
                            use_bloom=use_bloom, bits_per_bucket=bits_per_bucket,
                            filter_kind=filter_kind, cuckoo_buckets=cuckoo_buckets)
        # a prior run may have evolved the layout (rebucket): the
        # persisted spec of record overrides the constructor default.
        # UNCONDITIONAL — a store whose layout already evolved must be
        # probed under the evolved modulus even if the rebucket knob is
        # off in this run's params (restore_spec is a no-op on stores
        # that never stamped spec metrics). rollback_to_last_round
        # re-derives it again after discarding orphan snapshots.
        self.seen.restore_spec()
        self.frontier_tbl = self.store.table("frontier")
        self.scheduled_tbl = self.store.table("scheduled")
        self.candidates_tbl = self.store.table("candidates")
        # U6 domain-seen set (Statistics.java:54-60): first-seen hosts,
        # same delta-chain mechanism as the URL-seen table
        self.domains_tbl = self.store.table("domains")
        # crawl-trap host set (params.trap_ratio_pm): first-trapped hosts,
        # same delta-chain mechanism; empty/absent when the guard is off
        self.traps_tbl = self.store.table("traps")
        # content-digest seen table (params.content_dedup): digests of
        # every page whose links were extracted, delta-committed per
        # round — the content-seen sibling of the URL-seen set
        self.digests_tbl = self.store.table("digests")
        self.seeds_path = seeds_path
        self.sitemaps_path = sitemaps_path
        robots = spark.read.parquet(robots_path)
        if (params.robots_max_age_ms is not None
                and params.crawl_as_of_ms is not None):
            # U12 staleness: stale cache rows behave as absent (unknown
            # host → no disallow, default crawl delay)
            cutoff = params.crawl_as_of_ms - params.robots_max_age_ms
            # fetched_at arrives as TIMESTAMP_NTZ; session TZ is UTC so the
            # NTZ→TZ cast is identity and unix_millis is the stored epoch
            robots = robots.filter(
                F.unix_millis(F.col("fetched_at").cast("timestamp"))
                >= F.lit(cutoff))
        # A refreshed cache can hold several generations per host; the
        # politeness joins assume ONE row per host (fan-out would inflate
        # n_canon/robots_blocked and duplicate candidates until dedup).
        # Keep the freshest generation, ties broken by content — an
        # explicitly order-independent rule (snapshot tables have no row
        # order); run_oracle applies the identical pick.
        payload = [c for c in robots.columns if c != "host"]
        pick_fields = [F.unix_millis(F.col("fetched_at").cast("timestamp")),
                       F.col("crawl_delay"), F.col("disallow")]
        if "allow" in robots.columns:
            pick_fields.append(F.col("allow"))
        pick = F.struct(*pick_fields)
        robots = (robots.groupBy("host")
                  .agg(F.max_by(F.struct(*payload), pick).alias("_r"))
                  .select("host", "_r.*"))
        self.robots = robots
        self.docs = spark.read.parquet(documents_path)
        self._prev_depth = 0  # frontier depth after the last completed round
        # running seen-set cardinality (driver scalar, rides each
        # round's already-observed counts — the rebucket trigger reads
        # THIS instead of a standalone O(total) count() job). None =
        # pre-existing store whose logs predate the metric: resolved
        # once lazily, then maintained.
        self._seen_total: int | None = (
            None if self.seen.seen_tbl.exists() else 0)

    # -- resumability --------------------------------------------------------

    def rollback_to_last_round(self) -> dict | None:
        """Roll every table back to the versions of the last COMPLETE
        round (or to empty), discarding orphan snapshots from a crashed
        attempt, and restore the frontier-depth carry. Returns the last
        round's log entry (None when no round has committed). Shared by
        batch resume and streaming-batch redelivery."""
        last = self.store.last_round()
        tables = [("seen", self.seen.seen_tbl),
                  (self.seen.filter_name, self.seen.filter_tbl),
                  ("frontier", self.frontier_tbl),
                  ("scheduled", self.scheduled_tbl),
                  ("candidates", self.candidates_tbl),
                  ("domains", self.domains_tbl),
                  ("traps", self.traps_tbl),
                  ("digests", self.digests_tbl)]
        if last is None:
            for _, t in tables:
                t.rollback_to(0)
            self._prev_depth = 0
            self._seen_total = 0
            # spec adopted in __init__ may have come from a now-deleted
            # orphan snapshot (e.g. a crash between rebucket's commits
            # and its round-log re-commit) — re-derive from what's left
            self.seen.rederive_spec()
            return None
        for name, tbl in tables:
            v = last["tables"].get(name)
            if v is not None:
                tbl.rollback_to(v)
        self._prev_depth = last["metrics"]["frontier_depth"]
        # logs that predate the seen_total metric leave None → one lazy
        # resolve in the next round, then the running scalar takes over
        self._seen_total = last["metrics"].get("seen_total")
        self.seen.rederive_spec()
        return last

    def resume_round(self) -> tuple[int, DataFrame | None]:
        """(next_round, its candidates). Rolls back any table versions newer
        than the last complete round (crash between commits)."""
        last = self.rollback_to_last_round()
        if last is None:
            return 0, None
        nxt = last["round"] + 1
        cand = self.candidates_tbl.read(last["tables"]["candidates"])
        return nxt, cand

    # -- one round -----------------------------------------------------------

    def run_round(self, r: int, candidates: DataFrame,
                  batch_id: int | None = None) -> DataFrame:
        import time as _time
        t0 = _time.perf_counter()
        p = self.params
        m: dict = {"round": r}

        # recrawl policy: re-admit failed fetches from k rounds ago by
        # DELETING them from the seen set (tombstone delta; cuckoo slot
        # clear) and re-injecting them as candidates — they re-enter the
        # normal canonicalize → robots → dedup → seen → schedule pipeline
        # with zero special-casing downstream. Oracle mirror in
        # ccspark.oracle (exact per-round parity tested).
        stale = None
        if (p.recrawl_after_rounds is not None
                and r >= p.recrawl_after_rounds
                and self.scheduled_tbl.exists()):
            obs_rc = Observation()
            stale = (self.scheduled_tbl.read_chain()
                     # 304 Not Modified is a SUCCESS (revisit policy) —
                     # never failure-recrawled
                     .filter((F.col("fetch_round")
                              == r - p.recrawl_after_rounds)
                             & ~F.col("status").isin(200, 304))
                     .observe(obs_rc, F.count(F.lit(1)).alias("n"))
                     .cache())
            self.seen.remove(stale.select("url"), r)
            m["recrawled"] = _observed_count(obs_rc, stale)
            stale_cand = stale.select(
                F.col("url").alias("url_raw"), F.lit("").alias("page_url"),
                "kind", "alt", "parent_txt", "dom_depth", "dom_sib",
                "src_doc_id", "offset",
                F.lit(None).cast("long").alias("event_ms"),
                # max-hops lineage carried verbatim: a re-fetch is the
                # same URL at the same link distance
                *(["hop"] if p.max_hops is not None else []))
            candidates = stale_cand.unionByName(
                candidates.select(*stale_cand.columns))

        # revisit policy (freshness maintenance): successful fetches from
        # k rounds ago leave the seen set and re-enter as candidates
        # marked src_doc_id='revisit' — fetchsim answers 200 (changed,
        # re-extract) or 304 Not Modified (skip extraction) on the second
        # md5 band. Same tombstone-delta + normal-pipeline shape as
        # recrawl; oracle mirror in ccspark.oracle (exact parity tested).
        fresh = None
        if (p.revisit_after_rounds is not None
                and r >= p.revisit_after_rounds
                and self.scheduled_tbl.exists()):
            obs_rv = Observation()
            fresh = (self.scheduled_tbl.read_chain()
                     .filter((F.col("fetch_round")
                              == r - p.revisit_after_rounds)
                             & F.col("status").isin(200, 304))
                     .observe(obs_rv, F.count(F.lit(1)).alias("n"))
                     .cache())
            self.seen.remove(fresh.select("url"), r)
            m["revisited"] = _observed_count(obs_rv, fresh)
            fresh_cand = fresh.select(
                F.col("url").alias("url_raw"), F.lit("").alias("page_url"),
                "kind", "alt", "parent_txt", "dom_depth", "dom_sib",
                # priority inputs carried verbatim (ordering stays
                # lineage-stable); src_doc_id is ONLY the batch-dedup
                # tie-break and the fetchsim revisit marker
                F.lit("revisit").alias("src_doc_id"),
                F.lit(0).alias("offset"),
                F.lit(None).cast("long").alias("event_ms"),
                *(["hop"] if p.max_hops is not None else []))
            candidates = fresh_cand.unionByName(
                candidates.select(*fresh_cand.columns))

        # max-hops frontier control (Heritrix max-hops): default missing
        # hop lineage to 0 (seed round, external candidate files), then
        # drop candidates beyond the limit BEFORE admission. The dropped
        # count rides the same job as every other admission metric.
        obs_hx = None
        cand_pre = None
        if p.max_hops is not None:
            if "hop" not in candidates.columns:
                candidates = candidates.withColumn(
                    "hop", F.lit(0).cast("int"))
            obs_hx = Observation()
            cand_pre = candidates
            candidates = (candidates
                          .observe(obs_hx, F.coalesce(
                              F.sum((F.col("hop") > p.max_hops)
                                    .cast("long")), F.lit(0)).alias("n"))
                          .filter(F.col("hop") <= p.max_hops))

        # EVERY admission metric rides the seen-delta commit's action as
        # an Observation — per-round job count is the driver-side cost
        # that dominates the loop (each job pays fixed scheduler+worker
        # overhead), so the round runs NO standalone metric jobs at all:
        # candidates_in / n_canon / n_admitted / new_seen all materialize
        # during the one job that also computes the UDF canonicalization
        # exactly once (no cache needed — nothing downstream re-reads the
        # pre-dedup lineage).
        obs_in = Observation()
        obs_canon = Observation()
        obs_adm = Observation()
        candidates = candidates.observe(obs_in, F.count(F.lit(1)).alias("n"))
        canon = canonicalize(candidates, r)
        if p.pagerank_prior_weight is not None:
            # OPIC-style host-centrality boost on this batch's link graph
            # (webgraph.apply_pagerank_prior; oracle mirror in
            # ccspark.oracle — exact ordering parity tested). The batch
            # feeds both the rank build and the boost join: cache once.
            from .webgraph import apply_pagerank_prior
            canon = apply_pagerank_prior(canon.cache(),
                                         p.pagerank_prior_weight)
        canon = canon.observe(obs_canon, F.count(F.lit(1)).alias("n"))
        admitted = (robots_admission_filter(canon, self.robots)
                    .observe(obs_adm, F.count(F.lit(1)).alias("n")))
        pre_trap = admitted

        # crawl-trap guard (optional, params.trap_ratio_pm): per-host
        # URL-template collapse on THIS round's admitted batch — template
        # = query stripped, digit runs → 'N'. Hosts whose distinct-URL /
        # distinct-template ratio crosses the explosion threshold join a
        # persistent trap table (delta commit, same mechanism as domains)
        # and their candidates are dropped at admission from this round
        # on. Detection is a hosts-sized aggregate (two count_distinct
        # with map-side partial distinct) and the drop is a broadcast
        # anti-join — the robots disallow-list shape. Oracle mirror in
        # ccspark.oracle (exact per-round parity tested).
        trap_version = None
        cached_adm = None
        obs_kept = None
        if p.trap_ratio_pm is not None:
            cached_adm = admitted.cache()
            tmpl = F.regexp_replace(
                F.regexp_replace("url", r"\?.*$", ""), "[0-9]+", "N")
            stats = (cached_adm.select("host_key", "url", tmpl.alias("tmpl"))
                     .groupBy("host_key")
                     .agg(F.countDistinct("url").alias("n_urls"),
                          F.countDistinct("tmpl").alias("n_templates")))
            round_traps = (stats.filter(
                (F.col("n_urls") >= p.trap_min_urls)
                & (F.expr("(1000 * n_urls) div n_templates")
                   >= p.trap_ratio_pm)).select("host_key"))
            if self.traps_tbl.exists():
                round_traps = round_traps.join(
                    self.traps_tbl.read_chain(), "host_key", "left_anti")
            obs_tr = Observation()
            new_traps = (round_traps.withColumn("first_round", F.lit(r))
                         .observe(obs_tr, F.count(F.lit(1)).alias("n")))
            trap_version = self.traps_tbl.commit(new_traps, r)
            m["trap_hosts_new"] = _observed_count(obs_tr, new_traps)
            obs_kept = Observation()
            admitted = (cached_adm.join(
                F.broadcast(self.traps_tbl.read_chain()
                            .select("host_key")),
                "host_key", "left_anti")
                .observe(obs_kept, F.count(F.lit(1)).alias("n")))

        # new-seen count observed on the seen-delta commit's action
        obs_new = Observation()
        # bucket under the LIVE spec (self.seen.partitions, not
        # p.seen_partitions): rebucket_target_keys may have evolved the
        # layout since construction
        newx = self.seen.filter_new(with_bucket(
            batch_dedup(admitted), partitions=self.seen.partitions))
        # per-host lifetime quota (Heritrix maxDocumentsFromHost): prior
        # admissions = scheduled-chain rows + live-frontier rows (exactly
        # every URL that ever passed admission — compaction-safe: the
        # scheduled chain is never pruned and the live frontier is
        # admitted-minus-scheduled); within the batch, rank per host in
        # the SAME deterministic order the first-wins dedup sorts by, and
        # drop rows past the remaining allowance BEFORE they enter
        # seen/frontier. Hosts-sized aggregate + one window; the dropped
        # count rides the seen-commit job as an Observation. Oracle
        # mirror in ccspark.oracle.
        obs_cap = None
        if p.max_urls_per_host is not None:
            prior = None
            if self.scheduled_tbl.exists():
                prior = self.scheduled_tbl.read_chain().select("host_key")
            live0 = self.live_frontier()
            if live0 is not None:
                live0 = live0.select("host_key")
                prior = (prior.unionByName(live0)
                         if prior is not None else live0)
            newx = newx.withColumn("_prior", F.lit(0).cast("long"))
            if prior is not None:
                counts = prior.groupBy("host_key").agg(
                    F.count(F.lit(1)).alias("_pc"))
                newx = (newx.drop("_prior")
                        .join(counts, "host_key", "left")
                        .withColumn("_prior", F.coalesce("_pc", F.lit(0)))
                        .drop("_pc"))
            w_cap = Window.partitionBy("host_key").orderBy(
                *order_cols(), F.col("src_doc_id").asc(),
                F.col("offset").asc())
            obs_cap = Observation()
            ranked = newx.withColumn("_hrn", F.row_number().over(w_cap))
            cap_over = ranked.filter(
                F.col("_prior") + F.col("_hrn") > p.max_urls_per_host)
            newx = (ranked
                    .observe(obs_cap, F.coalesce(F.sum(
                        (F.col("_prior") + F.col("_hrn")
                         > p.max_urls_per_host).cast("long")),
                        F.lit(0)).alias("n"))
                    .filter(F.col("_prior") + F.col("_hrn")
                            <= p.max_urls_per_host)
                    .drop("_prior", "_hrn"))
        new = (newx
               .observe(obs_new, F.count(F.lit(1)).alias("n"))
               .cache())
        versions = self.seen.add(new, r)
        if trap_version is not None:
            versions["traps"] = trap_version
        m["candidates_in"] = _observed_count(obs_in, candidates)
        if obs_hx is not None:
            m["hops_exceeded"] = int(_observed_count(
                obs_hx, cand_pre.filter(F.col("hop") > p.max_hops)))
        n_canon = _observed_count(obs_canon, canon)
        n_adm = _observed_count(obs_adm, pre_trap)
        m["malformed_dropped"] = m["candidates_in"] - n_canon
        m["robots_blocked"] = n_canon - n_adm
        if obs_kept is not None:
            n_kept = _observed_count(obs_kept, admitted)
            m["trap_dropped"] = n_adm - n_kept
        else:
            n_kept = n_adm
        m["new_seen"] = _observed_count(obs_new, new)
        n_capped = 0
        if obs_cap is not None:
            n_capped = int(_observed_count(obs_cap, cap_over))
            m["host_cap_dropped"] = n_capped
        # dup_dropped stays the PRE-cap dedup count: kept − (admitted
        # post-cap + cap-dropped)
        m["dup_dropped"] = n_kept - m["new_seen"] - n_capped
        m["dedup_rate"] = (m["dup_dropped"] / n_kept) if n_kept else 0.0
        # seen-set cardinality as driver arithmetic (like frontier_depth):
        # total = prev − tombstoned (recrawl + revisit removals, both
        # already observed) + new admissions. Exact because every removal
        # targets a URL present in the resolved set (each scheduled
        # record is consumed by at most one removal round, and a URL
        # re-enters the scheduled chain only after re-admission), and
        # because recrawl (non-2xx/304) and revisit (200/304) target
        # DISJOINT urls under the deterministic fetchsim bands. Under
        # the production HTTP fetcher a url whose status flipped between
        # rounds could be removed by both paths in one round, drifting
        # this scalar low by 1 per such event — consumers are the
        # rebucket trigger (layout-only; a slightly early evolution) and
        # the metric itself, never correctness; an exact re-sync is one
        # seen_df().count() away if an operator wants it. Legacy stores
        # without the metric resolve once, then ride the scalar.
        if self._seen_total is None:
            self._seen_total = int(self.seen.seen_df().count())
        else:
            self._seen_total += (m["new_seen"] - m.get("recrawled", 0)
                                 - m.get("revisited", 0))
        m["seen_total"] = self._seen_total

        # U6: first-seen domains delta (anti-join against the domain chain)
        obs_dom = Observation()
        new_hosts = new.select("host_key").distinct()
        if self.domains_tbl.exists():
            new_hosts = new_hosts.join(self.domains_tbl.read_chain(),
                                       "host_key", "left_anti")
        new_hosts = (new_hosts
                     .withColumn("first_round", F.lit(r))
                     .observe(obs_dom, F.count(F.lit(1)).alias("n")))
        versions["domains"] = self.domains_tbl.commit(new_hosts, r)
        m["new_domains"] = _observed_count(obs_dom, new_hosts)

        # The frontier is MERGE-ON-READ: each round commits only its NEW
        # rows as a delta; the live set is (chain − scheduled-since-base),
        # resolved lazily. Round 1 rewrote the whole remaining frontier
        # every round — at 10^10 URLs that is a full-frontier write per
        # round; the delta commit writes O(new URLs) instead, and
        # compaction (below) periodically materializes the live set as a
        # 'full' snapshot to bound the subtraction chain (the Iceberg
        # merge-on-read + rewrite-data-files pattern).
        new_frontier = new.select(
            *FRONTIER_COLS,
            *(["hop"] if p.max_hops is not None else []))
        live = self.live_frontier()
        frontier = (live.unionByName(new_frontier)
                    if live is not None else new_frontier).cache()

        # adaptive politeness: previous round's per-host integer mean
        # latency → delay floor (hosts-sized aggregate, joined into the
        # budget exactly like the robots cache; observed on the same
        # scheduling job — no standalone metric job). Oracle mirror in
        # ccspark.oracle (exact budgets/offsets/ordering parity tested).
        host_delays = None
        if (p.adaptive_delay_factor_pm is not None and r >= 1
                and self.scheduled_tbl.exists()):
            # cached: the hosts-sized table feeds BOTH the budget join
            # and the offsets join (an Observation would double-count
            # across the two subtrees — cache + count instead, which
            # also computes the aggregate once)
            host_delays = (self.scheduled_tbl.read_chain()
                           .filter(F.col("fetch_round") == r - 1)
                           .groupBy("host_key")
                           .agg(F.expr(
                               f"(sum(latency_ms) div count(1))"
                               f" * {p.adaptive_delay_factor_pm} div 1000")
                               .alias("adaptive_ms"))
                           .cache())

        # priority aging (starvation control): the SCHEDULING order uses
        # priority + rounds-waited × boost; the persisted priority column
        # is untouched (aging is an ordering view — recorded tables stay
        # lineage-stable and the boost never compounds across resumes).
        # Oracle mirror in ccspark.oracle (same int subtract + double
        # multiply-add, same IEEE op order).
        pri_col = "priority"
        sched_in = frontier  # `frontier` stays bound to the cached union
        if p.age_boost_pm is not None:
            sched_in = frontier.withColumn(
                "_eff", F.col("priority")
                + (F.lit(r) - F.col("depth")) * F.lit(p.age_boost_pm / 1000.0))
            pri_col = "_eff"
        # dual-model arbitration ordering (ProcessingService.java:200-222
        # parity, params.dual_model_priority): arbitration-big URLs
        # schedule first via a +1000.0 effective-priority boost over the
        # (possibly aged) base — ordering view only, persisted priority
        # untouched; composes with aging in that op order (oracle
        # mirrors (base + 1000.0) exactly). One Arrow UDF over the
        # scheduling input; off by default.
        if p.dual_model_priority:
            sched_in = sched_in.withColumn(
                "_eff", F.col(pri_col)
                + F.when(dual_big_udf(F.col("url"), F.col("priority")),
                         F.lit(1000.0)).otherwise(F.lit(0.0)))
            pri_col = "_eff"

        # grouped politeness (per-IP address group or per-registered-
        # domain site): the group delay table (groups-sized max
        # aggregate over the frontier, cached — it feeds BOTH the budget
        # join and the offsets join, and its count is the group-count
        # metric). Oracle mirror in ccspark.oracle.
        ip_delays = None
        if p.politeness_ip_groups is not None or p.politeness_by_domain:
            ip_delays = group_delays(frontier, self.robots, p,
                                     host_delays).cache()
            m["ip_groups" if p.politeness_ip_groups is not None
              else "domain_groups"] = ip_delays.count()

        # scheduled count observed on the fetched-table commit
        obs_sched = Observation()
        sched = (schedule_frontier(sched_in, self.robots, p, host_delays,
                                   ip_delays, pri_col)
                 .observe(obs_sched, F.count(F.lit(1)).alias("n"))
                 .cache())
        fetched = (with_fetch_sim(with_fetch_offsets(sched, self.robots, p,
                                                     host_delays, ip_delays,
                                                     pri_col).drop("_eff"),
                                  redirects=p.follow_redirects,
                                  revisit_changed_pct=(
                                      p.revisit_changed_pct
                                      if p.revisit_after_rounds is not None
                                      else None))
                   .withColumn("fetch_round", F.lit(r)))
        obs_nm = None
        if p.revisit_after_rounds is not None:
            obs_nm = Observation()
            fetched = fetched.observe(
                obs_nm, F.coalesce(
                    F.sum((F.col("status") == 304).cast("long")),
                    F.lit(0)).alias("n"))
        versions["scheduled"] = self.scheduled_tbl.commit(fetched, r)
        m["scheduled"] = _observed_count(obs_sched, sched)
        if host_delays is not None:
            m["adaptive_hosts"] = host_delays.count()
        if obs_nm is not None:
            m["not_modified"] = int(_observed_count(
                obs_nm, self.scheduled_tbl.read(versions["scheduled"])
                .filter(F.col("status") == 304)))

        versions["frontier"] = self.frontier_tbl.commit(
            new_frontier, r, repartition=(min(p.seen_partitions, 32), "bucket"))
        # arithmetic, not a count job: depth = prev_depth + new − scheduled
        m["frontier_depth"] = self._prev_depth + m["new_seen"] - m["scheduled"]
        self._prev_depth = m["frontier_depth"]

        # discovered-pages count observed on the next-candidates commit
        obs_hits = Observation()
        hits = (discovered_docs(self.scheduled_tbl.read(versions["scheduled"]),
                                self.docs,
                                carry_cols=(("hop",)
                                            if p.max_hops is not None
                                            else ()))
                .observe(obs_hits, F.count(F.lit(1)).alias("n")))
        # content-digest dedup (params.content_dedup): a page whose span
        # digest was already seen — any earlier round (digests delta
        # chain) or earlier in this batch (within-batch winner = smallest
        # page_url) — keeps its fetch record but does NOT re-extract
        # links: a mirrored page's outlinks enter the frontier once.
        # Oracle mirror in ccspark.oracle.
        obs_cd = None
        cd_winners = None
        hits_all = hits  # pre-dedup reference for the obs_hits fallback
        if p.content_dedup:
            hd = hits.withColumn("_dg", F.md5(span_serial_expr()))
            if self.digests_tbl.exists():
                hd = hd.join(self.digests_tbl.read_chain()
                             .select(F.col("digest").alias("_dg")),
                             "_dg", "left_anti")
            w_dg = Window.partitionBy("_dg").orderBy(F.col("page_url").asc())
            obs_cd = Observation()
            cd_winners = (hd.withColumn("_rn", F.row_number().over(w_dg))
                          .filter(F.col("_rn") == 1).drop("_rn")
                          .observe(obs_cd, F.count(F.lit(1)).alias("n"))
                          .cache())
            versions["digests"] = self.digests_tbl.commit(
                cd_winners.select(F.col("_dg").alias("digest")), r)
            hits = cd_winners.drop("_dg")
        next_cand = extract_links(hits, follow_links=p.follow_links)
        obs_redir = None
        if p.follow_redirects:
            # 301 targets re-enter the frontier as candidates with
            # redirect lineage (page_url = the redirecting URL, so a
            # relative Location would resolve against it); they then
            # flow through the NORMAL canonicalize → robots → seen-dedup
            # → politeness pipeline — a redirect is frontier traffic,
            # not a side channel, which is what keeps ordering total
            # and targets deduped at 10^10 scale
            obs_redir = Observation()
            redir = (self.scheduled_tbl.read(versions["scheduled"])
                     .filter(F.col("status") == 301)
                     .select(F.col("redirect_to").alias("url_raw"),
                             F.col("url").alias("page_url"),
                             F.lit("redirect").alias("kind"),
                             F.lit("").alias("alt"),
                             F.lit("").alias("parent_txt"),
                             F.lit(0).alias("dom_depth"),
                             F.lit(0).alias("dom_sib"),
                             F.lit("redirect").alias("src_doc_id"),
                             F.lit(0).alias("offset"),
                             F.lit(None).cast("long").alias("event_ms"),
                             # a followed redirect is one hop (Heritrix
                             # counts the R-hop toward max-hops)
                             *([(F.col("hop") + F.lit(1)).cast("int")
                                .alias("hop")]
                               if p.max_hops is not None else []))
                     .observe(obs_redir, F.count(F.lit(1)).alias("n")))
            next_cand = next_cand.select(*redir.columns).unionByName(redir)
        versions["candidates"] = self.candidates_tbl.commit(next_cand, r)
        m["pages_discovered"] = _observed_count(obs_hits, hits_all)
        if obs_cd is not None:
            m["content_dups"] = m["pages_discovered"] - int(
                _observed_count(obs_cd, cd_winners))
            cd_winners.unpersist()
        if obs_redir is not None:
            m["redirects_followed"] = _observed_count(obs_redir, redir)

        # A13 phase-timer analog: wall time is observability only — never
        # part of the oracle-checked metric set
        m["wall_s"] = round(_time.perf_counter() - t0, 3)
        self.store.commit_round(r, versions, m, batch_id=batch_id)
        if (p.compact_seen_every is not None
                and (r + 1) % p.compact_seen_every == 0):
            # chain maintenance AFTER the round commit: a crash here just
            # loses the compaction, never round data
            # compact_seen (not raw compact_chain): materializes the
            # RESOLVED set so recrawl tombstones are reclaimed, not
            # carried into the full snapshot forever
            versions["seen"] = self.seen.compact_seen(
                r, repartition=(min(p.seen_partitions, 32), "bucket"))
            # filter (bloom/cuckoo): materialize latest-bucket-wins so
            # the delta chain stays bounded (same cadence as the seen chain)
            bv = self.seen.compact_filter(r)
            if bv is not None:
                versions[self.seen.filter_name] = bv
            # frontier: materialize the live set as a 'full' snapshot so
            # the merge-on-read subtraction chain stays bounded
            versions["frontier"] = self.frontier_tbl.commit(
                self.live_frontier(), r, kind="full",
                repartition=(min(p.seen_partitions, 32), "bucket"))
            # RE-commit the round log with the compacted versions —
            # without this, rollback_to_last_round (batch resume AND
            # every streaming micro-batch) treats the compaction
            # snapshots as orphans of a crashed attempt and deletes
            # them, silently re-growing the chains it just bounded.
            self.store.commit_round(r, versions, m, batch_id=batch_id)
            if p.expire_keep_last is not None:
                # history GC after the re-commit: the fresh 'full'
                # snapshots are now the chain bases, so everything
                # before them is reclaimable without touching any
                # version the round log of record references
                for tbl in (self.seen.seen_tbl, self.seen.filter_tbl,
                            self.frontier_tbl):
                    tbl.expire_snapshots(p.expire_keep_last)
                    tbl.remove_orphans()
        # automatic partition evolution (params.rebucket_target_keys):
        # grow the bucket count when keys/bucket exceeds the target —
        # a layout-only maintenance op AFTER the round commit (a crash
        # here loses the evolution, never round data); the round log is
        # RE-committed with the new 'full' versions so resume/rollback
        # treats them as state of record, not orphans (the compaction
        # discipline above).
        if p.rebucket_target_keys is not None:
            # the running scalar (observed counts riding the round's own
            # jobs) — NOT a standalone O(total) count() job per round
            n_seen = self._seen_total
            newp = self.seen.partitions
            while n_seen > p.rebucket_target_keys * newp:
                newp *= 2
            if newp != self.seen.partitions:
                rb = self.seen.rebucket(newp, r)
                versions.update(rb)
                m["rebucketed_to"] = newp
                self.store.commit_round(r, versions, m, batch_id=batch_id)
        for df in ((new, frontier, sched)
                   + ((stale,) if stale is not None else ())
                   + ((fresh,) if fresh is not None else ())
                   + ((host_delays,) if host_delays is not None else ())
                   + ((ip_delays,) if ip_delays is not None else ())
                   + ((cached_adm,) if cached_adm is not None else ())):
            df.unpersist()
        return self.candidates_tbl.read(versions["candidates"])

    def live_frontier(self) -> DataFrame | None:
        """The unscheduled frontier, resolved merge-on-read: the delta
        chain minus scheduled rows committed since the chain's 'full'
        base snapshot (None before any round)."""
        if not self.frontier_tbl.exists():
            return None
        chain = self.frontier_tbl.read_chain()
        if self.scheduled_tbl.exists():
            base = self.frontier_tbl.chain_base_round()
            sched = (self.scheduled_tbl.read_chain()
                     .filter(F.col("fetch_round") > base).select("url"))
            chain = chain.join(sched, "url", "left_anti")
        return chain

    # -- full run --------------------------------------------------------------

    def run(self, resume: bool = False) -> list[dict]:
        start, cand = (self.resume_round() if resume else (0, None))
        if cand is None:
            if start != 0:
                raise RuntimeError("resume requested but no candidates snapshot")
            seeds = self.spark.read.parquet(self.seeds_path)
            cand = seeds_to_candidates(seeds)
            if self.params.sitemap_seeding and self.sitemaps_path:
                cand = cand.unionByName(
                    self._sitemap_candidates(self.sitemaps_path))
        for r in range(start, self.params.rounds):
            cand = self.run_round(r, cand)
        return self.store.round_metrics()

    def _sitemap_candidates(self, sitemaps_path: str) -> DataFrame:
        """Sitemap discovery (params.sitemap_seeding): `<loc>` entries of
        the advertised sitemaps become round-0 candidates. Lineage is
        (sitemap:<host>, entry position) — unique per entry, so the
        first-wins batch dedup stays deterministic, and 'seed' < 'sitemap'
        lexicographically means a URL present in both sources keeps its
        seed lineage. Blobs are protocol-bounded (50k URLs / 50 MB), so
        from_xml + posexplode is a per-row expression — no shuffle."""
        from .sitemap import parse_sitemaps
        blobs = self.spark.read.parquet(sitemaps_path)
        sm = parse_sitemaps(blobs.select("host", "xml"), with_pos=True)
        return sm.select(
            F.col("loc").alias("url_raw"),
            F.lit("").alias("page_url"),
            F.lit("sitemap").alias("kind"),
            F.lit("").alias("alt"),
            F.lit("").alias("parent_txt"),
            F.lit(0).alias("dom_depth"),
            F.lit(0).alias("dom_sib"),
            F.concat(F.lit("sitemap:"), F.col("host")).alias("src_doc_id"),
            F.col("sm_pos").alias("offset"),
            F.lit(None).cast("long").alias("event_ms"),
        )

    # -- inspection -------------------------------------------------------------

    def export_frontier_ranged(self, path: str, n_files: int = 16) -> dict:
        """Materialize the live frontier as a RANGE-PARTITIONED priority
        queue (north_rule: 'priority queue realized as salted,
        range-partitioned frontier tables'): file k holds a contiguous
        slice of the total order, globally above every row of file k+1,
        and rows are sorted within each file — so a fetcher fleet drains
        highest-priority work by reading files in index order, no global
        sort at read time, and a partial drain (first j files) is exactly
        the global top slice. `repartitionByRange` samples split bounds
        (reservoir per partition) — bounds land where the data is, so a
        skew-free ~equal-rows split even when priorities cluster; the
        within-file sort is a local no-shuffle pass.

        Returns a manifest {file → rows, pri_max, pri_min} (written as
        <path>.manifest.json BESIDE the parquet directory — inside it,
        Spark's directory reader would trip on the non-parquet file) —
        the per-partition lineage a reader uses for range pruning
        without opening files."""
        import json
        import os

        live = self.live_frontier()
        if live is None:
            return {}
        order = [F.col("priority").desc(), F.col("depth").asc(),
                 F.col("surt").asc(), F.col("url").asc()]
        (live.repartitionByRange(n_files, *order)
             .sortWithinPartitions(*order)
             .write.mode("overwrite").parquet(path))
        files = (self.spark.read.parquet(path)
                 .withColumn("_f", F.element_at(
                     F.split(F.input_file_name(), "/"), -1))
                 .groupBy("_f")
                 .agg(F.count(F.lit(1)).alias("rows"),
                      F.max("priority").alias("pri_max"),
                      F.min("priority").alias("pri_min"))
                 .collect())
        manifest = {r._f: {"rows": r.rows, "pri_max": r.pri_max,
                           "pri_min": r.pri_min}
                    for r in sorted(files, key=lambda r: r._f)}
        with open(path.rstrip("/") + ".manifest.json", "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        return manifest

    def export_warc(self, out_dir: str) -> DataFrame:
        """Archive the crawl: every successfully fetched page (status
        200 with a known document) written as WARC response records
        through the distributed `.warc.gz` sink (warc.write_warc — one
        shard per partition, one gzip member per record, Common Crawl's
        layout, byte-readable back through warc_records). The payload is
        the document's interleaved span sequence serialized in offset
        order ('kind:text-or-ref' lines — the input_hint table IS the
        fetched representation in this engine; a deployment with raw
        bytes swaps its payload column in). Returns the shard manifest
        (path, n_records, n_bytes)."""
        from .warc import write_warc

        sched = (self.scheduled_rounds()
                 .filter(F.col("status") == 200)
                 .select("url", "content_type"))
        docs = self.docs.select(
            F.col("page_url").alias("url"),
            F.encode(span_serial_expr(), "UTF-8").alias("payload"))
        rows = (sched.join(docs, "url")
                .select(F.col("url").alias("uri"),
                        F.coalesce("content_type",
                                   F.lit("text/html")).alias("mime"),
                        "payload"))
        return write_warc(rows, out_dir)

    def export_cdx(self, out_dir: str) -> DataFrame:
        """Index the crawl: one CDX line per successful fetch, keyed by
        the row's SURT (already computed at canonicalization), timestamp
        = a 14-digit day derived from the fetch round, digest = the
        deterministic fetch_id prefix. Written through cdx.write_cdx
        (zipnum-style gz shards grouped by SURT host prefix + secondary
        manifest). With export_warc this completes the archive stack a
        Common Crawl-style deployment publishes: WARC shards + CDX
        index."""
        from .cdx import write_cdx

        cap = (self.scheduled_rounds()
               .filter(F.col("status") == 200)
               .select(F.col("surt").alias("cdx_key"),
                       F.concat(F.date_format(
                           F.date_add(F.lit("2026-01-01"),
                                      F.col("fetch_round")),
                           "yyyyMMdd"), F.lit("000000")).alias("ts14"),
                       "url",
                       F.substring("fetch_id", 1, 8).alias("digest")))
        return write_cdx(cap, out_dir)

    def scheduled_rounds(self) -> DataFrame:
        """All scheduled rows across committed rounds, in total order."""
        return (self.scheduled_tbl.read_chain()
                .orderBy(F.col("fetch_round").asc(), *order_cols()))
