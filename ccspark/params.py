"""Crawl parameters shared by the Spark engine and the pure-Python oracle."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlParams:
    """One scheduling-round configuration.

    round_seconds / crawl_delay define the per-host politeness budget —
    the per-host generalization (north_rule) of the reference's global
    150 ms inter-fetch gate (ProcessingService.java:57,235-240):
    budget(host) = floor(round_seconds / crawl_delay(host)).
    """

    rounds: int = 3
    round_seconds: float = 60.0
    default_crawl_delay: float = 0.15   # the reference's MIN_CALL_INTERVAL
    follow_links: bool = True           # schedule non-media <a>/<link> hrefs as pages
    num_salts: int = 8                  # hot-host salting fan-out (engine only)
    seen_partitions: int = 256          # bloom/seen hash partitions (engine only)
    #: U9 backpressure (ProcessingService.java:44-45 MAX_NUM_PENDING_TASKS):
    #: global cap on URLs scheduled per round, applied AFTER per-host budgets
    #: in frontier total order. None = unbounded.
    max_scheduled_per_round: int | None = None
    #: compact the seen-set delta chain into one 'full' snapshot every k
    #: rounds (Iceberg rewrite-data-files analog); None = never. Purely a
    #: maintenance operation — results are unchanged (tested).
    compact_seen_every: int | None = None
    #: after each compaction, expire snapshot history down to the last k
    #: versions per maintained table (Iceberg expire_snapshots analog;
    #: chain-closure keeps read_chain intact — tables.py). Requires
    #: compact_seen_every; None = keep all history (full time travel).
    expire_keep_last: int | None = None
    #: follow 301 redirects (fetchsim's deterministic [95,97) band): the
    #: Location target re-enters the frontier as a kind='redirect'
    #: candidate next round — canonicalized, robots-checked, seen-deduped
    #: and politeness-budgeted like any link. Composes with
    #: recrawl_after_rounds: a 301 is a non-200, so its SOURCE is also
    #: eligible for recrawl (both engines mirror this). Default OFF —
    #: reference-parity fetch outcomes unchanged.
    follow_redirects: bool = False
    #: recrawl policy (U5's deletion path in the round loop): at the start
    #: of round r, URLs scheduled in round r - recrawl_after_rounds whose
    #: fetch FAILED (status != 200) are removed from the seen set
    #: (SeenSet.remove — tombstone delta + cuckoo slot clear / bloom
    #: rebuild) and re-injected as candidates, re-entering the normal
    #: canonicalize → robots → dedup → schedule pipeline. None = never.
    recrawl_after_rounds: int | None = None
    #: revisit policy (freshness maintenance, the conditional-GET shape):
    #: at the start of round r, URLs scheduled in round
    #: r - revisit_after_rounds whose fetch SUCCEEDED (status 200 or 304)
    #: leave the seen set and re-enter as candidates marked
    #: src_doc_id='revisit' (priority inputs carried verbatim, so ordering
    #: is lineage-stable; src_doc_id is only the dedup tie-break). At
    #: fetch time a revisit in the 200 band answers 200 (content changed,
    #: links re-extracted — all dups vs seen) or 304 Not Modified (no
    #: re-extraction: discovered_docs keys on status==200), decided by a
    #: SECOND md5 band (kernels.md5_key2_one — independent of the primary
    #: band) < revisit_changed_pct. A 304 is a success: it is NOT eligible
    #: for failure-recrawl, and it stays on the revisit schedule. None =
    #: never (default — reference-parity outcomes unchanged).
    revisit_after_rounds: int | None = None
    revisit_changed_pct: int = 50
    #: maximum link-hop distance from a seed (the Heritrix max-hops /
    #: BUbiNG maxDepth frontier control): when set, every candidate
    #: carries a `hop` lineage column — seeds/sitemap entries hop 0,
    #: extracted links and followed redirects source-hop + 1,
    #: recrawl/revisit re-injections carry their hop verbatim — and
    #: candidates with hop > max_hops are dropped BEFORE admission
    #: (metric `hops_exceeded`; candidates_in counts survivors). The
    #: frontier/scheduled tables gain the hop column only when enabled,
    #: so default-off table schemas — and every pinned oracle — are
    #: unchanged. Per-crawl constant: never toggle on an existing state
    #: dir (the column would be absent from earlier snapshots).
    max_hops: int | None = None
    #: adaptive per-host politeness (production-crawler delay
    #: auto-tuning): when set, round r ≥ 1 computes each host's mean
    #: observed fetch latency over round r-1's scheduled rows (integer
    #: floor mean, ms) and raises that host's effective crawl delay to
    #: max(robots/default delay, mean_ms × factor_pm ∕ 1000 ms) — slow
    #: hosts get crawled more gently, fast hosts stay at the robots
    #: floor. factor_pm is per-mille (2000 = delay ≥ 2× mean latency).
    #: Arithmetic is integer up to one final IEEE division/compare, so
    #: budgets and fetch offsets stay bit-equal cross-engine. The
    #: host-delay table is a hosts-sized aggregate joined into the
    #: budget — same shape as the robots join. None = off (default).
    adaptive_delay_factor_pm: int | None = None
    #: robots-cache staleness (U12): entries older than robots_max_age_ms at
    #: crawl_as_of_ms are treated as absent (no disallow, default crawl
    #: delay). Both must be set to enable; as-of is an explicit parameter —
    #: never wall clock — so runs stay reproducible.
    robots_max_age_ms: int | None = None
    crawl_as_of_ms: int | None = None
    #: crawl-trap guard: a host whose admitted URLs collapse to few URL
    #: TEMPLATES (query stripped, digit runs → 'N') while minting many
    #: distinct URLs is a trap (calendar/session-id/faceted-search
    #: explosion). Fires when distinct URLs ≥ trap_min_urls AND
    #: (1000·n_urls) div n_templates ≥ trap_ratio_pm; trapped hosts are
    #: recorded in a persistent delta table and their candidates dropped
    #: at admission from that round on (frontier rows admitted BEFORE
    #: detection still drain — the guard bounds growth, it is not an
    #: eviction). None = guard off (no metric keys, no traps table).
    trap_ratio_pm: int | None = None
    trap_min_urls: int = 20
    #: host-centrality prior (OPIC/PageRank-style crawl ordering): when
    #: set, each round boosts candidate priority by
    #: weight × rank(host_key)/10^12, where rank is the fixed-point
    #: integer PageRank (webgraph.pagerank_fixed_point) of the round's
    #: OWN link graph — edges = distinct (host(page_url) → host_key).
    #: Integer ranks + one float multiply-add per row keep the order
    #: bit-reproducible (no float sums). None = off (default — the
    #: reference-parity ordering the north_rule compares).
    pagerank_prior_weight: float | None = None
    #: sitemap seeding (sitemaps.org discovery, RFC 9309 advertisement):
    #: when True AND the engine was given a sitemaps table, round 0's
    #: candidates are the seed list UNION the parsed `<loc>` entries
    #: (kind='sitemap', lineage = (sitemap:host, entry position)); they
    #: enter the normal canonicalize → robots → dedup → schedule
    #: pipeline, so a URL that is both seed and sitemap entry dedups
    #: deterministically (seed wins the lineage tie). False = off (the
    #: reference-parity seeding the north_rule compares).
    sitemap_seeding: bool = False
    #: per-IP politeness grouping (Heritrix "assignment by IP" / BUbiNG
    #: agent mapping): when set, the politeness unit is the RESOLVED
    #: ADDRESS GROUP instead of the hostname — budgets, top-K selection
    #: and fetch offsets are keyed by the group, so virtual hosts that
    #: share a server share one crawl-rate budget instead of multiplying
    #: it. The group's effective delay is the MAX of its member hosts'
    #: effective (robots ∨ adaptive) delays over the hosts present in
    #: the current frontier — the conservative choice: the shared server
    #: is fetched at its slowest member's cadence. The sandbox has no
    #: DNS, so resolution is a deterministic stand-in: group =
    #: md5('ip:' + host_key) mod politeness_ip_groups (the same
    #: cross-engine md5 derivation fetchsim uses); a deployment swaps in
    #: the resolver's output column — every downstream op keys on the
    #: group id, not on how it was produced. Metric `ip_groups` = groups
    #: holding frontier rows. None = per-host politeness (default —
    #: reference-parity budgets unchanged).
    politeness_ip_groups: int | None = None
    #: per-SITE politeness grouping: the politeness unit is the
    #: REGISTERED DOMAIN (publicsuffix rule over kernels.PSL2 — last-2
    #: labels ∈ PSL → last 3 labels, else last 2), so a site's
    #: subdomains (the classic budget-multiplication loophole: a
    #: thousand *.example.com vhosts each minting their own budget)
    #: share ONE crawl-rate budget. Same machinery as per-IP grouping —
    #: group delay = MAX member-host effective delay over the current
    #: frontier, budgets/selection/offsets keyed on the group — with the
    #: registered domain as the key; `domain_groups` metric. Mutually
    #: exclusive with politeness_ip_groups. False = off (default).
    politeness_by_domain: bool = False
    #: per-host lifetime quota (Heritrix maxDocumentsFromHost / crawl
    #: budget allocation): a host may admit at most this many URLs over
    #: the WHOLE crawl — once its cumulative admissions (scheduled rows
    #: + live frontier rows, i.e. every URL that ever passed admission)
    #: reach the cap, further candidates are dropped AT ADMISSION in the
    #: deterministic batch order (total order + lineage — the same sort
    #: the first-wins dedup uses), so the frontier never accumulates
    #: work the quota forbids. Dropped count = `host_cap_dropped`;
    #: dropped URLs do NOT enter the seen set (a later round may re-find
    #: them, correctly — they were never crawled). Recrawl/revisit
    #: re-admissions consume quota again (each is a real fetch).
    #: None = unlimited (default).
    max_urls_per_host: int | None = None
    #: content-digest dedup in the discovery loop (the URL-seen set's
    #: CONTENT-seen sibling — WARC-revisit semantics applied live): when
    #: True, each discovered page's span sequence is serialized in
    #: offset order and md5-digested; pages whose digest was already
    #: seen (any earlier round, or earlier in this round's batch — the
    #: within-batch winner is the smallest page_url) are still recorded
    #: as fetched but their links are NOT re-extracted, so a mirrored
    #: page's outlinks enter the frontier exactly once. Digests persist
    #: in a `digests` delta table (same snapshot mechanism as domains);
    #: metric `content_dups`. False = off (default).
    content_dedup: bool = False
    #: frontier priority aging (starvation control): when set, the
    #: SCHEDULING order — selection windows, fetch-offset ranks, and the
    #: global backpressure cut — uses the aged priority
    #: priority + (round − depth) × age_boost_pm ∕ 1000 (depth is the
    #: admission round, so the boost is rounds-waited × per-mille
    #: weight). Without it, a hot host's budget can starve its
    #: low-priority URLs FOREVER (every round mints fresh higher-priority
    #: candidates); with it, every frontier row's effective priority
    #: grows linearly until scheduled — bounded wait. The persisted
    #: priority column is UNCHANGED (aging is an ordering view, not a
    #: mutation), so recorded tables stay lineage-stable and the boost
    #: never compounds across resumes. One int subtract + one
    #: double multiply-add per row, bit-equal cross-engine. None = off
    #: (default — reference-parity ordering unchanged).
    age_boost_pm: int | None = None
    #: automatic seen-set partition evolution (SeenSet.rebucket in the
    #: round loop): after each round's commit, if the resolved seen set
    #: holds more than rebucket_target_keys × current-partition-count
    #: rows, the bucket count DOUBLES (repeatedly, to the smallest
    #: power-of-two multiple that restores keys/bucket ≤ target) and
    #: both seen tables are re-committed 'full' under the new spec —
    #: the knob that lets one engine configuration ride a crawl from
    #: 10^6 to 10^10 URLs without per-bucket filter blobs outgrowing
    #: task memory. Purely a layout operation: scheduled output,
    #: ordering and the seen SET are unchanged (tested vs a no-policy
    #: run); costs one count job per round while enabled plus the
    #: O(total) rewrite on the rounds that actually evolve. None = off.
    rebucket_target_keys: int | None = None
    #: dual-model priority arbitration (ProcessingService.java:200-222
    #: parity): when on, scheduling order consults a SECOND deterministic
    #: scorer — the n-gram model over the URL string
    #: (kernels.ngram_score_one, the ngramsClass analog) — arbitrated
    #: against the 23-feature priority scorer by the reference's exact
    #: agreement / confidence-margin rule (`|d1[0]-d1[1]| + 0.05 >
    #: |d2[0]-d2[1]|` → trust the n-gram model). Arbitration-big URLs
    #: schedule first (a +1000.0 effective-priority boost, composing
    #: with age_boost_pm like the aging view: an ordering-only policy —
    #: persisted priority columns and all recorded tables unchanged).
    #: Pure-Python oracle mirrors the identical float path. Default OFF —
    #: reference-parity ordering unchanged.
    dual_model_priority: bool = False


#: Total frontier order (SURVEY.md U13): priority DESC, then depth, surt, url.
ORDER_COLUMNS = ("priority", "depth", "surt", "url")


def order_key(rec: dict) -> tuple:
    """Oracle-side sort key implementing the total order."""
    return (-rec["priority"], rec["depth"], rec["surt"], rec["url"])
