"""CDX capture index — the Common Crawl-style URL index artifact.

The reference repo's whole domain is Common Crawl WARC processing; the
companion artifact every CC consumer touches is the CDX(J) URL index
with its zipnum layout (public formats: pywb / cdx-toolkit / the CC
index's cluster.idx): each capture keyed by its SURT (Sort-friendly URI
Reordering Transform) key plus a 14-digit timestamp, globally sorted,
cut into fixed-size blocks, with a tiny secondary index of (first key,
row count) per block so a lookup binary-searches the secondary index
and reads exactly one block.

Captures are synthesized deterministically from the orders table (the
repo's URL-bearing fixture pattern, same as seen_recrawl_cuckoo):
url = http://shop{o_custkey % 20}.example.com/order/{o_orderkey},
ts = o_orderdate rendered as yyyyMMdd000000, digest = the first 8 md5
hex chars of url|ts (stands in for the content digest — the fixture has
no payloads).

Scale story (100 TB): an index build is sort-by-key. On a cluster the
physical strategy is repartitionByRange(cdx_key) + sortWithinPartitions
with per-range block numbering; here the shard is the SURT host prefix
— deterministic, SQL-expressible, and contiguous in key order exactly
like the real cluster.idx's key ranges (every key of one shard sorts
together because the shard IS the key's prefix). The rank window
therefore partitions by shard (never a single global window), and the
secondary index aggregates to rows/block_size rows — driver-tiny.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .analytics import t

#: captures per zipnum block. The real CC index uses 3000 lines/block;
#: 50 keeps multiple blocks per shard at every test sf.
CDX_BLOCK = 50

_HOST_RE = r"^https?://([^/]+)"
_PATH_RE = r"^https?://[^/]+(/.*)$"


def _captures(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    url = F.concat(F.lit("http://shop"),
                   (F.col("o_custkey") % 20).cast("string"),
                   F.lit(".example.com/order/"),
                   F.col("o_orderkey").cast("string"))
    ts = F.concat(F.date_format("o_orderdate", "yyyyMMdd"), F.lit("000000"))
    return o.select(url.alias("url"), ts.alias("ts14"))


def q_cdx_index(spark, sf_dir):
    cap = _captures(spark, sf_dir)
    host = F.regexp_extract("url", _HOST_RE, 1)
    path = F.regexp_extract("url", _PATH_RE, 1)
    shard = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    cap = (cap.withColumn("shard", shard)
           .withColumn("cdx_key", F.concat(F.col("shard"), F.lit(")"), path))
           .withColumn("digest", F.substring(
               F.md5(F.concat("url", F.lit("|"), "ts14")), 1, 8)))
    w = Window.partitionBy("shard").orderBy("cdx_key", "ts14")
    return (cap.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .withColumn("block", F.expr(f"(rn - 1) div {CDX_BLOCK}"))
            .select("shard", "cdx_key", "ts14", "url", "digest",
                    "block", "rn"))


_SQL_CDX_BASE = f"""
WITH cap AS (
  SELECT 'http://shop' || CAST(o_custkey % 20 AS VARCHAR)
           || '.example.com/order/' || CAST(o_orderkey AS VARCHAR) AS url,
         strftime(o_orderdate, '%Y%m%d') || '000000' AS ts14
  FROM orders),
k AS (
  SELECT url, ts14,
    array_to_string(list_reverse(string_split(
      regexp_extract(url, '{_HOST_RE}', 1), '.')), ',') AS shard,
    substr(md5(url || '|' || ts14), 1, 8) AS digest,
    regexp_extract(url, '{_PATH_RE}', 1) AS path
  FROM cap),
r AS (
  SELECT shard, shard || ')' || path AS cdx_key, ts14, url, digest,
    CAST(row_number() OVER (PARTITION BY shard
                            ORDER BY shard || ')' || path, ts14)
         AS BIGINT) AS rn
  FROM k)
SELECT shard, cdx_key, ts14, url, digest,
       (rn - 1) // {CDX_BLOCK} AS block, rn
FROM r"""

SQL_CDX_INDEX = _SQL_CDX_BASE


def q_cdx_block_index(spark, sf_dir):
    """The zipnum secondary index: one row per (shard, block) carrying
    the block's first key and row count — the table a lookup
    binary-searches before reading exactly one block. Rows/block_size
    sized: tiny at any corpus scale."""
    idx = q_cdx_index(spark, sf_dir)
    return (idx.groupBy("shard", "block")
            .agg(F.min("cdx_key").alias("first_key"),
                 F.count(F.lit(1)).alias("n_rows")))


SQL_CDX_BLOCK_INDEX = (
    f"SELECT shard, block, min(cdx_key) AS first_key,"
    f" CAST(count(*) AS BIGINT) AS n_rows"
    f" FROM ({_SQL_CDX_BASE}) GROUP BY shard, block")


# ---------------------------------------------------------------------------
# capture-history ops: WARC revisit records + cross-snapshot diff
# ---------------------------------------------------------------------------

def _page_captures(spark, sf_dir):
    """Multi-capture fixture: one PAGE per customer (so every URL is
    captured once per order), digest = hash of the capture MONTH — the
    page's content changes monthly, so consecutive same-month captures
    carry identical digests and exercise the revisit path. Every third
    page is STATIC (digest ignores the month): its re-captures are all
    revisits and its cross-snapshot diff status is 'same'."""
    o = t(spark, sf_dir, "orders")
    url = F.concat(F.lit("http://shop"),
                   (F.col("o_custkey") % 20).cast("string"),
                   F.lit(".example.com/cust/"),
                   F.col("o_custkey").cast("string"))
    return o.select(
        url.alias("url"),
        F.concat(F.date_format("o_orderdate", "yyyyMMdd"), F.lit("000000"))
        .alias("ts14"),
        F.col("o_orderkey").alias("capture_id"),
        F.substring(F.md5(F.concat(
            F.col("o_custkey").cast("string"), F.lit("m"),
            F.when(F.col("o_custkey") % 3 == 0, F.lit("static"))
            .otherwise(F.date_format("o_orderdate", "yyyyMM")))),
            1, 8).alias("digest"),
        F.year("o_orderdate").alias("yr"))


_SQL_PAGE_CAPTURES = """
SELECT 'http://shop' || CAST(o_custkey % 20 AS VARCHAR)
         || '.example.com/cust/' || CAST(o_custkey AS VARCHAR) AS url,
       strftime(o_orderdate, '%Y%m%d') || '000000' AS ts14,
       o_orderkey AS capture_id,
       substr(md5(CAST(o_custkey AS VARCHAR) || 'm'
                  || CASE WHEN o_custkey % 3 = 0 THEN 'static'
                          ELSE strftime(o_orderdate, '%Y%m') END),
              1, 8) AS digest,
       CAST(year(o_orderdate) AS INT) AS yr
FROM orders"""


def q_warc_revisit(spark, sf_dir):
    """WARC revisit-record classification (the WARC 1.1 `revisit` record
    type, identical-payload-digest profile — how Common Crawl and every
    Heritrix-lineage crawler deduplicates storage): within each (url,
    digest) group the earliest capture is the stored `response`; every
    later identical capture becomes a `revisit` whose refers_to points at
    the stored one's timestamp. Window per (url, digest) — the shuffle
    key is the dedup identity itself, so the plan is one hash exchange;
    at archive scale the group is one page's identical captures (tiny)."""
    cap = _page_captures(spark, sf_dir)
    w = (Window.partitionBy("url", "digest")
         .orderBy("ts14", "capture_id"))
    grp = Window.partitionBy("url", "digest")
    return (cap.withColumn("rn", F.row_number().over(w))
            .withColumn("first_ts", F.min("ts14").over(grp))
            .select(
                "url", "ts14", "capture_id", "digest",
                F.when(F.col("rn") == 1, "response").otherwise("revisit")
                .alias("record_type"),
                F.when(F.col("rn") == 1, "").otherwise(F.col("first_ts"))
                .alias("refers_to")))


SQL_WARC_REVISIT = f"""
WITH cap AS ({_SQL_PAGE_CAPTURES}),
r AS (
  SELECT url, ts14, capture_id, digest,
         row_number() OVER (PARTITION BY url, digest
                            ORDER BY ts14, capture_id) AS rn,
         min(ts14) OVER (PARTITION BY url, digest) AS first_ts
  FROM cap)
SELECT url, ts14, capture_id, digest,
       CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS record_type,
       CASE WHEN rn = 1 THEN '' ELSE first_ts END AS refers_to
FROM r"""


def q_crawl_diff(spark, sf_dir):
    """Cross-snapshot crawl diff — what changed between two monthly
    crawls (snapshot a = captures through 1997, b = 1998 on): per URL
    take the LATEST capture's digest in each snapshot and classify
    added / gone / changed / same. NOT a self-join: each snapshot's
    latest capture is a conditional max over a fixed-width
    (ts14 ∥ zero-padded capture_id ∥ digest) encoding — lexicographic
    max ≡ latest-capture argmax — so the whole diff is ONE map-side-
    combinable hash aggregation on url (one exchange; the windowed
    two-branch full-outer formulation costs 4 exchanges and rescans).
    At 100 TB this is the monthly-snapshot reconciliation job, shuffle
    O(|urls|)."""
    cap = _page_captures(spark, sf_dir).withColumn(
        "snap", F.when(F.col("yr") <= 1997, "a").otherwise("b"))
    enc = F.concat("ts14", F.lpad(F.col("capture_id").cast("string"),
                                  12, "0"), "digest")
    agg = cap.groupBy("url").agg(
        F.max(F.when(F.col("snap") == "a", enc)).alias("ea"),
        F.max(F.when(F.col("snap") == "b", enc)).alias("eb"))
    digest_a = F.substring("ea", 27, 8)
    digest_b = F.substring("eb", 27, 8)
    status = (F.when(F.col("ea").isNull(), "added")
              .when(F.col("eb").isNull(), "gone")
              .when(digest_a == digest_b, "same")
              .otherwise("changed"))
    return agg.select(
        "url", status.alias("status"),
        F.coalesce(digest_a, F.lit("")).alias("digest_a"),
        F.coalesce(digest_b, F.lit("")).alias("digest_b"))


SQL_CRAWL_DIFF = f"""
WITH cap AS ({_SQL_PAGE_CAPTURES}),
e AS (
  SELECT url,
         CASE WHEN yr <= 1997 THEN 'a' ELSE 'b' END AS snap,
         ts14 || lpad(CAST(capture_id AS VARCHAR), 12, '0') || digest AS enc
  FROM cap),
agg AS (
  SELECT url,
         max(CASE WHEN snap = 'a' THEN enc END) AS ea,
         max(CASE WHEN snap = 'b' THEN enc END) AS eb
  FROM e GROUP BY url)
SELECT url,
       CASE WHEN ea IS NULL THEN 'added'
            WHEN eb IS NULL THEN 'gone'
            WHEN substr(ea, 27, 8) = substr(eb, 27, 8) THEN 'same'
            ELSE 'changed' END AS status,
       COALESCE(substr(ea, 27, 8), '') AS digest_a,
       COALESCE(substr(eb, 27, 8), '') AS digest_b
FROM agg"""


def write_cdx(captures, out_dir: str):
    """Distributed zipnum-style CDX writer (the index sibling of
    warc.write_warc): `captures` has (cdx_key, ts14, url, digest); rows
    are range-grouped by the SURT host prefix (shard = everything before
    ')' — contiguous in key order like the real cluster.idx ranges),
    sorted (cdx_key, ts14) within each shard file, and streamed as
    gzip text lines 'cdx_key ts14 url digest'. Returns the shard
    manifest (path, first_key, n_records) — the secondary index a
    lookup binary-searches. One file per partition; executor memory
    holds one Arrow batch."""
    import gzip
    import os
    from collections.abc import Iterator

    import pandas as pd

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    shard = F.substring_index("cdx_key", ")", 1)
    arranged = (captures.withColumn("_shard", shard)
                .repartition("_shard")
                .sortWithinPartitions("cdx_key", "ts14"))

    def write_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"cdx-{pid:05d}.gz")
        n = 0
        first = None
        fh = None
        try:
            for pdf in batches:
                if len(pdf) and fh is None:
                    fh = gzip.open(path, "wb")
                for k, ts, url, dg in zip(pdf["cdx_key"], pdf["ts14"],
                                          pdf["url"], pdf["digest"]):
                    if first is None:
                        first = k
                    fh.write(f"{k} {ts} {url} {dg}\n".encode())
                    n += 1
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame({"path": [path], "first_key": [first],
                                "n_records": [n]})

    return (arranged.select("cdx_key", "ts14", "url", "digest")
            .mapInPandas(write_parts,
                         "path string, first_key string, n_records long"))


REG: dict[str, tuple] = {
    "cdx_index": (q_cdx_index, SQL_CDX_INDEX),
    "cdx_block_index": (q_cdx_block_index, SQL_CDX_BLOCK_INDEX),
    "warc_revisit": (q_warc_revisit, SQL_WARC_REVISIT),
    "crawl_diff": (q_crawl_diff, SQL_CRAWL_DIFF),
}
