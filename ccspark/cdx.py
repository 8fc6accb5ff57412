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


REG: dict[str, tuple] = {
    "cdx_index": (q_cdx_index, SQL_CDX_INDEX),
    "cdx_block_index": (q_cdx_block_index, SQL_CDX_BLOCK_INDEX),
}
