"""Sitemap ingestion: the crawl-discovery source the reference walks
around (cc-warc-examples seeds from WARC link extraction only; a
production crawler ALSO seeds from sitemaps — RFC 9309 robots files
advertise them via `Sitemap:` directives and the sitemaps.org XML
protocol lists per-URL `loc`/`lastmod`/`priority` hints that feed the
frontier's priority scorer, U11).

Two operators, both DuckDB-oracle-backed on the base tables:

* ``sitemap_parse`` — build one sitemaps.org XML blob per host from a
  deterministic projection of ``orders`` (the same build→parse round-trip
  pattern as the WARC ingest ops, warc.py: the fixture bytes are
  synthesized in-query, the PARSER is the artifact under test), then
  parse it with Spark's native ``from_xml`` (XML support is built into
  Spark 4 — no third-party package) and explode the `<url>` entries back
  into frontier-candidate rows. The oracle twin computes the expected
  rows directly from ``orders``, so the test asserts the XML round trip
  is lossless.
* ``sitemap_discover`` — extract `Sitemap:` directives from robots.txt
  bodies (multiline regex, one `regexp_extract_all` + explode; the
  production fetcher.py robots parser handles the directive's RFC 9309
  grammar — this is the bulk-analytics twin over an archived robots
  corpus).

Scale story (100 TB): sitemap blobs arrive one-per-fetch (bounded 50k
URLs / 50 MB by the protocol), so ``from_xml`` is a per-row JVM
expression inside whole-stage codegen — no shuffle at all until the
exploded candidates hit the URL-seen anti-join (seen.py), which is
keyed on url hash exactly like link-extracted candidates. The build
side here groups by host only to synthesize the fixture; a real
deployment reads the blobs from the fetch table and skips that shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import t

N_HOSTS = 200  # synthetic host id space for the sitemap fixture

_URLSET_SCHEMA = ("STRUCT<url: ARRAY<STRUCT<"
                  "loc: STRING, lastmod: STRING, priority: DOUBLE>>>")


def sitemap_xml_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sitemaps.org XML blob per host, synthesized from
    ``orders``: one `<url>` entry per order, entries in orderkey order
    (sort_array on the leading key keeps the agg map-side combinable
    and the blob bit-stable across partitionings)."""
    o = t(spark, sf_dir, "orders")
    entry = F.format_string(
        "<url><loc>https://host%d.example.com/page/%d</loc>"
        "<lastmod>%s</lastmod><priority>%.1f</priority></url>",
        F.col("o_custkey") % N_HOSTS,
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("string"),
        (F.col("o_orderkey") % 10).cast("double") / F.lit(10.0))
    return (o.select((F.col("o_custkey") % N_HOSTS).alias("host"),
                     F.struct(F.col("o_orderkey").alias("k"),
                              entry.alias("e")).alias("ent"))
            .groupBy("host")
            .agg(F.concat(
                F.lit("<urlset>"),
                F.array_join(F.transform(
                    F.array_sort(F.collect_list("ent")), lambda x: x["e"]),
                    ""),
                F.lit("</urlset>")).alias("xml")))


def parse_sitemaps(blobs: DataFrame, xml_col: str = "xml",
                   with_pos: bool = False) -> DataFrame:
    """sitemaps.org `<urlset>` parser: native ``from_xml`` (JVM
    expression, codegen-friendly) + explode — each blob row yields one
    row per `<url>` entry with the frontier-relevant hint columns.
    ``with_pos`` adds the entry's 0-based document-order position
    (``sm_pos``) for lineage tie-breaking in the crawl engine."""
    parsed = blobs.withColumn(
        "_p", F.from_xml(F.col(xml_col), _URLSET_SCHEMA))
    keep = [c for c in blobs.columns if c != xml_col]
    if with_pos:
        exploded = parsed.select(
            *keep, F.posexplode("_p.url").alias("sm_pos", "_u"))
        pos_cols = [F.col("sm_pos")]
    else:
        exploded = parsed.select(*keep, F.explode("_p.url").alias("_u"))
        pos_cols = []
    return exploded.select(
        *keep, *pos_cols,
        F.col("_u.loc").alias("loc"),
        F.col("_u.lastmod").alias("lastmod"),
        F.col("_u.priority").alias("priority"))


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build→parse round trip: per-host XML blobs exploded back into
    frontier-candidate rows; the oracle computes the same rows straight
    from ``orders``, so any parser loss/reorder/retype breaks the hash."""
    return parse_sitemaps(sitemap_xml_per_host(spark, sf_dir))


SQL_SITEMAP_PARSE = """
SELECT o_custkey % 200 AS host,
       'https://host' || (o_custkey % 200) || '.example.com/page/' ||
           o_orderkey AS loc,
       CAST(o_orderdate AS VARCHAR) AS lastmod,
       CAST(o_orderkey % 10 AS DOUBLE) / 10.0 AS priority
FROM orders
"""


def robots_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic robots.txt corpus from ``supplier``: every host gets a
    boilerplate group; every third host advertises one sitemap, every
    ninth a second (index) sitemap — so the extractor sees 0, 1, and 2
    directives per body."""
    s = t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % N_HOSTS).alias("host"),
        F.col("s_suppkey").alias("k"))
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /tmp/\nCrawl-delay: 2\n"),
        F.when(F.col("k") % 3 == 0, F.format_string(
            "Sitemap: https://host%d.example.com/sitemap.xml\n",
            F.col("host"))).otherwise(F.lit("")),
        F.when(F.col("k") % 9 == 0, F.format_string(
            "Sitemap: https://host%d.example.com/sitemap-index.xml\n",
            F.col("host"))).otherwise(F.lit("")))
    return s.select("host", "k", body.alias("body"))


def q_sitemap_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Sitemap:` directive extraction over a robots corpus: multiline
    anchored regex (RFC 9309 allows the directive anywhere in the file,
    outside any group), one row per advertised sitemap URL."""
    r = robots_bodies(spark, sf_dir)
    return (r.select(
        "host", "k",
        F.explode(F.regexp_extract_all(
            "body", F.lit(r"(?m)^Sitemap:\s*(\S+)"), F.lit(1)))
        .alias("sitemap_url")))


SQL_SITEMAP_DISCOVER = """
WITH bodies AS (
  SELECT s_suppkey % 200 AS host, s_suppkey AS k,
         'User-agent: *' || chr(10) || 'Disallow: /tmp/' || chr(10) ||
         'Crawl-delay: 2' || chr(10) ||
         CASE WHEN s_suppkey % 3 = 0
              THEN 'Sitemap: https://host' || (s_suppkey % 200) ||
                   '.example.com/sitemap.xml' || chr(10) ELSE '' END ||
         CASE WHEN s_suppkey % 9 = 0
              THEN 'Sitemap: https://host' || (s_suppkey % 200) ||
                   '.example.com/sitemap-index.xml' || chr(10) ELSE '' END
         AS body
  FROM supplier)
SELECT host, k, u.sitemap_url
FROM bodies,
     UNNEST(regexp_extract_all(body, '(?m)^Sitemap:\\s*(\\S+)', 1))
     AS u(sitemap_url)
"""


# ---------------------------------------------------------------------------
# sitemap INDEX files (<sitemapindex> — the protocol's two-level form)
# ---------------------------------------------------------------------------
# Large sites shard their sitemaps: robots advertises ONE index file
# whose <sitemap><loc> entries point at child urlsets (each itself
# bounded at 50k URLs / 50 MB). Discovery is therefore a two-level
# parse: index → child sitemap URLs → fetch → urlset parse. The fixture
# groups hosts into 20 index files; the final row set must equal the
# flat per-host parse EXACTLY — a dropped child file silently loses all
# its URLs, which is why the whole chain (index parse → child join →
# urlset parse) is under the value hash, not just the leaf parser.
#
# Scale story: the index blob is tiny (≤ 50k loc entries); the child
# join keys on host — the same key the urlset build/fetch table already
# carries — and the per-child urlset parse stays a per-row JVM
# expression. No new shuffle shape vs the flat case.

N_IDX_GROUPS = 20

_SMINDEX_SCHEMA = "STRUCT<sitemap: ARRAY<STRUCT<loc: STRING>>>"


def sitemap_index_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One <sitemapindex> blob per host GROUP (host mod N_IDX_GROUPS),
    children in host order (same map-side-combinable sort_array build
    as the urlset blobs)."""
    o = t(spark, sf_dir, "orders")
    hosts = (o.select((F.col("o_custkey") % N_HOSTS).alias("host"))
             .distinct())
    child = F.format_string(
        "<sitemap><loc>https://host%d.example.com/sitemap.xml</loc>"
        "</sitemap>", F.col("host"))
    return (hosts.select((F.col("host") % N_IDX_GROUPS).alias("grp"),
                         F.struct(F.col("host").alias("k"),
                                  child.alias("e")).alias("ent"))
            .groupBy("grp")
            .agg(F.concat(
                F.lit("<sitemapindex>"),
                F.array_join(F.transform(
                    F.array_sort(F.collect_list("ent")), lambda x: x["e"]),
                    ""),
                F.lit("</sitemapindex>")).alias("xml")))


def q_sitemap_index_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level discovery: parse the index blobs, resolve each child
    <loc> back to its host, join the child urlset blobs on host, parse
    those, and emit (grp, host, loc) — value-equal to the flat parse,
    proving the index layer loses nothing."""
    idx = sitemap_index_per_group(spark, sf_dir)
    children = (idx.withColumn("_p", F.from_xml("xml", _SMINDEX_SCHEMA))
                .select("grp", F.explode("_p.sitemap").alias("_s"))
                .select("grp", F.regexp_extract(
                    F.col("_s.loc"), r"^https://host(\d+)\.", 1)
                    .cast("bigint").alias("host")))
    blobs = sitemap_xml_per_host(spark, sf_dir)
    return (parse_sitemaps(children.join(blobs, "host"))
            .select("grp", "host", "loc"))


SQL_SITEMAP_INDEX_PARSE = """
SELECT (o_custkey % 200) % 20 AS grp,
       o_custkey % 200 AS host,
       'https://host' || (o_custkey % 200) || '.example.com/page/' ||
           o_orderkey AS loc
FROM orders
"""


REG: dict[str, tuple] = {
    "sitemap_parse": (q_sitemap_parse, SQL_SITEMAP_PARSE),
    "sitemap_index_parse": (q_sitemap_index_parse, SQL_SITEMAP_INDEX_PARSE),
    "sitemap_discover": (q_sitemap_discover, SQL_SITEMAP_DISCOVER),
}
