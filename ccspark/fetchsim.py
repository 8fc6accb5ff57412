"""Deterministic fetch simulation (SURVEY.md S8/U10).

The sandbox has no network, so the reference's 100-thread HTTP fetcher
(ProcessingService.java:44-49,329-388) becomes a deterministic synthetic
responder keyed by a cross-engine hash of the URL: md5's first 15 hex
digits (< 2^60, signed-int64 safe), the same construction the reference
uses for its fetch id (UUID.nameUUIDFromBytes == MD5,
ProcessingService.java:350-355). The pure-Python oracle computes the
identical key via hashlib, so fetch outcomes (hence crawl progression)
match bit-for-bit. In production this stage is swapped for a mapInPandas
HTTP fetcher with the same output schema.

All expressions are JVM-side (md5/conv/pmod — whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import kernels as K


def fetch_key(url_col="url"):
    return F.conv(F.substring(F.md5(F.col(url_col)), 1, 15), 16, 10).cast("long")


def fetch_key2(url_col="url"):
    """Second independent 60-bit key (md5 hex digits 17-31) — mirrors
    kernels.md5_key2_one. Drives the revisit changed/not-modified coin."""
    return F.conv(F.substring(F.md5(F.col(url_col)), 17, 15), 16, 10).cast("long")


def with_fetch_sim(scheduled: DataFrame, url_col: str = "url",
                   redirects: bool = False,
                   revisit_changed_pct: int | None = None) -> DataFrame:
    """Attach deterministic fetch outcome columns:
    status (95% → 200, else 404), content_type (by media/video suffix,
    F6/F7 predicates; else text/html), content_length, latency_ms, and
    fetch_id (full md5 — the reference's dedup key / filename analog).

    redirects=True carves a 301 band OUT OF the 404 band (key mod 100 in
    [95, 97) → 301 with a deterministic `redirect_to` = url + '/moved';
    appending keeps any URL shape valid and same-host, so robots and
    politeness apply to the target unchanged). The 200 band is untouched,
    so enabling redirects never changes a successful fetch's outcome —
    the pinned fetch_sim oracle and the redirect-off crawl ordering stay
    bit-identical. The reference follows redirects implicitly
    (HttpURLConnection setInstanceFollowRedirects default,
    ProcessingService.java:329-388); here the hop is explicit frontier
    traffic so the seen set dedups targets and ordering stays total.

    revisit_changed_pct: rows marked src_doc_id='revisit' (re-admitted by
    CrawlParams.revisit_after_rounds) whose primary band is a success
    answer 200 (changed) when a SECOND independent md5 band
    (fetch_key2 mod 100, hex digits 17-31) < revisit_changed_pct, else
    304 Not Modified — the conditional-GET outcome. First-fetch rows are
    untouched, so every pinned default oracle stays bit-identical."""
    key = fetch_key(url_col)
    url = F.col(url_col)
    is_video = url.rlike(K.SPARK_VIDEO_RE)
    is_media = url.rlike(K.SPARK_MEDIA_RE)
    band = F.pmod(F.col("fetch_key"), F.lit(100))
    if redirects:
        status = (F.when(band < 95, 200).when(band < 97, 301)
                   .otherwise(404))
    else:
        status = F.when(band < 95, 200).otherwise(404)
    if revisit_changed_pct is not None:
        band2 = F.pmod(fetch_key2(url_col), F.lit(100))
        status = F.when(
            (F.col("src_doc_id") == "revisit") & (band < 95)
            & (band2 >= revisit_changed_pct), 304).otherwise(status)
    out = (scheduled
           .withColumn("fetch_key", key)
           .withColumn("status", status))
    if redirects:
        out = out.withColumn(
            "redirect_to",
            F.when(F.col("status") == 301, F.concat(url, F.lit("/moved"))))
    return (out
            .withColumn("content_type",
                        F.when(is_video, F.lit("video/mp4"))
                        .when(is_media, F.lit("image/jpeg"))
                        .otherwise(F.lit("text/html")))
            .withColumn("content_length",
                        (F.pmod(F.col("fetch_key"), F.lit(100000)) + 1000).cast("int"))
            .withColumn("latency_ms",
                        (F.pmod(F.col("fetch_key"), F.lit(500)) + 10).cast("int"))
            .withColumn("fetch_id", F.md5(url)))


def discovered_docs(fetched: DataFrame, docs: DataFrame,
                    carry_cols: tuple = ()) -> DataFrame:
    """Scheduled-and-200 URLs that hit a document's page_url — the crawl's
    page-discovery join. Equi-join on the URL; doc side is pruned to
    (page_url, doc_id, spans) so column pruning reaches the parquet scan.

    carry_cols: extra fetched-side lineage columns (e.g. `hop` for the
    max-hops control) attached to the matched docs — the join becomes
    inner (page_url is the doc key, so cardinality is unchanged)."""
    pages = fetched.filter(F.col("status") == 200).select(
        F.col("url").alias("page_url"), *carry_cols)
    if carry_cols:
        return docs.join(pages, "page_url", "inner")
    return docs.join(pages, "page_url", "left_semi")
