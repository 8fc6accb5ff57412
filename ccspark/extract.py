"""Spans → candidate links (SURVEY.md X3, the graft pivot).

The reference parses HTML with jsoup and walks the DOM
(MediaMap.java:49-66, MediaNodeVisitor.java:61-139); our input is already
the interleaved-spans table, so extraction is a pure JVM-side plan:
explode + per-kind predicates + column logic. No Python here at all.

Per-kind emission spec (must equal ccspark.oracle.extract_links_py):
- img / video / source    → emit when media_ref non-empty
- a / link                → emit when non-empty AND (isMediaUrl OR follow_links)
- iframe / embed / object → emit when non-empty AND isMediaUrl
The isMediaUrl predicate is the reference's full-match suffix+platform
regex set (MediaNodeVisitor.java:32-42,159-168), applied to the RAW href
before normalization, exactly as the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import kernels as K

ALWAYS_KINDS = ("img", "video", "source")
LINK_KINDS = ("a", "link")
MEDIA_ONLY_KINDS = ("iframe", "embed", "object")


def extract_links(docs: DataFrame, follow_links: bool = True) -> DataFrame:
    """documents(doc_id, page_url, spans) → one row per extracted link.

    Output: url_raw, page_url, kind, alt, parent_txt, dom_depth, dom_sib,
    src_doc_id, offset, event_ms. Flat-span field mapping per SURVEY.md
    §1.4: alt := span.text (≤500 chars, MediaNodeVisitor.java:44,146-152),
    dom_depth := span.offset, dom_sib := size(spans)-1.

    event_ms is the candidate's event time (epoch millis): the fetch time
    of the page the link was found on, carried from a `fetch_ms` column on
    docs when present (the WARC ingest stamps WARC-Date there), else null.
    Streaming watermarks key off it (ccspark.streaming.discovery_rate);
    the batch scheduler ignores it.
    """
    event_ms = (F.col("fetch_ms").cast("long") if "fetch_ms" in docs.columns
                else F.lit(None).cast("long"))
    sp = F.col("sp")
    # max-hops lineage: when the discovery join carried the source page's
    # hop (discovered_docs carry_cols), every extracted link is hop + 1
    hop_cols = ([(F.col("hop") + F.lit(1)).cast("int").alias("hop")]
                if "hop" in docs.columns else [])
    exploded = docs.select(
        F.col("doc_id").alias("src_doc_id"),
        "page_url",
        (F.size("spans") - F.lit(1)).alias("dom_sib"),
        event_ms.alias("event_ms"),
        *hop_cols,
        F.explode("spans").alias("sp"),
    )
    ref = sp.getField("media_ref")
    kind = sp.getField("kind")
    is_media = ref.rlike(K.SPARK_MEDIA_RE)
    keep = (
        kind.isin(*ALWAYS_KINDS)
        | (kind.isin(*LINK_KINDS) & (is_media | F.lit(follow_links)))
        | (kind.isin(*MEDIA_ONLY_KINDS) & is_media)
    )
    return (
        exploded
        .filter((kind != F.lit("text")) & ref.isNotNull() & (ref != F.lit("")))
        .filter(keep)
        .select(
            ref.alias("url_raw"),
            "page_url",
            kind.alias("kind"),
            F.substring(sp.getField("text"), 1, 500).alias("alt"),
            F.lit("").alias("parent_txt"),
            sp.getField("offset").cast("int").alias("dom_depth"),
            F.col("dom_sib").cast("int"),
            "src_doc_id",
            sp.getField("offset").cast("int").alias("offset"),
            "event_ms",
            *(["hop"] if hop_cols else []),
        )
    )


def tag_like_counts(docs: DataFrame) -> DataFrame:
    """A1 analog over spans: kind frequencies (the reference's tag counter
    shape, WARCTagCounter.java:40-69, re-expressed on interleaved spans)."""
    return (
        docs.select(F.explode("spans").alias("sp"))
        .groupBy(F.col("sp.kind").alias("kind"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
