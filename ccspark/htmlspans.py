"""HTML → interleaved-spans ingester (the transform that PRODUCES the
input_hint documents table from raw HTML).

Port of the jsoup DOM walk in MediaNodeVisitor.java:61-139:
- element vocabulary img / a / link / video / source(parent=video) /
  iframe / embed / object;
- per-kind attribute selection: img.src+alt, a|link.href+text(),
  video.src+text(), source.src with PARENT video's dims/text,
  iframe|embed.src+text(), object.data with alt := name attr;
- 500-char truncation of every harvested text (TEXT_SIZE_LIMIT,
  MediaNodeVisitor.java:44, reduce() at :147-153);
- emission at the element's TAIL visit (post-order), so offsets follow
  document order exactly as jsoup's NodeVisitor.tail does;
- domSiblings = sibling ELEMENT count, domDepth = node depth
  (MediaNodeVisitor.java:124-126).

The regex golden vector at MediaNodeVisitor.java:178-187
("asdfsdf.mov" matches MEDIA_SUFFIX) is pinned in tests/test_htmlspans.py.

Parser: stdlib html.parser building a light DOM — no jsoup/bs4 in the
runtime. Known approximation (documented, tested): Element.text() is the
concatenated descendant text with whitespace runs collapsed to single
spaces, which matches jsoup for inline content but does not reproduce
jsoup's implied-element insertion (<html>/<head>/<body> synthesis) for
malformed documents; depth is counted from the parsed root.

Spark shape: one pandas-UDF pass (html, page_url) → spans array column;
compose with warc.warc_html_bodies for the full front door:
.warc.gz → html body → interleaved documents table → crawl engine.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

TEXT_SIZE_LIMIT = 500   # MediaNodeVisitor.java:44

#: HTML5 void elements — their tail fires immediately (no end tag)
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}

_WS_RUN = re.compile(r"\s+")


class _El:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []   # _El | str
        self.parent = parent

    def attr(self, name: str) -> str:
        # jsoup Element.attr returns "" for absent attributes
        v = self.attrs.get(name)
        return v if v is not None else ""

    def text(self) -> str:
        """jsoup-style normalized descendant text."""
        parts: list[str] = []

        def walk(el):
            for c in el.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    walk(c)
        walk(self)
        return _WS_RUN.sub(" ", "".join(parts)).strip()

    def sibling_elements(self) -> int:
        if self.parent is None:
            return 0
        return sum(1 for c in self.parent.children
                   if isinstance(c, _El)) - 1


class _Tree(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _El("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        el = _El(tag, dict(attrs), self.cur)
        self.cur.children.append(el)
        if tag not in _VOID:
            self.cur = el

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_El(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # lenient: pop to the nearest matching open element, else ignore
        node = self.cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cur = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def _reduce(s: str) -> str:
    """MediaNodeVisitor.reduce: cap at TEXT_SIZE_LIMIT ('' stays '')."""
    return s[:TEXT_SIZE_LIMIT]


def _media_fields(e: _El) -> tuple[str, str] | None:
    """(src, alt) per the per-kind rules, or None when the element kind
    emits nothing. Gating on isMediaUrl is NOT applied here — it belongs
    to extract_links (F1-F3/F6), which the engine applies downstream;
    the reference fuses both steps inside one visitor."""
    tag = e.tag
    if tag == "img":
        return e.attr("src"), e.attr("alt")
    if tag in ("a", "link"):
        return e.attr("href"), _reduce(e.text())
    if tag == "video":
        return e.attr("src"), _reduce(e.text())
    if tag == "source":
        p = e.parent
        if p is not None and p.tag == "video":
            return e.attr("src"), _reduce(p.text())
        return None
    if tag in ("iframe", "embed"):
        return e.attr("src"), _reduce(e.text())
    if tag == "object":
        return e.attr("data"), e.attr("name")
    return None


def html_to_spans_one(html: str) -> list[dict]:
    """The interleaved-span sequence of one HTML document: text nodes and
    media-vocabulary elements in tail (document) order, offset = emission
    index. Empty-src media elements emit nothing (the reference's
    isNullOrEmpty(image.src) guard, MediaNodeVisitor.java:119)."""
    tree = _Tree()
    tree.feed(html or "")
    spans: list[dict] = []

    def emit(kind: str, text: str, ref: str) -> None:
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": len(spans)})

    def walk(el: _El, depth: int) -> None:
        for c in el.children:
            if isinstance(c, str):
                t = _WS_RUN.sub(" ", c).strip()
                if t:
                    emit("text", _reduce(t), "")
            else:
                walk(c, depth + 1)
        if el.tag != "#root":
            mf = _media_fields(el)
            if mf is not None and mf[0] != "":
                emit(el.tag, mf[1], mf[0])

    walk(tree.root, 0)
    return spans


def html_to_candidates_one(html: str, page_url: str) -> list[dict]:
    """The full CCMedia-shaped emission (MediaNodeVisitor.java:119-135):
    src, alt, width/height attrs, domElement, domDepth, domSiblings,
    parent text (500-capped) — one dict per emitted media element."""
    tree = _Tree()
    tree.feed(html or "")
    out: list[dict] = []

    def walk(el: _El, depth: int) -> None:
        for c in el.children:
            if not isinstance(c, str):
                walk(c, depth + 1)
        if el.tag == "#root":
            return
        mf = _media_fields(el)
        if mf is None or mf[0] == "":
            return
        src, alt = mf
        if el.tag == "source" and el.parent is not None:
            width, height = el.parent.attr("width"), el.parent.attr("height")
        else:
            width, height = el.attr("width"), el.attr("height")
        parent_txt = ""
        if el.parent is not None and el.parent.tag != "#root":
            parent_txt = _reduce(el.parent.text())
        out.append({
            "src": src, "alt": alt, "width": width, "height": height,
            "page_url": page_url, "dom_element": el.tag,
            "dom_depth": depth, "dom_siblings": el.sibling_elements(),
            "parent_txt": parent_txt,
        })

    walk(tree.root, 0)
    return out


SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])


@F.pandas_udf(T.ArrayType(SPAN_TYPE))
def spans_udf(html: pd.Series) -> pd.Series:
    return html.map(html_to_spans_one)


def html_docs_to_spans(df: DataFrame, html_col: str = "body",
                       url_col: str = "url",
                       doc_id_col: str | None = None) -> DataFrame:
    """(doc_id, page_url, spans[, fetch_ms]) — the input_hint documents
    shape — from a DataFrame of raw HTML. doc_id defaults to the page
    url; a fetch_ms column (WARC-Date epoch millis from
    warc_html_bodies) passes through as the documents' event time."""
    doc_id = F.col(doc_id_col) if doc_id_col else F.col(url_col)
    cols = [doc_id.cast("string").alias("doc_id"),
            F.col(url_col).alias("page_url"),
            spans_udf(F.col(html_col)).alias("spans")]
    if "fetch_ms" in df.columns:
        cols.append(F.col("fetch_ms").cast("long"))
    return df.select(*cols)


def warc_to_documents(spark, warc_path: str) -> DataFrame:
    """The full front door: .warc.gz → html responses → interleaved
    documents table, ready for CrawlEngine/extract_links."""
    from .warc import warc_html_bodies, warc_records
    return html_docs_to_spans(warc_html_bodies(warc_records(spark, warc_path)))


# ---------------------------------------------------------------------------
# oracle-checked query: the htmlwarc fixture pages are generated FROM the
# documents table with a fixed template (warc.write_archive_fixtures), so
# the exact span sequence the ingester must produce is SQL-derivable —
# the DuckDB twin enumerates it per documents row.
# ---------------------------------------------------------------------------


def q_html_to_spans(spark, sf_dir):
    """Full pipeline: .warc.gz of REAL html pages → record parse → html
    gate → DOM walk → interleaved spans, exploded for comparison."""
    from .warc import _fixture_paths
    docs = warc_to_documents(spark, _fixture_paths(sf_dir)["htmlwarc"])
    return (docs
            .select(F.regexp_extract("page_url", r"/(\d+)\.html$", 1)
                    .cast("bigint").alias("doc_id"),
                    F.explode("spans").alias("sp"))
            .select("doc_id",
                    F.col("sp.offset").cast("bigint").alias("offset"),
                    F.col("sp.kind").alias("kind"),
                    F.col("sp.text").alias("text"),
                    F.col("sp.media_ref").alias("media_ref")))


_NORM_TEXT = r"substr(trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 500)"

SQL_HTML_TO_SPANS = (
    "SELECT doc_id, CAST(0 AS BIGINT) AS offset, 'text' AS kind,"
    f" {_NORM_TEXT} AS text, '' AS media_ref FROM documents"
    " UNION ALL SELECT doc_id, 1, 'text', 'see pic ' || doc_id, ''"
    " FROM documents"
    " UNION ALL SELECT doc_id, 2, 'a', 'see pic ' || doc_id,"
    "  'http://media.example.com/' || doc_id || '.jpg' FROM documents"
    " UNION ALL SELECT doc_id, 3, 'img', 'alt ' || doc_id,"
    "  '/static/' || doc_id || '.png' FROM documents"
    " UNION ALL SELECT doc_id, 4, 'text', 'clip ' || doc_id, ''"
    " FROM documents"
    " UNION ALL SELECT doc_id, 5, 'video', 'clip ' || doc_id,"
    "  'http://v.example.com/' || doc_id || '.mp4' FROM documents")

REG: dict[str, tuple] = {
    "html_to_spans": (q_html_to_spans, SQL_HTML_TO_SPANS),
}
