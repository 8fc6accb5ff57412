"""HTML→spans ingester: MediaNodeVisitor.java:61-139 port semantics."""

from __future__ import annotations

import re

from ccspark.htmlspans import (TEXT_SIZE_LIMIT, html_to_candidates_one,
                               html_to_spans_one)
from ccspark.kernels import MEDIA_SUFFIX_RE


def test_media_suffix_golden_vector():
    """MediaNodeVisitor.java:178-187 main(): 'asdfsdf.mov' matches the
    media-suffix pattern (Java String.matches == fullmatch)."""
    assert re.fullmatch(MEDIA_SUFFIX_RE, "asdfsdf.mov")
    assert not re.fullmatch(MEDIA_SUFFIX_RE, "asdfsdf.mov.txt")


class TestSpanWalk:
    def test_tail_order_and_offsets(self):
        html = ("<html><body><p>hello world</p>"
                "<a href=\"http://x/p.jpg\">pic</a>"
                "<img src=\"a.png\" alt=\"A\">"
                "<div><video src=\"v.mp4\">clip</video></div>"
                "</body></html>")
        spans = html_to_spans_one(html)
        assert [(s["offset"], s["kind"], s["media_ref"]) for s in spans] == [
            (0, "text", ""),
            (1, "text", ""),
            (2, "a", "http://x/p.jpg"),
            (3, "img", "a.png"),
            (4, "text", ""),
            (5, "video", "v.mp4"),
        ]
        assert spans[0]["text"] == "hello world"
        assert spans[2]["text"] == "pic"       # a → reduce(e.text())
        assert spans[3]["text"] == "A"         # img → alt attr

    def test_empty_src_emits_nothing(self):
        """isNullOrEmpty(image.src) guard (MediaNodeVisitor.java:119)."""
        spans = html_to_spans_one("<img alt=\"x\"><a href=\"\">t</a>"
                                  "<video></video>")
        assert [s["kind"] for s in spans] == ["text"]   # only the 't'

    def test_source_requires_video_parent(self):
        """<source> only emits under a <video> parent
        (MediaNodeVisitor.java:100-106), carrying the PARENT's text."""
        spans = html_to_spans_one(
            "<video width=\"1\">cap<source src=\"s.mp4\"></video>"
            "<audio><source src=\"ignored.mp3\"></audio>")
        kinds = [(s["kind"], s["media_ref"]) for s in spans]
        assert ("source", "s.mp4") in kinds
        assert ("source", "ignored.mp3") not in kinds
        src_span = next(s for s in spans if s["kind"] == "source")
        assert src_span["text"] == "cap"

    def test_object_uses_data_and_name(self):
        """object → data attr as src, name attr as alt
        (MediaNodeVisitor.java:108-114)."""
        cands = html_to_candidates_one(
            "<object data=\"movie.swf\" name=\"My Movie\"></object>", "http://p")
        assert cands == [{
            "src": "movie.swf", "alt": "My Movie", "width": "", "height": "",
            "page_url": "http://p", "dom_element": "object", "dom_depth": 1,
            "dom_siblings": 0, "parent_txt": "",
        }]

    def test_text_truncation_500(self):
        """reduce() caps harvested text at 500 chars
        (MediaNodeVisitor.java:44,147-153)."""
        long_txt = "x" * 800
        spans = html_to_spans_one(
            f"<a href=\"http://x/p.jpg\">{long_txt}</a>")
        a = next(s for s in spans if s["kind"] == "a")
        assert len(a["text"]) == TEXT_SIZE_LIMIT

    def test_candidates_dims_from_video_parent(self):
        """<source> takes width/height from the parent video
        (MediaNodeVisitor.java:100-106)."""
        cands = html_to_candidates_one(
            "<video width=\"320\" height=\"240\">"
            "<source src=\"s.mp4\"></video>", "http://p")
        src = next(c for c in cands if c["dom_element"] == "source")
        assert (src["width"], src["height"]) == ("320", "240")

    def test_sibling_and_depth_counts(self):
        """domSiblings = sibling ELEMENT count (excluding self), domDepth
        = node depth (MediaNodeVisitor.java:124-126)."""
        cands = html_to_candidates_one(
            "<div><span>a</span><img src=\"i.png\"><b>c</b></div>", "http://p")
        img = cands[0]
        assert img["dom_siblings"] == 2
        assert img["dom_depth"] == 2

    def test_whitespace_normalized_like_jsoup(self):
        spans = html_to_spans_one("<p>a\n\n  b\tc </p>")
        assert spans[0]["text"] == "a b c"


class TestSparkPlumbing:
    def test_warc_to_documents_roundtrip(self, spark, tmp_path):
        """.warc.gz → documents table: spans survive Spark's array<struct>
        columnar round trip in exact document order (input_hint span-
        sequence invariant on INGESTED docs)."""
        from ccspark.htmlspans import warc_to_documents
        from ccspark.warc import RESPONSE_MIME, _gz_member, _record

        html = ("<html><body><p>hello world</p>"
                "<img src=\"a.png\" alt=\"A\"></body></html>")
        http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html).encode()
        p = tmp_path / "one.warc.gz"
        p.write_bytes(_gz_member(_record("response", "http://h/1.html",
                                         RESPONSE_MIME, http)))
        docs = warc_to_documents(spark, str(p)).collect()
        assert len(docs) == 1
        spans = [(s.offset, s.kind, s.text, s.media_ref)
                 for s in docs[0].spans]
        assert spans == [(0, "text", "hello world", ""),
                         (1, "img", "A", "a.png")]
