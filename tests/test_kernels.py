"""Unit tests for the pure pandas/python kernels (no Spark needed).

Golden vectors come from the reference's own embedded cases
(ProcessingService.java:504-567) plus constructed '..' cases covering
ProcessingService.java:446-460.
"""

import pandas as pd
import pytest

from ccspark import kernels as K


class TestNormalize:
    def test_reference_golden_typo3temp(self):
        # ProcessingService.java:508-509 — bare relative drops the base path
        assert K.normalize_one(
            "typo3temp/pics/4eaab97c99.jpg",
            "http://www.unradio.unal.edu.co/detalle/cy/2012/cm/4/article/autismo-ii.html",
        ) == "http://www.unradio.unal.edu.co/typo3temp/pics/4eaab97c99.jpg"

    def test_reference_golden_kidneyfund(self):
        # ProcessingService.java:535-536 — rooted relative, query dropped from base
        assert K.normalize_one(
            "/images/content/pagebuilder/KAD12-Logo-Header2.png",
            "http://www2.kidneyfund.org/site/TR/WalkKADEvent/KidneyActionDay?pg=objcon&fr_id=1360&px=1504700",
        ) == "http://www2.kidneyfund.org/images/content/pagebuilder/KAD12-Logo-Header2.png"

    def test_absolute_passthrough_untouched(self):
        # the reference never reassigns imageUrl in the try branch
        u = "HTTPS://Example.COM:8080/A/B.JPG?x=1#f"
        assert K.normalize_one(u, "http://base/") == u

    def test_dotdot_pops_one_segment_per_element(self):
        # elements = ['', '/', '/pics/a.jpg'] → len 3 → pops until the
        # rfind('/')>2 guard stops it (after 2 pops here)
        assert K.normalize_one("../../pics/a.jpg", "http://h.com/d/cy/2012/x.html") \
            == "http://h.com/d/cy/pics/a.jpg"
        # with long segments all 3 pops land
        assert K.normalize_one("../../pics/a.jpg", "http://h.com/detalle/cy/2012/x.html") \
            == "http://h.com/detalle/pics/a.jpg"

    def test_dotdot_guard_stops_at_short_path(self):
        # lastIndexOf('/') > 2 guard: '/ab' (idx 0) stops popping
        assert K.normalize_one("../x.jpg", "http://h.com/ab/cd.html") \
            == "http://h.com/ab/x.jpg"

    def test_inner_dotdot_quirk(self):
        # 'a..jpg' splits into 2 elements — treated as a dotdot relative
        out = K.normalize_one("a..jpg", "http://h.com/p/q/r.html")
        assert out == "http://h.com/p/qjpg"

    def test_port_dropped_in_reconstruction(self):
        assert K.normalize_one("x.gif", "http://h.com:8080/a/b.html") \
            == "http://h.com/x.gif"

    def test_malformed_base_returns_none(self):
        assert K.normalize_one("x.gif", "notaurl") is None
        assert K.normalize_one("x.gif", "") is None

    def test_series_matches_scalar(self):
        src = pd.Series(["typo3temp/pics/a.jpg", "http://abs/x.png", "../b.gif", ""])
        page = pd.Series(["http://h.com/a/b/c.html"] * 4)
        out = K.normalize_series(src, page)
        assert out[0] == "http://h.com/typo3temp/pics/a.jpg"
        assert out[1] == "http://abs/x.png"
        assert out[2] == K.normalize_one("../b.gif", "http://h.com/a/b/c.html")
        assert out[3] is None

    def test_whitespace_strip(self):
        s = pd.Series(["http://h .com/a b.jpg\t", None])
        out = K.strip_whitespace(s)
        assert out[0] == "http://h.com/ab.jpg"
        assert out[1] == ""


class TestHostSurt:
    def test_host_java_gethost(self):
        s = pd.Series(["http://User:p@WWW.Ex.COM:8080/a?q", "http://h/", "rel/x.jpg", None])
        out = K.hosts_of(s)
        assert out[0] == "WWW.Ex.COM"
        assert out[1] == "h"
        assert out[2] is None and out[3] is None

    def test_strip_www_case_sensitive(self):
        s = pd.Series(["www.a.com", "WWW.a.com", "wwwx.com"])
        assert K.strip_www(s).tolist() == ["a.com", "WWW.a.com", "wwwx.com"]

    def test_surt(self):
        assert K.surt_one("http://www.Example.com:8080/a/b?q=1") == "com,example)/a/b?q=1"
        assert K.surt_one("nope") is None


class TestVectorizedDecompose:
    URLS = [
        "http://User:p@WWW.Ex.COM:8080/a/b?q=1#f", "http://h/", "http://h",
        "HTTPS://A.B/x?y#z", "ftp://x.y/z", "mailto:someone@host.com",
        "file:/local/path", "rel/x.jpg", "", "http://h:80?q", "http://h#f",
        "http://@h/p", "http://a@b@c/p", "jar:foo!/bar", "http://h/p?a?b",
        "notaurl", "://nohost", "http://h.com/a b",
    ]

    def test_matches_scalar_split_url(self):
        """The vectorized _decompose must equal the scalar split_url spec
        on every absolute URL, and be all-None elsewhere."""
        s = pd.Series(self.URLS)
        d = K._decompose(s)
        for i, u in enumerate(self.URLS):
            if K.is_absolute(u):
                _proto, host, path, query = K.split_url(u)
                assert d["host"][i] == host, u
                assert d["path"][i] == path, u
                assert d["query"][i] == query, u
            else:
                assert d["host"][i] is None, u

    def test_surt_series_matches_scalar(self):
        s = pd.Series(self.URLS)
        got = K.surt_series(s)
        for i, u in enumerate(self.URLS):
            assert (got[i] if pd.notna(got[i]) else None) == K.surt_one(u), u


class TestPredicates:
    def test_media_suffix_and_platforms(self):
        s = pd.Series([
            "http://a/x.JPG", "http://a/x.jpg?v=1", "plain.png",
            "http://www.youtube.com/watch?v=abc", "http://vimeo.com/12345",
            "http://www.dailymotion.com/video/x7q_clip", "http://a/x.html",
        ])
        assert K.is_media_series(s).tolist() == [True, False, True, True, True, True, False]

    def test_video(self):
        s = pd.Series(["http://a/x.mp4", "http://a/x.jpg", "http://vimeo.com/99"])
        assert K.is_video_series(s).tolist() == [True, False, True]


class TestDims:
    @pytest.mark.parametrize("url,wh", [
        ("im_350x250.jpg", (350, 250)),
        ("a250px_b", (0, 250)),
        ("x_w300", (300, 0)),
        ("p_s64_h128", (64, 128)),
        ("width=800", (800, 0)),       # 'width' contains 'w'
        ("h_900x100_w5", (5, 900)),    # 'h_900' matches first, then 'w5' overwrites w
        ("im_350x250_h9", (350, 250)), # NxM wins and breaks
        ("noop.jpg", (0, 0)),
        ("p_99999999999999x2.jpg", (0, 0)),  # Integer overflow → abort
    ])
    def test_extract_dims(self, url, wh):
        assert K.extract_dims_one(url) == wh


class TestNgrams:
    def test_url_ngrams_reference_shape(self):
        got = K.url_ngrams_one("http://ab.cd/efg.html")
        assert got == {"ab", "cd", "ef", "fg", "efg"}

    def test_extension_only_stripped_when_short(self):
        # '.verylongext' (>4 chars after dot) is NOT stripped
        assert "verylongext" in K.url_ngrams_one("aa/bb.verylongext", 2, 15)


class TestPriority:
    def test_deterministic_and_feature_sensitive(self):
        pdf = pd.DataFrame({
            "url": ["http://h/a_800x600.jpeg", "http://h/a.html"],
            "page_url": ["http://h/p.html"] * 2,
            "kind": ["img", "a"],
            "alt": ["nice photo", ""],
            "parent_txt": ["", ""],
            "dom_depth": [3, 3],
            "dom_sib": [1, 1],
        })
        p = K.priority_scores(pdf)
        assert p[0] > p[1]
        assert K.priority_scores(pdf).tolist() == p.tolist()  # bit-stable
