"""Deterministic synthetic crawl fixtures (FIXTURES.md shapes, seed=42).

Generates the interleaved `documents` table mandated by the input hint —
(doc_id, page_url, spans: array<struct<kind,text,media_ref,offset>>) —
plus `seeds` and `robots`, written as parquet via pyarrow (no Spark
needed, so the pure-Python oracle and the engine read identical bytes).

Span/link mix exercises every reference branch: absolute URLs, bare
relatives, '../' relatives, whitespace-polluted URLs
(ProcessingService.java:170-171,436-474), media-suffix and platform URLs
(MediaNodeVisitor.java:32-42), malformed URLs (dropped,
ProcessingService.java:427-429), zipfian hosts with deliberately hot
heads, cross-document page links so the crawl progresses over rounds,
and ~5% duplicate media_refs (first-wins dedup, MediaReduce.java:12-19).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KINDS_MEDIA = ["img", "a", "link", "video", "source", "iframe", "embed", "object"]
KIND_P = [0.45, 0.22, 0.05, 0.06, 0.05, 0.07, 0.05, 0.05]

WORDS = ("news crawl media image video page host link frontier seed fetch "
         "politeness robot delay queue priority span text alt title body "
         "article photo gallery press daily world sport tech").split()

MEDIA_EXTS = ["jpg", "jpeg", "png", "gif", "bmp", "mp4", "mov", "flv", "swf", "wmv"]
TLDS = ["com", "org", "net", "gr", "de"]

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])


def _hosts(rng: np.random.Generator, n_hosts: int) -> list[str]:
    hosts = [f"hot{i}.example.com" for i in range(3)]  # deliberate hot heads
    hosts += [f"h{i}.site{i % 7}.{TLDS[i % len(TLDS)]}" for i in range(n_hosts - 3)]
    return hosts


def _host_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.2  # zipf-ish
    w[:3] *= 12.0                          # hot hosts
    return w / w.sum()


def _page_url(rng: np.random.Generator, host: str, j: int) -> str:
    www = "www." if rng.random() < 0.3 else ""
    d1, d2 = rng.choice(WORDS), rng.choice(WORDS)
    return f"http://{www}{host}/{d1}/{d2}/page{j}.html"


def _text(rng: np.random.Generator, lo=2, hi=12) -> str:
    k = int(rng.integers(lo, hi))
    return " ".join(rng.choice(WORDS, size=k))


def _media_ref(rng: np.random.Generator, host: str, page_urls: list[str],
               pool: list[str]) -> str:
    """One media/link URL drawn per the FIXTURES.md proportions."""
    r = rng.random()
    ext = MEDIA_EXTS[int(rng.integers(0, len(MEDIA_EXTS)))]
    name = f"{rng.choice(WORDS)}{int(rng.integers(0, 5000))}"
    dims = ""
    dr = rng.random()
    if dr < 0.15:
        dims = f"_{int(rng.integers(100, 900))}x{int(rng.integers(100, 900))}"
    elif dr < 0.25:
        dims = f"_w{int(rng.integers(50, 800))}"
    if r < 0.06 and pool:                       # duplicate of an earlier ref
        return pool[int(rng.integers(0, len(pool)))]
    if r < 0.30:                                 # absolute media URL
        h = host if rng.random() < 0.6 else f"cdn{int(rng.integers(0, 5))}.media.net"
        u = f"http://{h}/static/{name}{dims}.{ext}"
    elif r < 0.45:                               # bare relative
        u = f"assets/{name}{dims}.{ext}"
    elif r < 0.55:                               # rooted relative
        u = f"/images/{name}{dims}.{ext}"
    elif r < 0.65:                               # ../ relative
        depth = int(rng.integers(1, 4))
        u = "../" * depth + f"pics/{name}{dims}.{ext}"
    elif r < 0.72:                               # platform URL
        vid = f"v{int(rng.integers(0, 10**6))}"
        u = rng.choice([
            f"http://www.youtube.com/watch?v={vid}",
            f"http://vimeo.com/{int(rng.integers(10**5, 10**7))}",
            f"http://www.dailymotion.com/video/x{int(rng.integers(0, 10**5))}_clip",
        ])
    elif r < 0.78:                               # whitespace-polluted
        u = f"http://{host}/sta tic/{name}.{ext}"
    elif r < 0.82:                               # malformed (must be dropped)
        u = rng.choice(["htp:/broken", "://nohost", "%%%", "//proto.less/x.jpg"])
    else:                                        # cross-doc page link
        u = page_urls[int(rng.integers(0, len(page_urls)))]
        if rng.random() < 0.3:                   # relative form of a page link
            from .kernels import split_url
            _, h, p, _ = split_url(u)
            h = h[4:] if h.startswith("www.") else h
            if h == host:
                u = p
    if isinstance(u, np.str_):
        u = str(u)
    pool.append(u)
    return u


def make_crawl_fixture(out_dir: str, n_docs: int = 500, seed: int = 42,
                       n_seeds: int | None = None) -> dict[str, str]:
    """Write documents/seeds/robots parquet under out_dir; idempotent
    (skips when the directory already holds a matching manifest)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST")
    stamp = f"v6:{n_docs}:{seed}:{n_seeds}"
    paths = {t: os.path.join(out_dir, f"{t}.parquet")
             for t in ("documents", "seeds", "robots", "sitemaps")}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            if fh.read().strip() == stamp and all(os.path.exists(p) for p in paths.values()):
                return paths

    rng = np.random.default_rng(seed)
    n_hosts = max(10, n_docs // 12)
    hosts = _hosts(rng, n_hosts)
    hw = _host_weights(n_hosts)
    host_idx = rng.choice(n_hosts, size=n_docs, p=hw)
    page_urls = [_page_url(rng, hosts[host_idx[j]], j) for j in range(n_docs)]

    doc_ids, spans_col = [], []
    pool: list[str] = []
    for j in range(n_docs):
        host = hosts[host_idx[j]]
        n_spans = int(rng.integers(8, 30))
        spans = []
        for k in range(n_spans):
            if rng.random() < 0.68:
                spans.append({"kind": "text", "text": _text(rng),
                              "media_ref": "", "offset": k})
            else:
                kind = str(rng.choice(KINDS_MEDIA, p=KIND_P))
                ref = _media_ref(rng, host, page_urls, pool)
                spans.append({"kind": kind, "text": _text(rng, 0, 6),
                              "media_ref": ref, "offset": k})
        doc_ids.append(f"doc{j:07d}")
        spans_col.append(spans)

    docs = pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "page_url": pa.array(page_urls, pa.string()),
        "spans": pa.array(spans_col, pa.list_(SPAN_TYPE)),
    })
    pq.write_table(docs, paths["documents"])

    n_seeds = n_seeds or max(20, n_docs // 5)
    seed_urls = [page_urls[int(i)] for i in rng.choice(n_docs, size=n_seeds)]
    seed_urls += [u.replace("http://", "http://www.") for u in seed_urls[:max(1, n_seeds // 10)]]
    seed_urls += seed_urls[:max(1, n_seeds // 20)]       # deliberate duplicates
    seed_urls += ["htp:/broken-seed", "not a url at all"]  # malformed → dropped (U2/U3)
    pq.write_table(pa.table({"url": pa.array(seed_urls, pa.string())}), paths["seeds"])

    delays = rng.choice([0.15, 0.15, 0.15, 1.0, 5.0, 30.0], size=n_hosts)
    disallow = []
    for i in range(n_hosts):
        r = rng.random()
        if r < 0.04:
            disallow.append(["/"])                        # disallow-all
        elif r < 0.25:
            disallow.append([f"/{rng.choice(WORDS)}/"])
        else:
            disallow.append([])
    # RFC 9309 wildcard/Allow rules for a deterministic host subset
    # (offsets avoid the 3 hot heads): every 11th host disallows all
    # .html via wildcard+anchor but re-allows /sm/extra (allow rule is
    # LONGER than the disallow, so it wins the longest-match tie-break);
    # every 13th adds a mid-path '*' disallow.
    allow: list[list[str]] = []
    for i in range(n_hosts):
        if i == 1:
            # hot head: wildcard+anchor disallow that provably FIRES
            # (hot1 carries many page1*.html pages), with an equal-length
            # allow exercising the tie → allow (least restrictive) rule
            disallow[i] = disallow[i] + ["/*/page1*.html$"]
            allow.append(["/*/page11*.html$"])
        elif (i + 5) % 11 == 0:
            disallow[i] = disallow[i] + ["/*.html$"]
            allow.append(["/sm/extra"])
        elif (i + 7) % 13 == 0:
            disallow[i] = disallow[i] + [f"/{WORDS[i % len(WORDS)]}/*/"]
            allow.append([])
        else:
            allow.append([])
    robots = pa.table({
        "host": pa.array(hosts, pa.string()),
        "crawl_delay": pa.array(delays, pa.float64()),
        "disallow": pa.array(disallow, pa.list_(pa.string())),
        "allow": pa.array(allow, pa.list_(pa.string())),
        # fixed deterministic cache timestamp (U12 robots-cache schema)
        "fetched_at": pa.array([1767225600000] * n_hosts, pa.timestamp("ms")),
    })
    pq.write_table(robots, paths["robots"])

    # sitemaps.org XML blob for every third host: a mix of pages the link
    # graph already reaches (dup discovery must be dedup'd) and /sm/
    # extras reachable ONLY via the sitemap (the feature's observable
    # effect). A FRESH rng keeps the draws above byte-identical to v3.
    smrng = np.random.default_rng(seed + 7)
    by_host: dict[str, list[str]] = {}
    for j, u in enumerate(page_urls):
        by_host.setdefault(hosts[host_idx[j]], []).append(u)
    sm_hosts, sm_urls, sm_xml = [], [], []
    for i, host in enumerate(hosts):
        if i % 3 != 0:
            continue
        own = by_host.get(host, [])
        n_known = int(smrng.integers(0, min(3, len(own)) + 1))
        known = [own[int(k)] for k in
                 smrng.choice(len(own), size=n_known, replace=False)] if n_known else []
        extras = [f"http://{host}/sm/extra{i}_{k}.html"
                  for k in range(int(smrng.integers(1, 4)))]
        entries = "".join(
            f"<url><loc>{u}</loc><lastmod>2026-01-{(k % 28) + 1:02d}</lastmod>"
            f"<priority>0.{(k % 9) + 1}</priority></url>"
            for k, u in enumerate(known + extras))
        sm_hosts.append(host)
        sm_urls.append(f"http://{host}/sitemap.xml")
        sm_xml.append(f"<urlset>{entries}</urlset>")
    pq.write_table(pa.table({
        "host": pa.array(sm_hosts, pa.string()),
        "sitemap_url": pa.array(sm_urls, pa.string()),
        "xml": pa.array(sm_xml, pa.string()),
    }), paths["sitemaps"])

    with open(manifest, "w") as fh:
        fh.write(stamp)
    return paths


#: sf directory name → fixture size (used by the driver-facing queries()).
SF_DOCS = {"0.001": 500, "0.01": 5000, "0.1": 50000}


def fixture_for_sf(sf_dir: str, base: str | None = None) -> dict[str, str]:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = SF_DOCS.get(sf, 500)
    if base is None:
        base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "fixtures")
    out = os.path.join(base, f"sf{sf}")
    return make_crawl_fixture(out, n_docs=n)
