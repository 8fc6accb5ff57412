"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns, decoded and
feature-extracted inside mapInPandas Arrow batches.

Two decode tiers (both oracle-checked at value level):

- **Real codecs** (r4, ccspark/imagecodec.py): PNG — chunk walk, CRC-32
  verification, zlib inflate, full five-filter scanline reconstruction —
  and RIFF/WAV PCM16 via the stdlib `wave` module. `q_media_png_decode`,
  `q_media_png_hist`, `q_media_png_resize` and `q_media_wav_features`
  synthesize *genuine container bytes* per document (pixels/samples from
  a documented closed-form formula), run the real decoder, and compute
  stats from the DECODED buffer — so the DuckDB twin (the same formula
  in SQL) verifies the codec itself, end to end, at value level.
- **Deterministic fake** (`q_media_decode`): the r3 stand-in for formats
  that need a native library (JPEG/WebP/H.264 — no PIL/ffmpeg in this
  container); kept because it pins the batch-interface contract a native
  decoder drops into.

At 100 TB the payload column dominates storage; the plan keeps it pruned
(the scan reads only doc_id here; a real table stores payloads in their
own parquet column chunk, read only by the decode stage). Decode work is
embarrassingly parallel per document — no shuffle anywhere except the
12-key histogram aggregation, which partial-aggregates map-side.

Reference parity: ImageVectorization.java / IndexingManager.java consume
javax.imageio pixel buffers; q_media_png_decode is the Spark-side stage
that produces those buffers (cited for parity, not ported).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .analytics import t
from .imagecodec import decode_media, png_decode, png_encode, wav_decode, \
    wav_encode

DECODE_SCHEMA = ("doc_id bigint, n_bytes bigint, fake_width bigint, "
                 "fake_height bigint, n_frames bigint")


def decode_image_real(payload: bytes):
    """Production decode hook. PNG and WAV decode for real in-container
    (imagecodec.decode_media); native-library formats still raise."""
    return decode_media(payload)


# --------------------------------------------------------------------------
# deterministic payload synthesis (the closed form IS the oracle)
# --------------------------------------------------------------------------
# image: w = 8 + doc_id % 5, h = 6 + doc_id % 4,
#        px(r, c, ch) = (doc_id*31 + r*7 + c*3 + ch*11) % 256
# audio: n = 64 + doc_id % 33, v(i) = ((doc_id*13 + i*37) % 4096) - 2048

def synth_image(doc_id: int) -> np.ndarray:
    w, h = 8 + doc_id % 5, 6 + doc_id % 4
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((doc_id * 31 + r * 7 + c * 3 + ch * 11) % 256).astype(np.uint8)


def synth_samples(doc_id: int) -> np.ndarray:
    i = np.arange(64 + doc_id % 33, dtype=np.int64)
    return (((doc_id * 13 + i * 37) % 4096) - 2048).astype(np.int16)


_PX_CTE = (
    "WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h"
    "           FROM documents),"
    " px AS (SELECT doc_id, w, h,"
    "               (doc_id*31 + r.r*7 + c.c*3 + ch.ch*11) % 256 AS p,"
    "               r.r AS r, c.c AS c, ch.ch AS ch"
    "        FROM d,"
    "        LATERAL (SELECT unnest(generate_series(0, h-1)) AS r) r,"
    "        LATERAL (SELECT unnest(generate_series(0, w-1)) AS c) c,"
    "        LATERAL (SELECT unnest(generate_series(0, 2)) AS ch) ch)")


def _decode_batches(batches: Iterator[pd.DataFrame]):
    """Shared encode→REAL-decode loop: yields (doc_id, decoded array).
    The encode side cycles all five PNG filter types (imagecodec), and
    odd doc_ids encode Adam7-INTERLACED (r5) — so every document
    exercises the full unfilter spec and half the corpus exercises the
    seven-pass de-interlacer, all against the same pixel-formula oracle
    (lossless: the twin SQL is unchanged)."""
    for pdf in batches:
        for doc_id in pdf["doc_id"].astype("int64"):
            i = int(doc_id)
            yield i, png_decode(
                png_encode(synth_image(i), interlace=bool(i % 2)))


def q_media_png_decode(spark, sf_dir):
    """Real PNG decode: synthesize genuine PNG bytes per document, decode
    them with the in-repo codec (CRC walk + inflate + five-filter
    reconstruction), and emit stats OF THE DECODED PIXELS. The oracle
    computes the same stats from the pixel formula — any codec defect
    (filter math, chunk framing, stride) breaks the value hash."""
    docs = t(spark, sf_dir, "documents").select("doc_id")

    def decode(batches):
        for pdf in batches:
            out = []
            for doc_id, arr in _decode_batches(iter([pdf])):
                out.append((doc_id, arr.shape[1], arr.shape[0],
                            int(arr.astype(np.int64).sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"])

    return docs.mapInPandas(
        decode, schema="doc_id bigint, width bigint, height bigint, "
                       "pix_sum bigint")


SQL_MEDIA_PNG_DECODE = (
    _PX_CTE +
    " SELECT doc_id, w AS width, h AS height,"
    " CAST(SUM(p) AS BIGINT) AS pix_sum"
    " FROM px GROUP BY doc_id, w, h")


def q_media_png_hist(spark, sf_dir):
    """Feature extraction over decoded pixels: corpus-wide 4-bin
    per-channel histogram. Each Arrow batch emits 12 partial-count rows
    (np.bincount over the decoded buffer), then a 12-key groupBy sums —
    map-side partial aggregation, shuffle moves O(batches × 12) rows."""
    docs = t(spark, sf_dir, "documents").select("doc_id")

    def hist(batches):
        for pdf in batches:
            counts = np.zeros((3, 4), dtype=np.int64)
            for _doc_id, arr in _decode_batches(iter([pdf])):
                for chn in range(3):
                    counts[chn] += np.bincount(
                        arr[:, :, chn].ravel() >> 6, minlength=4)
            yield pd.DataFrame(
                [(chn, b, int(counts[chn, b]))
                 for chn in range(3) for b in range(4)],
                columns=["ch", "bin", "cnt"])

    return (docs.mapInPandas(hist, schema="ch bigint, bin bigint, cnt bigint")
            .groupBy("ch", "bin").agg(F.sum("cnt").alias("cnt")))


SQL_MEDIA_PNG_HIST = (
    _PX_CTE +
    " SELECT ch, p // 64 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt"
    " FROM px GROUP BY ch, p // 64")

_OUT_H, _OUT_W = 3, 4


def q_media_png_resize(spark, sf_dir):
    """Nearest-neighbor resize of the decoded image to a fixed 3×4
    thumbnail (numpy index gather over the decoded buffer; src index
    (r_out*h)//3, (c_out*w)//4), emitting the thumbnail pixel sum."""
    docs = t(spark, sf_dir, "documents").select("doc_id")

    def resize(batches):
        for pdf in batches:
            out = []
            for doc_id, arr in _decode_batches(iter([pdf])):
                h, w, _ = arr.shape
                ri = (np.arange(_OUT_H) * h) // _OUT_H
                ci = (np.arange(_OUT_W) * w) // _OUT_W
                thumb = arr[np.ix_(ri, ci)]
                out.append((doc_id, int(thumb.astype(np.int64).sum())))
            yield pd.DataFrame(out, columns=["doc_id", "thumb_sum"])

    return docs.mapInPandas(resize,
                            schema="doc_id bigint, thumb_sum bigint")


SQL_MEDIA_PNG_RESIZE = (
    "WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h"
    "           FROM documents),"
    " tp AS (SELECT doc_id,"
    "   (doc_id*31 + ((ro.ro*h)//3)*7 + ((co.co*w)//4)*3 + ch.ch*11) % 256"
    "     AS p"
    "   FROM d,"
    "   LATERAL (SELECT unnest(generate_series(0, 2)) AS ro) ro,"
    "   LATERAL (SELECT unnest(generate_series(0, 3)) AS co) co,"
    "   LATERAL (SELECT unnest(generate_series(0, 2)) AS ch) ch)"
    " SELECT doc_id, CAST(SUM(p) AS BIGINT) AS thumb_sum"
    " FROM tp GROUP BY doc_id")


def synth_jpeg_blocks(doc_id: int) -> np.ndarray:
    """Block-constant synthesis for the JPEG oracle: every 8×8 block of
    each channel holds one value from a closed-form formula, so the
    baseline-DCT round-trip is BIT-EXACT (jpegcodec module docstring:
    AC quantizes to 0, DC step 8 preserves the level-shifted value) and
    the DuckDB twin states decoded stats from the formula directly."""
    w, h = 8 * (2 + doc_id % 3), 8 * (1 + doc_id % 2)
    bi = np.arange(h // 8, dtype=np.int64)[:, None, None]
    bj = np.arange(w // 8, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    blocks = (doc_id * 37 + bi * 17 + bj * 29 + ch * 53) % 256
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)


def q_media_jpeg_decode(spark, sf_dir):
    """Real baseline-JPEG decode (jpegcodec: marker walk, stream-parsed
    DQT/DHT, Huffman + DC-prediction entropy decode with byte
    unstuffing, dequantize, IDCT): synthesize genuine JFIF bytes per
    document, decode them with the in-repo codec, and emit stats OF THE
    DECODED PIXELS. On the block-constant profile the round-trip is
    exact, so any codec defect (table parsing, Huffman walk, zigzag,
    IDCT, MCU raster) breaks the value hash against the formula twin."""
    from .jpegcodec import jpeg_decode, jpeg_encode
    docs = t(spark, sf_dir, "documents").select("doc_id")

    def decode(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"].astype("int64"):
                arr = jpeg_decode(jpeg_encode(synth_jpeg_blocks(int(doc_id))))
                out.append((int(doc_id), arr.shape[1], arr.shape[0],
                            int(arr.astype(np.int64).sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"])

    return docs.mapInPandas(
        decode, schema="doc_id bigint, width bigint, height bigint, "
                       "pix_sum bigint")


SQL_MEDIA_JPEG_DECODE = (
    "WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh"
    "           FROM documents),"
    " px AS (SELECT doc_id, bw, bh,"
    "   (doc_id*37 + bi.bi*17 + bj.bj*29 + ch.ch*53) % 256 AS p"
    "   FROM d,"
    "   LATERAL (SELECT unnest(generate_series(0, bh-1)) AS bi) bi,"
    "   LATERAL (SELECT unnest(generate_series(0, bw-1)) AS bj) bj,"
    "   LATERAL (SELECT unnest(generate_series(0, 2)) AS ch) ch)"
    " SELECT doc_id, 8 * bw AS width, 8 * bh AS height,"
    "  CAST(64 * SUM(p) AS BIGINT) AS pix_sum"
    " FROM px GROUP BY doc_id, bw, bh")


def q_media_wav_features(spark, sf_dir):
    """Real audio decode: synthesize RIFF/WAV PCM16 bytes per document
    (stdlib wave), decode them back, and compute features of the DECODED
    samples — length, energy (sum of squares, exact integer), and
    zero-crossing count. Oracle = the sample formula in SQL."""
    docs = t(spark, sf_dir, "documents").select("doc_id")

    def feats(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"].astype("int64"):
                payload = wav_encode(synth_samples(int(doc_id)))
                v, _rate = wav_decode(payload)
                v = v.astype(np.int64)
                zc = int(np.sum((v[:-1] < 0) != (v[1:] < 0)))
                out.append((int(doc_id), len(v), int(np.sum(v * v)), zc))
            yield pd.DataFrame(out, columns=["doc_id", "n_samples",
                                             "energy", "zero_crossings"])

    return docs.mapInPandas(
        feats, schema="doc_id bigint, n_samples bigint, energy bigint, "
                      "zero_crossings bigint")


SQL_MEDIA_WAV_FEATURES = (
    "WITH d AS (SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),"
    " s AS (SELECT doc_id, i.i AS i,"
    "              ((doc_id*13 + i.i*37) % 4096) - 2048 AS v"
    "       FROM d,"
    "       LATERAL (SELECT unnest(generate_series(0, n-1)) AS i) i),"
    " lg AS (SELECT doc_id, v,"
    "               LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev"
    "        FROM s)"
    " SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,"
    "        CAST(SUM(v*v) AS BIGINT) AS energy,"
    "        CAST(SUM(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (v < 0)"
    "                      THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings"
    " FROM lg GROUP BY doc_id")


def _fake_decode(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decoder: metadata derived from payload length.
    Stands in for a vectorized batch decoder with the same signature."""
    n = payloads.map(len).astype("int64")
    return pd.DataFrame({
        "n_bytes": n,
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "n_frames": n % 30,
    })


def q_media_decode(spark, sf_dir):
    """Binary payload → typed metadata via mapInPandas (Arrow batches).
    Payload synthesized as the utf-8 bytes of the text column."""
    docs = (t(spark, sf_dir, "documents")
            .select("doc_id", F.col("text").cast("binary").alias("payload")))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _fake_decode(pdf["payload"])
            meta.insert(0, "doc_id", pdf["doc_id"].astype("int64"))
            yield meta

    return docs.mapInPandas(decode, schema=DECODE_SCHEMA)


# the fake decode is pure arithmetic on byte length — SQL-expressible, so
# even the multimodal plumbing gets a full value-level oracle
SQL_MEDIA_DECODE = (
    "SELECT doc_id, n_bytes, n_bytes % 640 AS fake_width,"
    " (n_bytes * 7) % 480 AS fake_height, n_bytes % 30 AS n_frames"
    " FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes"
    "       FROM documents)")


def q_media_frame_sample(spark, sf_dir):
    """Frame-sampling plan shape: explode a deterministic frame index list
    per 'video' payload (every 10th frame), typed metadata per frame."""
    meta = q_media_decode(spark, sf_dir)
    return (meta.filter(F.col("n_frames") > 0)
            .select("doc_id", "n_frames",
                    F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                         F.lit(10))).alias("frame_idx"))
            .withColumn("frame_idx", F.col("frame_idx").cast("bigint")))


SQL_MEDIA_FRAME_SAMPLE = (
    "SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 10))"
    "  AS frame_idx"
    " FROM (" + SQL_MEDIA_DECODE + ") WHERE n_frames > 0")


# --------------------------------------------------------------------------
# magic-byte MIME sniffing
# --------------------------------------------------------------------------
# A crawler cannot trust Content-Type headers (F4 filters on what the
# SERVER claims; misconfigured servers label PNGs text/html and WARC
# payloads carry no header at all) — production pipelines re-derive the
# type from the payload's leading bytes, exactly like `file(1)` /
# Apache Tika's magic pass. Signatures (all public, from the format
# specs): PNG 89504E47, JPEG FFD8FF, GIF 47494638, RIFF….WAVE,
# %PDF 25504446, gzip 1F8B, else application/octet-stream.
#
# The fixture synthesizes one payload per document — a real signature
# prefix chosen by doc_id mod 7 followed by deterministic filler — and
# the sniffer reads ONLY the payload bytes (never the synthesis key), so
# a wrong signature table or offset breaks the oracle hash. Everything
# is JVM expressions on BINARY (unhex/substring/hex): zero shuffle,
# whole-stage codegen — at 100 TB this runs inside the ingest scan at
# wire speed, which is why it must not be a UDF.

_MIME_SIGS = [  # (synth kind id, prefix hex, sniffed mime)
    (0, "89504E470D0A1A0A", "image/png"),
    (1, "FFD8FFE000104A46", "image/jpeg"),
    (2, "4749463839614141", "image/gif"),
    (3, "524946465858585857415645", "audio/x-wav"),  # RIFFxxxxWAVE
    (4, "255044462D312E37", "application/pdf"),
    (5, "1F8B080000000000", "application/gzip"),
    (6, "48656C6C6F20776F", "application/octet-stream"),  # plain text
]


def q_media_mime_sniff(spark, sf_dir):
    """Payload-derived MIME per document: synthesize payload =
    signature-prefix(doc_id mod 7) || 'body', sniff the type back from
    the BYTES with the magic table, and emit (doc_id, mime, n_bytes).
    Sniff order matters (longest/most-specific first is unnecessary
    here because the signatures are disjoint, but RIFF checks bytes 9-12
    too — the container id alone is not WAV)."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    prefix = F.lit(None).cast("string")
    for k, hx, _ in reversed(_MIME_SIGS):
        prefix = F.when(F.col("doc_id") % 7 == k, F.lit(hx)).otherwise(prefix)
    payload = F.concat(F.unhex(prefix),
                       F.encode(F.concat(F.lit("body"),
                                         F.col("doc_id").cast("string")),
                                "UTF-8"))
    d = d.withColumn("payload", payload)
    head8 = F.hex(F.expr("substring(payload, 1, 8)"))
    riff = ((F.hex(F.expr("substring(payload, 1, 4)")) == "52494646")
            & (F.hex(F.expr("substring(payload, 9, 4)")) == "57415645"))
    mime = (F.when(head8.startswith("89504E470D0A1A0A"), "image/png")
            .when(head8.startswith("FFD8FF"), "image/jpeg")
            .when(head8.startswith("474946383"), "image/gif")
            .when(riff, "audio/x-wav")
            .when(head8.startswith("25504446"), "application/pdf")
            .when(head8.startswith("1F8B"), "application/gzip")
            .otherwise("application/octet-stream"))
    return d.select("doc_id", mime.alias("mime"),
                    F.length("payload").cast("bigint").alias("n_bytes"))


SQL_MEDIA_MIME_SNIFF = (
    "WITH p AS (SELECT doc_id,"
    "  CASE doc_id % 7"
    + "".join(f" WHEN {k} THEN '{hx}'" for k, hx, _ in _MIME_SIGS) +
    "  END AS hx FROM documents),"
    " b AS (SELECT doc_id,"
    "   unhex(hx) || encode('body' || CAST(doc_id AS VARCHAR)) AS payload"
    "  FROM p),"
    # DuckDB has no BLOB substring — slice the hex transcript instead
    # (byte k..k+n ≡ hex chars 2k-1..2(k+n)); identical to Spark's
    # hex(substring(payload, ...)) comparisons
    " hx AS (SELECT doc_id, payload, hex(payload) AS h FROM b)"
    " SELECT doc_id,"
    "  CASE"
    "   WHEN substring(h, 1, 16) LIKE '89504E470D0A1A0A%'"
    "        THEN 'image/png'"
    "   WHEN substring(h, 1, 6) = 'FFD8FF' THEN 'image/jpeg'"
    "   WHEN substring(h, 1, 9) = '474946383' THEN 'image/gif'"
    "   WHEN substring(h, 1, 8) = '52494646'"
    "    AND substring(h, 17, 8) = '57415645' THEN 'audio/x-wav'"
    "   WHEN substring(h, 1, 8) = '25504446' THEN 'application/pdf'"
    "   WHEN substring(h, 1, 4) = '1F8B' THEN 'application/gzip'"
    "   ELSE 'application/octet-stream' END AS mime,"
    "  CAST(octet_length(payload) AS BIGINT) AS n_bytes"
    " FROM hx")


REG: dict[str, tuple] = {
    "media_mime_sniff": (q_media_mime_sniff, SQL_MEDIA_MIME_SNIFF),
    "media_decode": (q_media_decode, SQL_MEDIA_DECODE),
    "media_frame_sample": (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE),
    "media_png_decode": (q_media_png_decode, SQL_MEDIA_PNG_DECODE),
    "media_jpeg_decode": (q_media_jpeg_decode, SQL_MEDIA_JPEG_DECODE),
    "media_png_hist": (q_media_png_hist, SQL_MEDIA_PNG_HIST),
    "media_png_resize": (q_media_png_resize, SQL_MEDIA_PNG_RESIZE),
    "media_wav_features": (q_media_wav_features, SQL_MEDIA_WAV_FEATURES),
}
