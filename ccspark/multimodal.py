"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns. The container has
no decode libraries, so the decode step is a clearly-marked deterministic
fake behind the same batch interface a real decoder would use — the
Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partition behavior) is real and oracle-checked:

- `q_media_decode` runs a mapInPandas "decoder" over binary payloads
  synthesized from the documents table, emitting typed metadata rows;
- `decode_image_real` is the production hook and raises
  NotImplementedError (no PIL/ffmpeg in-container).

At 100 TB the payload column dominates storage; the plan keeps it pruned
(the scan reads only doc_id+text here; a real table would store payloads
in their own parquet column chunk, read only by the decode stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from .analytics import t

DECODE_SCHEMA = ("doc_id bigint, n_bytes bigint, fake_width bigint, "
                 "fake_height bigint, n_frames bigint")


def decode_image_real(payload: bytes) -> dict:
    """Production decode hook (PIL/libvips). Not available in-container."""
    raise NotImplementedError(
        "image decode requires PIL/libvips, not installed in this container; "
        "the pipeline uses the deterministic fake below")


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


REG: dict[str, tuple] = {
    "media_decode": (q_media_decode, SQL_MEDIA_DECODE),
    "media_frame_sample": (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE),
}
