"""WARC / WET / WAT ingestion — the engine's front door for raw
Common-Crawl-shaped archives.

Spark shape: `spark.read.format("binaryFile")` gives ONE ROW PER .gz
FILE (binaryFile never splits), mirroring the reference's
one-ArchiveReader-per-file record reader (WARCFileRecordReader.java:
30-75 — each compressed file becomes a single ArchiveReader that a
single mapper iterates). Common Crawl ships ~1 GB segment files in
64k-file manifests, so file granularity IS the natural parallelism at
cluster scale; the record parser runs inside mapInPandas and streams
record batches out without collecting a file's records driver-side.

Record semantics ported:
- record iteration + per-record leniency (errors counted, never fatal):
  WARCFileRecordReader.java:30-75, TagCounterMap.java:62-66
- response gate `application/http; msgtype=response`, header/body split
  at the FIRST CRLFCRLF, `Content-Type: text/html` substring gate:
  TagCounterMap.java:40-53
- WET plain-text gate `text/plain`: WordCounterMap.java:32-39
- WAT JSON gate `application/json` + Envelope.Payload-Metadata.
  HTTP-Response-Metadata.Headers.Server: ServerTypeMap.java:31-47

The ingest queries are oracle-checked end-to-end: the fixture archives
are built deterministically FROM the sf documents table, so DuckDB twins
over `documents` are exact oracles for the ingested results.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
from typing import Iterator

import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .analytics import SQL_TAG_COUNT, SQL_WORD_COUNT, TAG_RE

RECORD_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("warc_date", T.StringType()),  # WARC-Date, ISO-8601 (event time)
    T.StructField("content", T.BinaryType()),
    T.StructField("corrupt", T.IntegerType()),   # S3-style lenient counter
])

RESPONSE_MIME = "application/http; msgtype=response"


def _iter_warc_records(raw: bytes):
    """Yield (headers: dict, content: bytes, corrupt: int) from one
    gzipped WARC file, STREAMING: records are decoded incrementally
    through gzip.GzipFile, so executor memory holds the compressed
    bytes (the binaryFile row) plus one record at a time — never the
    whole decompressed segment (typically 3-5x a ~1 GB .gz), matching
    the reference's one-ArchiveReader-per-file streaming reader
    (WARCFileRecordReader.java:30-75). Handles per-record gzip members
    (Common Crawl's layout) and whole-file gzip alike — Python's gzip
    transparently reads concatenated members. Lenient: a malformed
    record skips ahead to the next 'WARC/' version line and counts,
    mirroring the reference's per-record try/catch
    (TagCounterMap.java:62-66)."""
    stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    while True:
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue   # inter-record padding / resync scan after a corrupt one
        try:
            headers: dict = {}
            while True:
                ln = stream.readline()
                if not ln:
                    raise ValueError("truncated header block")
                ln = ln.rstrip(b"\r\n")
                if not ln:
                    break
                k, _, v = ln.partition(b": ")
                headers[k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
            clen = int(headers["Content-Length"])
            body = stream.read(clen)
            if len(body) < clen:
                raise ValueError("truncated record")
            yield headers, body, 0
        except Exception:
            yield {}, b"", 1


def warc_records(spark: SparkSession, path: str) -> DataFrame:
    """All records of the .gz archives under `path` (glob ok), one task
    per file. Columns: file, record_type, url, mime, content, corrupt."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = 256   # records per emitted Arrow batch: bounds executor
        for pdf in batches:            # memory at one chunk, not one file
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(fpath)
                rows = {k: [] for k in ("file", "record_type", "url", "mime",
                                        "warc_date", "content", "corrupt")}
                for headers, content, corrupt in _iter_warc_records(bytes(raw)):
                    rows["file"].append(fname)
                    rows["record_type"].append(headers.get("WARC-Type", ""))
                    rows["url"].append(headers.get("WARC-Target-URI", ""))
                    rows["mime"].append(headers.get("Content-Type", ""))
                    rows["warc_date"].append(headers.get("WARC-Date", ""))
                    rows["content"].append(content)
                    rows["corrupt"].append(corrupt)
                    if len(rows["file"]) >= chunk:
                        yield pd.DataFrame(rows)
                        rows = {k: [] for k in rows}
                if rows["file"]:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse, RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# adapters — everything below the parser is JVM-side DataFrame API
# ---------------------------------------------------------------------------


def warc_html_bodies(records: DataFrame) -> DataFrame:
    """HTTP response records → (url, http_headers, body) for text/html
    responses: the TagCounterMap.java:40-53 pipeline. The split is at the
    FIRST CRLFCRLF (F5); the html gate is the reference's exact substring
    test on the raw header block. fetch_ms is the record's WARC-Date as
    epoch millis (null when absent) — the event-time column the
    HTML→spans ingester carries onto documents and extract_links carries
    onto candidates (event_ms) for streaming watermarks."""
    s = F.decode(F.col("content"), "UTF-8")
    header = F.substring_index(s, "\r\n\r\n", 1)
    body = F.expr(r"substring(decode(content, 'UTF-8'),"
                  r" instr(decode(content, 'UTF-8'), '\r\n\r\n') + 4)")
    return (records
            .filter(F.col("mime") == RESPONSE_MIME)
            .withColumn("http_headers", header)
            .filter(F.col("http_headers").contains("Content-Type: text/html"))
            .withColumn("body", body)
            .withColumn("fetch_ms",
                        F.unix_millis(F.col("warc_date").cast("timestamp")))
            .select("url", "http_headers", "body", "fetch_ms"))


def wet_texts(records: DataFrame) -> DataFrame:
    """WET conversion records → (url, text) (WordCounterMap.java:32-39)."""
    return (records.filter(F.col("mime") == "text/plain")
            .select("url", F.decode("content", "UTF-8").alias("text")))


def wat_servers(records: DataFrame) -> DataFrame:
    """WAT metadata records → Server header (ServerTypeMap.java:37-47)."""
    path = "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']" \
           ".Headers.Server"
    return (records.filter(F.col("mime") == "application/json")
            .select(F.get_json_object(F.decode("content", "UTF-8"), path)
                    .alias("server"))
            .filter(F.col("server").isNotNull()))


# ---------------------------------------------------------------------------
# deterministic archive fixtures, built FROM the sf documents table so
# the parquet-side SQL twins are exact oracles for the ingested results
# ---------------------------------------------------------------------------


def _record(wtype: str, uri: str, mime: str, payload: bytes,
            date: str = "2026-01-01T00:00:00Z") -> bytes:
    rid = hashlib.md5(f"{wtype}|{uri}".encode()).hexdigest()
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def _gz_member(rec: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def write_warc(df: DataFrame, out_dir: str,
               wtype: str = "response") -> DataFrame:
    """DISTRIBUTED `.warc.gz` sink (the write side of S1): each input
    partition streams its rows into one `part-NNNNN.warc.gz` shard under
    `out_dir` — one gzip member per record, Common Crawl's layout, byte-
    readable back through `warc_records`. Returns the shard manifest
    (path, n_records, n_bytes), one row per non-empty partition.

    df columns: uri (string), mime (string), payload (binary). The
    writer is mapInPandas over Arrow batches — records are synthesized
    and appended incrementally, so executor memory holds one batch plus
    one record, never the shard. Shard naming uses the Spark partition
    id (TaskContext), the standard deterministic sink layout; out_dir
    must be a filesystem every executor can reach (local here; a shared
    mount/object store on a real cluster)."""
    import pyarrow as pa  # noqa: F401  (arrow batches are the transport)
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def write_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = 0
        fh = None
        try:
            for pdf in batches:
                if len(pdf) and fh is None:
                    fh = open(path, "wb")
                for uri, mime, payload in zip(pdf["uri"], pdf["mime"],
                                              pdf["payload"]):
                    fh.write(_gz_member(_record(wtype, uri, mime,
                                                bytes(payload))))
                    n += 1
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame({"path": [path], "n_records": [n],
                                "n_bytes": [os.path.getsize(path)]})

    return df.select("uri", "mime", "payload").mapInPandas(
        write_parts, "path string, n_records long, n_bytes long")


def write_archive_fixtures(sf_dir: str, out_dir: str) -> dict[str, str]:
    """fixture.{warc,wet,wat}.gz from sf documents, one gzip member per
    record (Common Crawl's layout). Idempotent via a manifest stamp.
    The WARC also carries a 'request' record, a non-html response and a
    corrupt member so the gates and the lenient path are exercised."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {k: os.path.join(out_dir, f"fixture.{k}.gz")
             for k in ("warc", "wet", "wat", "htmlwarc")}
    manifest = os.path.join(out_dir, "_MANIFEST")
    stamp = "v3:" + sf_dir
    if os.path.exists(manifest):
        with open(manifest) as fh:
            if (fh.read().strip() == stamp
                    and all(os.path.exists(p) for p in paths.values())):
                return paths

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pylist()
    warc, wet, wat, htmlwarc = [], [], [], []
    for d in docs:
        uri = f"http://docs.example.com/{d['doc_id']}.html"
        # the tag-count corpus: every word wrapped as a tag (the same
        # synthesis q_tag_count applies to documents.text)
        html = "<" + str(d["text"]).replace(" ", "><") + ">"
        http = ("HTTP/1.1 200 OK\r\n"
                "Content-Type: text/html; charset=UTF-8\r\n"
                f"Server: {d['source']}\r\n\r\n" + html).encode()
        warc.append(_record("response", uri, RESPONSE_MIME, http))
        wet.append(_record("conversion", uri, "text/plain",
                           str(d["text"]).encode()))
        env = {"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {
            "Headers": {"Server": d["source"]}}}}}
        wat.append(_record("metadata", uri, "application/json",
                           json.dumps(env).encode()))
        # a REAL page (not the tag-synthesized corpus) for the HTML→spans
        # ingester: p text, media <a>, <img>, <video> — its expected span
        # sequence is SQL-derivable from the documents row
        did = d["doc_id"]
        page = ("<html><body>"
                f"<p>{d['text']}</p>"
                f"<a href=\"http://media.example.com/{did}.jpg\">see pic {did}</a>"
                f"<img src=\"/static/{did}.png\" alt=\"alt {did}\">"
                f"<div><video width=\"320\" height=\"240\" "
                f"src=\"http://v.example.com/{did}.mp4\">clip {did}</video></div>"
                "</body></html>")
        page_http = ("HTTP/1.1 200 OK\r\n"
                     "Content-Type: text/html; charset=UTF-8\r\n\r\n"
                     + page).encode()
        htmlwarc.append(_record("response", uri, RESPONSE_MIME, page_http))
    # filter-exercising extras: a request record, a non-html response,
    # and a corrupt member (bad Content-Length) the parser must survive
    warc.append(_record("request", "http://docs.example.com/0.html",
                        "application/http; msgtype=request",
                        b"GET /0.html HTTP/1.1\r\n\r\n"))
    warc.append(_record("response", "http://docs.example.com/img.jpg",
                        RESPONSE_MIME,
                        b"HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\nJFIF"))
    corrupt = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\nx"
    with open(paths["warc"], "wb") as fh:
        for rec in warc:
            fh.write(_gz_member(rec))
        fh.write(_gz_member(corrupt))
    with open(paths["wet"], "wb") as fh:
        for rec in wet:
            fh.write(_gz_member(rec))
    with open(paths["wat"], "wb") as fh:
        for rec in wat:
            fh.write(_gz_member(rec))
    with open(paths["htmlwarc"], "wb") as fh:
        for rec in htmlwarc:
            fh.write(_gz_member(rec))
    with open(manifest, "w") as fh:
        fh.write(stamp)
    return paths


def _fixture_paths(sf_dir: str) -> dict[str, str]:
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures",
                        "warc_" + os.path.basename(os.path.normpath(sf_dir)))
    return write_archive_fixtures(sf_dir, base)


# ---------------------------------------------------------------------------
# oracle-checked ingest queries (twins run on the parquet documents table)
# ---------------------------------------------------------------------------


def q_warc_ingest_tag_count(spark, sf_dir):
    """TagCounterMap end-to-end over a real .warc.gz: ingest → response
    gate → html gate → body split → tag histogram. Oracle: the existing
    tag-count SQL over the documents table the archive was built from."""
    recs = warc_records(spark, _fixture_paths(sf_dir)["warc"])
    body = warc_html_bodies(recs)
    return (body.select(F.explode(
        F.regexp_extract_all("body", F.lit(TAG_RE), 1)).alias("tag"))
        .select(F.lower("tag").alias("tag"))
        .groupBy("tag").agg(F.count(F.lit(1)).alias("cnt")))


def q_wet_ingest_word_count(spark, sf_dir):
    """WordCounterMap end-to-end over a real .wet.gz."""
    recs = warc_records(spark, _fixture_paths(sf_dir)["wet"])
    return (wet_texts(recs)
            .select(F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def q_wat_ingest_server_count(spark, sf_dir):
    """ServerTypeMap end-to-end over a real .wat.gz."""
    recs = warc_records(spark, _fixture_paths(sf_dir)["wat"])
    return (wat_servers(recs)
            .groupBy("server").agg(F.count(F.lit(1)).alias("cnt")))


SQL_WAT_INGEST_SERVER_COUNT = (
    "SELECT source AS server, CAST(count(*) AS BIGINT) AS cnt"
    " FROM documents GROUP BY source")

REG: dict[str, tuple] = {
    "warc_ingest_tag_count": (q_warc_ingest_tag_count, SQL_TAG_COUNT),
    "wet_ingest_word_count": (q_wet_ingest_word_count, SQL_WORD_COUNT),
    "wat_ingest_server_count": (q_wat_ingest_server_count,
                                SQL_WAT_INGEST_SERVER_COUNT),
}
