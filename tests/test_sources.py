"""Sources (S2-S5): manifest chunking, lenient JSON-lines counters,
seed reading, TSV-gzip sink round trip."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F, types as T

from ccspark import sources as S


def test_manifest_chunking(spark, tmp_path):
    paths = [f"/data/part{i}.parquet" for i in range(1203)]
    mf = tmp_path / "warc.path"
    mf.write_text("\n".join(paths) + "\n\n")
    got = S.manifest_paths(spark, str(mf))
    assert got == paths
    chunks = list(S.manifest_chunks(got))
    assert [len(c) for c in chunks] == [500, 500, 203]


def test_lenient_jsonl_counts_corrupt_lines(spark, tmp_path):
    p = tmp_path / "rows.jsonl.gz"
    lines = ['{"id": 1, "src": "a"}', "{broken", '{"id": 2, "src": "b"}',
             "%%%", '{"id": 3, "src": "c"}']
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(lines))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("src", T.StringType())])
    good, metrics = S.read_jsonl_lenient(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 2, 3]
    m = metrics.collect()[0]
    assert m.records_in == 5 and m.json_syntax_problems == 2


def test_read_seeds_drops_blanks(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("http://a.com/\n\n  http://b.com/  \n")
    got = {r.url for r in S.read_seeds(spark, str(p)).collect()}
    assert got == {"http://a.com/", "http://b.com/"}


def test_tsv_gz_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("img", 3), ("a", 5)], "k string, v int")
    out = str(tmp_path / "out")
    S.write_tsv_gz(df, out, "k", "v")
    files = [f for f in os.listdir(out) if f.endswith(".gz")]
    assert files
    rows = set()
    for f in files:
        with gzip.open(os.path.join(out, f), "rt") as fh:
            rows.update(ln.strip() for ln in fh if ln.strip())
    assert rows == {"img\t3", "a\t5"}


def test_warc_sink_roundtrip(spark, tmp_path):
    """write_warc (distributed per-partition shard sink) → warc_records
    (the S1 reader) must round-trip uri/mime/payload exactly, and the
    manifest must account for every record."""
    import pandas as pd
    from pyspark.sql import functions as F
    from ccspark.warc import warc_records, write_warc

    rows = [(f"http://w.example.com/p{i}.html", "text/html",
             bytearray(f"<html><body>doc {i}</body></html>".encode()))
            for i in range(37)]
    df = (spark.createDataFrame(rows, "uri string, mime string, payload binary")
          .repartition(4))
    out = str(tmp_path / "warcout")
    manifest = write_warc(df, out).toPandas()
    assert manifest["n_records"].sum() == 37
    assert all(p.endswith(".warc.gz") for p in manifest["path"])

    back = (warc_records(spark, out + "/*.warc.gz")
            .filter((F.col("record_type") == "response")
                    & (F.col("corrupt") == 0))
            .select("url", "content").toPandas())
    assert len(back) == 37
    want = {u: bytes(p) for u, _m, p in rows}
    got = {r.url: bytes(r.content) for r in back.itertuples()}
    assert want == got
