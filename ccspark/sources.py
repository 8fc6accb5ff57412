"""Sources (SURVEY.md §2.1): manifest-driven scans, lenient JSON-lines,
seed lists.

The reference reads (a) S3 paths listed in a `warc.path` manifest,
chunked 500-per-job (AWSMediaExtractor.java:71-84,125-139), (b) gzipped
JSON-lines parsed leniently with malformed lines counted and dropped
(CommonCrawlAnalyzer.java:82-94,131-135), and (c) a newline-delimited
seed list (MultithreadedAnalyzer.java:185-202). Spark equivalents:
`spark.read.parquet(*paths)` handles manifests, `spark.read.json` with a
`_corrupt_record` column replaces the JSON_SYNTAX_PROBLEM_COUNT counter,
and gz is decompressed transparently.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: the reference's per-job input chunk (AWSMediaExtractor.java:71-73)
MANIFEST_CHUNK = 500


def manifest_paths(spark: SparkSession, manifest: str) -> list[str]:
    """Read a newline-delimited path manifest (the `warc.path` analog).
    Driver-side by design: a manifest is small metadata, not data."""
    return [r.value.strip() for r in spark.read.text(manifest).collect()
            if r.value.strip()]


def manifest_chunks(paths: list[str],
                    chunk: int = MANIFEST_CHUNK) -> Iterator[list[str]]:
    """The reference's 500-file failure-domain chunking — each chunk is
    one scheduling round's input (maps to our round loop, not to
    sequential Hadoop jobs)."""
    for i in range(0, len(paths), chunk):
        yield paths[i:i + chunk]


def read_manifest_parquet(spark: SparkSession, manifest: str,
                          chunk_no: int | None = None) -> DataFrame:
    """S2: scan the union of manifest paths (or one 500-path chunk)."""
    paths = manifest_paths(spark, manifest)
    if chunk_no is not None:
        paths = list(manifest_chunks(paths))[chunk_no]
    return spark.read.parquet(*paths)


def read_jsonl_lenient(spark: SparkSession, path: str,
                       schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """S3: lenient JSON-lines (gz transparent). Returns (good, metrics)
    where metrics is a 1-row frame with records_in/json_syntax_problems —
    the reference's LINE_COUNT / JSON_SYNTAX_PROBLEM_COUNT counters
    (CommonCrawlAnalyzer.java:21,91-93)."""
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())])
    raw = (spark.read.schema(with_corrupt)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", "_corrupt_record")
           .json(path)
           .cache())  # corrupt-record queries require caching the parse
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    metrics = raw.agg(
        F.count(F.lit(1)).alias("records_in"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("json_syntax_problems"))
    return good, metrics


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """S4: newline-delimited seed URLs → (url) frame, blanks dropped."""
    return (spark.read.text(path)
            .select(F.trim("value").alias("url"))
            .filter(F.col("url") != ""))


def write_tsv_gz(df: DataFrame, path: str, key: str, value: str) -> None:
    """S5: the reference's TextOutputFormat key TAB value gzip sink
    (WETWordCount.java:53-61)."""
    (df.select(F.concat_ws("\t", F.col(key), F.col(value)).alias("line"))
     .write.mode("overwrite").option("compression", "gzip").text(path))


# ---------------------------------------------------------------------------
# bucketed tables — shuffle-free co-located joins (the 100 TB seen-join
# deployment shape)
# ---------------------------------------------------------------------------

def write_bucketed(df: DataFrame, name: str, key: str, buckets: int,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a BUCKETED catalog table: rows are hash-clustered
    into `buckets` files per partition by `key` and sorted within each
    bucket, and the layout is recorded in the catalog so Spark's planner
    treats a scan as already hash-partitioned AND sorted on `key`.

    This is the at-rest form of the engine's central join at 10^10 URLs:
    the seen/frontier state tables already commit repartitioned by their
    `bucket` column (tables.py), but plain parquet forgets the
    partitioning at read time, so every round's anti-join re-shuffles
    BOTH sides. Two tables bucketed by the same key and count sort-merge
    join with ZERO exchanges and ZERO sorts (plan-audited in
    test_plans): the candidate batch — the small, new side — is the only
    thing shuffled, once, at write. On a real cluster this is the
    difference between moving 12 GiB of state per round and moving none
    of it.

    The write repartitions by the bucket key first so each bucket is ONE
    file: Spark only trusts (and plans around) the per-bucket sortBy
    order when a bucket has a single file — with several writer tasks
    each emitting a file per bucket, the scan would have to re-sort and
    the join's sort-elision is lost. Readers that want the sorts elided
    too must opt in via
    spark.sql.legacy.bucketedTableScan.outputOrdering=true (Spark 3+
    hides bucket sort order from the planner by default); exchange
    elision needs no flag.
    """
    (df.repartition(buckets, key).write.format("parquet").mode(mode)
       .bucketBy(buckets, key).sortBy(key).saveAsTable(name))


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed catalog table (scan carries the bucket layout)."""
    return spark.table(name)
