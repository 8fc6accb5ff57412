"""URL-seen set (SURVEY.md U5/U6/J1) — the engine's central dedup join.

Two cooperating structures, mirroring the reference's intent
(Statistics.java:21-51: a bloom filter documented for 15-20e9 insertions,
with a partitioned-pool workaround sketched at :37-49, while exact counts
are bookkept separately):

1. **Exact seen table** (set of record): snapshot table of
   (url, url_hash, bucket, first_round), hash-partitioned by
   bucket = pmod(xxhash64(url), P). Correctness comes from a left_anti
   join against this table — never from the bloom.

2. **Partitioned bloom accelerator**: one bitmap per bucket, built and
   probed inside Arrow applyInPandas/cogroup kernels (vectorized numpy —
   no per-row Python), persisted as a (bucket, bitmap, n, v) snapshot
   table committed as PER-BUCKET DELTAS: a round writes only the buckets
   that received new URLs, reads resolve latest-bucket-wins (max_by v),
   and compaction periodically materializes the resolved state.
   Probing splits candidates into definitely-new (bypass the exact join
   entirely — the common case on a growing crawl) and maybe-seen (the
   only rows that pay the exact anti-join shuffle). False positives cost
   a redundant join probe; false negatives are impossible (property test).

Scale arithmetic (BASELINE.md): P=256 buckets. At bench (1e6 URLs) each
bitmap is 2^20 bits = 128 KiB → 32 MiB total. At 1e10 URLs: 39e6
keys/bucket × ~10 bits ≈ 48 MiB/bucket ≈ 12 GiB total — distributed via
the cogroup (each task touches only its bucket's bitmap); nothing is ever
collected to the driver or broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .tables import SnapshotStore

_HASH_KEY_1 = "ccsparkbloomkey1"
_HASH_KEY_2 = "ccsparkbloomkey2"

BLOOM_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("bitmap", T.BinaryType()),
    T.StructField("n", T.LongType()),
])

# persisted rows additionally carry the snapshot version that wrote them
# (latest-bucket-wins on read), so each round commits ONLY the buckets
# that received new URLs as a delta instead of rewriting every bitmap
BLOOM_ROW_SCHEMA = T.StructType(
    BLOOM_SCHEMA.fields + [T.StructField("v", T.LongType())])


def _bit_positions(urls: pd.Series, m_bits: int, k: int) -> np.ndarray:
    """(len(urls), k) bloom bit indices — fully vectorized (pandas'
    C-implemented 64-bit hashing, two independent keys, double hashing)."""
    h1 = pd.util.hash_pandas_object(urls, index=False, hash_key=_HASH_KEY_1).to_numpy()
    h2 = pd.util.hash_pandas_object(urls, index=False, hash_key=_HASH_KEY_2).to_numpy()
    j = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def with_bucket(df: DataFrame, url_col: str = "url", partitions: int = 256) -> DataFrame:
    """JVM-side 64-bit hashing (U7): xxhash64 → bucket. This is the
    Statistics.java:37-49 'hash % NUM_BLOOM' pool-selection made real."""
    return (df
            .withColumn("url_hash", F.xxhash64(F.col(url_col)))
            .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(partitions)).cast("int")))


class SeenSet:
    def __init__(self, store: SnapshotStore, partitions: int = 256,
                 use_bloom: bool = True, bits_per_bucket: int = 1 << 20,
                 num_hashes: int = 7):
        self.store = store
        self.spark = store.spark
        self.partitions = partitions
        self.use_bloom = use_bloom
        self.m = bits_per_bucket
        self.k = num_hashes
        self.seen_tbl = store.table("seen")
        self.bloom_tbl = store.table("bloom")

    # -- read state ---------------------------------------------------------

    def seen_df(self, version: int | None = None) -> DataFrame | None:
        """The exact set of record: union of all committed deltas."""
        return self.seen_tbl.read_chain(version) if self.seen_tbl.exists() else None

    def _bloom_df(self) -> DataFrame | None:
        """Latest bitmap per bucket, resolved merge-on-read over the delta
        chain: each round commits only the buckets it touched, so a
        bucket's current bitmap is its row with the highest writer
        version `v` since the last 'full' (compaction) snapshot. The
        resolve is a max_by over ≤ P × chain-length tiny rows — nothing
        like the 12 GiB full-rewrite round 2 paid per round."""
        if not self.bloom_tbl.exists():
            return None
        chain = self.bloom_tbl.read_chain()
        return (chain.groupBy("bucket")
                .agg(F.max_by(F.struct("bitmap", "n"), F.col("v")).alias("_b"),
                     F.max("v").alias("v"))
                .select("bucket", "_b.bitmap", "_b.n", "v"))

    def compact_bloom(self, round_no: int) -> int | None:
        """Materialize the resolved per-bucket state as a 'full' snapshot
        so the latest-bucket-wins chain stays bounded (the bloom twin of
        the seen chain's compact_chain)."""
        resolved = self._bloom_df()
        if resolved is None:
            return None
        return self.bloom_tbl.commit(
            resolved, round_no, kind="full",
            repartition=(min(self.partitions, 64), "bucket"))

    # -- filter candidates to never-seen ------------------------------------

    def filter_new(self, candidates: DataFrame) -> DataFrame:
        """Candidates (must carry url/url_hash/bucket) → rows whose url has
        never been seen. Bloom pre-filter when enabled; exact anti-join
        backstop always."""
        seen = self.seen_df()
        if seen is None:
            return candidates
        bloom = self._bloom_df() if self.use_bloom else None
        if bloom is None:
            return candidates.join(seen.select("url"), "url", "left_anti")

        m, k = self.m, self.k
        out_schema = T.StructType(
            candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType())])

        def probe(key, cand_pdf, bloom_pdf):
            if len(cand_pdf) == 0:
                return cand_pdf.assign(maybe_seen=pd.Series([], dtype=bool))
            if len(bloom_pdf) == 0 or bloom_pdf["bitmap"].iloc[0] is None:
                return cand_pdf.assign(maybe_seen=False)
            bits = np.unpackbits(np.frombuffer(bloom_pdf["bitmap"].iloc[0], dtype=np.uint8))
            idx = _bit_positions(cand_pdf["url"], m, k)
            return cand_pdf.assign(maybe_seen=bits[idx].all(axis=1))

        flagged = (candidates.groupBy("bucket")
                   .cogroup(bloom.groupBy("bucket"))
                   .applyInPandas(probe, schema=out_schema))
        definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = (flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
                 .join(seen.select("url"), "url", "left_anti"))
        return definite_new.unionByName(maybe)

    # -- commit new URLs -----------------------------------------------------

    def add(self, new_rows: DataFrame, round_no: int,
            metrics: dict | None = None) -> dict[str, int]:
        """Append (url, url_hash, bucket) of `new_rows` to the exact table
        and fold them into the per-bucket bloom bitmaps. Returns committed
        snapshot versions."""
        add_df = new_rows.select("url", "url_hash", "bucket",
                                 F.lit(round_no).alias("first_round"))
        # append-only delta commit: the seen chain is never rewritten
        versions = {"seen": self.seen_tbl.commit(
            add_df, round_no, metrics=metrics,
            repartition=(min(self.partitions, 32), "bucket"))}

        if self.use_bloom:
            m, k = self.m, self.k

            def fold(key, urls_pdf, bloom_pdf):
                if len(urls_pdf) == 0:
                    # bucket present only on the bloom side (can't happen
                    # after the semi-join below, but keep fold total):
                    # nothing new → emit nothing, the old row stays live
                    return pd.DataFrame(
                        {c: [] for c in ("bucket", "bitmap", "n")})
                if len(bloom_pdf):
                    bits = np.unpackbits(np.frombuffer(bloom_pdf["bitmap"].iloc[0],
                                                       dtype=np.uint8)).copy()
                    n = int(bloom_pdf["n"].iloc[0])
                else:
                    bits = np.zeros(m, dtype=np.uint8)
                    n = 0
                idx = _bit_positions(urls_pdf["url"], m, k)
                bits[idx.ravel()] = 1
                n += len(urls_pdf)
                return pd.DataFrame({"bucket": [key[0]],
                                     "bitmap": [np.packbits(bits).tobytes()],
                                     "n": [n]})

            new_urls = add_df.select("bucket", "url")
            bloom = self._bloom_df()
            if bloom is None:
                bloom = self.spark.createDataFrame([], BLOOM_ROW_SCHEMA)
            else:
                # DELTA commit: fold (and re-emit) ONLY buckets that
                # received new URLs this round. Round 2 cogrouped the
                # full bloom table and re-wrote every bitmap every round
                # (≈12 GiB/round at the 1e10-URL design point no matter
                # how few URLs arrived); untouched buckets now stay in
                # their old snapshot files and win via max_by(v) on read.
                bloom = bloom.join(new_urls.select("bucket").distinct(),
                                   "bucket", "left_semi")
            folded = (new_urls.groupBy("bucket")
                      .cogroup(bloom.drop("v").groupBy("bucket"))
                      .applyInPandas(fold, schema=BLOOM_SCHEMA))
            next_v = (self.bloom_tbl.latest_version() or 0) + 1
            versions["bloom"] = self.bloom_tbl.commit(
                folded.withColumn("v", F.lit(next_v).cast("long")),
                round_no, repartition=(min(self.partitions, 64), "bucket"))
        return versions
