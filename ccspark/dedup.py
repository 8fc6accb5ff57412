"""Deduplication suite for large-scale training-data pipelines.

Five dedup families over the `documents` / `embeddings` tables, each an
idiomatic Catalyst plan (JVM-side expressions only — zero Python UDFs in
this module) paired with a DuckDB oracle:

- exact:        md5 content hash → first-wins group (hash-groupBy)
- minhash LSH:  3-word shingles → per-band min-hash → band-bucket
                self-join → candidate pairs verified with exact Jaccard
- simhash:      60-bit weighted sign-sum fingerprint → bucket clustering
                + 4×15-bit Hamming band join for near-dup pairs
- ngram Jaccard: exact pairwise 3-shingle Jaccard on a bounded window
- embedding:    cosine near-dup pairs (see ccspark.similarity for ANN)

Cross-engine exactness: every hash is md5-derived; min-hash signatures
stay HEX STRINGS (fixed-length hex min == numeric min, portable across
engines); Jaccard = one int/int division (single IEEE op). The
reference's dedup ancestor is first-wins-by-key (MediaReduce.java:12-19)
and the bloom URL-seen intent (Statistics.java:21-51); MinHash/SimHash
extend that to near-duplicate semantics at 100 TB scale where the
band-bucket join shuffles only (band, signature) keys, never pairwise.
"""

from __future__ import annotations

from pyspark.sql import (DataFrame, Observation, SparkSession, Window,
                         functions as F)

from .analytics import t

N_BANDS = 8          # LSH bands, one hash row per band (r=1)
SHINGLE_W = 3        # words per shingle
# 60-bit SimHash (15 md5 hex digits — the repo's standard cross-engine
# 64-bit-safe hash width): 4 bands × 15 bits = 32,768 bucket values per
# band. Round 2 shipped 16 bits (4-bit bands → 16 values/band), which
# degraded the Hamming band join to ~n²/16 candidate pairs — quadratic
# with a constant. At 60 bits the per-band collision rate for unrelated
# docs is 2^-15, so candidates are dominated by true near-dups (the
# Manku/Google WWW'07 regime), not by bucket exhaustion.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_N_BANDS = 4   # pigeonhole: Hamming ≤ 3 ⇒ ≥1 of 4 bands equal

# ---------------------------------------------------------------------------
# shared shingle plan
# ---------------------------------------------------------------------------

# tokens without empties, 0-based Spark / 1-based DuckDB indexing handled
# per engine; shingle = 3 consecutive words joined by ' '.
_SHINGLES_SPARK = (
    "CASE WHEN size(toks) >= 3 THEN "
    " transform(sequence(0, size(toks) - 3),"
    "   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    " ELSE array() END"
)
_SHINGLES_DUCK = (
    "list_transform(generate_series(1, len(toks) - 2),"
    " i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
)


def shingles_df(spark: SparkSession, sf_dir: str, max_doc: int | None = None,
                docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, shingle) distinct — the dedup unit (n-gram shingling)."""
    d = t(spark, sf_dir, "documents") if docs is None else docs
    if max_doc is not None:
        d = d.filter(F.col("doc_id") < max_doc)
    return (d.withColumn("toks", F.expr("filter(split(text, ' '), x -> x <> '')"))
            .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle"))
            .distinct())


def _shingles_sql(where: str = "") -> str:
    return (
        "SELECT DISTINCT doc_id, unnest(" + _SHINGLES_DUCK + ") AS shingle FROM ("
        "  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks"
        f"  FROM documents {where})"
    )


# ---------------------------------------------------------------------------
# exact dedup — hash-groupBy first-wins
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select(F.md5("text").alias("content_hash"), "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keep_doc"),
                 F.count(F.lit(1)).alias("n_copies")))


SQL_DEDUP_EXACT = (
    "SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc,"
    " CAST(count(*) AS BIGINT) AS n_copies"
    " FROM documents GROUP BY md5(text)")

# ---------------------------------------------------------------------------
# MinHash signatures — per (doc, band) min of md5(band|shingle); hex-string
# min is numeric min (fixed-length lowercase hex)
# ---------------------------------------------------------------------------


def minhash_df(spark, sf_dir, max_doc: int | None = None,
               shingles: DataFrame | None = None) -> DataFrame:
    sh = shingles_df(spark, sf_dir, max_doc) if shingles is None else shingles
    banded = sh.select(
        "doc_id", "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"))
    h = F.substring(F.md5(F.concat_ws("|", F.col("band"), F.col("shingle"))), 1, 15)
    return (banded.withColumn("h", h)
            .groupBy("doc_id", "band").agg(F.min("h").alias("minhash")))


def _minhash_sql(where: str = "") -> str:
    return (
        "SELECT doc_id, band, min(h) AS minhash FROM ("
        "  SELECT doc_id, band,"
        "   substr(md5(concat(band, '|', shingle)), 1, 15) AS h"
        "  FROM (" + _shingles_sql(where) + ") s,"
        f"       (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b)"
        " GROUP BY doc_id, band")


def q_minhash_signatures(spark, sf_dir):
    return (minhash_df(spark, sf_dir)
            .select("doc_id", F.col("band").cast("bigint").alias("band"), "minhash"))


SQL_MINHASH_SIGNATURES = (
    "SELECT doc_id, CAST(band AS BIGINT) AS band, minhash FROM ("
    + _minhash_sql() + ")")

# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs: docs sharing any (band, minhash) bucket,
# verified with exact shingle Jaccard. The scale path: the self-join keys
# are (band, minhash) — cardinality O(docs × bands), never O(docs²).
# ---------------------------------------------------------------------------


def q_dedup_minhash_lsh(spark, sf_dir):
    # The shingle pipeline (tokenize → explode → distinct) fans out into
    # FOUR consumers below (minhash, sizes, both sides of the intersect
    # join). persist() materializes it once; without it each branch
    # re-tokenizes and re-explodes the full corpus — at 100 TB that is
    # three redundant full-corpus passes. (The ContextCleaner unpersists
    # the cache when the plan is garbage collected.)
    sh = shingles_df(spark, sf_dir).persist()
    mh = minhash_df(spark, sf_dir, shingles=sh)
    a, b = mh.alias("a"), mh.alias("b")
    pairs = (a.join(b, ["band", "minhash"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter")))
    return (pairs
            .join(inter, ["doc_a", "doc_b"], "left")
            .withColumn("inter", F.coalesce("inter", F.lit(0)))
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "n_b"), "doc_b")
            .select("doc_a", "doc_b", "inter", "n_a", "n_b",
                    F.round(F.col("inter") /
                            (F.col("n_a") + F.col("n_b") - F.col("inter")), 6)
                    .alias("jaccard")))


SQL_DEDUP_MINHASH_LSH = (
    "WITH mh AS (" + _minhash_sql() + "),"
    " pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
    "   FROM mh a JOIN mh b ON a.band = b.band AND a.minhash = b.minhash"
    "   WHERE a.doc_id < b.doc_id),"
    " sh AS (" + _shingles_sql() + "),"
    " sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),"
    " inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS inter"
    "   FROM pairs p JOIN sh x ON x.doc_id = p.doc_a"
    "   JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle"
    "   GROUP BY p.doc_a, p.doc_b)"
    " SELECT p.doc_a, p.doc_b, coalesce(i.inter, 0) AS inter,"
    "  sa.n AS n_a, sb.n AS n_b,"
    "  round(coalesce(i.inter, 0) / (sa.n + sb.n - coalesce(i.inter, 0)), 6) AS jaccard"
    " FROM pairs p LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b"
    " JOIN sizes sa ON sa.doc_id = p.doc_a"
    " JOIN sizes sb ON sb.doc_id = p.doc_b")

# ---------------------------------------------------------------------------
# Duplicate clusters + deduplicated corpus: connected components of the
# VERIFIED near-dup graph (LSH pairs with exact Jaccard >= JACCARD_MIN),
# each component labeled by its min doc_id — the step that turns
# pairwise hits into the keep/drop decision a dedup pipeline ships.
#
# Algorithm: min-label propagation to fixpoint. Every doc starts with
# label = own id; each round a doc takes the min of its own label and
# its neighbors' labels; converged labels = component minima. One
# bounded-key shuffle (join on doc id + groupBy min) per round,
# localCheckpoint each round so lineage stays O(1) — the standard
# large-graph CC recipe (Kiveris et al. "Connected Components in
# MapReduce", SoCC'14 family). Rounds needed = graph diameter; near-dup
# components are star-ish clusters of copies (diameter a few hops, not
# a social graph), so convergence is fast at any scale and the loop is
# capped + asserted. The driver-side loop carries only the convergence
# COUNT, never data.
# ---------------------------------------------------------------------------

JACCARD_MIN = 0.5     # verified-edge threshold: bucket collisions with
                      # low true similarity are not duplication evidence
_CC_MAX_ITERS = 20


def connected_components(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id = min doc_id in component) for `nodes`
    (column doc_id) under undirected `pairs` (doc_a, doc_b), by
    min-label propagation to fixpoint."""
    # undirected: propagate both ways; materialized ONCE (the plan that
    # produced the pairs never re-executes in the loop)
    edges = pairs.union(pairs.select(
        F.col("doc_b").alias("doc_a"),
        F.col("doc_a").alias("doc_b"))).localCheckpoint()
    # the loop runs over edge-INCIDENT nodes only (doc_a covers both
    # endpoints — edges carry each pair in both directions): a node with
    # no edge can never change its label, so singletons — the OVERWHELMING
    # majority of a near-dup corpus — skip the iteration entirely and
    # rejoin at the end. Cuts every per-iteration shuffle/checkpoint/count
    # from corpus-sized to duplicate-graph-sized (measured 8.6 → ~2 s at
    # sf0.1 where 772 of 5000 docs are incident).
    incident = (edges.select(F.col("doc_a").cast("bigint").alias("doc_id"))
                .distinct().localCheckpoint())
    labels = incident.select(
        "doc_id", F.col("doc_id").alias("cluster_id")).localCheckpoint()
    for _ in range(_CC_MAX_ITERS):
        prop = (edges.join(labels.withColumnRenamed("doc_id", "doc_a"), "doc_a")
                .select(F.col("doc_b").alias("doc_id"), "cluster_id"))
        # convergence check fused into the SAME pass that materializes
        # the new labels: each doc's previous label rides the union as
        # the _own-tagged row, and an Observation sums label drops on
        # the checkpoint job — 1 job/iteration instead of 3 (the
        # join+count probe was pure scheduler overhead at graph sizes
        # where the data already fits one task)
        obs = Observation()
        tagged = (labels.withColumn("_own", F.lit(True))
                  .union(prop.withColumn("_own", F.lit(False))))
        new = (tagged.groupBy("doc_id")
               .agg(F.min("cluster_id").alias("cluster_id"),
                    F.min(F.when(F.col("_own"), F.col("cluster_id")))
                     .alias("_prev"))
               .observe(obs, F.coalesce(
                   F.sum((F.col("cluster_id") < F.col("_prev"))
                         .cast("long")), F.lit(0)).alias("chg"))
               .drop("_prev")
               .localCheckpoint())
        changed = obs.get["chg"]
        labels = new
        if changed == 0:
            singles = (nodes
                       .select(F.col("doc_id").cast("bigint").alias("doc_id"))
                       .join(incident, "doc_id", "left_anti")
                       .select("doc_id", F.col("doc_id").alias("cluster_id")))
            return labels.union(singles)
    raise AssertionError(f"CC did not converge in {_CC_MAX_ITERS} rounds")


def q_dedup_clusters(spark, sf_dir):
    pairs = (q_dedup_minhash_lsh(spark, sf_dir)
             .filter(F.col("jaccard") >= JACCARD_MIN)
             .select("doc_a", "doc_b"))
    return connected_components(
        t(spark, sf_dir, "documents").select("doc_id"), pairs)


def _duck_cc_ctes() -> str:
    """pairs (thresholded verified edges) + reach (recursive closure) +
    cc (min reachable id per doc) — the oracle computes TRUE connected
    components, independent of the Spark loop's round structure."""
    return (
        "pairs AS (SELECT doc_a, doc_b FROM (" + SQL_DEDUP_MINHASH_LSH + ")"
        f"   WHERE jaccard >= {JACCARD_MIN}),"
        " e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        "   UNION ALL SELECT doc_b, doc_a FROM pairs),"
        " reach(v, u) AS ("
        "   SELECT doc_id, doc_id FROM documents"
        "   UNION"
        "   SELECT r.v, e.dst FROM reach r JOIN e ON e.src = r.u),"
        " cc AS (SELECT CAST(v AS BIGINT) AS doc_id,"
        "   CAST(min(u) AS BIGINT) AS cluster_id FROM reach GROUP BY v)")


SQL_DEDUP_CLUSTERS = (
    "WITH RECURSIVE " + _duck_cc_ctes() + " SELECT doc_id, cluster_id FROM cc")


def q_dedup_fuzzy_corpus(spark, sf_dir):
    """The deduplicated corpus: one survivor (min doc_id) per near-dup
    cluster, with the cluster size it represents — the table a training
    pipeline feeds downstream. Singletons survive with cluster_size 1;
    drop count = sum(cluster_size - 1)."""
    cl = q_dedup_clusters(spark, sf_dir)
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (cl.filter(F.col("doc_id") == F.col("cluster_id"))
            .join(sizes, "cluster_id")
            .select("doc_id", "cluster_size"))


SQL_DEDUP_FUZZY_CORPUS = (
    "WITH RECURSIVE " + _duck_cc_ctes() + ","
    " sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size"
    "   FROM cc GROUP BY cluster_id)"
    " SELECT c.doc_id, s.cluster_size FROM cc c JOIN sizes s"
    " USING (cluster_id) WHERE c.doc_id = c.cluster_id")

# ---------------------------------------------------------------------------
# SimHash — 60-bit fingerprint: bit_j set iff sum over tokens of
# count × (2·bit_j(hash60(token)) − 1) > 0. hash60 = first 15 md5 hex
# digits (Spark conv(...,16,10) == DuckDB ('0x'||...)::BIGINT, both exact
# below 2^63).
# ---------------------------------------------------------------------------


def q_dedup_simhash(spark, sf_dir):
    wc = (t(spark, sf_dir, "documents")
          .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
          .withColumn("v", F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
                      .cast("bigint")))
    aggs = [
        F.sum(F.col("c") * (F.shiftright(F.col("v"), j).bitwiseAND(F.lit(1)) * 2 - 1))
        .alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = wc.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.cast("bigint").alias("simhash"))


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(c * (((v >> {j}) & 1) * 2 - 1)) AS s{j}" for j in range(SIMHASH_BITS))
    combine = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS))
    return (
        "SELECT doc_id, CAST(" + combine + " AS BIGINT) AS simhash FROM ("
        f" SELECT doc_id, {sums} FROM ("
        "   SELECT doc_id, word, count(*) AS c,"
        "    ('0x' || substr(md5(word), 1, 15))::BIGINT AS v"
        "   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)"
        "   WHERE word <> '' GROUP BY doc_id, word)"
        " GROUP BY doc_id)")


SQL_DEDUP_SIMHASH = _simhash_sql()


def q_simhash_clusters(spark, sf_dir):
    """SimHash bucket histogram — collision clusters are near-dup candidates."""
    return (q_dedup_simhash(spark, sf_dir)
            .groupBy("simhash").agg(F.count(F.lit(1)).alias("cluster_size"))
            .filter(F.col("cluster_size") > 1))


SQL_SIMHASH_CLUSTERS = (
    "SELECT simhash, CAST(count(*) AS BIGINT) AS cluster_size FROM ("
    + _simhash_sql() + ") GROUP BY simhash HAVING count(*) > 1")

def q_simhash_hamming_pairs(spark, sf_dir):
    """Near-dup pairs within Hamming distance ≤ 3 of the 60-bit SimHash,
    found by bit-band LSH: split the fingerprint into 4 bands of 15 bits —
    by pigeonhole, any pair within distance 3 agrees on ≥1 whole band —
    self-join per (band, band_value) bucket, then verify with
    bit_count(xor). The shuffle key is the band bucket (2^15 = 32,768
    values per band), never all-pairs: the SimHash twin of the MinHash
    band join. Unrelated docs collide in a band with probability 2^-15,
    so the candidate set is dominated by true near-dups rather than
    bucket exhaustion (round 2's 16-bit fingerprint gave only 16 values
    per band → ~n²/16 candidates — the scale-killer this width fixes)."""
    sh = q_dedup_simhash(spark, sf_dir)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.sequence(
            F.lit(0), F.lit(SIMHASH_N_BANDS - 1))).alias("band"))
    banded = banded.withColumn(
        "band_val", F.expr(
            f"shiftright(simhash, band * {SIMHASH_BAND_BITS})"
            f" & {(1 << SIMHASH_BAND_BITS) - 1}"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, ["band", "band_val"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(
                        F.col("b.simhash"))).cast("bigint").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= 3))


SQL_SIMHASH_HAMMING_PAIRS = (
    "WITH sh AS (" + _simhash_sql() + "),"
    " banded AS (SELECT doc_id, simhash, band,"
    f"   (simhash >> (band * {SIMHASH_BAND_BITS}))"
    f"    & {(1 << SIMHASH_BAND_BITS) - 1} AS band_val"
    f"   FROM sh, (SELECT unnest(generate_series(0, {SIMHASH_N_BANDS - 1}))"
    "    AS band) b)"
    " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,"
    "  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming"
    " FROM banded a JOIN banded b"
    "   ON a.band = b.band AND a.band_val = b.band_val"
    "   AND a.doc_id < b.doc_id"
    " WHERE bit_count(xor(a.simhash, b.simhash)) <= 3")

# ---------------------------------------------------------------------------
# exact pairwise n-gram Jaccard on a bounded window (doc_id < 50) — the
# correctness yardstick the LSH path approximates
# ---------------------------------------------------------------------------

_JACC_MAX_DOC = 50


def q_ngram_jaccard_topk(spark, sf_dir):
    sh = shingles_df(spark, sf_dir, _JACC_MAX_DOC)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "n_b"), "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("inter") /
                                (F.col("n_a") + F.col("n_b") - F.col("inter")), 6))
            .orderBy(F.col("jaccard").desc(), F.col("doc_a").asc(),
                     F.col("doc_b").asc())
            .limit(20)
            .select("doc_a", "doc_b", "inter", "jaccard"))


SQL_NGRAM_JACCARD_TOPK = (
    "WITH sh AS (" + _shingles_sql(f"WHERE doc_id < {_JACC_MAX_DOC}") + "),"
    " sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),"
    " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
    "   CAST(count(*) AS BIGINT) AS inter"
    "   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id"
    "   GROUP BY a.doc_id, b.doc_id)"
    " SELECT doc_a, doc_b, inter,"
    "  round(inter / (sa.n + sb.n - inter), 6) AS jaccard"
    " FROM inter JOIN sizes sa ON sa.doc_id = doc_a"
    " JOIN sizes sb ON sb.doc_id = doc_b"
    " ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20")


# ---------------------------------------------------------------------------
# duplicate-substring spans — exact substring-level dedup (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better", arXiv:2107.06499)
# ---------------------------------------------------------------------------
#
# The paper builds a corpus-wide suffix array and removes every substring of
# ≥ 50 TOKENS that occurs more than once. A monolithic suffix array does not
# distribute; the standard shuffle-native equivalent (same output for
# duplicate runs aligned to token boundaries) is k-gram anchoring:
#
#   1. every k-token window (gram) of every document, with its position;
#   2. grams occurring ≥ 2 times corpus-wide are "duplicated" — one
#      hash-groupBy, shuffle O(distinct grams), the same shape as A1;
#   3. a duplicated substring of length L ≥ k duplicates ALL of its L−k+1
#      constituent grams, so per document the duplicated positions form
#      runs; a gaps-and-islands window merge (partitioned BY DOC — never
#      global) reconstructs the maximal spans [min pos, max pos + k).
#
# Exactness across engines: grams are plain strings (md5-keyed only inside
# the Spark shuffle), positions are integers, the merge is integer
# arithmetic — no floats anywhere except the final dup_frac division
# (one int/int IEEE op, the repo's standard portable float).
# k = 5 here (fixture docs are ~100 tokens; the paper's 50-token threshold
# is a parameter, not a semantic).

SUBSTR_K = 5

_GRAMS_SPARK = (
    "CASE WHEN size(toks) >= {k} THEN"
    " transform(sequence(0, size(toks) - {k}),"
    "   i -> struct(i AS pos, concat_ws(' ', slice(toks, i + 1, {k})) AS gram))"
    " ELSE array() END"
).format(k=SUBSTR_K)


def gram_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gram) — every k-token window with its 0-based start."""
    return (t(spark, sf_dir, "documents")
            .withColumn("toks", F.expr("filter(split(text, ' '), x -> x <> '')"))
            .select("doc_id", F.explode(F.expr(_GRAMS_SPARK)).alias("g"))
            .select("doc_id", F.col("g.pos").alias("pos"),
                    F.col("g.gram").alias("gram")))


def duplicate_spans(grams: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """Maximal duplicated-substring spans per document.

    grams: (doc_id, pos, gram). A gram is duplicated when it occurs ≥ 2
    times corpus-wide (across OR within documents — a within-doc repeat is
    still a duplicated substring). Two duplicated windows at positions p <
    q belong to one span iff q − p ≤ k (their token ranges [p, p+k),
    [q, q+k) overlap or touch). Returns (doc_id, span_start, span_end,
    span_len) with span_end exclusive.
    """
    # shuffle 1: gram multiplicity on the md5 key (64-bit-safe join key at
    # 100 TB; the gram string itself never shuffles twice)
    keyed = grams.withColumn("gk", F.md5("gram"))
    dup = (keyed.groupBy("gk").agg(F.count(F.lit(1)).alias("cnt"))
           .filter(F.col("cnt") >= 2).select("gk"))
    hits = keyed.join(dup, "gk", "left_semi").select("doc_id", "pos")
    # shuffle 2: per-doc window — partitioned by doc_id, never global
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (hits
           .withColumn("brk", F.when(
               F.lag("pos").over(w).isNull()
               | ((F.col("pos") - F.lag("pos").over(w)) > F.lit(k)), 1)
               .otherwise(0))
           .withColumn("island", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (isl.groupBy("doc_id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(k)).alias("span_end"))
            .select(F.col("doc_id").cast("bigint"),
                    F.col("span_start").cast("bigint"),
                    F.col("span_end").cast("bigint"),
                    (F.col("span_end") - F.col("span_start"))
                    .cast("bigint").alias("span_len")))


def q_dedup_substring_spans(spark, sf_dir):
    return duplicate_spans(gram_positions(spark, sf_dir))


def q_dedup_substring_stats(spark, sf_dir):
    """Per-document duplicated-token budget: n_tokens, tokens covered by
    duplicated spans, and their ratio — the keep/trim decision a
    substring-dedup pipeline ships (the paper cuts the spans; the stats
    row is the audit record). Docs with no duplicated span appear with
    zeros (left join)."""
    d = (t(spark, sf_dir, "documents")
         .select("doc_id",
                 F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
                 .cast("bigint").alias("n_tokens")))
    spans = (duplicate_spans(gram_positions(spark, sf_dir))
             .groupBy("doc_id").agg(F.sum("span_len").alias("dup_tokens")))
    return (d.join(spans, "doc_id", "left")
            .select(F.col("doc_id").cast("bigint"), "n_tokens",
                    F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
                    .alias("dup_tokens"))
            .withColumn("dup_frac",
                        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6)))


# 1-based DuckDB list indexing: window i covers toks[i .. i+k-1], 0-based
# pos = i − 1; the island break and span arithmetic are identical integers.
_GRAMS_DUCK_SQL = (
    "SELECT doc_id, i - 1 AS pos,"
    "  concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3],"
    "         ' ', toks[i+4]) AS gram"
    " FROM (SELECT doc_id, list_filter(string_split(text, ' '),"
    "              x -> x <> '') AS toks FROM documents),"
    "  LATERAL unnest(generate_series(1, len(toks) - 4)) AS u(i)"
    " WHERE len(toks) >= 5")

_SPANS_DUCK_CTES = (
    "grams AS (" + _GRAMS_DUCK_SQL + "),"
    " dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),"
    " hits AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (gram)),"
    " isl AS (SELECT doc_id, pos,"
    "   CASE WHEN lag(pos) OVER w IS NULL"
    "        OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS brk"
    "   FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),"
    " isl2 AS (SELECT doc_id, pos, sum(brk) OVER"
    "   (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),"
    " spans AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,"
    "   CAST(min(pos) AS BIGINT) AS span_start,"
    "   CAST(max(pos) + 5 AS BIGINT) AS span_end,"
    "   CAST(max(pos) + 5 - min(pos) AS BIGINT) AS span_len"
    "   FROM isl2 GROUP BY doc_id, island)")

SQL_DEDUP_SUBSTRING_SPANS = (
    "WITH " + _SPANS_DUCK_CTES +
    " SELECT doc_id, span_start, span_end, span_len FROM spans")

SQL_DEDUP_SUBSTRING_STATS = (
    "WITH " + _SPANS_DUCK_CTES + ","
    " per_doc AS (SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens"
    "   FROM spans GROUP BY doc_id),"
    " toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,"
    "   CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))"
    "        AS BIGINT) AS n_tokens FROM documents)"
    " SELECT t.doc_id, t.n_tokens, coalesce(p.dup_tokens, 0) AS dup_tokens,"
    "  round(coalesce(p.dup_tokens, 0) / t.n_tokens, 6) AS dup_frac"
    " FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id")


# ---------------------------------------------------------------------------
# incremental cross-snapshot dedup — admit an incoming batch against an
# existing corpus without re-deduplicating the corpus itself
# ---------------------------------------------------------------------------


def q_dedup_incremental(spark, sf_dir):
    """Classify each NEW document (odd doc_id — 'the incoming batch')
    against the EXISTING corpus (even doc_id — 'the snapshot'):

      exact  — same md5(text) as some corpus doc,
      near   — shares ≥1 MinHash (band, signature) bucket with the corpus,
      unique — neither.

    The production shape at 100 TB: the corpus side reduces to its
    DISTINCT content hashes and band signatures (persisted once in the
    snapshot layer, exactly like the URL-seen table); each incoming batch
    costs two left-semi probes keyed on hash — never a new-batch ×
    corpus join and never a corpus rescan. Precedence exact > near."""
    return incremental_status(
        t(spark, sf_dir, "documents").select("doc_id", "text"))


def incremental_status(d: DataFrame) -> DataFrame:
    """(doc_id, text) → per-NEW-doc (doc_id, status) vs the even-id
    corpus; the semantics unit behind q_dedup_incremental (the 'exact'
    branch is exercised by hand-built duplicates in tests — the
    synthetic sf corpora contain no exact cross-parity copies)."""
    spark = d.sparkSession
    old_ids = d.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    new_ids = d.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    dh = d.select("doc_id", F.md5("text").alias("h"))
    old_hash = dh.join(old_ids, "doc_id", "left_semi").select("h").distinct()
    exact = (dh.join(new_ids, "doc_id", "left_semi")
             .join(old_hash, "h", "left_semi")
             .select("doc_id").withColumn("is_exact", F.lit(1)))
    mh = minhash_df(spark, None, shingles=shingles_df(spark, None, docs=d))
    old_sig = (mh.join(old_ids, "doc_id", "left_semi")
               .select("band", "minhash").distinct())
    near = (mh.join(new_ids, "doc_id", "left_semi")
            .join(old_sig, ["band", "minhash"], "left_semi")
            .select("doc_id").distinct().withColumn("is_near", F.lit(1)))
    return (new_ids
            .join(exact, "doc_id", "left").join(near, "doc_id", "left")
            .select(F.col("doc_id").cast("bigint"),
                    F.when(F.col("is_exact") == 1, "exact")
                    .when(F.col("is_near") == 1, "near")
                    .otherwise("unique").alias("status")))


SQL_DEDUP_INCREMENTAL = (
    "WITH dh AS (SELECT doc_id, md5(text) AS h FROM documents),"
    " old_h AS (SELECT DISTINCT h FROM dh WHERE doc_id % 2 = 0),"
    " mh AS (" + _minhash_sql() + "),"
    " old_sig AS (SELECT DISTINCT band, minhash FROM mh WHERE doc_id % 2 = 0),"
    " ex AS (SELECT doc_id FROM dh WHERE doc_id % 2 = 1"
    "        AND h IN (SELECT h FROM old_h)),"
    " nr AS (SELECT DISTINCT doc_id FROM"
    "        (SELECT * FROM mh WHERE doc_id % 2 = 1) m"
    "        SEMI JOIN old_sig USING (band, minhash))"
    " SELECT CAST(d.doc_id AS BIGINT) AS doc_id,"
    "  CASE WHEN e.doc_id IS NOT NULL THEN 'exact'"
    "       WHEN n.doc_id IS NOT NULL THEN 'near'"
    "       ELSE 'unique' END AS status"
    " FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d"
    " LEFT JOIN ex e ON d.doc_id = e.doc_id"
    " LEFT JOIN nr n ON d.doc_id = n.doc_id")


# ---------------------------------------------------------------------------
# C4-style line-level corpus dedup
# ---------------------------------------------------------------------------
#
# C4 (Raffel et al., "Exploring the Limits of Transfer Learning...", JMLR
# 2020, §2.2) deduplicates the corpus at SUB-document granularity: any
# exact three-sentence span that occurs more than once is kept only at
# its first occurrence and scrubbed everywhere else. On this corpus's
# space-tokenized text the analogous unit is a fixed-width word window;
# the operator removes repeated windows corpus-wide (first occurrence by
# (doc_id, window index) wins) and reassembles each document from its
# surviving windows.
#
# Scale story (100 TB): chunking is a per-row JVM expression (slice on
# the split array — no explode shuffle); the global first-occurrence
# decision is ONE hash shuffle on the window text (window groups are
# duplicate clusters, typically tiny, so the per-group sort is O(dups));
# reassembly is one shuffle back on doc_id with the whole document's
# windows aggregated map-side. Production would key the window shuffle
# on xxhash64(line) to shrink shuffle width (64-bit keys instead of
# ~40-byte strings, 2^-64 collision odds); the oracle-checked op keys on
# the raw text so the match is exact by construction.

LINE_W = 5  # words per dedup window


def doc_chunks(spark: SparkSession, sf_dir: str, w: int = LINE_W) -> DataFrame:
    """Non-overlapping w-word windows per document, chunked map-side:
    (doc_id, cid, line) with cid the 0-based window index."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws"))
    # split() never returns an empty array (empty text -> ['']), so the
    # sequence upper bound is always >= 0 and ascending.
    cids = F.sequence(
        F.lit(0), (F.ceil(F.size("ws") / w) - 1).cast("int"))
    return (docs
            .select("doc_id", F.posexplode(F.transform(
                cids,
                lambda i: F.array_join(F.slice("ws", i * w + 1, w), " ")))
                .alias("cid", "line")))


def q_dedup_lines(spark, sf_dir):
    """Per-document result of corpus-wide window dedup: surviving text,
    windows kept, windows scrubbed. First occurrence ordered by
    (doc_id, cid) wins — the same first-wins rule as A3/dedup_exact."""
    chunks = doc_chunks(spark, sf_dir)
    w = Window.partitionBy("line").orderBy("doc_id", "cid")
    flagged = chunks.withColumn("keep", F.row_number().over(w) == 1)
    ent = F.struct("cid", "line", "keep")
    kept = F.filter(F.array_sort(F.collect_list(ent)), lambda x: x["keep"])
    return (flagged.groupBy("doc_id").agg(
        F.array_join(F.transform(kept, lambda x: x["line"]), " ")
        .alias("clean_text"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.count(F.when(~F.col("keep"), 1)).alias("n_dropped")))


SQL_DEDUP_LINES = """
WITH chunks AS (
  SELECT doc_id, i - 1 AS cid,
         array_to_string(ws[(i-1)*5+1 : (i-1)*5+5], ' ') AS line
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       UNNEST(generate_series(1, CAST(ceil(len(ws)/5.0) AS BIGINT)))
       AS t(i)),
flagged AS (
  SELECT doc_id, cid, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, cid) = 1
             AS keep
  FROM chunks)
SELECT doc_id,
       COALESCE(string_agg(line, ' ' ORDER BY cid) FILTER (WHERE keep), '')
           AS clean_text,
       COUNT(*) FILTER (WHERE keep) AS n_kept,
       COUNT(*) FILTER (WHERE NOT keep) AS n_dropped
FROM flagged GROUP BY doc_id
"""


REG: dict[str, tuple] = {
    "dedup_lines": (q_dedup_lines, SQL_DEDUP_LINES),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH_LSH),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_fuzzy_corpus": (q_dedup_fuzzy_corpus, SQL_DEDUP_FUZZY_CORPUS),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "simhash_clusters": (q_simhash_clusters, SQL_SIMHASH_CLUSTERS),
    "simhash_hamming_pairs": (q_simhash_hamming_pairs, SQL_SIMHASH_HAMMING_PAIRS),
    "ngram_jaccard_topk": (q_ngram_jaccard_topk, SQL_NGRAM_JACCARD_TOPK),
    "dedup_substring_spans": (q_dedup_substring_spans,
                              SQL_DEDUP_SUBSTRING_SPANS),
    "dedup_substring_stats": (q_dedup_substring_stats,
                              SQL_DEDUP_SUBSTRING_STATS),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
}
