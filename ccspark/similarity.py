"""Approximate-nearest-neighbor search over the embeddings table.

Two paths, per the training-data-pipeline mandate:

- brute-force cosine top-k (the correctness baseline): query rows ×
  candidate rows equi-free join, dot products evaluated JVM-side with a
  strict left-to-right `aggregate` fold (deterministic float order —
  reproducible across batch sizes and engines);
- LSH-bucketed ANN (the scale path): 8 random-hyperplane sign bits with
  md5-derived ±1 weights → 256 buckets; at 100 TB the bucket id is the
  shuffle key, so candidate generation is a bucket-local join instead of
  a full cross product. An IVF variant would swap the hash for k-means
  centroid ids — same plan shape.

All vector math is on `array<double>` (embeddings cast from float) so
Spark and DuckDB run the identical IEEE op sequence; similarities are
rounded to 6 decimals and rankings use (sim, vec_id) total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .analytics import t

N_PLANES = 8
N_QUERIES = 10
TOP_K = 5


def emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (t(spark, sf_dir, "embeddings")
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))


# strict sequential fold — bit-identical to DuckDB's list_dot_product loop
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)")


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))


_DUCK_EMB = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
_DUCK_NORM = (f"SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm"
              f" FROM ({_DUCK_EMB})")

# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------


def q_ann_bruteforce_topk(spark, sf_dir):
    e = _with_norm(emb(spark, sf_dir))
    q = (e.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("norm").alias("qnorm")))
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
                 F.col("norm").alias("cnorm"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sim = F.round(dot / (F.col("qnorm") * F.col("cnorm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc())
    return (q.crossJoin(c)
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id", "sim",
                    F.col("rank").cast("bigint").alias("rank")))


SQL_ANN_BRUTEFORCE_TOPK = (
    "WITH e AS (" + _DUCK_NORM + "),"
    f" q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e"
    f"       WHERE vec_id < {N_QUERIES}),"
    " c AS (SELECT vec_id AS cand_id, v AS cv, norm AS cnorm FROM e),"
    " sims AS (SELECT query_id, cand_id,"
    "   round(list_dot_product(qv, cv) / (qnorm * cnorm), 6) AS sim"
    "   FROM q, c WHERE query_id <> cand_id)"
    " SELECT query_id, cand_id, sim, CAST(rank AS BIGINT) AS rank FROM ("
    "   SELECT *, row_number() OVER (PARTITION BY query_id"
    "     ORDER BY sim DESC, cand_id ASC) AS rank FROM sims)"
    f" WHERE rank <= {TOP_K}")

# ---------------------------------------------------------------------------
# embedding near-dup pairs (dedup family member living here with the
# vector ops): top-50 most-similar pairs within a bounded window
# ---------------------------------------------------------------------------

_PAIR_MAX_VEC = 200


def q_embedding_neardup_topk(spark, sf_dir):
    e = _with_norm(emb(spark, sf_dir)).filter(F.col("vec_id") < _PAIR_MAX_VEC)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("norm").alias("nb"))
    dot = F.expr(_DOT.format(a="va", b="vb"))
    sim = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (a.crossJoin(b)
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cosine", sim)
            .orderBy(F.col("cosine").desc(), F.col("vec_a").asc(),
                     F.col("vec_b").asc())
            .limit(50)
            .select("vec_a", "vec_b", "cosine"))


SQL_EMBEDDING_NEARDUP_TOPK = (
    "WITH e AS (" + _DUCK_NORM + ")"
    " SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
    "  round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine"
    f" FROM e a, e b WHERE a.vec_id < b.vec_id"
    f"  AND a.vec_id < {_PAIR_MAX_VEC} AND b.vec_id < {_PAIR_MAX_VEC}"
    " ORDER BY cosine DESC, vec_a ASC, vec_b ASC LIMIT 50")

# ---------------------------------------------------------------------------
# LSH-bucketed ANN: random-hyperplane signs with md5-derived ±1 weights.
# weight(p, j) = +1 iff first md5 hex digit of "p_j" < 8 — identical on
# both engines; projection is a strict sequential fold.
# ---------------------------------------------------------------------------


def _proj_expr(plane: int) -> str:
    # sum_j v[j-1] * w(plane, j-1), j = 1..64 (1-based fold index)
    return (
        "aggregate(sequence(1, size(v)), CAST(0.0 AS DOUBLE), (acc, j) -> acc +"
        f" v[j - 1] * (CASE WHEN CAST(conv(substring(md5(concat('{plane}', '_', j - 1)), 1, 1),"
        " 16, 10) AS INT) < 8 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))"
    )


def _duck_proj(plane: int) -> str:
    return (
        "list_sum(list_transform(generate_series(1, len(v)), j ->"
        f" v[j] * (CASE WHEN ('0x' || substr(md5(concat('{plane}', '_', j - 1)), 1, 1))::INT"
        " < 8 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)))"
    )


def q_ann_lsh_buckets(spark, sf_dir):
    e = emb(spark, sf_dir)
    bucket = None
    for p in range(N_PLANES):
        term = F.when(F.expr(_proj_expr(p)) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return e.select("vec_id", bucket.cast("bigint").alias("bucket"))


SQL_ANN_LSH_BUCKETS = (
    "SELECT vec_id, CAST("
    + " + ".join(
        f"(CASE WHEN {_duck_proj(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES))
    + " AS BIGINT) AS bucket FROM (" + _DUCK_EMB + ")")


def q_ann_lsh_topk(spark, sf_dir):
    """Bucket-local top-k: same ranking as brute force but candidates are
    restricted to the query's LSH bucket — the join key that makes ANN a
    bucket-partitioned shuffle at scale."""
    buckets = q_ann_lsh_buckets(spark, sf_dir)
    e = _with_norm(emb(spark, sf_dir)).join(buckets, "vec_id")
    q = (e.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("norm").alias("qnorm"), "bucket"))
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
                 F.col("norm").alias("cnorm"), "bucket")
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sim = F.round(dot / (F.col("qnorm") * F.col("cnorm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc())
    return (q.join(c, "bucket")
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id", "sim",
                    F.col("rank").cast("bigint").alias("rank")))


SQL_ANN_LSH_TOPK = (
    "WITH bk AS (" + SQL_ANN_LSH_BUCKETS + "),"
    " e AS (SELECT n.vec_id, n.v, n.norm, bk.bucket FROM (" + _DUCK_NORM + ") n"
    "       JOIN bk ON bk.vec_id = n.vec_id),"
    f" q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket FROM e"
    f"       WHERE vec_id < {N_QUERIES}),"
    " c AS (SELECT vec_id AS cand_id, v AS cv, norm AS cnorm, bucket FROM e),"
    " sims AS (SELECT query_id, cand_id,"
    "   round(list_dot_product(qv, cv) / (qnorm * cnorm), 6) AS sim"
    "   FROM q JOIN c USING (bucket) WHERE query_id <> cand_id)"
    " SELECT query_id, cand_id, sim, CAST(rank AS BIGINT) AS rank FROM ("
    "   SELECT *, row_number() OVER (PARTITION BY query_id"
    "     ORDER BY sim DESC, cand_id ASC) AS rank FROM sims)"
    f" WHERE rank <= {TOP_K}")


# ---------------------------------------------------------------------------
# IVF-bucketed ANN: coarse quantizer = K fixed centroid vectors (here the
# first K embeddings stand in for k-means centroids — the assignment and
# probe plumbing is the part that matters at scale); each vector joins its
# nearest cell, queries probe the NPROBE nearest cells. At 100 TB the cell
# id is the shuffle key and the centroid table is a broadcast dim.
# ---------------------------------------------------------------------------

N_CELLS = 16
NPROBE = 2


def _cells(spark, sf_dir):
    """(vec_id, cell, rank) for every vector: rank over cells by rounded
    cosine to the centroid (ties → smaller cell id). rank 1 = assignment;
    rank ≤ NPROBE = query probe set."""
    e = _with_norm(emb(spark, sf_dir))
    cents = (e.filter(F.col("vec_id") < N_CELLS)
             .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
                     F.col("norm").alias("cnorm")))
    dot = F.expr(_DOT.format(a="v", b="cv"))
    sim = F.round(dot / (F.col("norm") * F.col("cnorm")), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    return (e.crossJoin(F.broadcast(cents))
            .withColumn("csim", sim)
            .withColumn("crank", F.row_number().over(w))
            .select("vec_id", "cell", "crank"))


_DUCK_CELLS = (
    "SELECT vec_id, cell, crank FROM ("
    "  SELECT e.vec_id, c.cell,"
    "   row_number() OVER (PARTITION BY e.vec_id ORDER BY"
    "     round(list_dot_product(e.v, c.cv) / (e.norm * c.cnorm), 6) DESC,"
    "     c.cell ASC) AS crank"
    "  FROM (" + _DUCK_NORM + ") e,"
    f"  (SELECT vec_id AS cell, v AS cv, norm AS cnorm FROM (" + _DUCK_NORM + ")"
    f"   WHERE vec_id < {N_CELLS}) c)")


def q_ann_ivf_cells(spark, sf_dir):
    """The IVF assignment itself (rank-1 cell per vector)."""
    return (_cells(spark, sf_dir).filter(F.col("crank") == 1)
            .select("vec_id", F.col("cell").cast("bigint").alias("cell")))


SQL_ANN_IVF_CELLS = (
    "SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM ("
    + _DUCK_CELLS + ") WHERE crank = 1")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF search: probe the NPROBE nearest cells, rank candidates inside
    probed cells by cosine. Join key = cell (the bucket-partitioned path)."""
    cells = _cells(spark, sf_dir)
    assign = (cells.filter(F.col("crank") == 1).select("vec_id", "cell"))
    probes = (cells.filter(F.col("crank") <= NPROBE)
              .filter(F.col("vec_id") < N_QUERIES)
              .select(F.col("vec_id").alias("query_id"), "cell"))
    e = _with_norm(emb(spark, sf_dir))
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("norm").alias("qnorm"))
    c = (e.join(assign, "vec_id")
         .select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
                 F.col("norm").alias("cnorm"), "cell"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sim = F.round(dot / (F.col("qnorm") * F.col("cnorm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc())
    return (probes.join(c, "cell").join(q, "query_id")
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn("sim", sim)
            .dropDuplicates(["query_id", "cand_id"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id", "sim",
                    F.col("rank").cast("bigint").alias("rank")))


SQL_ANN_IVF_TOPK = (
    "WITH cells AS (" + _DUCK_CELLS + "),"
    " assign AS (SELECT vec_id, cell FROM cells WHERE crank = 1),"
    f" probes AS (SELECT vec_id AS query_id, cell FROM cells"
    f"   WHERE crank <= {NPROBE} AND vec_id < {N_QUERIES}),"
    " e AS (" + _DUCK_NORM + "),"
    " q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e),"
    " c AS (SELECT e.vec_id AS cand_id, e.v AS cv, e.norm AS cnorm, a.cell"
    "   FROM e JOIN assign a ON a.vec_id = e.vec_id),"
    " sims AS (SELECT DISTINCT p.query_id, c.cand_id,"
    "   round(list_dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm), 6) AS sim"
    "   FROM probes p JOIN c USING (cell) JOIN q USING (query_id)"
    "   WHERE p.query_id <> c.cand_id)"
    " SELECT query_id, cand_id, sim, CAST(rank AS BIGINT) AS rank FROM ("
    "   SELECT *, row_number() OVER (PARTITION BY query_id"
    "     ORDER BY sim DESC, cand_id ASC) AS rank FROM sims)"
    f" WHERE rank <= {TOP_K}")


REG: dict[str, tuple] = {
    "ann_bruteforce_topk": (q_ann_bruteforce_topk, SQL_ANN_BRUTEFORCE_TOPK),
    "embedding_neardup_topk": (q_embedding_neardup_topk, SQL_EMBEDDING_NEARDUP_TOPK),
    "ann_lsh_buckets": (q_ann_lsh_buckets, SQL_ANN_LSH_BUCKETS),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "ann_ivf_cells": (q_ann_ivf_cells, SQL_ANN_IVF_CELLS),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
}
