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
# weight(p, j) = +1 iff first md5 hex digit of "p_j" < 8. The weights are
# ROW-INDEPENDENT, so they are derived ONCE here (driver-side, the same
# md5 rule both engines previously evaluated inline) and inlined as array
# literals — round 1 recomputed 8 planes × 64 md5 calls per ROW inside
# the fold. The projection stays a strict sequential fold (same IEEE op
# order), so bucket values are unchanged.
# ---------------------------------------------------------------------------

EMB_DIM = 64   # embeddings table vector width (pinned by tests)


def _plane_weights(plane: int, dim: int = EMB_DIM) -> list[float]:
    import hashlib
    return [1.0 if int(hashlib.md5(f"{plane}_{j}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for j in range(dim)]


def _proj_expr(plane: int) -> str:
    w = ", ".join(f"{x:.1f}D" for x in _plane_weights(plane))
    # zip_with(v, w) keeps the per-element multiply, then the same strict
    # left-to-right fold as before: acc + (v[j] * w[j]) in index order
    return (f"aggregate(zip_with(v, array({w}), (x, wt) -> x * wt),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def _duck_proj(plane: int) -> str:
    w = ", ".join(f"{x:.1f}" for x in _plane_weights(plane))
    return f"list_dot_product(v, [{w}]::DOUBLE[])"


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
# IVF-bucketed ANN: coarse quantizer = N_CELLS centroids trained by a
# DETERMINISTIC spherical k-means (the IVFPQ coarse-quantizer analog of
# IndexingManage.java:68-80): init = first K vectors, KMEANS_ITERS Lloyd
# rounds of (assign to max rounded-cosine cell, ties → smaller cell) then
# (elementwise mean). The mean folds vectors in vec_id order (sort_array /
# list(ORDER BY)), so Spark and DuckDB run the identical IEEE op sequence
# and centroids are bit-equal — no order-dependent float summation.
# Empty cells keep their previous centroid. Each vector then joins its
# nearest cell; queries probe the NPROBE nearest cells. At 100 TB the
# cell id is the shuffle key, the centroid table a broadcast dim, and
# centroid TRAINING runs on a bounded sample (the standard IVF recipe)
# while assignment/probe stays full-corpus.
# ---------------------------------------------------------------------------

N_CELLS = 16
NPROBE = 2
KMEANS_ITERS = 3


def _centroids(spark, sf_dir) -> DataFrame:
    e = _with_norm(emb(spark, sf_dir))
    cents = (e.filter(F.col("vec_id") < N_CELLS)
             .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv")))
    mean_expr = (
        f"transform(aggregate(arr, array_repeat(CAST(0.0 AS DOUBLE), {EMB_DIM}),"
        " (acc, e) -> zip_with(acc, e.v, (a, b) -> a + b)), x -> x / n)")
    for _ in range(KMEANS_ITERS):
        cn = cents.withColumn(
            "cnorm", F.expr("sqrt(" + _DOT.format(a="cv", b="cv") + ")"))
        sim = F.round(F.expr(_DOT.format(a="v", b="cv"))
                      / (F.col("norm") * F.col("cnorm")), 6)
        w = Window.partitionBy("vec_id").orderBy(
            F.col("csim").desc(), F.col("cell").asc())
        assign = (e.crossJoin(F.broadcast(cn))
                  .withColumn("csim", sim)
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("vec_id", "cell", "v"))
        means = (assign.groupBy("cell")
                 .agg(F.sort_array(F.collect_list(F.struct("vec_id", "v")))
                      .alias("arr"),
                      F.count(F.lit(1)).alias("n"))
                 .select("cell", F.expr(mean_expr).alias("ncv")))
        cents = (cents.join(means, "cell", "left")
                 .select("cell", F.coalesce("ncv", "cv").alias("cv")))
    return cents


def _cells(spark, sf_dir):
    """(vec_id, cell, rank) for every vector: rank over cells by rounded
    cosine to the trained centroid (ties → smaller cell id). rank 1 =
    assignment; rank ≤ NPROBE = query probe set."""
    e = _with_norm(emb(spark, sf_dir))
    cents = _centroids(spark, sf_dir).withColumn(
        "cnorm", F.expr("sqrt(" + _DOT.format(a="cv", b="cv") + ")"))
    dot = F.expr(_DOT.format(a="v", b="cv"))
    sim = F.round(dot / (F.col("norm") * F.col("cnorm")), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    return (e.crossJoin(F.broadcast(cents))
            .withColumn("csim", sim)
            .withColumn("crank", F.row_number().over(w))
            .select("vec_id", "cell", "crank"))


def _duck_centroid_ctes() -> str:
    """The Lloyd loop as a flat CTE chain (c0 → a1/g1/m1/c1 → … → cK)."""
    parts = [
        "e AS (" + _DUCK_NORM + ")",
        f"c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {N_CELLS})",
    ]
    for it in range(1, KMEANS_ITERS + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"a{it} AS (SELECT vec_id, cell, v FROM ("
            " SELECT e.vec_id, c.cell, e.v, row_number() OVER ("
            "  PARTITION BY e.vec_id ORDER BY"
            "  round(list_dot_product(e.v, c.cv)"
            "        / (e.norm * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,"
            f"  c.cell ASC) AS rn FROM e, {prev} c) WHERE rn = 1)")
        parts.append(
            f"g{it} AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,"
            f" list(v ORDER BY vec_id) AS arr FROM a{it} GROUP BY cell)")
        parts.append(
            f"m{it} AS (SELECT cell, list_transform(list_reduce(arr,"
            " (acc, x) -> list_transform(generate_series(1, len(acc)),"
            " i -> acc[i] + x[i])),"
            f" s -> s / n) AS ncv FROM g{it})")
        parts.append(
            f"c{it} AS (SELECT p.cell, coalesce(m.ncv, p.cv) AS cv"
            f" FROM {prev} p LEFT JOIN m{it} m USING (cell))")
    return ", ".join(parts)


_DUCK_CELLS_BODY = (
    "SELECT vec_id, cell, crank FROM ("
    "  SELECT e.vec_id, c.cell,"
    "   row_number() OVER (PARTITION BY e.vec_id ORDER BY"
    "     round(list_dot_product(e.v, c.cv)"
    "           / (e.norm * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,"
    "     c.cell ASC) AS crank"
    f"  FROM e, c{KMEANS_ITERS} c)")


def q_ann_ivf_cells(spark, sf_dir):
    """The IVF assignment itself (rank-1 cell per vector)."""
    return (_cells(spark, sf_dir).filter(F.col("crank") == 1)
            .select("vec_id", F.col("cell").cast("bigint").alias("cell")))


SQL_ANN_IVF_CELLS = (
    "WITH " + _duck_centroid_ctes() + ","
    " cells AS (" + _DUCK_CELLS_BODY + ")"
    " SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM cells WHERE crank = 1")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF search: probe the NPROBE nearest cells, rank candidates inside
    probed cells by cosine. Join key = cell (the bucket-partitioned path)."""
    # persisted: assign + probes both consume it — without this the
    # 3-iteration coarse k-means chain executes twice per search
    cells = _cells(spark, sf_dir).persist()
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
    "WITH " + _duck_centroid_ctes() + ","
    " cells AS (" + _DUCK_CELLS_BODY + "),"
    " assign AS (SELECT vec_id, cell FROM cells WHERE crank = 1),"
    f" probes AS (SELECT vec_id AS query_id, cell FROM cells"
    f"   WHERE crank <= {NPROBE} AND vec_id < {N_QUERIES}),"
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


# ---------------------------------------------------------------------------
# classifier evaluation parity — the reference's only quantitative
# self-check is a hand-rolled dual-class confusion matrix + F1
# (FakeArffCreator.java:54-119). Same arithmetic here, evaluated for a
# SQL-expressible threshold classifier: plane-0 hyperplane projection > 0
# predicts BIG, ground truth = embeddings.label >= 5. All counts are
# integers and every F1 is a single int-ratio division (plus one exact
# add/halve for the macro average), so both engines produce bit-equal
# doubles. The PRIORITY-threshold variant of the same arithmetic runs
# over the crawl fixture against the pure-Python oracle (crawl REG +
# tests), where the 23-feature kernel lives.
# ---------------------------------------------------------------------------

_EVAL_LABEL_SPLIT = 5


def confusion_f1(d: DataFrame) -> DataFrame:
    """FakeArffCreator.java:54-119 arithmetic over a DataFrame with
    boolean columns pred_big/truth_big → one row of the six confusion
    counts and the three F1 scores (f1 = 2TP/(2TP+FN+FP), macro avg)."""
    c = lambda cond, name: F.sum(F.when(cond, 1).otherwise(0)) \
        .cast("bigint").alias(name)
    P, T = F.col("pred_big"), F.col("truth_big")
    m = d.agg(
        c(T & P, "tp_big"), c(T & ~P, "fn_big"), c(~T & P, "fp_big"),
        c(~T & ~P, "tp_small"), c(~T & P, "fn_small"), c(T & ~P, "fp_small"))
    f1_big = (2 * F.col("tp_big")
              / (2 * F.col("tp_big") + F.col("fn_big") + F.col("fp_big")))
    f1_small = (2 * F.col("tp_small")
                / (2 * F.col("tp_small") + F.col("fn_small") + F.col("fp_small")))
    return m.select(
        "tp_big", "fn_big", "fp_big", "tp_small", "fn_small", "fp_small",
        f1_big.alias("f1_big"), f1_small.alias("f1_small"),
        ((f1_big + f1_small) / 2).alias("f1_avg"))


def q_classifier_eval(spark, sf_dir):
    e = (t(spark, sf_dir, "embeddings")
         .select(F.col("label"),
                 F.col("embedding").cast("array<double>").alias("v")))
    return confusion_f1(e.select(
        (F.expr(_proj_expr(0)) > 0).alias("pred_big"),
        (F.col("label") >= _EVAL_LABEL_SPLIT).alias("truth_big")))


SQL_CLASSIFIER_EVAL = (
    "WITH d AS (SELECT (" + _duck_proj(0) + ") > 0 AS pred_big,"
    f"  label >= {_EVAL_LABEL_SPLIT} AS truth_big FROM"
    "  (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)),"
    " m AS (SELECT"
    "  CAST(sum(CASE WHEN truth_big AND pred_big THEN 1 ELSE 0 END) AS BIGINT) AS tp_big,"
    "  CAST(sum(CASE WHEN truth_big AND NOT pred_big THEN 1 ELSE 0 END) AS BIGINT) AS fn_big,"
    "  CAST(sum(CASE WHEN NOT truth_big AND pred_big THEN 1 ELSE 0 END) AS BIGINT) AS fp_big,"
    "  CAST(sum(CASE WHEN NOT truth_big AND NOT pred_big THEN 1 ELSE 0 END) AS BIGINT) AS tp_small,"
    "  CAST(sum(CASE WHEN NOT truth_big AND pred_big THEN 1 ELSE 0 END) AS BIGINT) AS fn_small,"
    "  CAST(sum(CASE WHEN truth_big AND NOT pred_big THEN 1 ELSE 0 END) AS BIGINT) AS fp_small"
    "  FROM d)"
    " SELECT tp_big, fn_big, fp_big, tp_small, fn_small, fp_small,"
    "  2 * tp_big / (2 * tp_big + fn_big + fp_big) AS f1_big,"
    "  2 * tp_small / (2 * tp_small + fn_small + fp_small) AS f1_small,"
    "  (2 * tp_big / (2 * tp_big + fn_big + fp_big)"
    "   + 2 * tp_small / (2 * tp_small + fn_small + fp_small)) / 2 AS f1_avg"
    " FROM m")


# ---------------------------------------------------------------------------
# IVFADC: the reference's actual index is IVF + product quantization
# (IndexingManage.java:68-80: 8192 coarse centroids, 64-dim, 8-bit PQ
# codes, ADC over RESIDUALS); this is the fixture-scale analog — coarse =
# the k-means IVF above (N_CELLS cells, NPROBE probes), fine = PQ_M=16
# subspaces × PQ_K=256 codes (8-bit, reference parity) over the COARSE
# RESIDUAL r = nv − ref(cell), where nv is the unit-normalized vector
# and ref(cell) the per-cell MEAN of the normalized members (_cell_refs)
# — the L2-optimal reference in the space the PQ quantizes: residual
# energy is 1 − ρ² (ρ = cell coherence) vs the non-residual 1. The r4
# config ladder at sf0.1 (ADC-only recall@5 vs brute force, measured):
# non-residual 8×16 = 0.28 (r3) → unit-centroid residual 8×16 = 0.22
# (inflates residual energy to 2(1−ρ), WORSE — rejected) → mean-ref
# residual 8×64 = 0.36, 8×256 = 0.40, 16×64 = 0.46, **16×256 = 0.58**.
# Squared-L2 ADC on residuals equals squared-L2 on the originals when
# query and candidate share the cell — which the probe join guarantees —
# and L2 ordering tracks cosine on unit vectors (||a-b||² = 2-2cos).
# The query-side LUT is therefore PER PROBED CELL: q's residual vs THAT
# cell's reference, keyed (query, cell, m, code).
# Determinism recipe shared with the IVF trainer: init = residual
# subvectors of the first PQ_K vectors, Lloyd assignment by 6-rounded
# distance with ties → smaller code, means folded in vec_id order —
# bit-equal codebooks across engines. ADC distances are summed as
# integer micro-units (round(d2,6)*1e6 per subspace, BIGINT sum), so the
# PQ_M-way sum is exact and engine-order-independent.
#
# Scale story: codebooks are PQ_M*PQ_K tiny rows (broadcast dim); codes
# are 16 bytes per doc (32× under the raw 512-byte vector) — the
# compression that removes the uncompressed-candidate-vector memory wall
# at 100 TB; the ADC join keys on (query, cell, m, code) against a
# broadcast LUT (N_QUERIES × NPROBE × PQ_M × PQ_K rows — still a
# broadcast dim), candidates stay cell-partitioned from the IVF probe.
# Only the LUT uses raw query vectors.
# ---------------------------------------------------------------------------

# r5: PQ_M 16 → 32 (2-dim subspaces, 32 B/vector — the documented
# 32-byte code budget, still 16× under the raw 512-byte vector).
# Measured ADC-only recall@5 ladder at sf0.1 vs brute force:
# 16×256 iters=2 = 0.58 (r4) → 16×256 iters=5 = 0.64 (Lloyd headroom
# exhausted at 16 B) → **32×256 iters=2 = 0.80** (target ≥0.7 met);
# re-rank recall unchanged at 0.94 (the IVF probe-coverage ceiling).
PQ_M = 32
PQ_DSUB = EMB_DIM // PQ_M
PQ_K = 256
PQ_ITERS = 2

def _cell_refs(spark, sf_dir, assign: DataFrame | None = None) -> DataFrame:
    """(cell, ncv): residual reference points = per-cell MEAN of the
    unit-normalized members (deterministic vec_id-ordered fold, same
    recipe as the coarse trainer). The mean of nv is the L2-optimal
    reference in the normalized space the PQ actually quantizes:
    residual energy is 1 − ρ² (ρ = cell coherence), strictly below the
    non-residual 1. Using the UNIT-normalized centroid instead inflates
    it to 2(1 − ρ) > 1 — measured WORSE than no residual at all on this
    data (sf0.1 ADC recall 0.22 vs 0.28)."""
    e = _with_norm(emb(spark, sf_dir))
    # (signature below takes the shared rank-1 assignment when the
    # caller already built it — see _pq_shared)
    mean_expr = (
        f"transform(aggregate(arr, array_repeat(CAST(0.0 AS DOUBLE), {EMB_DIM}),"
        " (acc, e) -> zip_with(acc, e.nv, (a, b) -> a + b)), x -> x / n)")
    if assign is None:
        assign = _assign_df(spark, sf_dir)
    return (e.withColumn("nv", F.expr("transform(v, x -> x / norm)"))
            .join(assign, "vec_id")
            .groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("vec_id", "nv")))
                 .alias("arr"),
                 F.count(F.lit(1)).alias("n"))
            .select("cell", F.expr(mean_expr).alias("ncv")))


def _residual_subvectors(spark, sf_dir, assign: DataFrame,
                         refs: DataFrame | None = None) -> DataFrame:
    """(vec_id, cell, m, sv): PQ_DSUB-wide slices of the coarse residual
    nv − ĉ(cell), one row per (vector, assigned cell, subspace).
    `assign` is (vec_id, cell) — rank-1 assignment for encoding, the
    NPROBE probe set for the query-side LUT (one residual per probed
    cell)."""
    e = _with_norm(emb(spark, sf_dir))
    ms = F.expr(
        f"transform(sequence(0, {PQ_M - 1}), m -> struct(m AS m,"
        f" slice(rv, m * {PQ_DSUB} + 1, {PQ_DSUB}) AS sv))")
    if refs is None:
        refs = _cell_refs(spark, sf_dir)
    return (e.withColumn("nv", F.expr("transform(v, x -> x / norm)"))
            .join(assign, "vec_id")
            .join(F.broadcast(refs), "cell")
            .withColumn("rv", F.expr("zip_with(nv, ncv, (a, b) -> a - b)"))
            .select("vec_id", "cell", F.explode(ms).alias("s"))
            .select("vec_id", "cell", F.col("s.m").alias("m"),
                    F.col("s.sv").alias("sv"))
            # ||sv||^2 once per row: distances use the dot expansion
            # ||s-c||^2 = svv - 2 s.c + cvv — ONE native fold per pair
            # instead of a zip+fold lambda (the Lloyd/code/LUT hot path)
            .withColumn("svv", F.expr(_DOT.format(a="sv", b="sv"))))


def _assign_df(spark, sf_dir) -> DataFrame:
    return (_cells(spark, sf_dir).filter(F.col("crank") == 1)
            .select("vec_id", "cell"))


def _pq_codebooks(spark, sf_dir, sub: DataFrame | None = None) -> DataFrame:
    """(m, code, cv): PQ_K centroids per subspace over RESIDUAL
    subvectors, all PQ_M subspaces trained in ONE k-means keyed by m
    (the subspace id is just another grouping column — no per-subspace
    jobs). One codebook shared across cells (standard IVFADC)."""
    if sub is None:
        sub = _residual_subvectors(spark, sf_dir, _assign_df(spark, sf_dir))
    cb = (sub.filter(F.col("vec_id") < PQ_K)
          .select("m", F.col("vec_id").alias("code"), F.col("sv").alias("cv")))
    mean_expr = (
        f"transform(aggregate(arr, array_repeat(CAST(0.0 AS DOUBLE), {PQ_DSUB}),"
        " (acc, e) -> zip_with(acc, e.sv, (a, b) -> a + b)), x -> x / n)")
    for _ in range(PQ_ITERS):
        cbv = cb.withColumn("cvv", F.expr(_DOT.format(a="cv", b="cv")))
        pd = F.round(F.col("svv") - 2 * F.expr(_DOT.format(a="sv", b="cv"))
                     + F.col("cvv"), 6)
        # argmin by (pd, code) as a map-side-combinable min(struct):
        # identical pick to the DuckDB twin's row_number ORDER BY pd, code
        # (code is unique per group, so the trailing sv never compares),
        # but the partial agg collapses the PQ_K candidate rows per
        # (vector, subspace) before the shuffle instead of sorting them
        # through a window exchange each Lloyd iteration.
        assign = (sub.join(F.broadcast(cbv), "m")
                  .withColumn("pd", pd)
                  .groupBy("vec_id", "m")
                  .agg(F.min(F.struct("pd", "code", "sv")).alias("mn"))
                  .select("vec_id", "m", F.col("mn.code").alias("code"),
                          F.col("mn.sv").alias("sv")))
        means = (assign.groupBy("m", "code")
                 .agg(F.sort_array(F.collect_list(F.struct("vec_id", "sv")))
                      .alias("arr"),
                      F.count(F.lit(1)).alias("n"))
                 .select("m", "code", F.expr(mean_expr).alias("ncv")))
        cb = (cb.join(means, ["m", "code"], "left")
              .select("m", "code", F.coalesce("ncv", "cv").alias("cv")))
    return cb


def _pq_codes(spark, sf_dir, sub: DataFrame | None = None,
              cb: DataFrame | None = None) -> DataFrame:
    """(vec_id, m, code): nearest trained codeword per RESIDUAL subspace
    — the PQ_M-small-ints-per-doc compressed representation
    (32 bytes/vector at PQ_M=32 × 8-bit codes — 16× under the raw
    512-byte float64 vector)."""
    if sub is None:
        sub = _residual_subvectors(spark, sf_dir, _assign_df(spark, sf_dir))
    if cb is None:
        cb = _pq_codebooks(spark, sf_dir, sub)
    cb = cb.withColumn("cvv", F.expr(_DOT.format(a="cv", b="cv")))
    pd = F.round(F.col("svv") - 2 * F.expr(_DOT.format(a="sv", b="cv"))
                 + F.col("cvv"), 6)
    # same min(struct) argmin as the Lloyd loop (see _pq_codebooks)
    return (sub.join(F.broadcast(cb), "m")
            .withColumn("pd", pd)
            .groupBy("vec_id", "m")
            .agg(F.min(F.struct("pd", "code")).alias("mn"))
            .select("vec_id", "m", F.col("mn.code").alias("code")))


def _pq_shared(spark, sf_dir):
    """Build the IVFADC training chain ONCE, persisted at every reuse
    point: cells (the 3-iteration coarse k-means — every consumer
    re-derives it otherwise), the per-cell residual references, the
    residual subvectors (reused by 2 Lloyd iterations + the final code
    assignment), and the trained codebooks. Without this the lazy plan
    re-executes the whole k-means chain once per consumer (~6× for the
    re-rank query — measured 95 s → ~8 s at sf0.1). All frames are tiny
    relative to the corpus (codebooks/refs are broadcast dims; sub is
    PQ_M rows/vector), and at 100 TB the trainer runs on a bounded
    sample anyway (see SCALE.md), so MEMORY_AND_DISK persists are safe."""
    cells = _cells(spark, sf_dir).persist()
    assign = cells.filter(F.col("crank") == 1).select("vec_id", "cell")
    refs = _cell_refs(spark, sf_dir, assign).persist()
    sub = _residual_subvectors(spark, sf_dir, assign, refs).persist()
    cb = _pq_codebooks(spark, sf_dir, sub).persist()
    return cells, assign, refs, sub, cb


def _pq_codes_shared(spark, sf_dir, sub, cb):
    """The encoded corpus, persisted: PQ_M small ints per vector — the
    index a serving deployment stores, and the frame every search query
    probes. Without the persist the ADC plan re-runs the full 8.2M-pair
    nearest-codeword assignment per consumer (measured ~2.5 s/run at
    sf0.1); the codes table itself is 32 bytes/vector."""
    return _pq_codes(spark, sf_dir, sub, cb).persist()


def q_ann_ivfpq_codes(spark, sf_dir):
    _cells_df, _assign, _refs, sub, cb = _pq_shared(spark, sf_dir)
    return (_pq_codes(spark, sf_dir, sub, cb)
            .select("vec_id", F.col("m").cast("bigint").alias("m"),
                    F.col("code").cast("bigint").alias("code")))


# integer micro-units: round kills the last-ulp noise, the outer round
# (not a bare cast — Spark truncates, DuckDB rounds) makes the BIGINT
# conversion identical in both engines
_MICRO = 1_000_000


def _ivfpq_adc(spark, sf_dir, topn: int) -> DataFrame:
    """IVFADC search core: IVF-probe candidate generation (cell join) +
    residual ADC scoring — the LUT holds, PER PROBED CELL, the distances
    from the query's residual-vs-that-cell subvectors to every codeword;
    a candidate in cell c is scored against the query's cell-c LUT rows
    (join key (query, cell, m, code)), so query and candidate residuals
    share the reference centroid and the ADC distance estimates the true
    inter-vector distance. Candidate score = BIGINT sum of its PQ_M code
    lookups; top-`topn` per query by (adist_u, cand_id)."""
    cells, assign, refs, sub, cb = _pq_shared(spark, sf_dir)
    probes = (cells.filter(F.col("crank") <= NPROBE)
              .filter(F.col("vec_id") < N_QUERIES)
              .select(F.col("vec_id").alias("query_id"), "cell"))
    codes = (_pq_codes_shared(spark, sf_dir, sub, cb)
             .withColumnRenamed("vec_id", "cand_id"))
    # query residual per PROBED cell (probes as the assignment input)
    qsub = (_residual_subvectors(
                spark, sf_dir,
                probes.select(F.col("query_id").alias("vec_id"), "cell"),
                refs)
            .withColumnRenamed("vec_id", "query_id"))
    pd_u = F.round(F.round(F.col("svv")
                           - 2 * F.expr(_DOT.format(a="sv", b="cv"))
                           + F.col("cvv"), 6)
                   * F.lit(float(_MICRO)), 0).cast("bigint")
    cbv = cb.withColumn("cvv", F.expr(_DOT.format(a="cv", b="cv")))
    lut = (qsub.join(F.broadcast(cbv), "m")
           .select("query_id", "cell", "m", "code", pd_u.alias("pd_u")))
    pairs = (probes
             .join(assign.withColumnRenamed("vec_id", "cand_id"), "cell")
             .filter(F.col("query_id") != F.col("cand_id"))
             .select("query_id", "cand_id", "cell")
             .dropDuplicates(["query_id", "cand_id"]))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_u").asc(), F.col("cand_id").asc())
    return (pairs.join(codes, "cand_id")
            .join(lut, ["query_id", "cell", "m", "code"])
            .groupBy("query_id", "cand_id")
            .agg(F.sum("pd_u").alias("adist_u"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topn)
            .select("query_id", "cand_id",
                    F.round(F.col("adist_u") / F.lit(float(_MICRO)), 6)
                    .alias("adist"),
                    F.col("rank").cast("bigint").alias("rank")))


def q_ann_ivfpq_topk(spark, sf_dir):
    return _ivfpq_adc(spark, sf_dir, TOP_K)


# ADC shortlist width for the exact re-rank stage: 32x the final k,
# measured at sf0.1 (2000 vectors, ~245-vector probe sets): the 32-bit
# codes rank coarsely (ADC-only recall ~0.3), so recall@5 after exact
# re-rank is 0.72 at R=8k, 0.92 at R=32k, and saturates at the 0.94 IVF
# probe-coverage ceiling by R=64k — 32k keeps the shortlist genuinely
# narrower than the probe set while giving up only 0.02 to the ceiling.
# A wider shortlist is nearly free (the ADC scores already exist — this
# only moves the row_number cutoff); the exact stage touches raw vectors
# for just RERANK_R rows per query, which is the whole point of PQ.
RERANK_R = 32 * TOP_K


def q_ann_ivfpq_rerank_topk(spark, sf_dir):
    """IVFPQ + exact re-rank — the standard production serving pattern
    the compressed index is designed for (ref IndexingManager pairs the
    IVFPQ index with exact-vector re-scoring of the shortlist): ADC
    shortlists RERANK_R candidates per query from 32-bit codes, then
    ONLY those rows join the raw vectors for an exact-cosine re-rank to
    TOP_K.

    Scale story: at 100 TB the candidate vectors never materialize —
    the shortlist join keys on cand_id against the (bucketed) embedding
    table and moves R rows per query, not a probe set; everything
    upstream stays PQ_M-small-ints-per-doc. Recovers near-IVF recall at PQ
    memory cost."""
    shortlist = (_ivfpq_adc(spark, sf_dir, RERANK_R)
                 .select("query_id", "cand_id"))
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
    return (shortlist.join(c, "cand_id").join(F.broadcast(q), "query_id")
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id", "sim",
                    F.col("rank").cast("bigint").alias("rank")))


def q_ann_ivfpq_rerank_recall(spark, sf_dir):
    """recall@k of the re-ranked IVFPQ search vs exact brute force — the
    number that shows the shortlist-then-exact stage recovering the
    recall the 32-bit codes alone give up."""
    bf = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    rr = q_ann_ivfpq_rerank_topk(spark, sf_dir).select("query_id", "cand_id")
    hit = bf.join(rr, ["query_id", "cand_id"], "left_semi")
    return (hit.agg(F.count(F.lit(1)).alias("hits"))
            .crossJoin(bf.agg(F.count(F.lit(1)).alias("total")))
            .select("hits", "total",
                    F.round(F.col("hits") / F.col("total"), 6).alias("recall")))


def _duck_pq_ctes() -> str:
    """Residual subvectors + the PQ Lloyd chain pb0 → … → pb{PQ_ITERS} +
    pqcodes, mirroring _residual_subvectors/_pq_codebooks/_pq_codes
    op-for-op. Requires the centroid chain (c{KMEANS_ITERS}) and `cells`
    CTEs in scope."""
    parts = [
        "assign0 AS (SELECT vec_id, cell FROM cells WHERE crank = 1)",
        "nv_t AS (SELECT vec_id, list_transform(v, x -> x / norm) AS nv"
        " FROM e)",
        # residual reference = per-cell mean of nv (vec_id-ordered fold,
        # mirror of _cell_refs)
        "ng0 AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,"
        " list(nv ORDER BY vec_id) AS arr"
        " FROM nv_t t JOIN assign0 a USING (vec_id) GROUP BY cell)",
        "ncents AS (SELECT cell, list_transform(list_reduce(arr,"
        " (acc, x) -> list_transform(generate_series(1, len(acc)),"
        " i -> acc[i] + x[i])), s -> s / n) AS ncv FROM ng0)",
        f"rv_t AS (SELECT t.vec_id, a.cell,"
        f" list_transform(generate_series(1, {EMB_DIM}),"
        f" i -> t.nv[i] - n.ncv[i]) AS rv"
        f" FROM nv_t t JOIN assign0 a USING (vec_id)"
        f" JOIN ncents n USING (cell))",
        f"nsub0 AS (SELECT vec_id, cell, g.m,"
        f" rv[(g.m * {PQ_DSUB} + 1):(g.m * {PQ_DSUB} + {PQ_DSUB})] AS sv"
        f" FROM rv_t, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) g)",
        "nsub AS (SELECT vec_id, cell, m, sv,"
        " list_dot_product(sv, sv) AS svv FROM nsub0)",
        f"pb0 AS (SELECT m, vec_id AS code, sv AS cv FROM nsub"
        f" WHERE vec_id < {PQ_K})",
    ]
    # dot expansion (see the Spark side): native list_dot_product folds
    # instead of interpreted generate_series lambdas — same formula both
    # engines, so doubles stay bit-equal
    d2 = "(s.svv - 2 * list_dot_product(s.sv, c.cv) + c.cvv)"
    for it in range(1, PQ_ITERS + 1):
        prev = f"pbv{it - 1}"
        parts.append(
            f"pbv{it - 1} AS (SELECT m, code, cv,"
            f" list_dot_product(cv, cv) AS cvv FROM pb{it - 1})")
        parts.append(
            f"pa{it} AS (SELECT vec_id, m, code, sv FROM ("
            " SELECT s.vec_id, s.m, c.code, s.sv, row_number() OVER ("
            "  PARTITION BY s.vec_id, s.m ORDER BY"
            f"  round({d2}, 6) ASC, c.code ASC) AS rn"
            f" FROM nsub s JOIN {prev} c USING (m)) WHERE rn = 1)")
        parts.append(
            f"pg{it} AS (SELECT m, code, CAST(count(*) AS BIGINT) AS n,"
            f" list(sv ORDER BY vec_id) AS arr FROM pa{it} GROUP BY m, code)")
        parts.append(
            f"pm{it} AS (SELECT m, code, list_transform(list_reduce(arr,"
            " (acc, x) -> list_transform(generate_series(1, len(acc)),"
            " i -> acc[i] + x[i])),"
            f" s -> s / n) AS ncv FROM pg{it})")
        parts.append(
            f"pb{it} AS (SELECT p.m, p.code, coalesce(q.ncv, p.cv) AS cv"
            f" FROM {prev} p LEFT JOIN pm{it} q USING (m, code))")
    parts.append(
        f"pbv{PQ_ITERS} AS (SELECT m, code, cv,"
        f" list_dot_product(cv, cv) AS cvv FROM pb{PQ_ITERS})")
    parts.append(
        "pqcodes AS (SELECT vec_id, m, code FROM ("
        " SELECT s.vec_id, s.m, c.code, row_number() OVER ("
        "  PARTITION BY s.vec_id, s.m ORDER BY"
        f"  round({d2}, 6) ASC, c.code ASC) AS rn"
        f" FROM nsub s JOIN pbv{PQ_ITERS} c USING (m)) WHERE rn = 1)")
    return ", ".join(parts)


SQL_ANN_IVFPQ_CODES = (
    "WITH " + _duck_centroid_ctes() + ","
    " cells AS (" + _DUCK_CELLS_BODY + "),"
    " " + _duck_pq_ctes() +
    " SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code"
    " FROM pqcodes")


def _sql_ivfpq_adc(topn: int) -> str:
    return (
    "WITH " + _duck_centroid_ctes() + ","
    " cells AS (" + _DUCK_CELLS_BODY + "),"
    f" probes AS (SELECT vec_id AS query_id, cell FROM cells"
    f"   WHERE crank <= {NPROBE} AND vec_id < {N_QUERIES}),"
    " " + _duck_pq_ctes() + ","
    # query residual per PROBED cell (mirror of the Spark qsub)
    f" qrv AS (SELECT t.vec_id AS query_id, p.cell,"
    f"   list_transform(generate_series(1, {EMB_DIM}),"
    f"   i -> t.nv[i] - n.ncv[i]) AS rv"
    f"   FROM nv_t t JOIN probes p ON p.query_id = t.vec_id"
    f"   JOIN ncents n USING (cell)),"
    f" qsub0 AS (SELECT query_id, cell, g.m,"
    f"   rv[(g.m * {PQ_DSUB} + 1):(g.m * {PQ_DSUB} + {PQ_DSUB})] AS sv"
    f"   FROM qrv, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) g),"
    " qsub AS (SELECT query_id, cell, m, sv,"
    "   list_dot_product(sv, sv) AS svv FROM qsub0),"
    " lut AS (SELECT q.query_id, q.cell, q.m, c.code,"
    "   CAST(round(round(q.svv - 2 * list_dot_product(q.sv, c.cv)"
    f"     + c.cvv, 6) * {_MICRO}, 0) AS BIGINT) AS pd_u"
    f"   FROM qsub q JOIN pbv{PQ_ITERS} c USING (m)),"
    " pairs AS (SELECT DISTINCT p.query_id, a.vec_id AS cand_id, a.cell"
    "   FROM probes p JOIN assign0 a USING (cell)"
    "   WHERE p.query_id <> a.vec_id),"
    " scored AS (SELECT pr.query_id, pr.cand_id,"
    "   CAST(sum(l.pd_u) AS BIGINT) AS adist_u"
    "   FROM pairs pr"
    "   JOIN pqcodes k ON k.vec_id = pr.cand_id"
    "   JOIN lut l ON l.query_id = pr.query_id AND l.cell = pr.cell"
    "     AND l.m = k.m AND l.code = k.code"
    "   GROUP BY pr.query_id, pr.cand_id)"
    " SELECT query_id, cand_id,"
    f"  round(adist_u / {_MICRO}.0, 6) AS adist,"
    "  CAST(rank AS BIGINT) AS rank FROM ("
    "   SELECT *, row_number() OVER (PARTITION BY query_id"
    "     ORDER BY adist_u ASC, cand_id ASC) AS rank FROM scored)"
    f" WHERE rank <= {topn}")


SQL_ANN_IVFPQ_TOPK = _sql_ivfpq_adc(TOP_K)


def q_ann_ivfpq_recall(spark, sf_dir):
    """recall@k of IVFPQ ADC search vs exact brute-force cosine top-k —
    the end-to-end index-quality metric (coarse quantizer + PQ loss)."""
    bf = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    pq_ = q_ann_ivfpq_topk(spark, sf_dir).select("query_id", "cand_id")
    hit = bf.join(pq_, ["query_id", "cand_id"], "left_semi")
    return (hit.agg(F.count(F.lit(1)).alias("hits"))
            .crossJoin(bf.agg(F.count(F.lit(1)).alias("total")))
            .select("hits", "total",
                    F.round(F.col("hits") / F.col("total"), 6).alias("recall")))


SQL_ANN_IVFPQ_RERANK_TOPK = (
    "WITH sl AS (SELECT query_id, cand_id FROM ("
    + _sql_ivfpq_adc(RERANK_R) + ")),"
    " e2 AS (" + _DUCK_NORM + "),"
    f" q2 AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e2"
    f"   WHERE vec_id < {N_QUERIES}),"
    " c2 AS (SELECT vec_id AS cand_id, v AS cv, norm AS cnorm FROM e2),"
    " sims AS (SELECT sl.query_id, sl.cand_id,"
    "   round(list_dot_product(qv, cv) / (qnorm * cnorm), 6) AS sim"
    "   FROM sl JOIN c2 USING (cand_id) JOIN q2 USING (query_id))"
    " SELECT query_id, cand_id, sim, CAST(rank AS BIGINT) AS rank FROM ("
    "   SELECT *, row_number() OVER (PARTITION BY query_id"
    "     ORDER BY sim DESC, cand_id ASC) AS rank FROM sims)"
    f" WHERE rank <= {TOP_K}")


SQL_ANN_IVFPQ_RERANK_RECALL = (
    "WITH bf AS (" + SQL_ANN_BRUTEFORCE_TOPK + "),"
    " rr AS (" + SQL_ANN_IVFPQ_RERANK_TOPK + "),"
    " h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM bf WHERE EXISTS ("
    "   SELECT 1 FROM rr WHERE rr.query_id = bf.query_id"
    "   AND rr.cand_id = bf.cand_id)),"
    " t2 AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bf)"
    " SELECT hits, total, round(hits / total, 6) AS recall FROM h, t2")


SQL_ANN_IVFPQ_RECALL = (
    "WITH bf AS (" + SQL_ANN_BRUTEFORCE_TOPK + "),"
    " pq AS (" + SQL_ANN_IVFPQ_TOPK + "),"
    " h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM bf WHERE EXISTS ("
    "   SELECT 1 FROM pq WHERE pq.query_id = bf.query_id"
    "   AND pq.cand_id = bf.cand_id)),"
    " t2 AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bf)"
    " SELECT hits, total, round(hits / total, 6) AS recall FROM h, t2")


def q_ann_ivf_recall(spark, sf_dir):
    """recall@k of the IVF probe search vs the exact brute-force top-k —
    the quantizer-quality metric (single row: hits, total, recall)."""
    bf = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    ivf = q_ann_ivf_topk(spark, sf_dir).select("query_id", "cand_id")
    hit = bf.join(ivf, ["query_id", "cand_id"], "left_semi")
    return (hit.agg(F.count(F.lit(1)).alias("hits"))
            .crossJoin(bf.agg(F.count(F.lit(1)).alias("total")))
            .select("hits", "total",
                    F.round(F.col("hits") / F.col("total"), 6).alias("recall")))


SQL_ANN_IVF_RECALL = (
    "WITH bf AS (" + SQL_ANN_BRUTEFORCE_TOPK + "),"
    " ivf AS (" + SQL_ANN_IVF_TOPK + "),"
    " h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM bf WHERE EXISTS ("
    "   SELECT 1 FROM ivf WHERE ivf.query_id = bf.query_id"
    "   AND ivf.cand_id = bf.cand_id)),"
    " t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bf)"
    " SELECT hits, total, round(hits / total, 6) AS recall FROM h, t")


# ---------------------------------------------------------------------------
# int8 embedding quantization — the standard storage/bandwidth cut before
# ANN serving (4x vs float32, 8x vs the cast-to-double compute form): one
# max-abs scale per vector, codes = round(x / scale) in [-127, 127]. At
# 100 TB this is a pure map (no shuffle); the quantized table is what the
# brute-force/LSH/IVF candidate scans read, with the fp32 source touched
# only by re-rank (the same raw-vector firewall as IVFPQ's shortlist).
# Outputs are integer-exact (code sums) plus the scale rounded to 6dp, so
# the DuckDB twin verifies the quantizer at value level; round() ties go
# away-from-zero in BOTH engines (Spark HALF_UP on positives+negatives ≡
# DuckDB ties-away).
# ---------------------------------------------------------------------------

def q_emb_int8_quantize(spark, sf_dir):
    e = emb(spark, sf_dir)
    max_abs = F.expr("aggregate(v, CAST(0.0 AS DOUBLE),"
                     " (acc, x) -> greatest(acc, abs(x)))")
    codes = F.expr("transform(v, x -> CAST(round(x / scale) AS BIGINT))")
    return (e.withColumn("scale",
                         F.greatest(max_abs, F.lit(1e-30)) / F.lit(127.0))
            .withColumn("codes", codes)
            .select("vec_id", F.round("scale", 6).alias("scale"),
                    F.expr("aggregate(codes, 0L, (a, x) -> a + x)")
                    .alias("code_sum"),
                    F.expr("aggregate(codes, 0L, (a, x) -> a + abs(x))")
                    .alias("code_l1"),
                    F.expr("aggregate(codes, 0L, (a, x) ->"
                           " a + CAST(abs(x) > 127 AS BIGINT))")
                    .alias("overflow")))


SQL_EMB_INT8_QUANTIZE = (
    "WITH q AS (SELECT vec_id, v,"
    "  greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0"
    "    AS scale"
    f"  FROM ({_DUCK_EMB})),"
    " c AS (SELECT vec_id, scale,"
    "   list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS codes"
    "  FROM q)"
    " SELECT vec_id, round(scale, 6) AS scale,"
    "  CAST(list_sum(codes) AS BIGINT) AS code_sum,"
    "  CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT)"
    "    AS code_l1,"
    "  CAST(list_sum(list_transform(codes,"
    "    x -> CAST(abs(x) > 127 AS BIGINT))) AS BIGINT) AS overflow"
    " FROM c")


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication inside IVF cells (Abbas et al.,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication", 2023, public). The published recipe: cluster the
# embedding space (here: the SAME trained IVF coarse k-means the ANN
# index uses — one clustering serves both search and dedup), compute
# pairwise cosine only WITHIN each cluster, and keep one representative
# per near-duplicate group (here: smallest vec_id — the same first-wins
# rule as dedup_exact).
#
# The synthetic embeddings are near-random (max pairwise cosine ~0.48),
# so the duplicate structure is synthesized deterministically in-query:
# vectors with vec_id < 50 get a copy at vec_id + 10000 scaled by 2.0 —
# same direction, so the copy's rounded cosine to every centroid equals
# its original's (identical cell, deterministic tie-break) and the
# original↔copy cosine is exactly 1.0. Expected output: every original
# survives, every copy is dropped — verified at value level by the twin.
#
# Scale story (100 TB): assignment is a broadcast-centroid join; the
# pair join keys on cell — SemDeDup's own cost model, O(Σ n_c²) with
# cell sizes bounded by growing N_CELLS ~ √n as the corpus grows; no
# global pair join ever forms. asg persists once for its three
# consumers (both pair sides + the survivor anti-join).
# ---------------------------------------------------------------------------

SEM_DUP_TAU = 0.99
_SEM_COPY_N = 50
_SEM_COPY_OFF = 10000


def q_semantic_dedup(spark, sf_dir):
    e = emb(spark, sf_dir)
    copies = (e.filter(F.col("vec_id") < _SEM_COPY_N)
              .select((F.col("vec_id") + _SEM_COPY_OFF).alias("vec_id"),
                      F.expr("transform(v, x -> x * CAST(2.0 AS DOUBLE))")
                      .alias("v")))
    u = _with_norm(e.unionByName(copies))
    cents = _centroids(spark, sf_dir).withColumn(
        "cnorm", F.expr("sqrt(" + _DOT.format(a="cv", b="cv") + ")"))
    csim = F.round(F.expr(_DOT.format(a="v", b="cv"))
                   / (F.col("norm") * F.col("cnorm")), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    asg = (u.crossJoin(F.broadcast(cents))
           .withColumn("csim", csim)
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("vec_id", "cell", "v", "norm")).persist()
    a = asg.select("cell", F.col("vec_id").alias("a_id"),
                   F.col("v").alias("av"), F.col("norm").alias("an"))
    b = asg.select("cell", F.col("vec_id").alias("b_id"),
                   F.col("v").alias("bv"), F.col("norm").alias("bn"))
    cos = F.round(F.expr(_DOT.format(a="av", b="bv"))
                  / (F.col("an") * F.col("bn")), 6)
    dups = (a.join(b, "cell")
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("cos", cos)
            .filter(F.col("cos") >= SEM_DUP_TAU)
            .select(F.col("b_id").alias("vec_id")).distinct())
    return (asg.join(dups, "vec_id", "left_anti")
            .select("vec_id", F.col("cell").cast("bigint").alias("cell")))


SQL_SEMANTIC_DEDUP = (
    "WITH " + _duck_centroid_ctes() + ","
    f" cp AS (SELECT vec_id + {_SEM_COPY_OFF} AS vec_id,"
    "   list_transform(v, x -> x * 2.0) AS v FROM e"
    f"   WHERE vec_id < {_SEM_COPY_N}),"
    " u AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM cp),"
    " un AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM u),"
    " asg AS (SELECT vec_id, cell, v, norm FROM ("
    "   SELECT un.vec_id, c.cell, un.v, un.norm, row_number() OVER ("
    "     PARTITION BY un.vec_id ORDER BY"
    "     round(list_dot_product(un.v, c.cv)"
    "           / (un.norm * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,"
    "     c.cell ASC) AS rn"
    f"   FROM un, c{KMEANS_ITERS} c) WHERE rn = 1),"
    " dups AS (SELECT DISTINCT b.vec_id FROM asg a"
    "   JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id"
    "   WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6)"
    f"     >= {SEM_DUP_TAU})"
    " SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg"
    " WHERE vec_id NOT IN (SELECT vec_id FROM dups)")


REG: dict[str, tuple] = {
    "emb_int8_quantize": (q_emb_int8_quantize, SQL_EMB_INT8_QUANTIZE),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "ann_bruteforce_topk": (q_ann_bruteforce_topk, SQL_ANN_BRUTEFORCE_TOPK),
    "embedding_neardup_topk": (q_embedding_neardup_topk, SQL_EMBEDDING_NEARDUP_TOPK),
    "ann_lsh_buckets": (q_ann_lsh_buckets, SQL_ANN_LSH_BUCKETS),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "ann_ivf_cells": (q_ann_ivf_cells, SQL_ANN_IVF_CELLS),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
    "ann_ivf_recall": (q_ann_ivf_recall, SQL_ANN_IVF_RECALL),
    "ann_ivfpq_codes": (q_ann_ivfpq_codes, SQL_ANN_IVFPQ_CODES),
    "ann_ivfpq_topk": (q_ann_ivfpq_topk, SQL_ANN_IVFPQ_TOPK),
    "ann_ivfpq_recall": (q_ann_ivfpq_recall, SQL_ANN_IVFPQ_RECALL),
    "ann_ivfpq_rerank_topk": (q_ann_ivfpq_rerank_topk,
                              SQL_ANN_IVFPQ_RERANK_TOPK),
    "ann_ivfpq_rerank_recall": (q_ann_ivfpq_rerank_recall,
                                SQL_ANN_IVFPQ_RERANK_RECALL),
    "classifier_eval": (q_classifier_eval, SQL_CLASSIFIER_EVAL),
}
