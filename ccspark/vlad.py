"""VLAD + PCA image-vectorization analogue (ImageVectorization.java).

The reference's media pipeline vectorizes each crawled image as:
scale → SURF local descriptors → SVM descriptor filter → VLAD
aggregation against PRE-TRAINED vocabularies → PCA projection +
whitening (ImageVectorization.java:135-230: `featureExtractor.
extractFeatures`, the IN/OUT `svm.distributionForInstance` filter at
:185-196 with its 0.7 threshold, `vladAggregator.aggregate` at :219,
`pcaProjector.sampleToEigenSpace` at :228). This module re-expresses
that pipeline Spark-first over the `documents` table:

- **Local descriptors**: the container has no image libs (the real
  SURF extractor would slot into `multimodal.decode_image_real`'s
  mapInPandas hook), so descriptors are a deterministic, SQL-
  reproducible stand-in — pure int64 modular arithmetic on
  (doc_id, j, k), the same pattern as `multimodal._fake_decode`. Every
  value is a dyadic rational n/2^20, so all downstream sums/residuals
  are EXACT in float64 and the DuckDB oracle matches bit-for-bit up to
  the single final rounding.
- **Descriptor filter**: keep a descriptor unless its mean exceeds 0.7
  — mirroring the reference's drop-when-P(OUT)>0.7 gate
  (ImageVectorization.java:192-196) as a deterministic score.
- **VLAD**: vocabulary = K fixed centroids (the reference loads
  pre-trained vocabularies from disk — `setVladAggregator`, learning
  files — so a fixed codebook IS the faithful shape: a broadcast dim
  table, not in-pipeline training). Each kept descriptor joins its
  nearest centroid (Euclidean, ties → smaller cell), residuals are
  summed per (doc, cell) with an ORDERED fold (sort_array / list ORDER
  BY j: Spark and DuckDB run the identical IEEE op sequence), empty
  cells contribute zero blocks, and the concatenated K·D vector is
  L2-normalized (VladAggregator normalizes; power-law step omitted).
- **PCA + whitening**: trained on a BOUNDED sample (doc_id < 2048) of
  VLAD vectors driver-side in numpy — the same bounded-sample recipe
  as IVF centroid training (similarity.py) and the reference's own
  offline-trained `pcaProjector`. Components are broadcast as literals
  and the projection runs as a vectorized Arrow matmul (mapInPandas) —
  numpy exact-oracled in tests/test_vlad.py; not SQL-expressible
  (eigendecomposition), so the driver records a rows-only check.

Scale story (100 TB): descriptor extraction is embarrassingly parallel
mapInPandas over the payload column; the codebook and PCA matrix are
tiny broadcast artifacts; VLAD is one groupBy(doc_id, cell) partial-agg
shuffle keyed by doc; nothing collects to the driver except the bounded
PCA training sample.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import t

#: descriptors per doc = 1 + doc_id % M_VAR (images yield variable
#: numbers of local features)
M_VAR = 4
#: descriptor dimension (reference SURF = 64; kept small so the oracle's
#: per-dimension SQL stays readable — the plan shape is dimension-blind)
D = 8
#: VLAD vocabulary size (reference: multiple vocabularies, concatenated;
#: one K-word vocabulary here)
K = 4
#: projected dimension (reference vectorLength, e.g. 1024 from 4·64·128)
PCA_P = 8
#: PCA training-sample bound (same recipe as IVF centroid training)
PCA_SAMPLE = 2048

_ZEROS = "array_repeat(CAST(0.0 AS DOUBLE), {d})"

#: descriptor value (doc_id, j, k) — dyadic n/2^20, exact in float64
_DESC = ("transform(sequence(0, {dm1}), k -> "
         "CAST((doc_id * 1315423911 + j * 2654435761 + k * 97) "
         "% 1048576 AS DOUBLE) / 1048576.0)")
#: codebook value (cell c, dim k) — the 'pre-trained vocabulary'
_CV = ("transform(sequence(0, {dm1}), k -> "
       "CAST(((c * 53 + k * 19) * 2654435761) % 1048576 AS DOUBLE) "
       "/ 1048576.0)")


def _descriptors(spark, sf_dir) -> DataFrame:
    """(doc_id, j, dsc): filtered local descriptors per document."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return (docs
            .select("doc_id",
                    F.explode(F.expr(f"sequence(0, doc_id % {M_VAR})"))
                    .alias("j"))
            .withColumn("dsc", F.expr(_DESC.format(dm1=D - 1)))
            # the SVM IN/OUT gate's stand-in (java :192-196): drop
            # descriptors whose mean score exceeds 0.7
            .filter(F.expr("aggregate(dsc, CAST(0.0 AS DOUBLE), "
                           f"(a, x) -> a + x) / {D} <= 0.7")))


def _codebook(spark) -> DataFrame:
    """(cell, cv): the fixed 'pre-trained' VLAD vocabulary (broadcast)."""
    return (spark.range(K).select(F.col("id").alias("cell"))
            .withColumn("c", F.col("cell"))
            .withColumn("cv", F.expr(_CV.format(dm1=D - 1)))
            .select("cell", "cv"))


def _vlad_vectors(spark, sf_dir) -> DataFrame:
    """(doc_id, vlad): L2-normalized K·D VLAD vector per document,
    components rounded to 6 dp (the only inexact step — everything
    before the norm divide is exact dyadic arithmetic)."""
    d = _descriptors(spark, sf_dir)
    cb = _codebook(spark)
    d2 = F.expr("aggregate(zip_with(dsc, cv, (a, b) -> (a - b) * (a - b)), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    w = Window.partitionBy("doc_id", "j").orderBy(
        F.col("d2").asc(), F.col("cell").asc())
    assigned = (d.crossJoin(F.broadcast(cb))
                .withColumn("d2", d2)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .withColumn("r", F.expr("zip_with(dsc, cv, (a, b) -> a - b)"))
                .select("doc_id", "cell", "j", "r"))
    # ordered fold per (doc, cell): identical IEEE op sequence as the
    # oracle's list(r ORDER BY j) + list_reduce
    sums = (assigned.groupBy("doc_id", "cell")
            .agg(F.sort_array(F.collect_list(F.struct("j", "r")))
                 .alias("arr"))
            .select("doc_id", "cell",
                    F.expr("aggregate(arr, " + _ZEROS.format(d=D) + ", "
                           "(acc, e) -> zip_with(acc, e.r, "
                           "(a, b) -> a + b))").alias("rsum")))
    docs = t(spark, sf_dir, "documents").select("doc_id")
    flat = (docs.join(
                sums.groupBy("doc_id")
                    .agg(F.map_from_entries(
                        F.collect_list(F.struct("cell", "rsum"))).alias("m")),
                "doc_id", "left")
            .select("doc_id", F.expr(
                f"flatten(transform(sequence(0, {K - 1}), c -> "
                "coalesce(element_at(m, CAST(c AS BIGINT)), "
                + _ZEROS.format(d=D) + ")))").alias("flat")))
    return (flat
            .withColumn("n2", F.expr("aggregate(flat, CAST(0.0 AS DOUBLE), "
                                     "(a, x) -> a + x * x)"))
            .select("doc_id", F.expr(
                "CASE WHEN n2 > 0 THEN transform(flat, "
                "x -> round(x / sqrt(n2), 6)) ELSE flat END").alias("vlad")))


def q_media_vlad(spark, sf_dir) -> DataFrame:
    """(doc_id, k, v): the VLAD vector, one row per component (scalar
    rows hash robustly in the driver compare)."""
    return (_vlad_vectors(spark, sf_dir)
            .select("doc_id", F.posexplode("vlad").alias("k", "v"))
            .select("doc_id", F.col("k").cast("bigint").alias("k"), "v"))


_DUCK_DESC = ("list_transform(generate_series(0, {dm1}), k -> "
              "CAST((doc_id * 1315423911 + j * 2654435761 + k * 97) "
              "% 1048576 AS DOUBLE) / 1048576.0)")
_DUCK_CV = ("list_transform(generate_series(0, {dm1}), k -> "
            "CAST(((c * 53 + k * 19) * 2654435761) % 1048576 AS DOUBLE) "
            "/ 1048576.0)")
_DUCK_ZEros = "[" + ", ".join(["0.0"] * D) + "]"

SQL_MEDIA_VLAD = f"""
WITH d0 AS (
  SELECT doc_id, unnest(generate_series(0, doc_id % {M_VAR})) AS j
  FROM documents
), d1 AS (
  SELECT doc_id, j, {_DUCK_DESC.format(dm1=D - 1)} AS dsc FROM d0
), kept AS (
  SELECT * FROM d1 WHERE list_sum(dsc) / {D} <= 0.7
), cents AS (
  SELECT c AS cell, {_DUCK_CV.format(dm1=D - 1)} AS cv
  FROM (SELECT unnest(generate_series(0, {K - 1})) AS c)
), assign AS (
  SELECT doc_id, j, dsc, cell, cv FROM (
    SELECT d.doc_id, d.j, d.dsc, c.cell, c.cv, row_number() OVER (
      PARTITION BY d.doc_id, d.j ORDER BY
      list_sum(list_transform(generate_series(1, {D}),
        i -> (d.dsc[i] - c.cv[i]) * (d.dsc[i] - c.cv[i]))) ASC,
      c.cell ASC) AS rn
    FROM kept d, cents c) WHERE rn = 1
), resid AS (
  SELECT doc_id, cell, j, list_transform(generate_series(1, {D}),
    i -> dsc[i] - cv[i]) AS r FROM assign
), sums AS (
  SELECT doc_id, cell, list_reduce(list(r ORDER BY j),
    (acc, x) -> list_transform(generate_series(1, {D}),
      i -> acc[i] + x[i])) AS rsum
  FROM resid GROUP BY doc_id, cell
), grid AS (
  SELECT doc_id, cell FROM documents,
    (SELECT unnest(generate_series(0, {K - 1})) AS cell)
), flatv AS (
  SELECT g.doc_id,
    flatten(list(coalesce(s.rsum, {_DUCK_ZEros}) ORDER BY g.cell)) AS flat
  FROM grid g LEFT JOIN sums s USING (doc_id, cell) GROUP BY g.doc_id
), normed AS (
  SELECT doc_id, flat,
    list_sum(list_transform(flat, x -> x * x)) AS n2 FROM flatv
)
SELECT doc_id, CAST(ks.k AS BIGINT) AS k,
  CASE WHEN n2 > 0 THEN round(flat[ks.k + 1] / sqrt(n2), 6)
       ELSE flat[ks.k + 1] END AS v
FROM normed, (SELECT unnest(generate_series(0, {K * D - 1})) AS k) ks
"""


def _train_pca(vlads: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, W): whitened PCA projection trained on the sample rows.
    Deterministic: eigh of the biased covariance, top-PCA_P components
    in descending-eigenvalue order, sign fixed so each component's
    largest-magnitude entry is positive."""
    mu = vlads.mean(axis=0)
    xc = vlads - mu
    cov = (xc.T @ xc) / len(vlads)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:PCA_P]
    w = evecs[:, order]
    ev = evals[order]
    flip = w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])] < 0
    w = w * np.where(flip, -1.0, 1.0)
    return mu, w / np.sqrt(ev + 1e-12)          # whitening


def q_media_vlad_pca(spark, sf_dir) -> DataFrame:
    """(doc_id, k, v): VLAD vectors projected to PCA_P whitened PCA
    components. Training reads only the bounded doc_id < PCA_SAMPLE
    sample to the driver (IVF-training recipe); projection is a
    vectorized Arrow matmul over the full corpus. No SQL oracle
    (eigendecomposition) — numpy-exact-oracled in tests/test_vlad.py."""
    vecs = _vlad_vectors(spark, sf_dir)
    sample = (vecs.filter(F.col("doc_id") < PCA_SAMPLE)
              .orderBy("doc_id").collect())
    mu, w = _train_pca(np.array([r["vlad"] for r in sample]))
    mu_b = spark.sparkContext.broadcast(mu)
    w_b = spark.sparkContext.broadcast(w)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["vlad"].to_numpy())
            proj = np.round((x - mu_b.value) @ w_b.value, 6)
            n = len(pdf)
            yield pd.DataFrame({
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), PCA_P),
                "k": np.tile(np.arange(PCA_P, dtype="int64"), n),
                "v": proj.reshape(-1),
            })

    return vecs.mapInPandas(
        project, schema="doc_id bigint, k bigint, v double")


def pca_oracle_pandas(doc_ids: np.ndarray, vlads: np.ndarray) -> pd.DataFrame:
    """Pure-numpy twin of q_media_vlad_pca for the pytest oracle: same
    bounded sample, same training, same projection, same rounding."""
    mask = doc_ids < PCA_SAMPLE
    order = np.argsort(doc_ids[mask], kind="stable")
    mu, w = _train_pca(vlads[mask][order])
    proj = np.round((vlads - mu) @ w, 6)
    return pd.DataFrame({
        "doc_id": np.repeat(doc_ids, PCA_P),
        "k": np.tile(np.arange(PCA_P, dtype="int64"), len(doc_ids)),
        "v": proj.reshape(-1),
    })


REG: dict[str, tuple] = {
    "media_vlad": (q_media_vlad, SQL_MEDIA_VLAD),
    "media_vlad_pca": (q_media_vlad_pca, None),
}
