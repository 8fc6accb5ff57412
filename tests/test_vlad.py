"""VLAD + PCA image-vectorization analogue (ccspark.vlad).

`media_vlad` is oracle-backed (DuckDB twin, exact values) and covered by
test_queries_oracle like every other registry entry; here we pin the
stages test_queries_oracle can't see — the PCA projection (not
SQL-expressible) against a pure-numpy twin, structural invariants of the
trained projection, and the zero-cell / filtered-descriptor edges.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccspark.vlad import (D, K, M_VAR, PCA_P, _train_pca, _vlad_vectors,
                          pca_oracle_pandas, q_media_vlad, q_media_vlad_pca)


@pytest.fixture(scope="module")
def vlad_pdf(spark, sf_dir) -> pd.DataFrame:
    return (_vlad_vectors(spark, sf_dir).toPandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_vlad_shape_and_norm(vlad_pdf):
    assert (vlad_pdf["vlad"].map(len) == K * D).all()
    norms = vlad_pdf["vlad"].map(lambda v: float(np.linalg.norm(v)))
    # L2-normalized to 6-dp rounding; all-zero vectors (every descriptor
    # filtered) stay zero
    assert ((abs(norms - 1.0) < 1e-4) | (norms == 0.0)).all()


def test_vlad_row_count(spark, sf_dir, vlad_pdf):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(vlad_pdf) == n_docs
    assert q_media_vlad(spark, sf_dir).count() == n_docs * K * D


def test_vlad_descriptor_filter_bites(spark, sf_dir):
    """The 0.7 mean gate must actually drop descriptors (else it tests
    nothing) while keeping most of them (mean of uniform-ish values
    ~0.5)."""
    from ccspark.vlad import _descriptors
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.selectExpr(f"sum(doc_id % {M_VAR} + 1)").first()[0]
    kept = _descriptors(spark, sf_dir).count()
    assert 0 < kept < total


def test_pca_matches_numpy_oracle(spark, sf_dir, vlad_pdf):
    """q_media_vlad_pca ≡ the pure-numpy twin, exact to the shared
    6-dp rounding: same bounded training sample, same eigh, same sign
    convention, same whitening."""
    got = (q_media_vlad_pca(spark, sf_dir).toPandas()
           .sort_values(["doc_id", "k"]).reset_index(drop=True))
    want = (pca_oracle_pandas(vlad_pdf["doc_id"].to_numpy(),
                              np.stack(vlad_pdf["vlad"].to_numpy()))
            .sort_values(["doc_id", "k"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["k"].values == want["k"].values).all()
    assert np.array_equal(got["v"].values, want["v"].values)


def test_train_pca_invariants(vlad_pdf):
    x = np.stack(vlad_pdf["vlad"].to_numpy())
    mu, w = _train_pca(x)
    assert w.shape == (K * D, PCA_P)
    # whitening: projected training data has ~unit variance per
    # component wherever the eigenvalue dominates the 1e-12 epsilon
    # regularizer; epsilon-dominated (near-null) components come out
    # BELOW 1, never above
    proj = (x - mu) @ w
    var = proj.var(axis=0)
    assert np.all(var <= 1.0 + 1e-6)
    informative = var > 0.5
    assert informative.sum() >= PCA_P // 2
    assert np.all(np.abs(var[informative] - 1.0) < 1e-6)
    # components (pre-whitening directions) are orthogonal
    wn = w / np.linalg.norm(w, axis=0)
    off = wn.T @ wn - np.eye(PCA_P)
    assert np.abs(off).max() < 1e-9
    # sign convention: each column's largest-magnitude entry is positive
    peaks = wn[np.abs(wn).argmax(axis=0), np.arange(PCA_P)]
    assert (peaks > 0).all()


def test_vlad_plan_broadcasts_codebook(spark, sf_dir):
    plan = q_media_vlad(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
