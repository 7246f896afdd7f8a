"""ANN recall on a CLUSTERED corpus (r5 verdict task 7).

Every recall number previously pinned for IVF/IVF-PQ/LSH was measured
on small ad-hoc arrays or the driver's near-isotropic embeddings
table (max off-diagonal cosine ~0.51), where cell structure is noise.
These tests use the deterministic mixture-of-Gaussians fixture
(sources/embeddings.py) — 16 real clusters, 2000 vectors, dim 64 — and
pin recall at sub-linear configurations (nprobe < n_centroids, banded
LSH), where the index actually skips most of the corpus.

Bounds are pinned slightly under the measured values on the fixed
seed; a regression below them means candidate selection broke, not
tenant noise (recall is deterministic given the corpus and index
parameters — k-means training samples are ordered by id)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def clustered(spark):
    from gorillaspark.sources.embeddings import generate_clustered_embeddings
    emb = generate_clustered_embeddings(
        spark, n=2000, dim=64, n_clusters=16, spread=0.08, seed=7).cache()
    emb.count()
    yield emb
    emb.unpersist()


def _queries(emb, n=32):
    # round-robin cluster assignment → first 32 ids cover all 16
    # clusters twice
    return emb.where(F.col("vec_id") < n)


def test_fixture_has_real_cluster_structure(clustered):
    """Sanity: within-cluster cosine >> cross-cluster cosine, so IVF
    cells correspond to actual structure (unlike the driver corpus)."""
    pdf = clustered.limit(400).toPandas()
    X = np.stack(pdf["embedding"].to_numpy())
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    sim = X @ X.T
    same = pdf["cluster_id"].to_numpy()[:, None] == \
        pdf["cluster_id"].to_numpy()[None, :]
    off = ~np.eye(len(X), dtype=bool)
    within = sim[same & off].mean()
    across = sim[~same].mean()
    assert within > 0.6 and across < 0.3, (within, across)


def test_ivf_kmeans_recall_clustered(spark, clustered):
    """k-means-trained IVF (the production path: real learned cells)
    at nprobe=4 of 16 — scoring ~25% of the corpus."""
    from gorillaspark.operators.similarity import ann_topk_ivf
    out = ann_topk_ivf(clustered, _queries(clustered), k=10,
                       n_centroids=16, nprobe=4).toPandas()
    assert len(out) == 32
    assert out["recall_at_k"].mean() >= 0.95, out["recall_at_k"].mean()
    assert out["recall_at_k"].min() >= 0.8, out["recall_at_k"].min()


def test_ivfpq_recall_clustered(spark, clustered):
    """IVF-PQ (fixed codebook + packed ADC scoring) at nprobe=4 of 16.

    On a TIGHTLY clustered corpus coarse PQ has a known failure mode
    this test pins honestly: with 16 codewords per subspace (one per
    cluster) every same-cell candidate quantizes to the SAME code, ADC
    scores tie, and a shallow refine keeps an essentially arbitrary
    subset — measured recall collapses to ~0.6. Deep refine (120 of
    ~500 candidates, still sub-linear) restores ~1.0 because the exact
    re-rank sees the whole tied cohort. Production fix at scale is
    residual PQ or 8-bit codebooks; here we pin BOTH measured sides so
    the docstring's claim stays evidence, not prose."""
    from gorillaspark.operators.similarity import ann_topk_ivfpq
    q = _queries(clustered)
    deep = ann_topk_ivfpq(clustered, q, k=10, n_centroids=16, nprobe=4,
                          n_sub=8, n_codes=16, dim=64,
                          refine=120).toPandas()
    assert len(deep) == 32
    assert deep["recall_at_k"].mean() >= 0.95, deep["recall_at_k"].mean()
    assert deep["recall_at_k"].min() >= 0.8, deep["recall_at_k"].min()
    shallow = ann_topk_ivfpq(clustered, q, k=10, n_centroids=16,
                             nprobe=4, n_sub=8, n_codes=16, dim=64,
                             refine=40).toPandas()
    # the documented collapse: tied ADC scores + shallow refine
    assert shallow["recall_at_k"].mean() < 0.85, \
        shallow["recall_at_k"].mean()
    # production 8-bit codebooks (256 codes — 64-bit packed, unsigned
    # extraction) partially restore shallow-refine recall by giving
    # ~16 codewords per cluster per subspace (measured 0.77 vs 0.59);
    # the remaining gap to deep refine is quantization noise at the
    # within-cluster scale — the residual-PQ motivation, pinned here
    # as a measured fact rather than a docstring claim
    wide = ann_topk_ivfpq(clustered, q, k=10, n_centroids=16,
                          nprobe=4, n_sub=8, n_codes=256, dim=64,
                          refine=40).toPandas()
    assert wide["recall_at_k"].mean() >= \
        shallow["recall_at_k"].mean() + 0.1, \
        (wide["recall_at_k"].mean(), shallow["recall_at_k"].mean())


def test_trained_residual_pq_recall_clustered(spark, clustered):
    """Residual PQ with k-means-trained codebooks — the production
    configuration: vectors quantize as centroid + PQ(residual), the
    ADC score adds one broadcast per-(query, cell) centroid term, and
    trained codewords tile the residual cloud that sampled ones
    cannot (fixed-sample residual codebooks measured WORSE than plain
    PQ: 0.32/0.73 at 16/256 codes vs plain 0.59/0.77 — random
    residuals make poor codewords). Best shallow-refine config on this
    corpus, pinned: measured 0.81 at 8x256, refine=40."""
    from gorillaspark.operators.similarity import (
        ann_topk_ivfpq, pq_train_residual_codebooks)
    cb = pq_train_residual_codebooks(clustered, n_centroids=16,
                                     n_sub=8, n_codes=256, dim=64)
    out = ann_topk_ivfpq(clustered, _queries(clustered), k=10,
                         n_centroids=16, nprobe=4, n_sub=8,
                         n_codes=256, dim=64, refine=40,
                         residual=True, codebooks=cb).toPandas()
    assert len(out) == 32
    assert out["recall_at_k"].mean() >= 0.75, out["recall_at_k"].mean()


def test_lsh_recall_clustered(spark, clustered):
    """Banded random-hyperplane LSH (64 planes / 32 bands): on a
    clustered corpus near neighbours share band codes, so recall vs
    brute force stays near-perfect while only bucket-collisions are
    scored."""
    from gorillaspark.operators.similarity import (
        cosine_topk_bruteforce, cosine_topk_lsh)
    q = _queries(clustered)
    lsh = (cosine_topk_lsh(clustered, q, k=10, n_planes=64, n_bands=32,
                           seed=5)
           .select("query_id", "nbr_id").toPandas())
    brute = (cosine_topk_bruteforce(clustered, q, k=10)
             .select("query_id", "nbr_id").toPandas())
    got = set(map(tuple, lsh.to_numpy()))
    want = list(map(tuple, brute.to_numpy()))
    recall = sum(p in got for p in want) / len(want)
    assert recall >= 0.95, recall
