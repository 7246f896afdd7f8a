"""Synthetic clustered embeddings: a mixture-of-Gaussians corpus where
IVF cells correspond to REAL structure.

Why it exists (VERDICT r4 task 7): the driver's embeddings.parquet is
near-isotropic (max off-diagonal cosine ~= 0.51), so ANN recall
numbers measured there say little about how IVF/IVF-PQ/LSH behave on
production embedding spaces, which are strongly clustered. This
generator produces a deterministic mixture corpus — `n_clusters`
unit-norm centers, per-vector Gaussian spread — so recall bounds at
``nprobe < n_centroids`` are meaningful and pinnable.

Scale shape: generation is distributed (``spark.range`` + one Arrow
batch kernel); each row's vector is derived purely from
``(seed, vec_id)`` via a counter-based RNG construction
(``Philox``-keyed per row), so any executor can generate any slice
independently — no driver-side materialization, no sequential-state
RNG, reproducible under repartitioning. The 100 TB version of this
table is the same code with a bigger ``n``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _centers(n_clusters: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic unit-norm cluster centers."""
    rng = np.random.default_rng(np.random.Philox(key=seed))
    c = rng.normal(0.0, 1.0, (n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def generate_clustered_embeddings(spark: SparkSession, n: int = 2000,
                                  dim: int = 64, n_clusters: int = 16,
                                  spread: float = 0.08,
                                  seed: int = 7) -> DataFrame:
    """(vec_id, cluster_id, embedding) — embedding = center[cluster] +
    N(0, spread) noise, cluster round-robin by vec_id so every cluster
    has n/n_clusters members and queries drawn from low ids cover all
    clusters. Vectors are float64 arrays (same schema as the driver's
    embeddings table after its CAST)."""
    C = _centers(n_clusters, dim, seed)

    def gen(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            cl = (ids % n_clusters).astype(np.int64)
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, (i, c) in enumerate(zip(ids, cl)):
                # counter-based: the row's stream depends only on
                # (seed, vec_id) — executor- and split-independent
                r = np.random.default_rng(
                    np.random.Philox(key=seed, counter=[0, 0, 0, int(i)]))
                out[j] = C[c] + r.normal(0.0, spread, dim)
            yield pd.DataFrame({
                "vec_id": ids, "cluster_id": cl,
                "embedding": list(out)})

    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .mapInPandas(gen, "vec_id long, cluster_id long, "
                              "embedding array<double>"))
