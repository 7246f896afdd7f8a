"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

* brute-force cosine top-k — the exact baseline: a broadcast join of
  the (small) query set against the corpus, dot products computed
  JVM-side with ``aggregate``/``zip_with`` (no Python in the row path),
  ranked per query with a window;
* LSH-bucketed ANN — the scale path: random-hyperplane signatures
  (vectorized pandas UDF), multi-probe bucket join, exact re-ranking
  inside buckets only. Recall tunable by (n_planes, n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _norm_col(vec: str) -> F.Column:
    return F.sqrt(F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def with_unit_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine becomes a plain dot product."""
    n = _norm_col(vec_col)
    return emb.withColumn(
        "unit",
        F.transform(vec_col, lambda x: x.cast("double") / n))


def cosine_topk_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 10,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected small (it is broadcast); the corpus side
    streams — one pass, no shuffle of the corpus. Ties break on
    neighbor id for determinism.
    """
    corpus = with_unit_norm(emb, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("unit").alias("nbr_unit"))
    qs = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("q_unit"))
    dot = F.aggregate(
        F.zip_with("q_unit", "nbr_unit", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (corpus.join(F.broadcast(qs),
                          F.col("query_id") != F.col("nbr_id"))
              .withColumn("cosine", F.round(dot, 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "nbr_id", "cosine"))


def make_hyperplane_udf(dim: int, n_planes: int = 16, seed: int = 5):
    """Random-hyperplane LSH signature (one int per table)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @pandas_udf("long")
    def signature(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    return signature


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 10,
                    dim: int | None = None, n_planes: int = 12,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: hyperplane buckets + exact rank inside the
    query's bucket (single-probe single-table variant; production
    recall comes from multiple tables/probes — same plan repeated)."""
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
    sig = make_hyperplane_udf(dim, n_planes)
    corpus = with_unit_norm(emb, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("unit").alias("nbr_unit"),
        sig(vec_col).alias("bucket"))
    qs = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("q_unit"),
        sig(vec_col).alias("bucket"))
    dot = F.aggregate(
        F.zip_with("q_unit", "nbr_unit", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (corpus.join(F.broadcast(qs), "bucket")
              .where(F.col("query_id") != F.col("nbr_id"))
              .withColumn("cosine", F.round(dot, 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "nbr_id", "cosine"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                             n_planes: int = 10,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Near-duplicate vector pairs: LSH bucket join + exact cosine ≥ τ.

    Exact verification bounds false positives to zero; recall is the
    LSH trade-off (raise tables/probes at scale)."""
    dim = len(emb.select(vec_col).head()[0])
    sig = make_hyperplane_udf(dim, n_planes)
    normed = with_unit_norm(emb, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit"),
        sig(vec_col).alias("bucket"))
    a = normed.alias("a")
    b = normed.alias("b")
    dot = F.aggregate(
        F.zip_with("a.unit", "b.unit", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vid") < F.col("b.vid")))
            .withColumn("cosine", F.round(dot, 6))
            .where(F.col("cosine") >= threshold)
            .select(F.col("a.vid").alias("vec_a"),
                    F.col("b.vid").alias("vec_b"), "cosine"))


def embedding_near_dup_exact(emb: DataFrame, threshold: float = 0.9,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Exact near-duplicate pairs (all-pairs cosine ≥ τ).

    Quadratic — the oracle/verification path; at corpus scale use
    :func:`embedding_near_dup_pairs` (LSH candidates, identical final
    predicate)."""
    normed = with_unit_norm(emb, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit"))
    a = normed.alias("a")
    b = normed.alias("b")
    dot = F.aggregate(
        F.zip_with("a.unit", "b.unit", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, F.col("a.vid") < F.col("b.vid"))
            .withColumn("cosine", F.round(dot, 6))
            .where(F.col("cosine") >= threshold)
            .select(F.col("a.vid").alias("vec_a"),
                    F.col("b.vid").alias("vec_b"), "cosine"))
