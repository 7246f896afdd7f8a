"""Deduplication operators over document corpora.

Large-scale training-data shapes, each expressed Spark-first:

* exact: hash-groupBy on the text (content hash), keep min doc_id —
  one shuffle on the hash, no driver involvement;
* n-gram Jaccard: explode character shingles → distinct → self-join on
  shingle → per-pair intersection counts → |A∩B| / (|A|+|B|-|A∩B|) —
  the classic pair-generation plan; the shingle join is the shuffle,
  pruned by ``min_shared`` before the expensive part;
* MinHash + LSH: vectorized signature computation in an Arrow batch
  (one pandas UDF over the shingle arrays, numpy universal hashing),
  banding → candidate buckets → exact Jaccard verification of
  candidates only. At 100 TB the bucket join replaces the quadratic
  shingle self-join; recall is tunable by (n_perm, n_bands);
* SimHash: 64-bit signatures from token hashes (vectorized), duplicate
  candidates = identical signature (or banded Hamming neighborhoods);
* embedding near-dup: cosine ≥ τ pairs via LSH bucketing on random
  hyperplanes with exact verification (see similarity.py for the ANN
  machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text (content-hash grouping)."""
    return (docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc (lowercased, ws-tokenized)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (docs
            .where(F.size(toks) >= n)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.array_distinct(grams)).alias("shingle")))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_df: float | None = None) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ threshold (a < b).

    Exact (quadratic in co-bucketed docs) — the oracle/verifier path;
    the scale path is :func:`minhash_lsh_pairs` which feeds candidates
    into the same final Jaccard predicate.

    ``max_df``: drop shingles occurring in more than this fraction of
    documents before the self-join. At corpus scale a boilerplate
    shingle shared by 1% of 10^9 docs creates a 10^14-row join bucket;
    the stop-shingle filter bounds every bucket. This changes the
    Jaccard estimate slightly (computed over the filtered sets), the
    standard trade; leave None for the exact oracle-checked form.
    """
    sh = shingles(docs, n, text_col, id_col)
    if max_df is not None:
        n_docs = docs.count()
        hot = (sh.groupBy("shingle")
               .agg(F.count(F.lit(1)).alias("df"))
               .where(F.col("df") > max_df * n_docs)
               .select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sh = sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("sz").alias("sz_b"))
    out = (inter.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("jaccard",
                       F.col("inter")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .where(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_mat(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64)
    return a, b


def make_minhash_udf(n_perm: int = 64, seed: int = 7):
    """Vectorized MinHash over an array<string>-of-shingles column.

    Universal hashing ((a*x + b) mod p) over per-shingle 64-bit stable
    hashes; the whole Arrow batch is one numpy einsum-free broadcast.
    """
    a, b = _minhash_mat(n_perm, seed)

    @pandas_udf("array<long>")
    def minhash(shingle_sets: pd.Series) -> pd.Series:
        out = []
        for arr in shingle_sets:
            if arr is None or len(arr) == 0:
                out.append(np.full(n_perm, _MERSENNE, dtype=np.int64))
                continue
            # stable 61-bit hashes of the shingles (bytes-based FNV-1a)
            hs = np.fromiter(
                (_fnv1a61(s) for s in arr), dtype=np.int64, count=len(arr))
            # (n_perm, n_shingles) universal hash, min over shingles
            m = (a[:, None] * hs[None, :] % _MERSENNE + b[:, None]) \
                % _MERSENNE
            out.append(m.min(axis=1))
        return pd.Series(out)

    return minhash


def _fnv1a61(s: str) -> int:
    h = 0xcbf29ce484222325
    for ch in s.encode():
        h ^= ch
        h = (h * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h % _MERSENNE


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                      n_perm: int = 64, n_bands: int = 16,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard.

    Plan: shingle sets → signatures (one vectorized UDF) → explode
    bands → groupBy (band, band-hash) buckets → intra-bucket candidate
    pairs → exact Jaccard on candidates only → threshold. The band join
    is the only wide shuffle and it carries signatures, not text.
    """
    rows_per_band = n_perm // n_bands
    # the shingle relation feeds signatures, candidate verification and
    # size lookups — cache it instead of re-exploding the corpus 4×
    sh = shingles(docs, n, text_col, id_col).cache()
    sets = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("shingle_set"),
        F.count(F.lit(1)).alias("sz"))
    mh = make_minhash_udf(n_perm)
    sigs = sets.select("doc_id", "sz", mh("shingle_set").alias("sig"))
    bands = sigs.select(
        "doc_id", "sz",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.hash(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)))
        ).alias("band", "band_hash"))
    x = bands.alias("x")
    y = bands.alias("y")
    cands = (x.join(y, (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.band_hash") == F.col("y.band_hash"))
                    & (F.col("x.doc_id") < F.col("y.doc_id")))
             .select(F.col("x.doc_id").alias("doc_a"),
                     F.col("y.doc_id").alias("doc_b"))
             .distinct())
    # exact verification of candidates only
    sh_a = sh.select(F.col("doc_id").alias("doc_a"),
                     F.col("shingle").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"),
                     F.col("shingle").alias("sh_b"))
    inter = (cands.join(sh_a, "doc_a")
             .join(sh_b, (F.col("doc_b") == F.col("doc_b2"))
                   & (F.col("sh_a") == F.col("sh_b")))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def make_simhash_udf(seed: int = 11):
    @pandas_udf("long")
    def simhash(token_sets: pd.Series) -> pd.Series:
        out = np.empty(len(token_sets), dtype=np.int64)
        for i, arr in enumerate(token_sets):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            hs = np.fromiter((_fnv1a64(t) for t in arr), dtype=np.uint64,
                             count=len(arr))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            out[i] = int(((acc > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum()
                         .astype(np.int64))
        return pd.Series(out)

    return simhash


def _fnv1a64(s: str) -> int:
    h = 0xcbf29ce484222325
    for ch in s.encode():
        h ^= ch
        h = (h * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_duplicates(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical 64-bit SimHash (strong near-dup
    signal); banded Hamming-neighbor search extends this at scale."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sh = make_simhash_udf()
    sigs = docs.select(F.col(id_col).alias("doc_id"),
                       sh(toks).alias("simhash"))
    return (sigs.groupBy("simhash")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
                 F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") > 1))
