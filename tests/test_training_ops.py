"""Training-data operators: dedup, similarity, text stats, multimodal
plumbing — checked against in-process numpy/pandas oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gorillaspark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_duplicates,
)
from gorillaspark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from gorillaspark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
)
from gorillaspark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "a completely different sentence about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "der hund und die katze sind nicht ein team"),
        (5, "le chat et le chien sont les meilleurs amis pour la vie"),
        (6, "spark engines process a completely different sentence"),
        (7, "short text"),
    ]
    return spark.createDataFrame(pd.DataFrame(base, columns=["doc_id", "text"]))


def _jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        tk = t.lower().split()
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs).toPandas()
    dupes = out[out.n_copies > 1]
    assert len(dupes) == 1
    assert dupes.iloc[0]["keep_id"] == 0 and dupes.iloc[0]["n_copies"] == 2


def test_ngram_jaccard_matches_python_oracle(spark, docs):
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = (ngram_jaccard_pairs(docs, n=3, threshold=0.3)
           .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    want = []
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                jc = _jaccard(texts[i], texts[j])
                if jc >= 0.3:
                    want.append((i, j, round(jc, 6)))
    assert [tuple(r) for r in got.to_numpy()] == want


def test_minhash_lsh_finds_verified_pairs(spark, docs):
    """LSH candidates + exact verification ⊆ brute force, and at high
    similarity the near-dup pair must be recalled."""
    got = minhash_lsh_pairs(docs, n=3, threshold=0.5, n_perm=64,
                            n_bands=32).toPandas()
    brute = ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    gs = {(r.doc_a, r.doc_b) for r in got.itertuples()}
    bs = {(r.doc_a, r.doc_b) for r in brute.itertuples()}
    assert gs <= bs                      # verification kills false positives
    assert (0, 1) in gs or (0, 3) in gs  # high-sim pairs recalled
    assert (0, 3) in gs                  # exact dup always recalled


def test_simhash_exact_dupes(spark, docs):
    out = simhash_duplicates(docs).toPandas()
    assert any(set(ids) == {0, 3} for ids in out["doc_ids"])


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(60),
                        "embedding": list(vecs)})
    emb = spark.createDataFrame(pdf)
    queries = emb.where(F.col("vec_id") < 5)
    got = (cosine_topk_bruteforce(emb, queries, k=5)
           .toPandas().sort_values(["query_id", "rank"]))
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    for q in range(5):
        s = np.round(sims[q].astype(np.float64), 6)
        order = sorted((-s[i], i) for i in range(60) if i != q)[:5]
        want = [i for _, i in order]
        have = got[got.query_id == q]["nbr_id"].tolist()
        assert have == want, (q, have, want)


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(6)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    near = base[3] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    vecs = np.vstack([base, near[None, :]])
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(21), "embedding": list(vecs)}))
    out = embedding_near_dup_pairs(emb, threshold=0.99).toPandas()
    assert (3, 20) in {(r.vec_a, r.vec_b) for r in out.itertuples()}


def test_textstats_and_fingerprint(spark, docs):
    tc = token_count(docs).toPandas().set_index("doc_id")
    assert tc.loc[0, "n_tokens"] == 9
    q = quality_score(docs).toPandas().set_index("doc_id")
    assert 0 <= q["quality"].min() and q["quality"].max() <= 1
    assert q.loc[0, "stop_hits"] == 1          # 'the' (distinct hits)
    li = lang_id(docs).toPandas().set_index("doc_id")
    assert li.loc[0, "lang_pred"] == "en"
    assert li.loc[4, "lang_pred"] == "de"
    assert li.loc[5, "lang_pred"] == "fr"
    fp = fingerprint(docs).toPandas().set_index("doc_id")

    def poly(s, m=(1 << 31) - 1):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % m
        return h
    for i in [0, 2, 7]:
        assert fp.loc[i, "fingerprint"] == poly(
            docs.where(F.col("doc_id") == i).collect()[0].text)
    assert fp.loc[0, "fingerprint"] == fp.loc[3, "fingerprint"]


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n=48)
    feats = extract_features(media, decoder="fake", dim=8).toPandas()
    assert len(feats) == 48
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic across runs
    feats2 = extract_features(media, decoder="fake", dim=8).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert (a["sha256"] == b["sha256"]).all()
    assert all(np.allclose(x, y) for x, y in zip(a["feature"], b["feature"]))
    # stub decoder must refuse loudly, not fake silently
    with pytest.raises(Exception) as exc_info:
        extract_features(media, decoder="stub").count()
    assert "NotImplementedError" in str(exc_info.value) or \
        isinstance(exc_info.value, NotImplementedError)
    plan = frame_sample_plan(media, every_ms=500).toPandas()
    assert set(plan.columns) == {"media_id", "frame_ts_ms"}
    assert (plan.groupby("media_id").size() == 3).all()  # 0,500,1000
