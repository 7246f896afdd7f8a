"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All JVM-side column expressions (split/filter/aggregate) — whole-stage
codegen end to end, no Python in the row path. Heuristics are
deliberately simple and deterministic so DuckDB oracles can replicate
them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny function-word inventories for the n-gram/stopword language score
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "por", "con", "para"],
}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate
    (≈ ceil(chars/4), the common ~4-chars-per-token heuristic)."""
    toks = _tokens(text_col)
    return docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_subwords",
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("long"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword/repetition quality features plus a
    composite [0,1] score (monotone blend, fully SQL-expressible)."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    n_uniq = F.size(F.array_distinct(toks))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    avg_word = n_chars / F.greatest(n_tok, F.lit(1))
    out = (docs
           .withColumn("n_chars", n_chars.cast("long"))
           .withColumn("n_tokens", n_tok.cast("long"))
           .withColumn("uniq_ratio",
                       F.round(n_uniq / F.greatest(n_tok, F.lit(1)), 6))
           .withColumn("stop_hits", n_stop.cast("long"))
           .withColumn("punct_ratio",
                       F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
           .withColumn("avg_word_len", F.round(avg_word, 6)))
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.col("uniq_ratio") * 0.4
        + F.least(F.col("stop_hits") / F.lit(4.0), F.lit(1.0)) * 0.2)
    return out.withColumn("quality", F.round(score, 6))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Function-word voting language ID with deterministic tie-break
    (highest hit count, then language code order)."""
    toks = _tokens(text_col)
    hits = [
        F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in ws]))).alias(f"hits_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]
    scored = docs.select("*", *hits)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pick = F.coalesce(
        *[F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg))
          for lg in langs],
        F.lit("unknown"))
    return scored.withColumn("lang_pred", pick)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic rolling document fingerprint.

    h = fold(h * 31 + code) mod 2^31-1 over the text's character codes
    (polynomial rolling hash) — replicable in DuckDB via list_reduce
    for the oracle; collision-grouping on it is the cheap near-exact
    dedup key. Modulus 2^31-1 keeps acc*31+c < 2^36, overflow-safe in
    BIGINT on both engines (Spark 4 ANSI mode throws on overflow)."""
    m = (1 << 31) - 1
    chars = F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
    codes = F.transform(chars, F.ascii)
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c.cast("long")) % F.lit(m))
    return docs.withColumn("fingerprint", h)


def _trigram_explode(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, tri): one row per lowercased char-trigram occurrence.

    Two O(len²)-per-doc traps are bound away (ruinous on real
    multi-KB documents even though short test docs hide them):
    ``lower(text)`` is LET-BOUND through a 1-element transform so it
    lowercases once per document, and trigrams come from an O(1)
    indexed CHARACTER ARRAY (split once) instead of
    ``substring(t, i, 3)``, whose UTF-8 position seek is O(i) per
    call. Per-character split equals per-codepoint substring for BMP
    text (the corpus is ASCII); supplementary-plane characters would
    split into surrogate pairs — mirror any change in the oracle."""
    tris = F.expr(
        f"element_at(transform("
        f"array(filter(split(lower({text_col}), ''), x -> x != '')), "
        f"cs -> CASE WHEN size(cs) >= 3 THEN "
        f"transform(sequence(1, size(cs) - 2), "
        f"i -> concat(element_at(cs, i), element_at(cs, i + 1), "
        f"element_at(cs, i + 2))) "
        f"ELSE cast(array() AS array<string>) END), 1)")
    return docs.select("doc_id", F.explode(tris).alias("tri"))


def trigram_lm_train(docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Train a frozen char-trigram model on a held-out corpus:
    returns the (tri, cnt) count relation to pass as ``model_df=`` to
    :func:`trigram_lm_scores`. Persist it (parquet) once and every
    shard scores against the SAME distribution — the production CCNet
    shape, where per-shard self-training would make scores
    incomparable across shards."""
    return (_trigram_explode(docs, text_col)
            .groupBy("tri").agg(F.count(F.lit(1)).alias("cnt")))


def trigram_lm_scores(docs: DataFrame,
                      text_col: str = "text",
                      model_df: DataFrame | None = None) -> DataFrame:
    """Character-trigram language-model quality score per document —
    the CCNet-style filter a training-data pipeline ranks corpora
    with: documents whose character statistics diverge from the
    corpus (boilerplate, mojibake, code dumps) score low.

    Model: ``model_df=None`` (oracle mode) trains on the scored corpus
    itself — exactly SQL-recomputable, no OOV possible. Passing a
    precomputed (tri, cnt) relation (:func:`trigram_lm_train`) freezes
    the model so disjoint shards produce comparable scores; trigrams
    absent from the frozen model get the additive-smoothing floor
    ``ln(1 / (total + V))`` (V = model vocabulary size) — one shared
    OOV constant, still integer-quantized, still order-independent.

    Per occurrence, logprob ln(count_t / total) is quantized to
    ``floor(lp * 1e6 + 0.5)`` BIGINT before summing, so per-doc
    totals are exact integer sums — aggregation-order independent and
    bit-identical across engines (the same pattern as the IVF-PQ ADC
    scores; the only float steps are one ln per DISTINCT trigram and
    one final division of identical integers, both deterministic
    one-shot ops).

    Scale shape: the trigram relation is bounded by charset^3 (tens
    of thousands of rows at 100 TB — broadcast), the explode is the
    only wide op, and the per-doc aggregate is map-side combinable.
    Output: (doc_id, n_trigrams, avg_logprob round-6).
    """
    tri = _trigram_explode(docs, text_col)
    frozen = model_df is not None
    counts = model_df if frozen else (
        tri.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt")))
    stats = counts.agg(F.sum("cnt").alias("total"),
                       F.count(F.lit(1)).alias("vocab"))
    lp = (counts.crossJoin(F.broadcast(stats))
          .select("tri",
                  F.floor(F.log(F.col("cnt") / F.col("total"))
                          * F.lit(1e6) + F.lit(0.5)).alias("lp_i")))
    scored = tri.join(F.broadcast(lp), "tri",
                      "left" if frozen else "inner")
    if frozen:
        oov = stats.select(
            F.floor(F.log(F.lit(1.0)
                          / (F.col("total") + F.col("vocab")))
                    * F.lit(1e6) + F.lit(0.5)).alias("oov_i"))
        scored = (scored.crossJoin(F.broadcast(oov))
                  .withColumn("lp_i",
                              F.coalesce("lp_i", "oov_i")))
    # floor(s/n)/1e6, NOT ROUND(s/1e6/n, 6): the average of exact
    # integer micro-logprobs can land exactly on a half-microunit
    # boundary, where Spark (half-up) and DuckDB (half-even) round
    # apart — first seen at sf1 (avg -5.6226235). floor of one double
    # division of identical integers is tie-free and bit-identical.
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.sum("lp_i").alias("_s"))
            .select("doc_id", "n_trigrams",
                    (F.floor(F.col("_s") / F.col("n_trigrams"))
                     / F.lit(1e6)).alias("avg_logprob")))
