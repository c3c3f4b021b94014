"""N-gram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al. 2020) ranks crawl documents by the perplexity of a
KenLM 5-gram model trained on a clean reference corpus and keeps the
low-perplexity head. The engine equivalent keeps the exact statistical
shape — counts-based n-gram LM with additive smoothing, per-document
mean log-probability — built entirely from DataFrame ops so training
and scoring both distribute:

* training is two count aggregations over the reference shard
  (unigrams, bigrams), each one shuffle with map-side partial aggs;
* scoring explodes the corpus into bigrams and LEFT-joins the count
  tables; the count tables are vocabulary-sized (tiny next to a
  100-TB corpus) so both joins auto-broadcast — the corpus side never
  shuffles;
* probabilities are add-alpha smoothed: p(w2|w1) =
  (c(w1,w2) + a) / (c(w1) + a*V) with V the reference vocabulary
  size, carried as a broadcast 1-row frame so the whole pipeline
  stays lazy (no driver-side count()).

Tokens are lowercase ``\\s+`` splits, the same normalization the other
text operators use. Reference analog: Sophox has no LM layer; this is
part of the training-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(df: DataFrame, cols: list[str], text_col: str) -> DataFrame:
    """Materialized lowercase token-array column (the decontaminate
    lesson: never reference split() inside a downstream lambda)."""
    return df.select(
        *cols, F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks")
    ).where(F.array_join(F.col("_toks"), "") != "")


def _bigram_rows(df: DataFrame, cols: list[str], text_col: str) -> DataFrame:
    toked = _tokens(df, cols, text_col)
    toks = F.col("_toks")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    return toked.select(*cols, F.explode(pairs).alias("b")).select(
        *cols, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )


def train_bigram_lm(ref: DataFrame, text_col: str = "text") -> dict:
    """Count tables from the reference corpus. Returns
    ``{"unigrams": (w1, c1), "bigrams": (w1, w2, c12), "vocab": (V,)}``
    — all lazy DataFrames; the caller joins/broadcasts them."""
    toks = _tokens(ref, [], text_col).select(
        F.explode(F.col("_toks")).alias("w1")
    )
    unigrams = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bigrams = (
        _bigram_rows(ref, [], text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    vocab = unigrams.agg(F.count(F.lit(1)).cast("double").alias("V"))
    return {"unigrams": unigrams, "bigrams": bigrams, "vocab": vocab}


def perplexity(
    df: DataFrame,
    lm: dict,
    key: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document bigram perplexity under the trained LM.

    Output: (key, n_bigrams, avg_logprob, perplexity) for every
    document with at least one bigram. ``perplexity =
    exp(-avg_logprob)`` — lower is closer to the reference corpus,
    exactly CCNet's ranking statistic.
    """
    grams = _bigram_rows(df, [key], text_col)
    scored = (
        grams.join(F.broadcast(lm["unigrams"]), "w1", "left")
        .join(F.broadcast(lm["bigrams"]), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(lm["vocab"]))
        .select(
            F.col(key),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("V"))
            ).alias("lp"),
        )
    )
    return scored.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("avg_logprob"),
        F.exp(-F.avg("lp")).alias("perplexity"),
    )
