"""Learned document-quality classifier (hashed-feature logistic
regression) — the "looks like the reference corpus" filter from the
CCNet / LLaMA-style pipelines, where a linear classifier over hashed
token features separates a curated positive set from raw crawl text.

Everything is DataFrame algebra so training distributes and the exact
pipeline replays in SQL:

* features: hashed bag-of-words — token → md5-digit uniform → bucket
  (the same portable digit-positional arithmetic as
  ``sampling.md5_uniform``, so any SQL engine reproduces the bucketing
  without an engine-specific hash), counts normalized per document;
* training: full-batch gradient descent on logistic loss, each
  iteration = ONE broadcast join of the (dim)-sized weight table into
  the (doc, feature) rows, a per-document margin aggregation, a
  sigmoid, and a per-feature gradient aggregation — two narrow
  shuffles per iteration, both keyed on small cardinalities (doc key,
  feature bucket), with the corpus-sized feature table reused across
  iterations from one persisted materialization;
* deterministic: zero-init weights, fixed learning rate, no sampling —
  the oracle replays the UNROLLED iterations.

Scoring joins the broadcast learned weights back into corpus features:
the 100-TB side never shuffles (the per-doc agg co-partitions with the
feature explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sophox_spark.operators.sampling import md5_uniform


def doc_features(
    df: DataFrame, key: str = "doc_id", text_col: str = "text", dim: int = 64
) -> DataFrame:
    """(key, f, x): hashed-bucket token counts, L1-normalized per doc
    so long documents don't dominate the gradient."""
    toks = df.select(
        F.col(key),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    feats = toks.select(
        F.col(key), (md5_uniform(F.col("tok")) % F.lit(dim)).alias("f")
    )
    counts = feats.groupBy(key, "f").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy(key).agg(F.sum("c").alias("t"))
    return counts.join(tot, key).select(
        key, "f", (F.col("c") / F.col("t")).alias("x")
    )


def train_quality_clf(
    labeled: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 64,
    iters: int = 2,
    lr: float = 1.0,
) -> DataFrame:
    """Logistic-regression weights after ``iters`` full-batch GD steps
    from zero init. ``label_col`` is 0/1. Returns (f, w) — ``dim``
    rows (absent features keep weight 0 and are emitted explicitly so
    the weight table is always dense).

    Gradient: w_f -= lr * mean_docs(x_f * (sigmoid(margin) - y)).
    """
    n_docs = labeled.select(key).distinct().count()  # bounded scalar
    feats = doc_features(labeled, key, text_col, dim).join(
        labeled.select(key, F.col(label_col).alias("_y")), key
    ).localCheckpoint()  # one materialization reused by every iteration
    spark = labeled.sparkSession
    weights = spark.range(dim).select(
        F.col("id").cast("long").alias("f"), F.lit(0.0).alias("w")
    )
    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(weights), "f", "left")
            .groupBy(key, "_y")
            .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("m"))
        )
        resid = margins.select(
            F.col(key),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("_y"))
            .alias("r"),
        )
        grad = (
            feats.join(resid, key)
            .groupBy("f")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(float(n_docs))).alias("g"))
        )
        weights = (
            weights.join(grad, "f", "left")
            .select(
                "f",
                (F.col("w") - F.lit(lr) * F.coalesce(F.col("g"), F.lit(0.0)))
                .alias("w"),
            )
            .localCheckpoint()
        )
    return weights


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """(key, margin, p_good): sigmoid score under the learned weights.
    Weight table broadcasts; the corpus side never shuffles beyond the
    per-document aggregation."""
    feats = doc_features(df, key, text_col, dim)
    return (
        feats.join(F.broadcast(weights), "f", "left")
        .groupBy(key)
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("margin"))
        .select(
            key,
            "margin",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("p_good"),
        )
    )
