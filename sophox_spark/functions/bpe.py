"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al. 2016) — the canonical subword-vocabulary learner for LLM training
corpora, built DataFrame-first:

* the corpus collapses ONCE to a (word, count) vocabulary table — the
  only corpus-sized shuffle; at 10^12 documents the distinct-word
  table is millions of rows, i.e. trivially small next to the corpus,
  and every merge iteration runs on it alone;
* each merge iteration is one pair-count aggregation (explode adjacent
  symbol pairs weighted by word count, map-side combined) + one argmax
  (a bounded single-row collect — the iteration's decision, same
  driver-scalar pattern as the fixpoint operators) + one fold that
  rewrites the symbol arrays (left-to-right non-overlapping, exactly
  Sennrich's regex semantics);
* the vocabulary frame localCheckpoints per iteration so the plan
  stays flat instead of nesting n_merges aggregate lambdas.

Pair statistics mirror the reference implementation: overlapping pairs
count once per occurrence position ('aaa' yields (a,a) twice), and the
greedy fold cannot re-merge through a fresh merge because the merged
symbol is strictly longer than its left part. Ties break
deterministically (count desc, then left, then right lexicographic) —
a documented sharpening of the reference's dict-order tie.

``apply_bpe`` segments text with a learned merge table inside an
Arrow-batched pandas UDF (the standard labeled Python crossing: the
merge list is a broadcast-sized driver value, per-word results memoize
within each batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, wc): lowercase whitespace words. The one
    corpus-sized aggregation; everything downstream is vocab-sized."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    ).where(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))


def _char_symbols(word):
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def train_bpe(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns the merge table as
    [(rank, left, right, pair_count)] — rank 0 first; feed to
    :func:`apply_bpe` or ``spark.createDataFrame`` for a frame."""
    vocab = word_counts(df, text_col).select(
        "wc", _char_symbols(F.col("word")).alias("syms")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        syms = F.col("syms")
        pair_idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(0), F.size(syms) - 2)
        ).otherwise(F.array().cast("array<int>"))
        pairs = vocab.select(
            "wc",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at(syms, i + 1).alias("l"),
                        F.element_at(syms, i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
        ).groupBy("p.l", "p.r").agg(F.sum("wc").alias("c"))
        top = pairs.orderBy(
            F.col("c").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, left, right, cnt))
        lx, rx, mx = F.lit(left), F.lit(right), F.lit(left + right)
        merged = F.aggregate(
            syms,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lx)
                & (x == rx),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(mx)),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select("wc", merged.alias("syms")).localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment each document with the learned merge table:
    (key, pieces array<string>, n_pieces). Arrow-batched; per-word
    results memoize within each batch (crawl text repeats words)."""
    ranked = [(m[1], m[2]) for m in sorted(merges)]

    @F.pandas_udf("array<string>")
    def _seg(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def seg_word(w):
            out = cache.get(w)
            if out is None:
                out = list(w)
                for left, right in ranked:
                    i, merged = 0, []
                    while i < len(out):
                        if (
                            i + 1 < len(out)
                            and out[i] == left
                            and out[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(out[i])
                            i += 1
                    out = merged
                cache[w] = out
            return out

        return pd.Series(
            [
                [p for w in str(t).lower().split() for p in seg_word(w)]
                for t in texts
            ]
        )

    pieces = _seg(F.col(text_col))
    return df.select(
        F.col(key), pieces.alias("pieces")
    ).withColumn("n_pieces", F.size("pieces"))
