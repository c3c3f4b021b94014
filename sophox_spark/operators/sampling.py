"""Corpus mixing and sequence packing (training-data assembly stage).

After filtering/dedup, a training pipeline still has to (a) MIX
heterogeneous sources into target proportions and (b) PACK documents
into fixed-length training sequences. Both are deterministic
DataFrame-only transforms here:

* :func:`temperature_mix` — temperature-flattened source weighting
  (the multilingual-sampling rule from the mBERT/XLM-R line of work,
  also how The Pile weights its subsets): group d with n_d documents
  gets weight w_d ∝ n_d^T, T ∈ (0, 1] flattening head groups and
  boosting the tail. Selection is a per-document deterministic coin:
  an md5-derived uniform compared against the group's keep rate, so
  reruns and resumed jobs select the identical subset (no RNG state),
  and the oracle replays it in any SQL engine.
* :func:`pack_sequences` — contiguous greedy packing: documents in
  deterministic key order fill fixed token-budget bins; a document
  that crosses the budget boundary closes its bin (no splitting, the
  common "greedy, no document fragmentation" variant). One window
  cumsum — at scale this is a single global sort, the same shape as
  any total-order operation (range partition + per-partition scan).

Both carry exact SQL replays in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX = "0123456789abcdef"
_U_SCALE = 16 ** 8  # uniform domain: first 8 md5 hex digits


def md5_uniform(col: Column) -> Column:
    """Deterministic uniform integer in [0, 16^8) from the first 8 md5
    hex digits — digit-wise positional arithmetic (the simhash-oracle
    trick) so DuckDB reproduces it with strpos/substr, no engine hash."""
    h = F.md5(col.cast("string"))
    u = F.lit(0).cast("long")
    for j in range(8):
        digit = F.instr(F.lit(_HEX), F.substring(h, j + 1, 1)) - 1
        u = u + digit.cast("long") * F.lit(16 ** (7 - j)).cast("long")
    return u


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    key: str = "doc_id",
    temperature: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Deterministic temperature-weighted corpus sampling.

    Group sizes n_d aggregate once (tiny table → broadcast back);
    weights w_d = n_d^T / Σ n_d^T; each group keeps
    min(1, budget_frac·N·w_d / n_d) of its documents by the md5 coin.
    T=1 is proportional (rates equal across groups); T→0 approaches
    uniform-over-groups. Output: every selected document with its
    group's keep rate and the group stats — callers count tokens per
    group downstream to verify the realized mixture.
    """
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_d"))
    tot = sizes.agg(
        F.sum(F.pow(F.col("n_d").cast("double"), F.lit(temperature))).alias("z"),
        F.sum("n_d").alias("n_total"),
    )
    rates = sizes.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_d",
        F.least(
            F.lit(1.0),
            F.lit(budget_frac)
            * F.col("n_total")
            * (F.pow(F.col("n_d").cast("double"), F.lit(temperature)) / F.col("z"))
            / F.col("n_d"),
        ).alias("keep_rate"),
    )
    coin = md5_uniform(F.col(key))
    return (
        df.join(F.broadcast(rates), group_col)
        .where(coin < (F.col("keep_rate") * F.lit(float(_U_SCALE))))
        .select(key, group_col, "n_d", "keep_rate")
    )


def pack_sequences(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """Greedy contiguous packing of whitespace-token counts into
    fixed-budget training sequences.

    Documents are taken in ascending ``key`` order; each document is
    appended whole (never fragmented) to the current bin, and a
    document whose tokens cross the budget boundary closes the bin.
    Equivalently: bin = floor(exclusive-prefix-sum(tokens) / budget).

    The prefix sum is the textbook DISTRIBUTED scan, not a global
    window (Spark executes an unpartitioned window on a single task —
    a scale-killer): range-repartition by key, per-partition window
    prefix sums, then a partition-count-sized offset table (cumsum of
    per-partition totals) broadcasts back. The result is independent
    of where the range boundaries land, so sampling nondeterminism in
    RangePartitioner can never change the output.

    Output: (key, n_tokens, bin, bin_offset) where bin_offset is the
    token offset of the document inside its bin's running stream.
    """
    # coalesce NULL text to '' so a NULL row contributes 0 tokens like
    # an empty document instead of a NULL n_tokens that silently drops
    # out of the prefix sum and shifts every later bin_offset (the
    # DuckDB oracle's length(trim(coalesce)) semantics; ADVICE r6)
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    n_tok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    # localCheckpoint pins ONE materialization: both consumers below
    # must see identical range boundaries, and RangePartitioner's
    # sample is not contractually stable across recomputations
    toks = (
        df.select(F.col(key), n_tok.alias("n_tokens"))
        .repartitionByRange(key)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local = Window.partitionBy("_pid").orderBy(key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_local = toks.withColumn(
        "_before_local", F.coalesce(F.sum("n_tokens").over(local), F.lit(0))
    )
    offsets = (
        toks.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_ptot"))
        .withColumn(
            "_poff",
            F.coalesce(
                F.sum("_ptot").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_poff")
    )
    before = F.col("_before_local") + F.col("_poff")
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .select(
            key,
            "n_tokens",
            F.floor(before / F.lit(budget)).alias("bin"),
            (before % F.lit(budget)).alias("bin_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    standard chunker in front of embedding / RAG / long-context
    training pipelines. Chunks start every ``chunk_tokens - overlap``
    tokens; the last chunk may be short; empty documents yield no
    chunks. Pure array expressions (one explode, zero Python, zero
    shuffle — chunking is embarrassingly row-parallel).

    Output: (key, chunk_id, tok_start, tok_end, chunk) with token
    offsets [tok_start, tok_end) and the space-rejoined chunk text.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toked = df.select(
        F.col(key), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.when(F.array_join(toks, "") == "", F.lit(0)).otherwise(F.size(toks))
    # chunk starts: 0, stride, 2*stride, ... while start < n - overlap
    # (a start inside the previous chunk's tail would yield a chunk
    # fully contained in it — the standard no-redundant-tail rule)
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0),
            F.floor((F.greatest(n - F.lit(overlap), F.lit(1)) - 1) / F.lit(stride))
            .cast("int") * F.lit(stride),
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("tok_start"),
            F.least(s + F.lit(chunk_tokens), n).alias("tok_end"),
            F.array_join(
                F.slice(toks, s + 1, F.least(F.lit(chunk_tokens), n - s)), " "
            ).alias("chunk"),
        ),
    )
    out = toked.select(F.col(key), F.posexplode(chunks).alias("chunk_id", "c"))
    return out.select(
        key,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.tok_start").cast("long").alias("tok_start"),
        F.col("c.tok_end").cast("long").alias("tok_end"),
        F.col("c.chunk").alias("chunk"),
    )


def uniform_sample(
    df: DataFrame, k: int = 100, key: str = "doc_id"
) -> DataFrame:
    """Deterministic uniform k-sample: order by the md5 coin of the
    key (ties by key) and take k — the rerun-stable analog of
    reservoir sampling for eval-set carving. A global top-k, not a
    global sort: Spark's TakeOrderedAndProject keeps k rows per
    partition then merges, so no full-corpus shuffle."""
    return df.orderBy(md5_uniform(F.col(key)).asc(), F.col(key).asc()).limit(k)
