"""Text-analysis columns for the documents/pages tables.

Training-data-pipeline operators over ``documents(text, lang, ...)``:
language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace split), and
document fingerprinting (normalized-text hash). Everything is a native
Spark Column expression — JVM-side, whole-stage-codegen'd, and each has
an exactly equivalent ANSI-SQL form for the DuckDB oracle (the SQL
strings live in __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny deterministic stopword profiles; enough signal for synthetic docs
LANG_PROFILES: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " et ", " les ", " des "],
    "es": [" el ", " y ", " los ", " que "],
}


def occurrence_count(text: Column, needle: str) -> Column:
    """# of occurrences of a literal substring (portable: same formula
    works in DuckDB as (length(x)-length(replace(x,n,'')))/length(n))."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(occurrence_count(padded, w) for w in words)
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when all
    scores are zero. Deterministic tie-break by profile order."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    # iterate reversed so earlier profiles win ties (strict >)
    for lang in reversed(list(scores)):
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def token_count(text: Column) -> Column:
    """Whitespace tokens (empty text → 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


PUNCT_CLASS = r"[.,!?;:]"


def quality_score(text: Column) -> Column:
    """Heuristic in [0,1]: length band + punctuation-density band +
    mean-token-length band, equally weighted. Pure arithmetic (portable
    to the SQL oracle)."""
    n = F.length(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    toks = token_count(text)
    punct_ratio = punct / F.greatest(n, F.lit(1))
    mean_tok = n / F.greatest(toks, F.lit(1))
    len_ok = F.when((n >= 200) & (n <= 20000), 1.0).otherwise(
        F.when(n >= 50, 0.5).otherwise(0.0)
    )
    punct_ok = F.when((punct_ratio >= 0.005) & (punct_ratio <= 0.1), 1.0).otherwise(0.5)
    tok_ok = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), 1.0).otherwise(0.5)
    return ((len_ok + punct_ok + tok_ok) / 3.0).alias("quality")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key (portable: DuckDB md5())."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def repetition_stats(df, key: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the standard crawl-filtering heuristics) per document:

    * ``dup_line_frac`` — fraction of lines that repeat an earlier
      line: 1 − distinct/total
    * ``dup_line_char_frac`` — characters inside the REPEATED line
      occurrences over all line characters
    * ``top_bigram`` / ``top_bigram_frac`` — the most frequent word
      2-gram (ties break lexicographically) and the character fraction
      its occurrences cover

    All native exprs: one explode per signal family + grouped aggs —
    JVM-side, shuffle on ``key`` only, linear in corpus size."""
    from pyspark.sql import DataFrame, Window

    assert isinstance(df, DataFrame)
    k = F.col(key)
    lines = df.select(
        k, F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    per = (
        lines.groupBy(key, "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(key, "c", F.length("line").alias("ln"))
    )
    doc_lines = per.groupBy(key).agg(
        F.sum("c").alias("n_lines"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_line_frac"),
        (
            F.sum((F.col("c") - 1) * F.col("ln"))
            / F.greatest(F.sum(F.col("c") * F.col("ln")), F.lit(1))
        ).cast("double").alias("dup_line_char_frac"),
    )
    toks = df.select(
        k,
        F.length(text_col).alias("n_chars"),
        F.posexplode(
            F.split(F.regexp_replace(F.col(text_col), "\n", " "), r"\s+")
        ).alias("pos", "tok"),
    ).filter(F.length("tok") > 0)
    w = Window.partitionBy(key).orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            k, "n_chars",
            F.concat_ws(" ", "tok", "nxt").alias("bg"),
        )
    )
    bgc = bigrams.groupBy(key, "n_chars", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = Window.partitionBy(key).orderBy(F.desc("c"), F.asc("bg"))
    top = (
        bgc.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .select(
            key,
            F.col("bg").alias("top_bigram"),
            (
                F.col("c") * F.length("bg")
                / F.greatest(F.col("n_chars"), F.lit(1))
            ).cast("double").alias("top_bigram_frac"),
        )
    )
    return doc_lines.join(top, key, "left")


# PII scrubbing: standard hygiene pass before a crawl corpus becomes
# training data. Patterns are deliberately conservative (precision
# over recall) and every replacement is a typed placeholder so counts
# stay auditable. Pure regexp_replace/regexp_count — JVM-side.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (category, regex, placeholder)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",
     r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
     r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
     "<IP>"),
    ("phone",
     r"(?<![0-9])\+?[0-9]{1,3}[-. ]\(?[0-9]{2,4}\)?[-. ][0-9]{3,4}"
     r"[-. ][0-9]{3,4}(?![0-9])",
     "<PHONE>"),
)


def scrub_pii(text: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed text, {category: match count}) — emails, IPv4
    addresses, and separator-delimited phone numbers become typed
    placeholders. Passes run email -> ip -> phone on the running
    text, so each character is claimed by at most one category."""
    counts = {}
    out = text
    for cat, pat, repl in PII_PATTERNS:
        counts[cat] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, repl)
    return out, counts
