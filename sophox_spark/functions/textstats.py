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
