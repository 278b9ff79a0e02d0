"""Text-analysis operators over document tables.

All hot-path expressions are built-in Catalyst functions (split /
regexp / array higher-order fns) — JVM-side, whole-stage-codegen'd, no
Python UDFs — so they hold up on a 100 TB documents table: embarrassingly
parallel per-row work, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic stopword list shared with oracle SQL
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ]."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.length(text)


def quality_score(text: Column) -> Column:
    """Length/stopword/punctuation quality heuristic in [0, 1]:
    long-enough docs with natural stopword density and low symbol noise
    score high. Deterministic, SQL-expressible (oracle-checkable)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return (length_term + stop_term + punct_term) / 3.0


def lang_guess(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic (content-based; independent of
    any stored lang label)."""
    return (
        F.when(text.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(stopword_ratio(text) >= 0.05, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized text (rolling-hash equivalent for exact-dup
    detection after normalization)."""
    return F.xxhash64(F.regexp_replace(F.trim(text), r"\s+", " "))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("stop_ratio", F.round(stopword_ratio(t), 6))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("quality", F.round(quality_score(t), 6))
        .withColumn("lang_guess", lang_guess(t))
        .withColumn("fp", fingerprint(t))
    )


# GPT-2-style pretokenizer (the public BPE pre-split regex): contraction
# suffixes, letter runs, digit runs, punctuation runs, trailing spaces.
# Java regex syntax (\p{L}/\p{N} unicode classes) — evaluated JVM-side.
_BPE_PRETOKEN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"


def bpe_ish_token_count(text: Column) -> Column:
    """Pretokenizer-level token count (the BPE pre-split, before merges):
    a closer proxy for LLM token budgets than whitespace words — digits,
    punctuation and contractions count separately. Pure regexp_count,
    zero Python."""
    return F.regexp_count(text, F.lit(_BPE_PRETOKEN))


def bpe_ish_tokens(text: Column) -> Column:
    """The pretokens themselves (array column), for inspection/tests."""
    return F.regexp_extract_all(text, F.lit(f"({_BPE_PRETOKEN})"), 1)
