"""Text-analysis operators (extension E4): stats, quality scoring,
language ID, token counting, fingerprinting.

All hot-path expressions are built-in pyspark.sql.functions (JVM,
whole-stage codegen) — at 100 TB these are scan-bound narrow maps with
zero shuffle. The only Python is the optional Pandas-UDF hook for
heavier NLP, which moves Arrow batches, never rows.

The reference's only text handling is JSONSTAT label extraction
(producers/statbank/fetch_data_statbank.py:49-65); this module is the
BASELINE.json-mandated extension for LLM-training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ingest_spark.functions.hashing import normalized_fingerprint

# Tiny embedded stopword lists for the language-ID heuristic. Counting
# occurrences of " w " bounded patterns is pure string arithmetic and
# reproducible in any SQL engine (the oracle recomputes it).
EN_STOPWORDS = ("the", "and", "of", "to", "is", "in", "that", "it")
DA_STOPWORDS = ("og", "er", "det", "en", "til", "af", "ikke", "som")


def _occurrences(text: Column, word: str) -> Column:
    """# of word-token occurrences of ``word``, counted by filtering
    the split array — exact for ADJACENT repeats ("the the the" = 3),
    where the replace-" w "-and-measure trick undercounts because
    non-overlapping matches consume the shared boundary space.
    Portable: the oracle uses len(list_filter(string_split(...)))."""
    return F.size(F.filter(F.split(text, " "), lambda x: x == word)).cast("int")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, words, distinct words, avg word
    length, type-token ratio. Narrow map, no shuffle."""
    t = F.col(text_col)
    words = F.split(t, " ")
    return df.withColumns(
        {
            "n_chars_calc": F.length(t),
            "n_words": F.size(words),
            "n_distinct_words": F.size(F.array_distinct(words)),
            "avg_word_len": F.round(
                (F.length(t) - F.size(words) + 1) / F.size(words), 4
            ),
            "type_token_ratio": F.round(
                F.size(F.array_distinct(words)) / F.size(words), 4
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: penalize very short docs, low
    lexical diversity and stopword-free (likely non-linguistic) text.
    The standard cheap pre-filter before expensive dedup/training."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    ttr = F.size(F.array_distinct(words)) / n_words
    stop_hits = sum((_occurrences(t, w) for w in EN_STOPWORDS), F.lit(0))
    stop_ratio = stop_hits / n_words
    score = (
        F.least(n_words / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(ttr * 2, F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * 10, F.lit(1.0)) * F.lit(0.2)
    )
    return df.withColumn("quality_score", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-heuristic language ID: argmax of per-language
    stopword occurrence counts, 'und' (undetermined) on a zero/tie."""
    t = F.lower(F.col(text_col))
    en = sum((_occurrences(t, w) for w in EN_STOPWORDS), F.lit(0))
    da = sum((_occurrences(t, w) for w in DA_STOPWORDS), F.lit(0))
    return (
        df.withColumn("en_hits", en)
        .withColumn("da_hits", da)
        .withColumn(
            "lang_pred",
            F.when(F.col("en_hits") > F.col("da_hits"), F.lit("en"))
            .when(F.col("da_hits") > F.col("en_hits"), F.lit("da"))
            .otherwise(F.lit("und")),
        )
    )


# GPT-2-style pre-tokenizer, restricted to the RE2-and-Java common
# subset (no lookahead): a token is an optionally-space-prefixed run of
# letters, digits, or other non-space symbols. On ASCII corpora this
# reproduces the BPE pre-tokenization split exactly; the merges step
# below it only subdivides, so the count is the standard budget proxy.
PRETOK_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens, a BPE-style pre-tokenizer regex
    count, and the ceil(chars/4) estimate (the cheap proxy when even a
    regex pass is too much). Exact BPE with a merges table would be a
    Pandas UDF over the same pre-token split."""
    t = F.col(text_col)
    ws = F.size(F.split(t, " "))
    return df.withColumns(
        {
            "ws_tokens": ws,
            "pretok_tokens": F.size(F.regexp_extract_all(t, F.lit(PRETOK_PATTERN), 0)),
            "bpe_est_tokens": F.ceil(F.length(t) / F.lit(4.0)).cast("bigint"),
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization fingerprint (case/space/punct-insensitive identity)."""
    return df.withColumn("fingerprint", normalized_fingerprint(text_col))


def word_ngrams(text: Column | str, n: int) -> Column:
    """Ordered word n-grams (non-distinct) — shared with dedup.shingles
    semantics but kept positional for TF-style uses."""
    words = F.split(F.col(text) if isinstance(text, str) else text, " ")
    k = F.size(words) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)])
    )
    return F.when(k > 0, gram).otherwise(F.array())
