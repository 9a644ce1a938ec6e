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
            # scaled-integer division (x*10^4 div n / 10^4) instead of
            # round(x/n, 4): int/int ratios land on EXACT 5-decimal
            # midpoints whenever n is a power of two (1/32 = .03125),
            # where Spark (shortest-decimal) and other engines (binary)
            # round in opposite directions
            "avg_word_len": (
                ((F.length(t) - F.size(words) + 1) * 10000 / F.size(words))
                .cast("long")
                .cast("double")
                / 10000
            ),
            "type_token_ratio": (
                (F.size(F.array_distinct(words)) * 10000 / F.size(words))
                .cast("long")
                .cast("double")
                / 10000
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
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = sum((_occurrences(t, w) for w in EN_STOPWORDS), F.lit(0))
    # integer micro-units end-to-end (score = micros / 1e6): the three
    # ratio terms are small-int fractions that hit exact decimal
    # midpoints for power-of-two word counts, where double rounding
    # diverges across engines. 0.4*min(w/20,1) -> min(20000w, 400000),
    # 0.4*min(2d/w,1) -> min(800000d div w, 400000),
    # 0.2*min(10s/w,1) -> min(2000000s div w, 200000).
    t1 = F.least(n_words.cast("long") * 20000, F.lit(400000).cast("long"))
    t2 = F.least(
        (n_distinct.cast("long") * 800000 / n_words).cast("long"),
        F.lit(400000).cast("long"),
    )
    t3 = F.least(
        (stop_hits.cast("long") * 2000000 / n_words).cast("long"),
        F.lit(200000).cast("long"),
    )
    return df.withColumn(
        "quality_score", (t1 + t2 + t3).cast("double") / 1_000_000
    )


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


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Boilerplate/spam signal: share of the document taken by its
    single most-repeated word n-gram. Template pages and keyword-stuffed
    spam score high; natural prose scores near 1/total.

    Plan: explode n-grams -> (doc, gram) hash aggregate -> (doc) max +
    sum — two shuffles on doc_id, both with map-side combine. The
    ratio is scaled-integer division (portable midpoint behavior)."""
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy(id_col).agg(
        F.max("cnt").cast("long").alias("max_gram_count"),
        F.sum("cnt").cast("long").alias("total_grams"),
        (
            (F.max("cnt") * 1000000 / F.sum("cnt")).cast("long").cast("double")
            / 1000000
        ).alias("repetition_ratio"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Training-sample chunker: split each document into token windows
    of ``size`` whitespace tokens advancing by ``stride`` (overlapping
    when stride < size), the standard pretokenization step that turns a
    variable-length corpus into fixed-shape training samples.

    Plan: one narrow projection (split + sequence) then a generate
    (explode) — no shuffle at all; chunking is embarrassingly parallel
    and stays inside whole-stage codegen. At 100 TB the only knob is
    input split size (``files.maxPartitionBytes``); output is ~
    size/stride x the input rows but each row is narrow.
    Generalizes the reference's day-window chunking (S3,
    producers/energinet/fetch_data_energinet.py:139-186) from time
    ranges to token ranges."""
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunked = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(" ", F.slice("_toks", F.col("_start"), size)).alias("chunk_text"),
        F.size(F.slice("_toks", F.col("_start"), size)).alias("n_tokens"),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace email addresses and phone numbers with
    typed placeholders and count the redactions. Both patterns are
    RE2-safe (no backtracking constructs), so the same regex runs on
    Spark (Java regex), DuckDB (RE2), and any engine in between —
    and linear-time matching is what you want on adversarial 100 TB
    web text anyway.

    Plan: two chained regexp_replace + two regexp_count, all inside
    one codegen'd projection; no shuffle."""
    c = F.col(text_col)
    return df.withColumn(
        "n_emails", F.regexp_count(c, F.lit(EMAIL_RE)).cast("int")
    ).withColumn(
        "n_phones", F.regexp_count(c, F.lit(PHONE_RE)).cast("int")
    ).withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing at least
    one word n-gram with any benchmark document, with the count of
    distinct shared grams. The decontamination primitive every
    training-data pipeline runs before shipping a corpus.

    Plan: distinct n-grams per side -> equi-join on the gram -> count
    per corpus doc. The benchmark side (eval sets are small) is
    broadcast, so the corpus never shuffles. At 100 TB, join on
    ``stable_hash64(gram)`` instead of the string to cut shuffle/
    broadcast width ~8x; string join kept here for oracle exactness.
    """
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    ).distinct()
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("shared_ngrams"))
    )
