"""Text-analysis operators over a documents(doc_id, text, ...) table.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (normalization
hash). All pure JVM column expressions — no Python in the data path — so the
same logic runs unchanged on a 1000-executor scan of 100 TB of text.

Determinism note: every ratio is computed as one division of exact integer
counts, so results are bit-identical across engines/orders (the DuckDB
oracle harness hashes values).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny embedded stopword lists for the language-ID heuristic. A real deploy
# swaps in per-language n-gram profiles; the operator shape (explode-free
# single-pass scoring) stays the same.
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"]

WORD_RE = "[A-Za-z0-9]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation marks
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[^A-Za-z0-9\\s]"


def _words(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def _hits(words: Column, vocab: list[str]) -> Column:
    return F.size(F.array_intersect(F.array_distinct(words), F.array([F.lit(w) for w in vocab])))


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace-token and BPE-ish-regex token counts per document."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("\\S+"), 0)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length(F.regexp_replace(F.col("text"), "\\s+", "")).alias("n_chars_nospace"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    ratios = integer counts divided once (scaled to 1e6 and floored) so the
    values are exact integers — engine-order-independent.
    """
    words = _words(F.col("text"))
    n_words = F.size(words)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), 0))
    n_stop = _hits(words, EN_STOPWORDS)
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_chars.cast("bigint").alias("n_chars"),
        # mean word length in millionths, floored: exact integer arithmetic
        F.when(n_words > 0, F.floor((sum_word_len * 1000000) / n_words))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mean_word_len_ppm"),
        F.when(n_chars > 0, F.floor((n_punct.cast("bigint") * 1000000) / n_chars))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("punct_ratio_ppm"),
        F.when(n_words > 0, F.floor((n_stop.cast("bigint") * 1000000) / n_words))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("stopword_ratio_ppm"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID: en vs es vs unk by distinct-hit count."""
    words = _words(F.col("text"))
    en = _hits(words, EN_STOPWORDS)
    es = _hits(words, ES_STOPWORDS)
    return docs.select(
        "doc_id",
        en.alias("en_hits"),
        es.alias("es_hits"),
        F.when((en >= 2) & (en >= es), F.lit("en"))
        .when((es >= 2) & (es > en), F.lit("es"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text,
    and an order-insensitive 'bag' fingerprint (md5 of sorted distinct
    words) for near-dup clustering."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    words_sorted = F.array_join(F.array_sort(F.array_distinct(_words(F.col("text")))), " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_norm"),
        F.md5(words_sorted).alias("fp_bag"),
    )
