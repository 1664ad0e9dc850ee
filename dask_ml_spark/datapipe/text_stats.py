"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions / aggregations — JVM-side, codegen,
oracle-reproducible in SQL. At 100 TB these are narrow maps over the
documents table (the fingerprint adds one groupBy on doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.datapipe.dedup import tokens_expr
from dask_ml_spark.utils import ensure_min_partitions

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic. Deliberately short + ASCII so the same literals
# embed into the duckdb oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una", "por", "con"],
}


def token_count(text_col) -> "F.Column":
    """Whitespace-ish token count (the BPE-ish regex tokenizer)."""
    return F.size(tokens_expr(text_col))


def language_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-ratio per language + argmax language guess.

    score_lang = |tokens ∩ stopwords_lang| / n_tokens, computed with
    array_intersect on the distinct token set — no explode, no shuffle.
    """
    toks = F.array_distinct(tokens_expr(F.col(text_col)))
    ntok = F.greatest(F.size(toks), F.lit(1))
    cols = {f"score_{lang}": (
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))) / ntok
    ) for lang, words in STOPWORDS.items()}
    out = ensure_min_partitions(df).select(F.col(id_col), *[v.alias(k) for k, v in cols.items()])
    # argmax language (ties → lexicographically first language code)
    langs = sorted(STOPWORDS)
    best = None
    for lang in langs:
        cond = True
        for other in langs:
            if other != lang:
                op = (F.col(f"score_{lang}") > F.col(f"score_{other}")) if other < lang \
                    else (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
                cond = op if cond is True else (cond & op)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return out.withColumn("lang_pred", best.otherwise(F.lit(langs[0])))


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation /
    digit / uppercase / stopword ratios, mean word length."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_expr(text)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    df = ensure_min_partitions(df)
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()-]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct / safe_toks).alias("distinct_ratio"),
        (n_punct / safe_chars).alias("punct_ratio"),
        (n_digit / safe_chars).alias("digit_ratio"),
        (n_upper / safe_chars).alias("upper_ratio"),
        (n_stop / safe_toks).alias("stopword_ratio"),
        ((n_chars.cast("double") - F.length(F.regexp_replace(text, " ", ""))) / safe_chars).alias("space_ratio"),
        (F.length(F.concat_ws("", toks)) / safe_toks).alias("mean_word_len"),
    )


def document_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set. Whitespace/punctuation/word-order-robust — the
    bag-of-words analog of a rolling-hash fingerprint, expressible as a
    pure projection (sort + concat + md5) with no shuffle."""
    toks = F.array_sort(F.array_distinct(tokens_expr(F.col(text_col))))
    return ensure_min_partitions(df).select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
        F.size(toks).alias("n_distinct_tokens"),
    )


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 5, max_digit_ratio: float = 0.3,
                   min_distinct_ratio: float = 0.2) -> DataFrame:
    """Composable curation filter — pushes straight down to the scan."""
    toks = tokens_expr(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
    digit_ratio = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")) / n_chars
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)).cast("double")
    return df.where(
        (n_tokens >= min_tokens)
        & (digit_ratio <= max_digit_ratio)
        & (distinct_ratio >= min_distinct_ratio)
    )
