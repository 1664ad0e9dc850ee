"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") —
the iterative pair-merge loop, Spark-first.

Shape at 100 TB: the corpus is touched ONCE — one explode + groupBy
builds the word-TYPE table (word, count), whose size is bounded by
vocabulary (millions), not corpus rows (billions). Every merge round
then runs on that bounded table: one pair-count aggregate (map-side
partial on uniformly-hashed pairs), a 1-row argmax collect (model
state, the same driver contract as k-means centroids), and a narrow
JVM array fold applying the merge — no UDF, no shuffle of corpus
data, no growth with corpus size. Lineage from chained rounds is cut
with localCheckpoint every few rounds (the repo-wide pattern; the
ContextCleaner reclaims them).

Encoding applies the learned merges in priority order — per merge one
JVM fold for short merge lists, or a single Arrow-batched pandas UDF
for production-sized vocabularies (one Python pass instead of k
chained plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.datapipe.dedup import tokens_expr


def word_types(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) word-type table — the ONE corpus-sized pass. Bounded
    by vocabulary size afterwards."""
    return (df.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def _to_symbols(word_col) -> "F.Column":
    """Initial symbol sequence: one character per symbol. (NOT
    split(w, '(?!^)') — Spark's split keeps a trailing empty string
    for end-of-string lookahead matches.)"""
    return F.regexp_extract_all(word_col, F.lit("."), 0)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol arrays, weighted by
    word-type count: one posexplode + one aggregate."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s as left, element_at(syms, i + 2) as right))")
    return (words.where(F.size("syms") >= 2)
            .select("n", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("n").alias("pair_count")))


def _apply_merge(syms_col, left: str, right: str) -> "F.Column":
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs — a pure JVM aggregate fold over the symbol array."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(l, r)))
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text",
              checkpoint_every: int = 4):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (merges, words): merges is a list of (left, right, pair_count) in
    priority order; words is the final symbolized word-type frame.

    Ties in pair counts break deterministically (count desc, then
    (left, right) asc) so training is reproducible across
    partitionings, retries, and engines.
    """
    words = (word_types(df, text_col)
             .withColumn("syms", _to_symbols(F.col("word")))
             .localCheckpoint())
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (_pair_counts(words)
               .orderBy(F.desc("pair_count"), "left", "right")
               .limit(1).collect())
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((left, right, int(cnt)))
        words = words.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right))
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges, words


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               output_col: str = "bpe_tokens",
               method: str = "auto") -> DataFrame:
    """Tokenize text with a learned merge list: split into words,
    char-split each word, apply the merges in priority order, concat
    the per-word token sequences.

    ``method='expr'`` chains one JVM fold per merge — zero Python, the
    right call for short merge lists. ``method='arrow'`` runs the whole
    merge loop in ONE Arrow-batched pandas UDF — the right call for
    production vocabularies (50k merges would otherwise chain 50k plan
    nodes). ``'auto'`` picks expr for <= 16 merges. Both are narrow
    maps: no shuffle at any scale, and both produce identical output
    (parity-tested).
    """
    if method == "auto":
        method = "expr" if len(merges) <= 16 else "arrow"
    # collision-safe staging name (double-underscore convention): a
    # user column literally named f"{text_col}_words" must not be
    # overwritten and then silently dropped
    words = F.expr(
        "transform(__bpe_words, w -> regexp_extract_all(w, '.', 0))")
    base = df.withColumn("__bpe_words", tokens_expr(F.col(text_col)))
    if method == "expr":
        def _merge_fn(left, right):
            # a real 1-arg closure: F.transform counts default args as
            # lambda parameters and would reject `lambda s, l=..., r=...`
            return lambda syms: _apply_merge(syms, left, right)

        col = base.withColumn("__wsyms", words)
        for left, right, _ in merges:
            col = col.withColumn(
                "__wsyms", F.transform(F.col("__wsyms"),
                                       _merge_fn(left, right)))
        return (col.withColumn(output_col, F.flatten(F.col("__wsyms")))
                .drop("__wsyms", "__bpe_words"))
    # arrow path: one Python pass applying all merges per word
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql.functions import pandas_udf

    merge_list = [(m[0], m[1]) for m in merges]

    def _encode(series):
        def enc(ws):
            if ws is None:  # null text -> null tokens, like the expr path
                return None
            out = []
            for w in ws:
                syms = list(w)
                for left, right in merge_list:
                    acc = []
                    for s in syms:
                        if acc and acc[-1] == left and s == right:
                            acc[-1] = left + right
                        else:
                            acc.append(s)
                    syms = acc
                out.extend(syms)
            return out

        return series.map(enc)

    _encode.__annotations__ = {"series": pd.Series, "return": pd.Series}
    udf = pandas_udf(_encode, "array<string>")
    return (base.withColumn(output_col, udf(F.col("__bpe_words")))
            .drop("__bpe_words"))
