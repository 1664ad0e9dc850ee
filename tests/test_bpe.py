"""Distributed BPE training/encoding vs a pure-Python reference."""

import re

import pytest


def _ref_word_counts(texts):
    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9_]{2,}", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_bpe(word_counts, n_merges):
    """Independent reference: greedy left-to-right merge application,
    ties broken (count desc, pair asc)."""
    words = {}
    for w, c in word_counts.items():
        k = tuple(w)
        words[k] = words.get(k, 0) + c
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new = {}
        for syms, c in words.items():
            acc = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            k = tuple(acc)
            new[k] = new.get(k, 0) + c
        words = new
    return merges, words


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the lowlands are low and wide and the newness is new",
]


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"])


def test_bpe_train_matches_reference(spark, toy_docs):
    from dask_ml_spark.datapipe.bpe import bpe_train

    merges, words = bpe_train(toy_docs, n_merges=8)
    ref_merges, ref_words = _ref_bpe(_ref_word_counts(TEXTS), 8)
    assert merges == ref_merges
    # the final symbolized word-type table agrees too
    got = {tuple(r["syms"]): r["n"] for r in words.collect()}
    assert got == ref_words


def test_bpe_train_partitioning_invariant(spark, toy_docs):
    from dask_ml_spark.datapipe.bpe import bpe_train

    m1, _ = bpe_train(toy_docs, n_merges=5)
    m2, _ = bpe_train(toy_docs.repartition(7), n_merges=5)
    assert m1 == m2


def test_bpe_encode_expr_arrow_parity_and_roundtrip(spark, toy_docs):
    from dask_ml_spark.datapipe.bpe import bpe_encode, bpe_train

    merges, _ = bpe_train(toy_docs, n_merges=6)
    a = {r["doc_id"]: r["bpe_tokens"] for r in
         bpe_encode(toy_docs, merges, method="expr").collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in
         bpe_encode(toy_docs, merges, method="arrow").collect()}
    assert a == b
    # lossless segmentation: concatenating tokens re-yields the words
    for i, t in enumerate(TEXTS):
        assert "".join(a[i]) == "".join(re.findall(r"[a-z0-9_]{2,}", t.lower()))
    # merges actually compressed something
    n_chars = sum(len(w) for w in re.findall(r"[a-z0-9_]{2,}", TEXTS[0].lower()))
    assert len(a[0]) < n_chars


def test_bpe_encode_no_shuffle(spark, toy_docs):
    from dask_ml_spark.datapipe.bpe import bpe_encode, bpe_train

    merges, _ = bpe_train(toy_docs, n_merges=4)
    plan = bpe_encode(toy_docs, merges, method="expr")._jdf.queryExecution(
        ).executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_bpe_encode_null_text_parity(spark):
    from dask_ml_spark.datapipe.bpe import bpe_encode

    df = spark.createDataFrame([(1, "low lower"), (2, None)],
                               "doc_id int, text string")
    merges = [("l", "o", 3)]
    a = {r["doc_id"]: r["bpe_tokens"] for r in
         bpe_encode(df, merges, method="expr").collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in
         bpe_encode(df, merges, method="arrow").collect()}
    assert a == b
    assert a[2] is None and a[1][0] == "lo"


def test_bpe_encode_quote_symbols_safe(spark):
    # merge symbols are arbitrary strings on the public API — a quote
    # must not break the expr path (built from expressions, not SQL text)
    from dask_ml_spark.datapipe.bpe import _apply_merge
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "'", "b"],)], "syms array<string>")
    out = df.select(_apply_merge(F.col("syms"), "a", "'").alias("m")).collect()
    assert out[0]["m"] == ["a'", "b"]


def test_bpe_encode_preserves_user_words_column(spark):
    """A user column literally named f'{text_col}_words' must survive:
    the staging column is __bpe_words, not text_words (ADVICE r5)."""
    from dask_ml_spark.datapipe.bpe import bpe_encode

    df = spark.createDataFrame(
        [("ab ab", "KEEP"), ("ba", "ME")], ["text", "text_words"])
    for method in ("expr", "arrow"):
        out = bpe_encode(df, [("a", "b", 2)], method=method)
        assert "text_words" in out.columns
        rows = {r["text"]: (r["text_words"], r["bpe_tokens"])
                for r in out.collect()}
        assert rows["ab ab"] == ("KEEP", ["ab", "ab"])
        assert rows["ba"] == ("ME", ["b", "a"])
