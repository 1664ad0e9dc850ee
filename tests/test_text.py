"""Text vectorizers (reference tests/feature_extraction/test_text.py,
F7 corpus)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.text import (
    CountVectorizer,
    HashingVectorizer,
    TfidfTransformer,
)

CORPUS = [
    (0, "This is the first document."),
    (1, "This document is the second document."),
    (2, "And this is the third one."),
    (3, "Is this the first document?"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"]).repartition(2).cache()


def test_count_vectorizer_vocab(corpus_df):
    cv = CountVectorizer().fit(corpus_df)
    # sklearn's vocabulary for the same corpus
    want = ["and", "document", "first", "is", "one", "second", "the", "third", "this"]
    assert cv.feature_names_out_.tolist() == want


def test_count_vectorizer_transform(corpus_df):
    cv = CountVectorizer().fit(corpus_df)
    out = cv.transform(corpus_df).select("doc_id", "features").toPandas().sort_values("doc_id")
    M = np.stack([v.toArray() for v in out["features"]])
    want = np.array([
        [0, 1, 1, 1, 0, 0, 1, 0, 1],
        [0, 2, 0, 1, 0, 1, 1, 0, 1],
        [1, 0, 0, 1, 1, 0, 1, 1, 1],
        [0, 1, 1, 1, 0, 0, 1, 0, 1],
    ], dtype=float)
    np.testing.assert_allclose(M, want)


def test_count_vectorizer_min_df(corpus_df):
    cv = CountVectorizer(min_df=2).fit(corpus_df)
    assert "and" not in cv.vocabulary_
    assert "document" in cv.vocabulary_


def test_count_vectorizer_long_form(corpus_df):
    cv = CountVectorizer().fit(corpus_df)
    long = cv.transform_long(corpus_df, "doc_id").toPandas()
    doc1 = long[long.doc_id == 1]
    tid = cv.vocabulary_["document"]
    assert doc1[doc1.token_id == tid]["count"].iloc[0] == 2


def test_hashing_vectorizer(corpus_df):
    hv = HashingVectorizer(n_features=64, alternate_sign=False)
    out = hv.transform(corpus_df).select("doc_id", "features").toPandas().sort_values("doc_id")
    M = np.stack([v.toArray() for v in out["features"]])
    # row 0 has 5 tokens, all weight 1 → sum 5
    assert M[0].sum() == 5
    # deterministic
    out2 = hv.transform(corpus_df).select("doc_id", "features").toPandas().sort_values("doc_id")
    M2 = np.stack([v.toArray() for v in out2["features"]])
    np.testing.assert_allclose(M, M2)


def test_hashing_vectorizer_long(corpus_df):
    hv = HashingVectorizer(n_features=64, alternate_sign=False)
    long = hv.transform_long(corpus_df, "doc_id").toPandas()
    assert (long.groupby("doc_id")["value"].sum() == [5, 6, 6, 5]).all()


def test_tfidf(corpus_df):
    cv = CountVectorizer().fit(corpus_df)
    long = cv.transform_long(corpus_df, "doc_id")
    tf = TfidfTransformer().fit(long, n_docs=4)
    out = tf.transform(long).toPandas()
    # l2 norm per doc == 1
    norms = out.groupby("doc_id")["tfidf"].apply(lambda s: np.sqrt((s**2).sum()))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-9)
    # idf of 'this'/'is'/'the' (df=4) is ln(5/5)+1 = 1 (smooth)
    idf = tf.idf_.toPandas().set_index("token_id")["idf"]
    assert abs(idf[cv.vocabulary_["this"]] - 1.0) < 1e-9


def test_feature_hasher_dict(spark):
    from dask_ml_spark.operators.text import FeatureHasher

    rows = [(0, {"cat=a": 1.0, "qty": 3.0}), (1, {"cat=b": 1.0, "qty": 5.0})]
    df = spark.createDataFrame(rows, "row_id long, features_raw map<string,double>").repartition(2)
    fh = FeatureHasher(n_features=64)
    long = fh.transform_long(df, "row_id").toPandas()
    vecs = {r["row_id"]: r["features"] for r in fh.transform(df).select("row_id", "features").collect()}
    # long and vector forms agree bucket-for-bucket
    for _, r in long.iterrows():
        assert vecs[r["row_id"]][int(r["bucket"])] == pytest.approx(r["value"])
    # deterministic across runs
    again = fh.transform_long(df, "row_id").toPandas()
    a = long.sort_values(["row_id", "bucket"]).reset_index(drop=True)
    b = again.sort_values(["row_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_feature_hasher_string_input(spark):
    from dask_ml_spark.operators.text import FeatureHasher

    df = spark.createDataFrame([(0, ["a", "b", "a"])], "row_id long, features_raw array<string>")
    fh = FeatureHasher(n_features=64, input_type="string", alternate_sign=False)
    out = fh.transform_long(df, "row_id").toPandas()
    # 'a' occurs twice -> one bucket with value 2, 'b' once
    assert sorted(out["value"].tolist()) == [1.0, 2.0]


def test_zip_with_index_dense_and_ordered(spark):
    from dask_ml_spark.utils import zip_with_index

    df = spark.range(1000).selectExpr("cast(id * 7919 % 1000 as string) AS tok").distinct()
    indexed, pinned = zip_with_index(df, "tok", id_col="idx")
    pdf = indexed.toPandas().sort_values("tok").reset_index(drop=True)
    pinned.unpersist()
    assert sorted(pdf["idx"]) == list(range(len(pdf)))  # dense 0..n-1
    assert (pdf["idx"].to_numpy() == pdf["idx"].sort_values().to_numpy()).all()  # sorted order


def test_count_vectorizer_fit_distributed_matches_fit(documents):
    cv1 = CountVectorizer(min_df=2, max_df=0.8).fit(documents)
    cv2 = CountVectorizer(min_df=2, max_df=0.8).fit_distributed(documents)
    vocab_pdf = cv2.vocabulary_frame_.toPandas().sort_values("token_id")
    # identical dictionary, identical dense sorted-token ids
    assert list(vocab_pdf["token"]) == list(cv1.feature_names_out_)
    assert list(vocab_pdf["token_id"]) == list(range(len(vocab_pdf)))
    assert cv2.n_features_ == len(cv1.vocabulary_)
    # identical triplet output through either vocabulary representation
    t1 = cv1.transform_long(documents, "doc_id").toPandas()
    t2 = cv2.transform_long(documents, "doc_id").toPandas()
    key = ["doc_id", "token_id"]
    t1 = t1.sort_values(key).reset_index(drop=True)
    t2 = t2.sort_values(key).reset_index(drop=True)
    assert t1.equals(t2)
    cv2.vocabulary_frame_.unpersist()


def test_count_vectorizer_auto_distributed_above_budget(corpus_df):
    """fit keeps the vocabulary distributed when it exceeds
    max_vocab_collect: no driver dictionary, transform_long still
    works, transform points the user at the triplet path."""
    cv = CountVectorizer(max_vocab_collect=3).fit(corpus_df)
    assert cv.vocabulary_ is None
    assert cv.n_features_ == 9  # same 9-token vocabulary as the driver path
    vocab_pdf = cv.vocabulary_frame_.toPandas().sort_values("token_id")
    want = ["and", "document", "first", "is", "one", "second", "the", "third", "this"]
    assert list(vocab_pdf["token"]) == want
    long = cv.transform_long(corpus_df, "doc_id").toPandas()
    tid = int(vocab_pdf[vocab_pdf.token == "document"]["token_id"].iloc[0])
    assert long[(long.doc_id == 1) & (long.token_id == tid)]["count"].iloc[0] == 2
    with pytest.raises(ValueError, match="transform_long"):
        cv.transform(corpus_df)
    cv.vocabulary_frame_.unpersist()


def test_count_vectorizer_small_vocab_stays_on_driver(corpus_df):
    cv = CountVectorizer().fit(corpus_df)  # default budget: 1M tokens
    assert cv.vocabulary_ is not None and len(cv.vocabulary_) == 9
    assert getattr(cv, "vocabulary_frame_", None) is None


def test_readability_scores_hand_example(spark):
    """Hand-counted example: 'The cat sat. It ran away!' — words 6,
    sentences 2, syllables (the=1, cat=1, sat=1, it=1, ran=1,
    away=2 [a, ay]) = 7; plus the zero-word NULL guard and the
    sentence floor."""
    from dask_ml_spark.datapipe.text_stats import readability_scores

    df = spark.createDataFrame(
        [("d1", "The cat sat. It ran away!"),
         ("d2", "?!?"),          # no words: NULL scores
         ("d3", "unpunctuated stream of words")],  # sentences floors to 1
        "doc_id string, text string")
    rows = {r["doc_id"]: r
            for r in readability_scores(df).collect()}
    r = rows["d1"]
    assert (r["words"], r["sentences"], r["syllables"]) == (6, 2, 7)
    w_s, y_w = 6 / 2.0, 7 / 6.0
    assert abs(r["flesch"] - (206.835 - 1.015 * w_s - 84.6 * y_w)) \
        < 1e-9
    assert abs(r["fk_grade"] - (0.39 * w_s + 11.8 * y_w - 15.59)) \
        < 1e-9
    assert rows["d2"]["words"] == 0 and rows["d2"]["flesch"] is None
    assert rows["d3"]["sentences"] == 1
    # 4 words, syllables: un-pun-ctu... vowel groups: u,u,ua,e = 4? use engine consistency instead
    assert rows["d3"]["words"] == 4 and rows["d3"]["syllables"] >= 4
