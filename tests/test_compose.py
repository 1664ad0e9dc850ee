"""Pipeline / ColumnTransformer / PolynomialFeatures / pairwise /
spectral / streaming — the composition + remaining operator surface."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.cluster import SpectralClustering
from dask_ml_spark.operators.compose import (
    ColumnTransformer,
    FeatureUnion,
    Pipeline,
    make_pipeline,
)
from dask_ml_spark.operators.linear_model import LinearRegression
from dask_ml_spark.operators.pairwise import (
    euclidean_distances_matrix,
    pairwise_distances,
    pairwise_distances_argmin_min,
    pairwise_kernels,
    rbf_kernel_matrix,
)
from dask_ml_spark.operators.preprocessing import (
    MinMaxScaler,
    PolynomialFeatures,
    StandardScaler,
)

FEATS = [f"f{j}" for j in range(5)]


def test_pipeline_fit_predict(xy_regression):
    pipe = Pipeline([
        ("scale", StandardScaler()),
        ("reg", LinearRegression(penalty="none")),
    ])
    pipe.fit(xy_regression, FEATS)
    r2 = pipe.score(xy_regression)
    assert r2 > 0.99
    pred = pipe.predict(xy_regression)
    assert "prediction" in pred.columns


def test_make_pipeline(xy_regression):
    pipe = make_pipeline(MinMaxScaler(), LinearRegression(penalty="none"))
    assert list(pipe.named_steps) == ["minmaxscaler", "linearregression"]
    pipe.fit(xy_regression, FEATS)
    assert pipe.score(xy_regression) > 0.99


def test_column_transformer(xy_regression):
    ct = ColumnTransformer([
        ("a", StandardScaler(), ["f0", "f1"]),
        ("b", MinMaxScaler(), ["f2"]),
    ])
    out = ct.fit_transform(xy_regression).toPandas()
    np.testing.assert_allclose(out["f0"].mean(), 0, atol=1e-12)
    assert out["f2"].min() >= -1e-12 and out["f2"].max() <= 1 + 1e-12
    # untouched column passes through
    orig = xy_regression.toPandas()
    np.testing.assert_allclose(sorted(out["f4"]), sorted(orig["f4"]))


def test_feature_union(xy_regression):
    from dask_ml_spark.operators.decomposition import PCA, TruncatedSVD

    fu = FeatureUnion([
        ("pca", PCA(n_components=2)),
        ("svd", TruncatedSVD(n_components=2)),
    ])
    out = fu.fit(xy_regression, FEATS).transform(xy_regression)
    for c in ["pc0", "pc1", "sv0", "sv1"]:
        assert c in out.columns


def test_required_input_columns_declarations():
    """The CV planners prune the fold cache to what the estimator
    declares it reads: column-scoped stages union their needs, any
    whole-frame stage (BlockTransformer, passthrough remainder)
    disables pruning by returning None."""
    from dask_ml_spark.operators.wrappers import BlockTransformer

    pipe = Pipeline([("scale", StandardScaler()),
                     ("reg", LinearRegression(penalty="none"))])
    assert pipe.required_input_columns(["f0", "f1"]) == ["f0", "f1"]

    # a whole-frame stage poisons the pipeline's declaration
    blocked = Pipeline([("block", BlockTransformer(lambda pdf: pdf)),
                        ("reg", LinearRegression(penalty="none"))])
    assert blocked.required_input_columns(["f0"]) is None

    # ColumnTransformer declares its OWN specs, not the caller's list
    ct = ColumnTransformer([("a", StandardScaler(), ["f0", "f1"]),
                            ("b", MinMaxScaler(), "f2")],
                           remainder="drop")
    assert ct.required_input_columns(["zzz"]) == ["f0", "f1", "f2"]
    # the repo default remainder='passthrough' flows the whole frame
    ct_pass = ColumnTransformer([("a", StandardScaler(), ["f0"])])
    assert ct_pass.required_input_columns(["f0"]) is None

    fu = FeatureUnion([("s1", StandardScaler()), ("s2", MinMaxScaler())])
    assert fu.required_input_columns(["f0", "f3"]) == ["f0", "f3"]
    fu_blocked = FeatureUnion([("s1", StandardScaler()),
                               ("b", BlockTransformer(lambda pdf: pdf))])
    assert fu_blocked.required_input_columns(["f0"]) is None

    # pipeline keeps the caller's columns even when a stage narrows
    ct_in_pipe = Pipeline([("ct", ct),
                           ("reg", LinearRegression(penalty="none"))])
    req = ct_in_pipe.required_input_columns(["f2", "f4"])
    assert set(req) >= {"f0", "f1", "f2", "f4"}


def test_polynomial_features(xy_regression):
    pf = PolynomialFeatures(degree=2).fit(xy_regression, ["f0", "f1"])
    assert pf.feature_names_out_ == ["1", "f0", "f1", "f0^2", "f0 f1", "f1^2"]
    out = pf.transform(xy_regression).toPandas()
    np.testing.assert_allclose(out["f0^2"], out["f0"] ** 2)
    np.testing.assert_allclose(out["f0 f1"], out["f0"] * out["f1"])
    assert (out["1"] == 1.0).all()


def test_polynomial_interaction_only(xy_regression):
    pf = PolynomialFeatures(degree=2, interaction_only=True, include_bias=False)
    pf.fit(xy_regression, ["f0", "f1", "f2"])
    assert pf.feature_names_out_ == ["f0", "f1", "f2", "f0 f1", "f0 f2", "f1 f2"]


def test_pairwise_distances(xy_regression):
    Y = np.array([[0.0] * 5, [1.0] * 5])
    out = pairwise_distances(xy_regression, FEATS, Y).select(*FEATS, "distances").toPandas()
    X = out[FEATS].to_numpy()
    D = np.stack(out["distances"].to_numpy())
    want = euclidean_distances_matrix(X, Y)
    np.testing.assert_allclose(D, want, rtol=1e-9)


def test_pairwise_argmin_min(blobs):
    centers = np.array([[-7.0, -7.0], [0.0, 0.0], [7.0, 7.0]])
    out = pairwise_distances_argmin_min(blobs, ["x0", "x1"], centers).toPandas()
    # argmin should recover the generating cluster
    assert (out["argmin"] == out["cluster"]).mean() > 0.99
    assert (out["min_dist"] < 2.0).all()


def test_pairwise_kernels(xy_regression):
    Y = np.array([[0.5] * 5])
    out = pairwise_kernels(xy_regression, FEATS, Y, metric="rbf", gamma=0.1)
    pdf = out.select(*FEATS, "kernel").toPandas()
    X = pdf[FEATS].to_numpy()
    K = np.stack(pdf["kernel"].to_numpy())
    np.testing.assert_allclose(K, rbf_kernel_matrix(X, Y, 0.1), rtol=1e-9)


def test_spectral_clustering(blobs):
    sc = SpectralClustering(n_clusters=3, n_components=60, gamma=0.5, random_state=0)
    out = sc.fit_predict(blobs, ["x0", "x1"]).toPandas()
    assert out["prediction"].nunique() == 3
    # clusters should align with ground truth up to permutation
    agreement = out.groupby("cluster")["prediction"].agg(lambda s: s.value_counts().iloc[0] / len(s))
    assert (agreement > 0.95).all()


def test_streaming_windowed_features_batch(spark):
    from dask_ml_spark.sources.io import load_table
    from dask_ml_spark.streaming.incremental import windowed_event_features

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = windowed_event_features(ev, window="1 hour").toPandas()
    assert {"window_start", "window_end", "user_id", "n_events", "avg_value"} <= set(out.columns)
    assert (out["n_events"] > 0).all()


def test_streaming_incremental_fit(spark, tmp_path):
    """foreachBatch partial_fit over a file stream (availableNow)."""
    from dask_ml_spark.datasets import make_classification
    from dask_ml_spark.operators.local_estimators import CentroidClassifier
    from dask_ml_spark.streaming.incremental import StreamingIncremental

    path = str(tmp_path / "stream_src")
    df = make_classification(200, 5, random_state=0, n_partitions=4, spark=spark)
    df.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    feats = [f"f{j}" for j in range(5)]
    si = StreamingIncremental(CentroidClassifier(), feats)
    si.fit_stream(stream, trigger_once=True)
    assert si.n_batches_ >= 1
    assert len(si.estimator.classes_) == 2
    assert si.n_capped_batches_ == 0


def test_streaming_incremental_batch_cap(spark, tmp_path):
    """An oversized micro-batch is capped to max_batch_rows with a
    ResourceWarning instead of pulling everything to the driver."""
    import warnings

    from dask_ml_spark.datasets import make_classification
    from dask_ml_spark.operators.local_estimators import CentroidClassifier
    from dask_ml_spark.streaming.incremental import StreamingIncremental

    path = str(tmp_path / "big_stream_src")
    df = make_classification(500, 4, random_state=0, n_partitions=2, spark=spark)
    df.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    feats = [f"f{j}" for j in range(4)]
    si = StreamingIncremental(CentroidClassifier(), feats, max_batch_rows=100)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        si.fit_stream(stream, trigger_once=True)
    assert si.n_capped_batches_ >= 1
    assert any(issubclass(w.category, ResourceWarning) for w in caught)
    # model trained on at most max_batch_rows per batch
    assert 0 < sum(si.estimator.counts_.values()) <= 100 * si.n_batches_


def test_streaming_windowed_features_matches_batch(spark, tmp_path):
    """readStream -> watermarked window agg -> memory sink produces the
    same aggregates as the batch rendering of the same operator."""
    import pandas as pd

    from dask_ml_spark.sources.io import load_table
    from dask_ml_spark.streaming.incremental import windowed_event_features

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "ev_src")
    ev.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    agg = windowed_event_features(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("wef_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT window_start, user_id, n_events, sum_value FROM wef_stream")
        .toPandas().sort_values(["window_start", "user_id"]).reset_index(drop=True)
    )
    want = (
        windowed_event_features(ev, window="1 hour")
        .select("window_start", "user_id", "n_events", "sum_value")
        .toPandas().sort_values(["window_start", "user_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_required_input_columns_self_scoped_vectorizers():
    """CountVectorizer/HashingVectorizer/FeatureHasher read their own
    input_col regardless of the caller's `columns` — the pruning
    declaration must surface it (review-caught: the planner would
    otherwise prune the text column out of the fold cache)."""
    from dask_ml_spark.operators.text import (CountVectorizer,
                                              FeatureHasher,
                                              HashingVectorizer,
                                              TfidfTransformer)

    assert CountVectorizer(input_col="text") \
        .required_input_columns(["features"]) == ["text"]
    assert HashingVectorizer(input_col="body") \
        .required_input_columns(None) == ["body"]
    assert FeatureHasher(input_col="raw") \
        .required_input_columns(["x"]) == ["raw"]
    # call-time column names -> cannot declare; pruning disabled
    assert TfidfTransformer().required_input_columns(["x"]) is None

    pipe = Pipeline([("vec", CountVectorizer(input_col="text")),
                     ("reg", LinearRegression(penalty="none"))])
    req = pipe.required_input_columns(["features"])
    assert "text" in req and "features" in req
