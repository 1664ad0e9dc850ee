"""ParallelPostFit / Incremental / BlockTransformer / ensembles with a
numpy stand-in estimator (no sklearn in the image — the protocol is
what matters, reference wrappers.py:23)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.ensemble import (
    BlockwiseVotingClassifier,
    BlockwiseVotingRegressor,
)
from dask_ml_spark.operators.local_estimators import CentroidClassifier as NumpyMeanClassifier, MeanRegressor as NumpyMeanRegressor
from dask_ml_spark.operators.wrappers import (
    BlockTransformer,
    Incremental,
    ParallelPostFit,
)

FEATS = [f"f{j}" for j in range(5)]


def test_parallel_post_fit_predict(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    ppf = ParallelPostFit(NumpyMeanClassifier())
    ppf.fit(xy_classification, feats)
    pred = ppf.predict(xy_classification)
    assert pred.select("prediction").distinct().count() <= 2
    acc = ppf.score(xy_classification)
    assert 0 <= acc <= 1
    proba = ppf.predict_proba(xy_classification).select("probability").first()[0]
    assert len(proba) == 2 and abs(sum(proba) - 1) < 1e-9


def test_parallel_post_fit_matches_local(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    pdf = xy_classification.toPandas()
    X = pdf[feats].to_numpy()
    y = pdf["label"].to_numpy()
    local = NumpyMeanClassifier().fit(X, y)
    ppf = ParallelPostFit(NumpyMeanClassifier()).fit(xy_classification, feats)
    got = (
        ppf.predict(xy_classification.orderBy("f0"))
        .select("f0", "prediction").toPandas().sort_values("f0")
    )
    order = pdf.sort_values("f0").index
    want = local.predict(X[order])
    np.testing.assert_allclose(got["prediction"].to_numpy(), want)


def test_incremental_partial_fit(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    inc = Incremental(NumpyMeanClassifier(), shuffle_blocks=False, random_state=0)
    inc.fit(xy_classification, feats, classes=[0, 1])
    # partial_fit of centroids over all data == full fit (order-free here)
    pdf = xy_classification.toPandas()
    local = NumpyMeanClassifier().fit(pdf[feats].to_numpy(), pdf["label"].to_numpy())
    np.testing.assert_allclose(
        inc.estimator.centroids_, local.centroids_, rtol=1e-9
    )
    # each block trained as its own executor-side job (reference chains
    # worker futures); the driver never collected partition data
    assert inc.executor_partition_fits_ >= 2


def test_incremental_deterministic_blocks(spark):
    """deterministic_by must make the block chain a pure function of
    the data: (a) refits and arbitrary input repartitionings give
    IDENTICAL coefficients, and (b) the result equals a driver-side
    replay that groups rows by the same Knuth fold and chains
    partial_fit in fold order (the semantics the SQL oracle replays)."""
    from pyspark.sql import functions as F

    from dask_ml_spark.operators.local_estimators import SGDClassifier
    from dask_ml_spark.operators.wrappers import Incremental

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("f0"),
        ((F.col("id") % 13) / 13.0).alias("f1"),
        ((F.col("id") % 3) == 0).cast("double").alias("label"))

    def run(frame):
        inc = Incremental(SGDClassifier(lr=0.1), deterministic_by=["k"],
                          n_blocks=4)
        inc.fit(frame, ["f0", "f1"], label_col="label", classes=[0.0, 1.0])
        return inc

    a, b = run(df), run(df.repartition(13))
    # block MULTISETS and block order are exactly reproducible; row
    # order WITHIN a block follows shuffle fetch order, so the
    # batch-mean float sums agree only to association slack (~1e-16) —
    # which is the documented contract (and why the oracle scores the
    # thresholded accuracy, not raw coefficients)
    np.testing.assert_allclose(a.estimator.coef_, b.estimator.coef_,
                               rtol=1e-12)
    np.testing.assert_allclose(a.estimator.intercept_,
                               b.estimator.intercept_, rtol=1e-12)
    assert a.executor_partition_fits_ == 4

    # independent fold computation (the hash_split Knuth chain) +
    # driver-side sequential chain over fold groups in fold order
    pdf = df.toPandas()
    M, P = 2654435761, 1 << 31
    folds = ((pdf["k"].astype("int64") % P) * M % P) % 4
    model = SGDClassifier(lr=0.1)
    for fold in range(4):
        part = pdf[folds == fold]
        if len(part):
            model.partial_fit(part[["f0", "f1"]].to_numpy(dtype="float64"),
                              part["label"].to_numpy(dtype="float64"),
                              classes=np.array([0.0, 1.0]))
    # same multisets, same order; only within-block ROW order differs
    # (shuffle fetch vs pandas order), so the batch-mean steps agree to
    # float-association slack
    np.testing.assert_allclose(a.estimator.coef_, model.coef_, rtol=1e-9)
    np.testing.assert_allclose(a.estimator.intercept_, model.intercept_,
                               rtol=1e-9)


def test_block_transformer(xy_regression):
    bt = BlockTransformer(lambda pdf: pdf.assign(f0=pdf.f0 * 2))
    out = bt.transform(xy_regression).select("f0").toPandas()
    orig = xy_regression.select("f0").toPandas()
    np.testing.assert_allclose(sorted(out["f0"]), sorted(orig["f0"] * 2))


def test_blockwise_voting_classifier(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    bv = BlockwiseVotingClassifier(NumpyMeanClassifier())
    bv.fit(xy_classification, feats)
    assert len(bv.estimators_) >= 2  # one model per partition
    pred = bv.predict(xy_classification).select("prediction").toPandas()
    assert set(pred["prediction"].unique()) <= {0.0, 1.0}


def test_blockwise_voting_regressor(xy_regression):
    bv = BlockwiseVotingRegressor(NumpyMeanRegressor())
    bv.fit(xy_regression, FEATS)
    pred = bv.predict(xy_regression).select("prediction").first()[0]
    pdf_mean = xy_regression.toPandas()["label"].mean()
    # mean of per-partition means ≈ global mean (equal-ish partitions)
    assert abs(pred - pdf_mean) < 10


def test_fitted_models_pickle_roundtrip(spark):
    """Fitted estimators are plain-Python state (numpy on the driver) —
    picklable for model persistence, exactly like the reference's
    sklearn-style estimators. Unpickled models must still produce
    plans (their state folds into column-expression literals)."""
    import pickle

    from pyspark.sql import functions as F

    from dask_ml_spark.operators.cluster import KMeans
    from dask_ml_spark.operators.decomposition import PCA
    from dask_ml_spark.operators.linear_model import LogisticRegression
    from dask_ml_spark.operators.preprocessing import StandardScaler
    from dask_ml_spark.sources.io import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    lab = li.withColumn("label", (F.col("l_returnflag") == "R").cast("double"))

    sc = pickle.loads(pickle.dumps(StandardScaler().fit(li, cols)))
    assert sc.transform(li).columns == li.columns

    km = pickle.loads(pickle.dumps(
        KMeans(n_clusters=3, max_iter=3, random_state=0).fit(li, cols)))
    assert km.predict(li).select("prediction").distinct().count() <= 3

    pca = pickle.loads(pickle.dumps(PCA(n_components=2).fit(li, cols)))
    assert {"pc0", "pc1"} <= set(pca.transform(li).columns)

    lr = pickle.loads(pickle.dumps(LogisticRegression(max_iter=5).fit(lab, cols)))
    assert "prediction" in lr.predict(lab).columns
