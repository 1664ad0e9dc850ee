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
