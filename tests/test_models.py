"""Estimator tests vs numpy oracles (reference pattern: parity vs
sklearn on collected data, SURVEY §5.1)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.cluster import KMeans
from dask_ml_spark.operators.decomposition import PCA, IncrementalPCA, TruncatedSVD
from dask_ml_spark.operators.linear_model import (
    LinearRegression,
    LogisticRegression,
    PoissonRegression,
)
from dask_ml_spark.operators.naive_bayes import GaussianNB

FEATS = [f"f{j}" for j in range(5)]


def test_linear_regression_ols(xy_regression):
    m = LinearRegression(penalty="none").fit(xy_regression, FEATS)
    pdf = xy_regression.toPandas()
    X = np.column_stack([pdf[c] for c in FEATS])
    y = pdf["label"].to_numpy()
    Xi = np.column_stack([X, np.ones(len(X))])
    beta, *_ = np.linalg.lstsq(Xi, y, rcond=None)
    np.testing.assert_allclose(m.coef_, beta[:-1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(m.intercept_, beta[-1], rtol=1e-3, atol=1e-3)
    r2 = m.score(xy_regression)
    assert r2 > 0.99


def test_logistic_regression(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    m = LogisticRegression(C=float("inf")).fit(xy_classification, feats)
    acc = m.score(xy_classification)
    assert acc > 0.5
    probs = m.predict_proba(xy_classification).select("probability").toPandas()
    assert probs["probability"].between(0, 1).all()


def test_poisson_regression(spark):
    from dask_ml_spark.datasets import make_counts

    df = make_counts(500, 5, random_state=0, spark=spark).cache()
    m = PoissonRegression().fit(df, FEATS)
    pred = m.predict(df).select("prediction").toPandas()
    assert (pred["prediction"] > 0).all()  # log link ⇒ positive rates


def test_gaussian_nb(xy_classification):
    feats = [f"f{j}" for j in range(20)]
    nb = GaussianNB().fit(xy_classification, feats)
    pdf = xy_classification.toPandas()
    for ci, cls in enumerate(nb.classes_):
        sub = pdf[pdf.label == cls]
        np.testing.assert_allclose(nb.theta_[ci], sub[feats].mean().to_numpy(), rtol=1e-8)
        np.testing.assert_allclose(
            nb.var_[ci], sub[feats].var(ddof=0).to_numpy() + nb.epsilon_, rtol=1e-6
        )
    acc = nb.score(xy_classification)
    assert acc > 0.5
    probs = nb.predict_proba(xy_classification).select("probability").toPandas()
    sums = probs["probability"].apply(sum)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-9)


def test_kmeans_mllib(blobs):
    km = KMeans(n_clusters=3, random_state=0).fit(blobs, ["x0", "x1"])
    assert km.cluster_centers_.shape == (3, 2)
    want = np.array([[-7.0, -7.0], [0.0, 0.0], [7.0, 7.0]])
    got = np.array(sorted(km.cluster_centers_.tolist()))
    np.testing.assert_allclose(got, want, atol=0.2)
    pred = km.predict(blobs).select("x0", "prediction").toPandas()
    assert pred["prediction"].nunique() == 3
    # transform: distance array of length k
    d = km.transform(blobs).select("distances").first()[0]
    assert len(d) == 3


def test_kmeans_dataframe_lloyd(blobs):
    km = KMeans(n_clusters=3, random_state=0, algorithm="lloyd_dataframe").fit(blobs, ["x0", "x1"])
    want = np.array([[-7.0, -7.0], [0.0, 0.0], [7.0, 7.0]])
    got = np.array(sorted(km.cluster_centers_.tolist()))
    np.testing.assert_allclose(got, want, atol=0.3)


def test_pca(xy_regression):
    pca = PCA(n_components=3).fit(xy_regression, FEATS)
    pdf = xy_regression.toPandas()
    X = pdf[FEATS].to_numpy()
    Xc = X - X.mean(axis=0)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    np.testing.assert_allclose(
        np.abs(pca.components_), np.abs(Vt[:3]), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        pca.explained_variance_, (S**2 / (len(X) - 1))[:3], rtol=1e-8
    )
    # transform parity (up to sign)
    t = pca.transform(xy_regression).select("pc0", "pc1", "pc2").toPandas().to_numpy()
    want = Xc @ Vt[:3].T
    for j in range(3):
        sj = np.sign(pca.components_[j] @ Vt[j])
        np.testing.assert_allclose(np.sort(t[:, j]), np.sort(sj * want[:, j]), rtol=1e-5, atol=1e-8)


def test_pca_inverse(xy_regression):
    pca = PCA().fit(xy_regression, FEATS)  # full rank
    rt = pca.inverse_transform(pca.transform(xy_regression)).select(*FEATS).toPandas()
    orig = xy_regression.select(*FEATS).toPandas()
    np.testing.assert_allclose(
        np.sort(rt.to_numpy(), axis=0), np.sort(orig.to_numpy(), axis=0), atol=1e-8
    )


def test_truncated_svd(xy_regression):
    svd = TruncatedSVD(n_components=2).fit(xy_regression, FEATS)
    pdf = xy_regression.toPandas()
    X = pdf[FEATS].to_numpy()
    _, S, Vt = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(svd.singular_values_, S[:2], rtol=1e-8)
    np.testing.assert_allclose(np.abs(svd.components_), np.abs(Vt[:2]), rtol=1e-6, atol=1e-8)


def test_incremental_pca(xy_regression):
    ipca = IncrementalPCA(n_components=2)
    half1 = xy_regression.where(F.col("f0") > 0)
    half2 = xy_regression.where(F.col("f0") <= 0)
    ipca.partial_fit(half1, FEATS)
    ipca.partial_fit(half2, FEATS)
    full = PCA(n_components=2).fit(xy_regression, FEATS)
    # covariance accumulation is exact ⇒ same result as batch PCA
    np.testing.assert_allclose(ipca.components_, full.components_, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(ipca.explained_variance_, full.explained_variance_, rtol=1e-8)


def test_randomized_svd_matches_exact(spark):
    """Halko sketch + distributed TSQR vs numpy on a wide-ish frame
    with fast spectral decay (the regime the sketch targets)."""
    import pandas as pd

    from dask_ml_spark.operators.decomposition import randomized_svd

    rng = np.random.RandomState(0)
    d, n, true_rank = 20, 2000, 5
    X = (rng.standard_normal((n, true_rank)) * (10.0 ** -np.arange(true_rank))
         ) @ rng.standard_normal((true_rank, d))
    cols = [f"c{j}" for j in range(d)]
    df = spark.createDataFrame(pd.DataFrame(X, columns=cols)).repartition(8)
    S, Vt = randomized_svd(df, cols, n_components=3, n_iter=3, random_state=0)
    _, S_np, Vt_np = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(S, S_np[:3], rtol=1e-6)
    for j in range(3):
        assert abs(float(Vt[j] @ Vt_np[j])) > 1 - 1e-8  # same direction ± sign


def test_truncated_svd_randomized_algorithm(xy_regression):
    exact = TruncatedSVD(n_components=2).fit(xy_regression, FEATS)
    rand = TruncatedSVD(n_components=2, algorithm="randomized", n_iter=4,
                        random_state=0).fit(xy_regression, FEATS)
    np.testing.assert_allclose(rand.singular_values_, exact.singular_values_, rtol=1e-5)
    np.testing.assert_allclose(np.abs(rand.components_), np.abs(exact.components_),
                               rtol=1e-4, atol=1e-6)


def test_pca_randomized_solver(xy_regression):
    exact = PCA(n_components=2).fit(xy_regression, FEATS)
    rand = PCA(n_components=2, svd_solver="randomized", random_state=0).fit(
        xy_regression, FEATS)
    np.testing.assert_allclose(rand.singular_values_, exact.singular_values_, rtol=1e-5)
    np.testing.assert_allclose(np.abs(rand.components_), np.abs(exact.components_),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rand.explained_variance_, exact.explained_variance_, rtol=1e-5)
    np.testing.assert_allclose(rand.noise_variance_, exact.noise_variance_, rtol=1e-3, atol=1e-8)
