"""Metrics vs numpy oracle (the reference tests vs sklearn.metrics,
tests/metrics/test_metrics.py — numpy computes the same formulas)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.functions import metrics as M


@pytest.fixture(scope="module")
def preds(spark):
    rng = np.random.RandomState(0)
    n = 500
    y = rng.randint(0, 2, n).astype(float)
    p = rng.rand(n)
    pred = (p > 0.5).astype(float)
    yreg = rng.randn(n) * 3 + 1
    preg = yreg + rng.randn(n)
    w = rng.rand(n) + 0.1
    import pandas as pd

    pdf = pd.DataFrame({
        "label": y, "prediction": pred, "probability": p,
        "ylabel": yreg, "ypred": preg, "w": w,
    })
    return spark.createDataFrame(pdf).repartition(4).cache(), pdf


def test_accuracy(preds):
    df, pdf = preds
    got = M.accuracy_score(df)
    np.testing.assert_allclose(got, (pdf.label == pdf.prediction).mean())


def test_accuracy_weighted(preds):
    df, pdf = preds
    got = M.accuracy_score(df, weight_col="w")
    want = (pdf.w * (pdf.label == pdf.prediction)).sum() / pdf.w.sum()
    np.testing.assert_allclose(got, want)


def test_mse_rmse(preds):
    df, pdf = preds
    err = (pdf.ypred - pdf.ylabel) ** 2
    np.testing.assert_allclose(
        M.mean_squared_error(df, "ylabel", "ypred"), err.mean())
    np.testing.assert_allclose(
        M.mean_squared_error(df, "ylabel", "ypred", squared=False), np.sqrt(err.mean()))


def test_mae_mape_msle(preds):
    df, pdf = preds
    np.testing.assert_allclose(
        M.mean_absolute_error(df, "ylabel", "ypred"),
        np.abs(pdf.ypred - pdf.ylabel).mean())
    np.testing.assert_allclose(
        M.mean_absolute_percentage_error(df, "ylabel", "ypred"),
        (np.abs(pdf.ypred - pdf.ylabel) / np.maximum(np.abs(pdf.ylabel), 1e-15)).mean())


def test_r2(preds):
    df, pdf = preds
    ss_res = ((pdf.ylabel - pdf.ypred) ** 2).sum()
    ss_tot = ((pdf.ylabel - pdf.ylabel.mean()) ** 2).sum()
    np.testing.assert_allclose(M.r2_score(df, "ylabel", "ypred"), 1 - ss_res / ss_tot)


def test_log_loss(preds):
    df, pdf = preds
    p = np.clip(pdf.probability, 1e-15, 1 - 1e-15)
    want = -(pdf.label * np.log(p) + (1 - pdf.label) * np.log(1 - p)).mean()
    np.testing.assert_allclose(M.log_loss(df), want)


def test_scorer_registry(preds):
    df, _ = preds
    assert M.get_scorer("accuracy") is M.accuracy_score
    with pytest.raises(ValueError):
        M.get_scorer("nope")
    neg = M.get_scorer("neg_mean_squared_error")(df, "ylabel", "ypred")
    assert neg < 0
