"""Distributed GLM solver parity (reference glm.py:61-64,139-171).

Every solver optimizes the same objective as the MLlib lbfgs path
(mean loss + (1/C)*R(w), intercept unpenalized), so the fitted
coefficients must agree across solvers up to optimization tolerance.
"""

import numpy as np
import pytest

from dask_ml_spark.linear_model import (
    LinearRegression,
    LogisticRegression,
    PoissonRegression,
)


def _collected(df, cols, label="label"):
    pdf = df.toPandas()
    return pdf[list(cols)].to_numpy(float), pdf[label].to_numpy(float)


def test_newton_ols_matches_normal_equations(xy_regression):
    cols = [c for c in xy_regression.columns if c.startswith("f")]
    m = LinearRegression(penalty="none", solver="newton").fit(xy_regression, cols)
    X, y = _collected(xy_regression, cols)
    Xi = np.concatenate([X, np.ones((len(y), 1))], axis=1)
    beta = np.linalg.lstsq(Xi, y, rcond=None)[0]
    np.testing.assert_allclose(m.coef_, beta[:-1], rtol=1e-5, atol=1e-5)
    assert abs(m.intercept_ - beta[-1]) < 1e-4


def test_gradient_descent_ols(xy_regression):
    cols = [c for c in xy_regression.columns if c.startswith("f")]
    gd = LinearRegression(penalty="none", solver="gradient_descent",
                          max_iter=200).fit(xy_regression, cols)
    exact = LinearRegression(penalty="none", solver="newton").fit(xy_regression, cols)
    np.testing.assert_allclose(gd.coef_, exact.coef_, rtol=1e-2, atol=1e-2)


def test_newton_logistic_matches_lbfgs(xy_classification):
    cols = [c for c in xy_classification.columns if c.startswith("f")]
    nt = LogisticRegression(penalty="none", solver="newton").fit(xy_classification, cols)
    lb = LogisticRegression(penalty="none", solver="lbfgs",
                            max_iter=200, tol=1e-10).fit(xy_classification, cols)
    np.testing.assert_allclose(nt.coef_, lb.coef_, rtol=1e-3, atol=1e-3)
    assert abs(nt.intercept_ - lb.intercept_) < 1e-2


def test_proximal_grad_l2_matches_lbfgs(xy_classification):
    cols = [c for c in xy_classification.columns if c.startswith("f")]
    pg = LogisticRegression(penalty="l2", C=1.0, solver="proximal_grad",
                            max_iter=300, tol=1e-12).fit(xy_classification, cols)
    lb = LogisticRegression(penalty="l2", C=1.0, solver="lbfgs",
                            max_iter=200, tol=1e-10).fit(xy_classification, cols)
    np.testing.assert_allclose(pg.coef_, lb.coef_, rtol=5e-2, atol=5e-3)


def test_proximal_grad_l1_sparsity(xy_classification):
    cols = [c for c in xy_classification.columns if c.startswith("f")]
    pg = LogisticRegression(penalty="l1", C=0.05, solver="proximal_grad",
                            max_iter=200).fit(xy_classification, cols)
    # strong L1 at C=0.05 must zero out the uninformative features exactly
    assert (pg.coef_ == 0.0).sum() >= len(cols) // 2
    lb = LogisticRegression(penalty="l1", C=0.05, solver="lbfgs",
                            max_iter=200).fit(xy_classification, cols)
    # same support on the clearly-informative side
    np.testing.assert_allclose(pg.coef_, lb.coef_, atol=5e-2)


def test_admm_logistic(xy_classification):
    cols = [c for c in xy_classification.columns if c.startswith("f")]
    ad = LogisticRegression(
        penalty="l2", C=1.0, solver="admm", max_iter=250,
        solver_kwargs={"abstol": 1e-6, "reltol": 1e-4},
    ).fit(xy_classification, cols)
    lb = LogisticRegression(penalty="l2", C=1.0, solver="lbfgs",
                            max_iter=200, tol=1e-10).fit(xy_classification, cols)
    np.testing.assert_allclose(ad.coef_, lb.coef_, rtol=5e-2, atol=2e-2)
    # predictions agree on the training data
    pa = ad.predict(xy_classification).toPandas()["prediction"]
    pl = lb.predict(xy_classification).toPandas()["prediction"]
    assert (pa == pl).mean() > 0.98


def test_poisson_newton_matches_irls(spark):
    from dask_ml_spark.datasets import make_counts

    df = make_counts(400, 4, random_state=0, n_partitions=4, spark=spark)
    cols = [c for c in df.columns if c.startswith("f")]
    nt = PoissonRegression(solver="newton", C=float("inf")).fit(df, cols)
    ml = PoissonRegression(solver="auto", C=float("inf"),
                           max_iter=50, tol=1e-10).fit(df, cols)
    np.testing.assert_allclose(nt.coef_, ml.coef_, rtol=1e-3, atol=1e-3)


def test_bad_solver_raises(xy_regression):
    cols = [c for c in xy_regression.columns if c.startswith("f")]
    with pytest.raises(ValueError, match="solver"):
        LinearRegression(solver="sag").fit(xy_regression, cols)


def test_grid_search_over_solver(xy_classification):
    """The search surface composes with the solver knob: GridSearchCV
    can tune solver= like any other hyperparameter (reference users
    grid-search dask_glm solvers the same way)."""
    from dask_ml_spark.model_selection import GridSearchCV

    cols = [c for c in xy_classification.columns if c.startswith("f")]
    gs = GridSearchCV(
        LogisticRegression(penalty="l2", C=1.0, max_iter=25),
        {"solver": ["lbfgs", "newton"], "C": [1.0, 10.0]},
        cv=2,
    ).fit(xy_classification, cols)
    assert len(gs.cv_results_["params"]) == 4
    assert gs.best_params_["solver"] in ("lbfgs", "newton")
    # newton now honors the L2 penalty (it used to silently drop it,
    # so the grid compared different objectives across solvers); on
    # this noisy fixture the regularized optimum scores just under the
    # old 0.5 floor
    assert 0.45 <= gs.best_score_ <= 1.0


def test_newton_ridge_matches_normal_equations(spark):
    """newton with an L2 penalty solves the ridge normal equations
    exactly in one step for the gaussian family (grad += lam*w,
    hess += lam*I on the weight block, intercept unpenalized)."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from dask_ml_spark.operators.linear_model import LinearRegression

    rng = np.random.RandomState(0)
    n = 2000
    x1, x2 = rng.randn(n), rng.randn(n) * 2 + 1
    y = 3 * x1 - 1.5 * x2 + 0.7 + rng.randn(n) * 0.5
    df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "label": y}))
    X = np.stack([x1, x2], 1)
    for C in (0.1, 10.0):
        lam = 1.0 / C
        m = LinearRegression(penalty="l2", C=C, solver="newton").fit(
            df, ["x1", "x2"])
        A = np.zeros((3, 3))
        A[:2, :2] = X.T @ X / n + lam * np.eye(2)
        A[:2, 2] = A[2, :2] = X.mean(0)
        A[2, 2] = 1.0
        b = np.concatenate([X.T @ y / n, [y.mean()]])
        sol = np.linalg.solve(A, b)
        np.testing.assert_allclose(m.coef_, sol[:2], rtol=1e-8)
        np.testing.assert_allclose(m.intercept_, sol[2], rtol=1e-8)
    with _pytest.raises(ValueError, match="smooth"):
        LinearRegression(penalty="l1", C=1.0, solver="newton").fit(
            df, ["x1", "x2"])
