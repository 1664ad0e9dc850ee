"""Generalized linear models.

Reference: dask_ml/linear_model/glm.py:98-385 — delegates solvers to
dask_glm (admm/lbfgs/proximal_grad/newton/gradient_descent). Spark
already ships these solver families JVM-side (L-BFGS / OWL-QN / IRLS)
inside pyspark.ml — distributed gradient aggregation via treeAggregate,
which is exactly the dask solvers' communication pattern. So fitting
delegates to MLlib; the fitted coefficients come back to the driver as
small numpy state, and predict/predict_proba are pure column
expressions (X·β folded into the plan as literals — no UDF, no MLlib
model object needed at serve time).

Regularization mapping (reference glm.py:40-42,146): C ↔ regParam =
1/C (per-sample scaling matches MLlib's objective), penalty l1/l2 ↔
elasticNetParam 1.0/0.0.

Solver surface (reference glm.py:61-64,139-171): ``admm``,
``gradient_descent``, ``newton``, ``lbfgs``, ``proximal_grad``.
``auto``/``lbfgs`` delegate to MLlib (JVM treeAggregate); the other four
run our distributed implementations in ``operators/solvers.py`` — same
objective, same optimum, different communication pattern.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, ClassifierMixin, RegressorMixin


def _assemble(df: DataFrame, cols, out="__features"):
    from pyspark.ml.feature import VectorAssembler

    from dask_ml_spark.utils import ensure_min_partitions

    va = VectorAssembler(inputCols=list(cols), outputCol=out)
    return va.transform(ensure_min_partitions(df))


def _reuse_assembled(df: DataFrame, cols, label_col, out="__features"):
    """Return ``df`` unchanged when it already carries a ``__features``
    vector assembled from exactly ``cols`` (checked via the ML-attr
    metadata VectorAssembler writes) and a double label — the CV-cache
    fast path: GridSearchCV/Hyperband assemble ONCE at the fold-cache
    grain, and every (candidate, fold) fit plus the refit skips its own
    assemble + persist + materialize. None → caller assembles itself."""
    if out not in df.columns or label_col not in df.columns:
        return None
    if df.schema[label_col].dataType.simpleString() != "double":
        return None
    try:
        attrs = df.schema[out].metadata["ml_attr"]["attrs"]
        flat = [a for group in attrs.values() for a in group]
        flat.sort(key=lambda a: a["idx"])
        assembled_names = [a["name"] for a in flat]
    except (KeyError, TypeError):
        return None
    return df if assembled_names == list(cols) else None


def _assembled_input(df: DataFrame, cols, label_col):
    """(assembled_frame, owned): reuse a caller-assembled CV-cache
    frame when present, else assemble + persist a private copy (the
    solver's treeAggregate rescans the input once per iteration).
    ``owned`` tells the fit whether to unpersist afterwards."""
    pre = _reuse_assembled(df, cols, label_col)
    if pre is not None:
        return pre, False
    assembled = _assemble(
        df.select(*cols, F.col(label_col).cast("double").alias(label_col)),
        cols).persist()
    return assembled, True


def prepare_glm_cv_cache(df: DataFrame, cols, label_col) -> DataFrame:
    """Pre-assemble the ``__features`` vector at the CV fold-cache
    grain (see _reuse_assembled). Row-wise and parameter-independent,
    so it belongs ABOVE the per-candidate fan-out: without it every
    (candidate, fold) fit persists and materializes its own assembled
    copy of the fold — k*n_candidates cached copies instead of one."""
    keep = [c for c in df.columns if c != label_col]
    return _assemble(
        df.select(*keep, F.col(label_col).cast("double").alias(label_col)),
        cols)


def _fit_custom(est, df, cols, label_col, family):
    """Route non-lbfgs solver names to operators/solvers.py (reference
    glm.py:139-171 delegates the same names to dask_glm)."""
    from dask_ml_spark.operators.solvers import fit_glm

    coef, intercept = fit_glm(
        df, cols, label_col, family, est.solver,
        getattr(est, "penalty", "l2"), est.C, est.fit_intercept,
        est.max_iter, est.tol, est.solver_kwargs,
    )
    est.coef_ = coef
    est.intercept_ = intercept
    est.feature_columns_ = cols
    est.label_col_ = label_col
    return est


def _linear_expr(cols, coef, intercept):
    e = F.lit(float(intercept))
    for c, w in zip(cols, coef):
        if w != 0.0:  # L1-sparse models skip zero terms entirely
            e = e + F.col(c).cast("double") * F.lit(float(w))
    return e


class LinearRegression(BaseEstimator, RegressorMixin):
    """OLS / ridge / lasso (reference glm.py:225-268)."""

    def __init__(self, penalty: str = "l2", C: float = 1.0, fit_intercept: bool = True,
                 max_iter: int = 100, tol: float = 1e-6, solver: str = "auto",
                 solver_kwargs: dict | None = None):
        self.penalty = penalty
        self.C = C
        self.fit_intercept = fit_intercept
        self.max_iter = max_iter
        self.tol = tol
        self.solver = solver
        self.solver_kwargs = solver_kwargs

    def prepare_cv_cache(self, df, columns, label_col):
        """GLM CV-cache preparation: pre-assemble ``__features`` at the
        fold-cache grain when this fit would delegate to MLlib (see
        _reuse_assembled); custom solvers read raw columns, no prep."""
        if self.solver not in ("auto", "lbfgs") or columns is None:
            return df
        return prepare_glm_cv_cache(df, list(columns), label_col)

    def fit(self, df: DataFrame, columns=None, label_col: str = "label") -> "LinearRegression":
        from pyspark.ml.regression import LinearRegression as MLlibLR

        cols = self._validate_data(df, columns)
        if self.solver not in ("auto", "lbfgs"):
            return _fit_custom(self, df, cols, label_col, "gaussian")
        # persist across solver iterations (LBFGS/IRLS treeAggregate
        # rescans the input once per iteration) — unless the caller
        # already assembled at the CV fold-cache grain
        assembled, owned = _assembled_input(df, cols, label_col)
        reg = 0.0 if self.C in (None, float("inf")) else 1.0 / self.C
        if self.penalty is None or self.penalty == "none":
            reg, elastic = 0.0, 0.0
        else:
            elastic = 1.0 if self.penalty == "l1" else 0.0
        m = MLlibLR(
            featuresCol="__features", labelCol=label_col,
            regParam=reg, elasticNetParam=elastic,
            # the reference (dask_glm) penalizes raw-space coefficients;
            # MLlib's default standardization=True would change the
            # regularized optimum and break cross-solver agreement
            standardization=False,
            fitIntercept=self.fit_intercept, maxIter=self.max_iter, tol=self.tol,
        ).fit(assembled)
        if owned:
            assembled.unpersist()
        self.coef_ = np.asarray(m.coefficients.toArray())
        self.intercept_ = float(m.intercept)
        self.feature_columns_ = cols
        self.label_col_ = label_col
        return self

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        return df.withColumn(output_col, _linear_expr(self.feature_columns_, self.coef_, self.intercept_))


class LogisticRegression(BaseEstimator, ClassifierMixin):
    """Binary logistic regression (reference glm.py:270-330)."""

    def __init__(self, penalty: str = "l2", C: float = 1.0, fit_intercept: bool = True,
                 max_iter: int = 100, tol: float = 1e-6, threshold: float = 0.5,
                 solver: str = "auto", solver_kwargs: dict | None = None):
        self.penalty = penalty
        self.C = C
        self.fit_intercept = fit_intercept
        self.max_iter = max_iter
        self.tol = tol
        self.threshold = threshold
        self.solver = solver
        self.solver_kwargs = solver_kwargs

    def prepare_cv_cache(self, df, columns, label_col):
        """GLM CV-cache preparation: pre-assemble ``__features`` at the
        fold-cache grain when this fit would delegate to MLlib (see
        _reuse_assembled); custom solvers read raw columns, no prep."""
        if self.solver not in ("auto", "lbfgs") or columns is None:
            return df
        return prepare_glm_cv_cache(df, list(columns), label_col)

    def fit(self, df: DataFrame, columns=None, label_col: str = "label") -> "LogisticRegression":
        from pyspark.ml.classification import LogisticRegression as MLlibLogReg

        cols = self._validate_data(df, columns)
        if self.solver not in ("auto", "lbfgs"):
            out = _fit_custom(self, df, cols, label_col, "logistic")
            out.classes_ = np.array([0.0, 1.0])
            return out
        # persist across solver iterations (LBFGS/IRLS treeAggregate
        # rescans the input once per iteration) — unless the caller
        # already assembled at the CV fold-cache grain
        assembled, owned = _assembled_input(df, cols, label_col)
        reg = 0.0 if self.C in (None, float("inf")) else 1.0 / self.C
        if self.penalty is None or self.penalty == "none":
            reg, elastic = 0.0, 0.0
        else:
            elastic = 1.0 if self.penalty == "l1" else 0.0
        m = MLlibLogReg(
            featuresCol="__features", labelCol=label_col,
            regParam=reg, elasticNetParam=elastic,
            # the reference (dask_glm) penalizes raw-space coefficients;
            # MLlib's default standardization=True would change the
            # regularized optimum and break cross-solver agreement
            standardization=False,
            fitIntercept=self.fit_intercept, maxIter=self.max_iter, tol=self.tol,
        ).fit(assembled)
        if owned:
            assembled.unpersist()
        self.coef_ = np.asarray(m.coefficients.toArray())
        self.intercept_ = float(m.intercept)
        self.classes_ = np.array([0.0, 1.0])
        self.feature_columns_ = cols
        self.label_col_ = label_col
        return self

    def decision_function(self, df: DataFrame, output_col: str = "decision") -> DataFrame:
        return df.withColumn(output_col, _linear_expr(self.feature_columns_, self.coef_, self.intercept_))

    def predict_proba(self, df: DataFrame, output_col: str = "probability") -> DataFrame:
        margin = _linear_expr(self.feature_columns_, self.coef_, self.intercept_)
        return df.withColumn(output_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        margin = _linear_expr(self.feature_columns_, self.coef_, self.intercept_)
        sigma = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        return df.withColumn(output_col, (sigma > self.threshold).cast("double"))


class PoissonRegression(BaseEstimator, RegressorMixin):
    """Poisson GLM with log link (reference glm.py:332-385) via MLlib
    GeneralizedLinearRegression (IRLS, distributed)."""

    def __init__(self, C: float = 1.0, fit_intercept: bool = True,
                 max_iter: int = 25, tol: float = 1e-6, solver: str = "auto",
                 solver_kwargs: dict | None = None):
        self.C = C
        self.fit_intercept = fit_intercept
        self.max_iter = max_iter
        self.tol = tol
        self.solver = solver
        self.solver_kwargs = solver_kwargs
        self.penalty = "l2"

    def prepare_cv_cache(self, df, columns, label_col):
        """GLM CV-cache preparation: pre-assemble ``__features`` at the
        fold-cache grain when this fit would delegate to MLlib (see
        _reuse_assembled); custom solvers read raw columns, no prep."""
        if self.solver not in ("auto", "lbfgs") or columns is None:
            return df
        return prepare_glm_cv_cache(df, list(columns), label_col)

    def fit(self, df: DataFrame, columns=None, label_col: str = "label") -> "PoissonRegression":
        from pyspark.ml.regression import GeneralizedLinearRegression

        cols = self._validate_data(df, columns)
        if self.solver not in ("auto", "lbfgs"):
            return _fit_custom(self, df, cols, label_col, "poisson")
        # persist across solver iterations (LBFGS/IRLS treeAggregate
        # rescans the input once per iteration) — unless the caller
        # already assembled at the CV fold-cache grain
        assembled, owned = _assembled_input(df, cols, label_col)
        reg = 0.0 if self.C in (None, float("inf")) else 1.0 / self.C
        m = GeneralizedLinearRegression(
            featuresCol="__features", labelCol=label_col,
            family="poisson", link="log",
            regParam=reg, fitIntercept=self.fit_intercept,
            maxIter=self.max_iter, tol=self.tol,
        ).fit(assembled)
        if owned:
            assembled.unpersist()
        self.coef_ = np.asarray(m.coefficients.toArray())
        self.intercept_ = float(m.intercept)
        self.feature_columns_ = cols
        self.label_col_ = label_col
        return self

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        return df.withColumn(
            output_col, F.exp(_linear_expr(self.feature_columns_, self.coef_, self.intercept_))
        )
