"""Decomposition: PCA / TruncatedSVD / IncrementalPCA.

Reference: dask_ml/decomposition/pca.py (TSQR SVD, 470 LoC),
truncated_svd.py, incremental_pca.py.

Spark design: for d features the covariance (or Gramian) matrix is
d×d — tiny. One distributed aggregation pass computes all first and
second moments (d + d(d+1)/2 sums, map-side combined, JVM codegen);
the eigendecomposition of the d×d matrix runs on the driver with
numpy. This replaces TSQR entirely for d up to a few thousand — at
100 TB the data pass is the cost, and this does exactly one.
(The reference's TSQR exists because dask must orthogonalize tall
blocks; Spark's agg tree gives the same single-pass reduction.)
For very wide d there is a RowMatrix.computeSVD escape hatch.

Sign convention: deterministic svd_flip analog — each component is
flipped so its largest-|.| coordinate is positive (matches sklearn's
output modulo sign, same guarantee the reference tests rely on,
tests/test_pca.py sign handling).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, TransformerMixin


def _moment_aggs(cols):
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"s_{c}"))
    for i, ci in enumerate(cols):
        for j in range(i, len(cols)):
            cj = cols[j]
            aggs.append(
                F.sum(F.col(ci).cast("double") * F.col(cj).cast("double")).alias(f"p_{i}_{j}")
            )
    return aggs


def _moments(df: DataFrame, cols):
    """One pass → (n, sum_x (d,), sum_xxT (d,d))."""
    row = df.agg(*_moment_aggs(cols)).collect()[0]
    d = len(cols)
    n = row["__n"]
    s = np.array([row[f"s_{c}"] for c in cols], dtype="float64")
    P = np.zeros((d, d), dtype="float64")
    for i in range(d):
        for j in range(i, d):
            P[i, j] = P[j, i] = row[f"p_{i}_{j}"]
    return n, s, P


def _flip(components: np.ndarray) -> np.ndarray:
    signs = np.sign(components[np.arange(len(components)), np.abs(components).argmax(axis=1)])
    signs[signs == 0] = 1.0
    return components * signs[:, None]


class PCA(BaseEstimator, TransformerMixin):
    def __init__(self, n_components: int | None = None, whiten: bool = False,
                 svd_solver: str = "covariance", random_state: int | None = None,
                 copy: bool = True, tol: float = 0.0, iterated_power: int = 0):
        # copy/tol/iterated_power accepted for reference signature
        # compatibility (pca.py:180-189); the covariance-pass solver has
        # no in-place mutation and computes the exact eigendecomposition
        self.n_components = n_components
        self.whiten = whiten
        self.svd_solver = svd_solver
        self.random_state = random_state
        self.copy = copy
        self.tol = tol
        self.iterated_power = iterated_power

    def fit(self, df: DataFrame, columns=None) -> "PCA":
        cols = self._validate_data(df, columns)
        n, s, P = _moments(df, cols)
        mean = s / n
        # covariance with ddof=1 (sklearn/dask-ml parity: explained
        # variance uses n-1, pca.py explained_variance_ = S**2/(n-1))
        cov = (P - np.outer(mean, s)) / (n - 1)
        cov = (cov + cov.T) / 2.0
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1]
        evals = np.clip(evals[order], 0.0, None)
        comps = _flip(evecs[:, order].T)
        k = self.n_components or len(cols)
        self.n_samples_ = int(n)
        self.mean_ = mean
        self.components_ = comps[:k]
        self.explained_variance_ = evals[:k]
        total_var = evals.sum()
        self.explained_variance_ratio_ = self.explained_variance_ / total_var if total_var > 0 else self.explained_variance_
        self.singular_values_ = np.sqrt(self.explained_variance_ * (n - 1))
        self.noise_variance_ = float(evals[k:].mean()) if k < len(evals) else 0.0
        self.feature_columns_ = cols
        return self

    def transform(self, df: DataFrame, prefix: str = "pc") -> DataFrame:
        """X_centered · Vᵀ as pure column expressions (components are
        plan literals — the broadcast-matmul of pca.py:356-393)."""
        exprs = {}
        for ki, comp in enumerate(self.components_):
            e = F.lit(0.0)
            for c, mu, w in zip(self.feature_columns_, self.mean_, comp):
                e = e + (F.col(c).cast("double") - F.lit(float(mu))) * F.lit(float(w))
            if self.whiten:
                e = e / F.lit(float(np.sqrt(self.explained_variance_[ki])) or 1.0)
            exprs[f"{prefix}{ki}"] = e
        return df.withColumns(exprs)

    def inverse_transform(self, df: DataFrame, prefix: str = "pc") -> DataFrame:
        exprs = {}
        for j, c in enumerate(self.feature_columns_):
            e = F.lit(float(self.mean_[j]))
            for ki, comp in enumerate(self.components_):
                pc = F.col(f"{prefix}{ki}")
                if self.whiten:
                    pc = pc * F.lit(float(np.sqrt(self.explained_variance_[ki])))
                e = e + pc * F.lit(float(comp[j]))
            exprs[c] = e
        return df.withColumns(exprs)

    def score_samples(self, df: DataFrame, output_col: str = "log_likelihood") -> DataFrame:
        """Gaussian log-likelihood under the probabilistic PCA model
        (reference pca.py:430-493). Pure column math over the projected
        coordinates."""
        k = len(self.components_)
        d = len(self.feature_columns_)
        rho = self.noise_variance_ if self.noise_variance_ > 0 else 1e-12
        # precision matrix in the PCA basis: 1/ev for kept comps, 1/rho
        # for the residual subspace
        proj = self.transform(df, prefix="__sc_pc")
        sq_total = F.lit(0.0)
        for c, mu in zip(self.feature_columns_, self.mean_):
            x = F.col(c).cast("double") - F.lit(float(mu))
            sq_total = sq_total + x * x
        sq_proj = F.lit(0.0)
        mahal = F.lit(0.0)
        for ki in range(k):
            pc = F.col(f"__sc_pc{ki}")
            sq_proj = sq_proj + pc * pc
            mahal = mahal + pc * pc / F.lit(float(self.explained_variance_[ki]))
        mahal = mahal + (sq_total - sq_proj) / F.lit(float(rho))
        logdet = float(np.log(self.explained_variance_).sum() + (d - k) * np.log(rho))
        const = float(d * np.log(2 * np.pi))
        ll = F.lit(-0.5) * (mahal + F.lit(logdet + const))
        return proj.withColumn(output_col, ll).drop(*[f"__sc_pc{ki}" for ki in range(k)])


class TruncatedSVD(BaseEstimator, TransformerMixin):
    """SVD without centering (reference truncated_svd.py:9-246): the
    Gramian XᵀX is computed in the same single pass; eigh on driver."""

    def __init__(self, n_components: int = 2, random_state: int | None = None):
        self.n_components = n_components
        self.random_state = random_state

    def fit(self, df: DataFrame, columns=None) -> "TruncatedSVD":
        cols = self._validate_data(df, columns)
        n, s, P = _moments(df, cols)
        evals, evecs = np.linalg.eigh(P)
        order = np.argsort(evals)[::-1]
        evals = np.clip(evals[order], 0.0, None)
        comps = _flip(evecs[:, order].T)
        k = self.n_components
        self.components_ = comps[:k]
        self.singular_values_ = np.sqrt(evals[:k])
        # explained variance of the PROJECTED coordinates (sklearn defn)
        mean = s / n
        cov_diag_total = (np.diag(P) - n * mean**2).sum() / (n - 1)
        proj_second = evals[:k] / n  # E[t_k^2]
        # var(t_k) needs E[t_k]^2 = (comp·mean)^2
        t_mean = self.components_ @ mean
        self.explained_variance_ = proj_second * (n / (n - 1)) - t_mean**2 * (n / (n - 1))
        self.explained_variance_ratio_ = self.explained_variance_ / cov_diag_total if cov_diag_total > 0 else self.explained_variance_
        self.n_samples_ = int(n)
        self.feature_columns_ = cols
        return self

    def transform(self, df: DataFrame, prefix: str = "sv") -> DataFrame:
        exprs = {}
        for ki, comp in enumerate(self.components_):
            e = F.lit(0.0)
            for c, w in zip(self.feature_columns_, comp):
                e = e + F.col(c).cast("double") * F.lit(float(w))
            exprs[f"{prefix}{ki}"] = e
        return df.withColumns(exprs)


class IncrementalPCA(PCA):
    """Batch-sequential PCA (reference incremental_pca.py:36-427).

    On Spark the covariance-accumulation formulation makes the
    incremental algorithm exact AND embarrassingly parallel: partial
    (n, Σx, ΣxxT) per batch/partition combine associatively — so
    partial_fit just accumulates moments and refits the
    eigendecomposition. This matches Chan/Golub/LeVeque merging
    (reference decomposition/extmath.py:19-108) without the per-batch
    SVD approximation error.
    """

    def __init__(self, n_components: int | None = None, whiten: bool = False, batch_size: int | None = None):
        super().__init__(n_components=n_components, whiten=whiten)
        self.batch_size = batch_size
        self._n = 0
        self._s = None
        self._P = None

    def partial_fit(self, df: DataFrame, columns=None) -> "IncrementalPCA":
        cols = self._validate_data(df, columns, reset=self._s is None)
        n, s, P = _moments(df, cols)
        if self._s is None:
            self._n, self._s, self._P = n, s, P
            self.feature_columns_ = cols
        else:
            self._n += n
            self._s = self._s + s
            self._P = self._P + P
        self._refit()
        return self

    def _refit(self):
        n, s, P = self._n, self._s, self._P
        cols = self.feature_columns_
        mean = s / n
        cov = (P - np.outer(mean, s)) / max(n - 1, 1)
        cov = (cov + cov.T) / 2.0
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1]
        evals = np.clip(evals[order], 0.0, None)
        comps = _flip(evecs[:, order].T)
        k = self.n_components or len(cols)
        self.n_samples_seen_ = int(n)
        self.mean_ = mean
        self.components_ = comps[:k]
        self.explained_variance_ = evals[:k]
        tv = evals.sum()
        self.explained_variance_ratio_ = evals[:k] / tv if tv > 0 else evals[:k]
        self.singular_values_ = np.sqrt(self.explained_variance_ * max(n - 1, 1))
        self.noise_variance_ = float(evals[k:].mean()) if k < len(evals) else 0.0

    def fit(self, df: DataFrame, columns=None) -> "IncrementalPCA":
        self._n, self._s, self._P = 0, None, None
        return self.partial_fit(df, columns)
