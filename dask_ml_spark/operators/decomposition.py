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


def _matrix_pass(df: DataFrame, cols, fn, out_shape):
    """One distributed pass: ``fn(X_block) -> small ndarray`` partials
    accumulated per partition (Arrow batches), summed on the driver.
    The collected set is one flattened array per partition — the same
    tree-reduction shape as the reference's blockwise partial sums
    (k_means.py:582-601), expressed with mapInPandas."""
    import pandas as pd

    size = int(np.prod(out_shape))

    def _part(it):
        acc = np.zeros(size, dtype="float64")
        seen = False
        for pdf in it:
            X = pdf.to_numpy(dtype="float64")
            if len(X):
                acc += fn(X).ravel()
                seen = True
        if seen:
            yield pd.DataFrame({"v": [acc]})

    rows = df.select(*[F.col(c).cast("double") for c in cols]).mapInPandas(
        _part, schema="v array<double>").collect()
    total = np.zeros(size, dtype="float64")
    for r in rows:
        total += np.asarray(r["v"], dtype="float64")
    return total.reshape(out_shape)


def _tsqr_r(df: DataFrame, cols, W: np.ndarray, mean=None) -> np.ndarray:
    """R factor of the implicit tall matrix (X - mean)·W via TSQR
    (Benson 2013, the reference's da.linalg.svd building block,
    pca.py:272-281): per-partition streaming QR keeps only an l×l R;
    the driver QRs the stacked R blocks.  At 1000 executors that is
    1000 l×l matrices — a broadcast-sized reduction."""
    import pandas as pd

    l = W.shape[1]
    mu = None if mean is None else np.asarray(mean, dtype="float64")

    def _part(it):
        R = None
        for pdf in it:
            X = pdf.to_numpy(dtype="float64")
            if not len(X):
                continue
            if mu is not None:
                X = X - mu
            M = X @ W
            stacked = M if R is None else np.vstack([R, M])
            R = np.linalg.qr(stacked, mode="r")
        if R is not None:
            yield pd.DataFrame({"v": [R.ravel()]})

    rows = df.select(*[F.col(c).cast("double") for c in cols]).mapInPandas(
        _part, schema="v array<double>").collect()
    Rs = [np.asarray(r["v"], dtype="float64").reshape(-1, l) for r in rows]
    return np.linalg.qr(np.vstack(Rs), mode="r")


def randomized_svd(df: DataFrame, columns, n_components: int,
                   n_oversamples: int = 10, n_iter: int = 2,
                   random_state: int | None = None, mean=None):
    """Randomized range-finder SVD (Halko, Martinsson & Tropp 2011 —
    the algorithm behind the reference's ``da.linalg.svd_compressed``,
    pca.py:205-250 'randomized' solver).

    The n×d matrix is never materialized: a d×l sketch ``W`` is
    maintained on the driver so that the working subspace is always
    the implicit product ``(X-mean)·W``.  Each step is one distributed
    pass collecting small matrices (l×l TSQR blocks or d×l / l×d
    Gramian partials); with the default ``n_iter=2`` the total is
    ``2·n_iter + 2`` passes.  Use when d is too wide for the exact
    d×d moment pass (_moments) — partials scale O(d·l), not O(d²).

    Returns ``(singular_values (k,), Vt (k,d))`` of (X - mean).
    """
    cols = list(columns)
    d = len(cols)
    k = n_components
    l = min(d, k + n_oversamples)
    rng = np.random.RandomState(random_state)
    mu = None if mean is None else np.asarray(mean, dtype="float64")

    W = rng.standard_normal((d, l))
    # orthonormalize A·W, then alternate AᵀA power steps with TSQR
    # re-orthonormalization (numerical stabilization per Halko Alg 4.4)
    R = _tsqr_r(df, cols, W, mean=mu)
    W = W @ np.linalg.pinv(R)
    def _centered(X):
        return X if mu is None else X - mu

    for _ in range(n_iter):
        def _power(X, W=W):
            Xc = _centered(X)
            return Xc.T @ (Xc @ W)

        W = _matrix_pass(df, cols, _power, (d, l))
        R = _tsqr_r(df, cols, W, mean=mu)
        W = W @ np.linalg.pinv(R)

    # B = Qᵀ·A  (l×d, small); SVD on driver
    def _project(X, W=W):
        Xc = _centered(X)
        return (Xc @ W).T @ Xc

    B = _matrix_pass(df, cols, _project, (l, d))
    _, S, Vt = np.linalg.svd(B, full_matrices=False)
    return S[:k], _flip(Vt[:k])


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
        if self.svd_solver == "randomized":
            return self._fit_randomized(df, cols)
        # 'auto'/'full'/'tsqr'/'covariance' all take the exact one-pass
        # moments + driver eigh route — for the d regimes where a d×d
        # matrix fits on the driver it strictly dominates real TSQR
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

    def _fit_randomized(self, df: DataFrame, cols) -> "PCA":
        """Wide-d scale path (reference pca.py:205-250 'randomized' /
        da.linalg.svd_compressed): Halko sketch + distributed TSQR;
        only O(d) and O(d·l) state ever leaves the executors."""
        d = len(cols)
        row = df.agg(F.count("*").alias("__n"),
                     *[F.sum(F.col(c).cast("double")).alias(f"s_{c}") for c in cols],
                     *[F.sum(F.col(c).cast("double") * F.col(c).cast("double")
                             ).alias(f"ss_{c}") for c in cols],
                     ).collect()[0]
        n = row["__n"]
        s = np.array([row[f"s_{c}"] for c in cols], dtype="float64")
        ss = np.array([row[f"ss_{c}"] for c in cols], dtype="float64")
        mean = s / n
        k = self.n_components or d
        n_iter = self.iterated_power if self.iterated_power else 2
        S, Vt = randomized_svd(df, cols, k, n_iter=n_iter,
                               random_state=self.random_state, mean=mean)
        self.n_samples_ = int(n)
        self.mean_ = mean
        self.components_ = Vt
        self.explained_variance_ = S**2 / (n - 1)
        total_var = float(((ss - n * mean**2) / (n - 1)).sum())
        self.explained_variance_ratio_ = (
            self.explained_variance_ / total_var if total_var > 0 else self.explained_variance_)
        self.singular_values_ = S
        resid = total_var - float(self.explained_variance_.sum())
        self.noise_variance_ = max(0.0, resid / (d - k)) if k < d else 0.0
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
    """SVD without centering (reference truncated_svd.py:9-246).

    ``algorithm='tsqr'`` (default): the Gramian XᵀX is computed in one
    exact single pass; eigh on driver — strictly cheaper than real
    TSQR for d up to a few thousand.  ``algorithm='randomized'``: the
    Halko sketch with distributed TSQR re-orthonormalization
    (randomized_svd above) — the wide-d scale path, partials O(d·l)."""

    def __init__(self, n_components: int = 2, algorithm: str = "tsqr",
                 n_iter: int = 5, random_state: int | None = None,
                 tol: float = 0.0, compute: bool = True):
        # tol/compute accepted for reference signature compatibility
        # (truncated_svd.py:10-18); results are always "computed" here
        self.n_components = n_components
        self.algorithm = algorithm
        self.n_iter = n_iter
        self.random_state = random_state
        self.tol = tol
        self.compute = compute

    def fit(self, df: DataFrame, columns=None) -> "TruncatedSVD":
        cols = self._validate_data(df, columns)
        k = self.n_components
        if self.algorithm == "randomized":
            # O(d) aggs only (no d×d Gramian): mean + per-column second
            # moment for the explained-variance bookkeeping
            row = df.agg(F.count("*").alias("__n"),
                         *[F.sum(F.col(c).cast("double")).alias(f"s_{c}") for c in cols],
                         *[F.sum(F.col(c).cast("double") * F.col(c).cast("double")
                                 ).alias(f"ss_{c}") for c in cols],
                         ).collect()[0]
            n = row["__n"]
            s = np.array([row[f"s_{c}"] for c in cols], dtype="float64")
            diag_P = np.array([row[f"ss_{c}"] for c in cols], dtype="float64")
            S, comps = randomized_svd(df, cols, k, n_iter=self.n_iter,
                                      random_state=self.random_state)
            evals = np.zeros(len(cols))
            evals[:k] = S**2
        else:
            n, s, P = _moments(df, cols)
            diag_P = np.diag(P)
            evals, evecs = np.linalg.eigh(P)
            order = np.argsort(evals)[::-1]
            evals = np.clip(evals[order], 0.0, None)
            comps = _flip(evecs[:, order].T)
        self.components_ = comps[:k]
        self.singular_values_ = np.sqrt(evals[:k])
        # explained variance of the PROJECTED coordinates (sklearn defn)
        mean = s / n
        cov_diag_total = (diag_P - n * mean**2).sum() / (n - 1)
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
