"""Covariance-based outlier scoring (beyond-reference; the
sklearn.covariance.EllipticEnvelope neighborhood minus the MCD
refinement — honest naming: plain empirical-covariance Mahalanobis).

Curation pipelines flag numeric outliers before scaling/regression
(the Winsorizer's detection-side sibling): the squared Mahalanobis
distance d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) scores every row against the
corpus's empirical mean/covariance.

Spark-first shape: fit is ONE aggregate pass (means + pairwise
product moments — d(d+3)/2 scalars for d features); the inverse is a
tiny driver-side numpy solve; scoring folds Σ⁻¹ into a literal
quadratic-form column expression — no UDF, no shuffle, scan-speed at
100 TB, and the predicate (d² > threshold) pushes into curation
joins. Population covariance (ddof=0), matching StandardScaler's
var_pop convention, so the SQL oracle can replay fit AND score from
raw sums (see the `mahalanobis_outliers` catalog query)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from dask_ml_spark.base import BaseEstimator


def _precision(cov: np.ndarray) -> np.ndarray:
    """Robust precision matrix with engine-parity arithmetic.

    Degenerate Σ (a constant column, a collinear pair — cond > 1e12 or
    det 0) takes the Moore-Penrose pseudo-inverse: scores stay finite,
    measuring distance within the data's actual subspace (the
    rank-deficient directions contribute 0, the convention sklearn's
    EmpiricalCovariance ends up with under its own pinvh path).

    Well-conditioned d <= 3 uses the closed-form adjugate/det with the
    SAME operation order as the SQL oracle's Cramer replay
    (plans/queries.py::_sql_mahalanobis_outliers) so both engines fold
    bit-identical precision literals into the quadratic form — LAPACK
    inv() differs from the cofactor arithmetic in the last ulps, which
    can flip a value sitting on a 0.5e-6 rounding boundary. d > 3
    falls back to np.linalg.inv.
    """
    d = cov.shape[0]
    cond = np.linalg.cond(cov)
    if not np.isfinite(cond) or cond > 1e12:
        return np.linalg.pinv(cov, hermitian=True)
    if d == 1:
        return np.array([[1.0 / float(cov[0, 0])]])
    if d == 2:
        c00, c01, c11 = float(cov[0, 0]), float(cov[0, 1]), float(cov[1, 1])
        det = c00 * c11 - c01 * c01
        return np.array([[c11 / det, -c01 / det],
                         [-c01 / det, c00 / det]])
    if d == 3:
        c00, c01, c02 = float(cov[0, 0]), float(cov[0, 1]), float(cov[0, 2])
        c11, c12, c22 = float(cov[1, 1]), float(cov[1, 2]), float(cov[2, 2])
        # cofactor expansion in the oracle's exact order
        det = (c00 * (c11 * c22 - c12 * c12)
               - c01 * (c01 * c22 - c12 * c02)
               + c02 * (c01 * c12 - c11 * c02))
        q00 = (c11 * c22 - c12 * c12) / det
        q01 = (c02 * c12 - c01 * c22) / det
        q02 = (c01 * c12 - c02 * c11) / det
        q11 = (c00 * c22 - c02 * c02) / det
        q12 = (c02 * c01 - c00 * c12) / det
        q22 = (c00 * c11 - c01 * c01) / det
        return np.array([[q00, q01, q02],
                         [q01, q11, q12],
                         [q02, q12, q22]])
    return np.linalg.inv(cov)


class MahalanobisOutlier(BaseEstimator):
    def __init__(self, threshold: float | None = None):
        # threshold: squared-distance cutoff for predict(); callers
        # pick it (e.g. the chi-square d-dof quantile for Gaussian
        # data) — no scipy in this container, so no default
        self.threshold = threshold

    def fit(self, df: DataFrame, columns=None) -> "MahalanobisOutlier":
        cols = self._validate_data(df, columns)
        d = len(cols)
        aggs = [F.avg(F.col(c).cast("double")).alias(f"m_{c}") for c in cols]
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.avg(F.col(cols[i]).cast("double")
                                  * F.col(cols[j]).cast("double"))
                            .alias(f"p_{i}_{j}"))
        row = df.agg(*aggs).collect()[0]
        mu = np.array([row[f"m_{c}"] for c in cols], dtype="float64")
        cov = np.empty((d, d), dtype="float64")
        for i in range(d):
            for j in range(i, d):
                cov[i, j] = cov[j, i] = row[f"p_{i}_{j}"] - mu[i] * mu[j]
        self.columns_ = cols
        self.location_ = mu
        self.covariance_ = cov
        self.precision_ = _precision(cov)
        return self

    def score_samples(self, df: DataFrame,
                      output_col: str = "mahalanobis_sq") -> DataFrame:
        """Adds the squared Mahalanobis distance as a pure column
        expression (Σ⁻¹ folded in as literals)."""
        P, mu, cols = self.precision_, self.location_, self.columns_
        cen = [F.col(c).cast("double") - F.lit(float(m))
               for c, m in zip(cols, mu)]
        expr = F.lit(0.0)
        for i in range(len(cols)):
            for j in range(len(cols)):
                expr = expr + F.lit(float(P[i, j])) * cen[i] * cen[j]
        return df.withColumn(output_col, expr)

    def predict(self, df: DataFrame,
                output_col: str = "is_outlier") -> DataFrame:
        if self.threshold is None:
            raise ValueError("set threshold= to use predict(); "
                             "score_samples() needs none")
        scored = self.score_samples(df, "__m2")
        return (scored.withColumn(
            output_col, (F.col("__m2") > float(self.threshold)))
            .drop("__m2"))
