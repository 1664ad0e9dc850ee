"""Random projections (Johnson-Lindenstrauss dimensionality
reduction).

sklearn.random_projection parity (GaussianRandomProjection /
SparseRandomProjection / johnson_lindenstrauss_min_dim) — the
reference defers to sklearn via its wrapper surface; here the
projection is first-class because it is the natural 100 TB
preprocessor ahead of the ANN / k-NN-graph / k-center operators: it
needs NO data pass to fit (the matrix depends only on shapes and the
seed), and transform folds the matrix into column expressions — a
narrow JVM projection, no UDF, no shuffle, exactly like PCA.transform
(decomposition.py:249).

Sparse (Achlioptas 2003 / Li 2006): entries are 0 with probability
1−density, else ±sqrt(1/density)/sqrt(k) — at the default
density=1/sqrt(d) the fold touches ~k·sqrt(d) terms instead of k·d,
which is also what keeps wide-d transforms inside the codegen budget.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, TransformerMixin


def johnson_lindenstrauss_min_dim(n_samples: int, eps: float = 0.1) -> int:
    """Minimum k preserving pairwise distances to within 1±eps
    (the JL bound sklearn uses: 4·ln n / (eps²/2 − eps³/3))."""
    if not 0 < eps < 1:
        raise ValueError("eps must be in (0, 1)")
    denom = (eps ** 2 / 2.0) - (eps ** 3 / 3.0)
    # ceil, not trunc: flooring would return a k one below the bound
    return int(math.ceil(4.0 * math.log(n_samples) / denom))


class _BaseRandomProjection(BaseEstimator, TransformerMixin):
    def __init__(self, n_components: int = 64, random_state: int = 0):
        self.n_components = n_components
        self.random_state = random_state

    def _make_components(self, d: int) -> np.ndarray:
        raise NotImplementedError

    def fit(self, df: DataFrame, columns=None):
        cols = self._validate_data(df, columns)
        # no data pass: the matrix depends only on (d, k, seed)
        self.components_ = self._make_components(len(cols))
        self.feature_columns_ = cols
        return self

    def transform(self, df: DataFrame, prefix: str = "rp") -> DataFrame:
        exprs = {}
        for ki, comp in enumerate(self.components_):
            e = F.lit(0.0)
            for c, w in zip(self.feature_columns_, comp):
                if w != 0.0:  # sparse rows skip their zero terms
                    e = e + F.col(c).cast("double") * F.lit(float(w))
            exprs[f"{prefix}{ki}"] = e
        return df.withColumns(exprs)


class GaussianRandomProjection(_BaseRandomProjection):
    """Dense N(0, 1/k) projection matrix."""

    def _make_components(self, d: int) -> np.ndarray:
        rng = np.random.RandomState(self.random_state)
        return rng.normal(0.0, 1.0 / math.sqrt(self.n_components),
                          (self.n_components, d))


class SparseRandomProjection(_BaseRandomProjection):
    """Achlioptas/Li sparse projection: P(±s/√k) = density/2 each,
    0 otherwise, s = √(1/density); density=None → 1/√d (Li 2006)."""

    def __init__(self, n_components: int = 64, density: float | None = None,
                 random_state: int = 0):
        super().__init__(n_components, random_state)
        self.density = density

    def _make_components(self, d: int) -> np.ndarray:
        density = self.density if self.density is not None \
            else 1.0 / math.sqrt(d)
        if not 0 < density <= 1:
            raise ValueError("density must be in (0, 1]")
        rng = np.random.RandomState(self.random_state)
        scale = math.sqrt(1.0 / density) / math.sqrt(self.n_components)
        u = rng.uniform(size=(self.n_components, d))
        comp = np.zeros((self.n_components, d))
        comp[u < density / 2.0] = -scale
        comp[u > 1.0 - density / 2.0] = scale
        self.density_ = density
        return comp
