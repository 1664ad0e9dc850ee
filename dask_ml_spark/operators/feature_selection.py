"""Feature selection — sklearn-style, distributed as single wide
aggregates (beyond-reference: dask-ml ships no feature_selection
module, but every tabular pipeline built on it reaches for sklearn's;
reference pipeline surface per SURVEY §2.6 composes these via
``Pipeline``/``ColumnTransformer``).

Every scorer here is ONE aggregation pass over the data — per-class
moment sums for ANOVA, ``corr`` for the regression F — combined
driver-side over #classes x #features scalars. Transform is a column
projection (narrow, zero-cost at any scale). No UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, TransformerMixin
from dask_ml_spark.operators.preprocessing import _nn


class VarianceThreshold(BaseEstimator, TransformerMixin):
    """Remove features whose population variance (ddof=0, the sklearn
    convention) is <= ``threshold``. One ``var_pop`` aggregate row."""

    def __init__(self, threshold: float = 0.0):
        self.threshold = threshold

    def fit(self, df: DataFrame, columns=None) -> "VarianceThreshold":
        cols = self._validate_data(df, columns)
        row = df.agg(*[F.var_pop(_nn(c)).alias(c) for c in cols]).collect()[0]
        self.variances_ = [float(row[c]) if row[c] is not None else 0.0
                           for c in cols]
        self.columns_ = cols
        self.support_ = [bool(v > self.threshold) for v in self.variances_]
        self.transformed_columns_ = [c for c, k in zip(cols, self.support_)
                                     if k]
        return self

    def get_support(self):
        return list(self.support_)

    def transform(self, df: DataFrame) -> DataFrame:
        drop = [c for c, keep in zip(self.columns_, self.support_)
                if not keep]
        return df.drop(*drop)


def f_classif(df: DataFrame, feature_cols, label_col: str = "label"):
    """One-way ANOVA F-statistic per feature (sklearn ``f_classif``):
    F_i = (SS_between/(g-1)) / (SS_within/(N-g)). One
    groupBy(label) pass collecting (n, sum, sum_sq) per feature —
    #classes rows of driver state — then scalar math.

    Returns {feature: F} (inf where SS_within == 0, NaN for g < 2,
    matching sklearn's degenerate conventions). NULL/NaN feature
    values are excluded PER FEATURE (pairwise-complete: each feature's
    class counts track its own non-null rows).
    """
    feats = list(feature_cols)
    aggs = []
    for i, c in enumerate(feats):
        x = _nn(c)
        aggs += [F.count(x).alias(f"__n{i}"),
                 F.sum(x).alias(f"__s{i}"), F.sum(x * x).alias(f"__q{i}")]
    rows = df.groupBy(F.col(label_col).alias("__y")).agg(*aggs).collect()
    out = {}
    for i, c in enumerate(feats):
        # only classes where this feature has data participate
        rs = [r for r in rows if r[f"__n{i}"] > 0]
        g = len(rs)
        n_total = sum(r[f"__n{i}"] for r in rs)
        if g < 2 or n_total <= g:
            out[c] = float("nan")
            continue
        ts = sum(r[f"__s{i}"] for r in rs)
        grand_mean = ts / n_total
        ssb = sum(r[f"__n{i}"] * (r[f"__s{i}"] / r[f"__n{i}"]
                                  - grand_mean) ** 2 for r in rs)
        ssw = sum(r[f"__q{i}"] - r[f"__s{i}"] ** 2 / r[f"__n{i}"]
                  for r in rs)
        # degeneracy must be judged RELATIVE to the feature's magnitude:
        # a constant column leaves both sums as FP dust (~eps * sum_sq),
        # and dust/dust would otherwise fabricate a huge F
        scale = sum(abs(r[f"__q{i}"]) for r in rs) + 1.0
        if ssw <= 1e-12 * scale:
            out[c] = (float("nan") if ssb <= 1e-12 * scale
                      else float("inf"))
        else:
            out[c] = (ssb / (g - 1)) / (ssw / (n_total - g))
    return out


def f_regression(df: DataFrame, feature_cols, target_col: str):
    """Univariate linear-regression F-test per feature (sklearn
    ``f_regression``): F_i = r_i^2 / (1 - r_i^2) * (n_i - 2) with r_i
    the Pearson correlation and n_i the PAIRWISE-COMPLETE count —
    ``corr`` silently skips incomplete pairs, so the degrees of freedom
    must count the same rows or NULLs inflate F. One agg."""
    feats = list(feature_cols)
    y = _nn(target_col)
    aggs = []
    for i, c in enumerate(feats):
        x = _nn(c)
        aggs += [F.corr(x, y).alias(f"__r{i}"),
                 F.count(F.when(x.isNotNull() & y.isNotNull(), 1))
                 .alias(f"__n{i}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for i, c in enumerate(feats):
        r, n = row[f"__r{i}"], row[f"__n{i}"]
        if r is None or n <= 2:
            out[c] = float("nan")
        elif abs(r) >= 1.0:
            out[c] = float("inf")
        else:
            out[c] = r * r / (1.0 - r * r) * (n - 2)
    return out


def chi2(df: DataFrame, feature_cols, label_col: str = "label"):
    """sklearn ``chi2``: treats each NON-NEGATIVE feature as a mass
    distributed over classes and tests observed per-class mass against
    the expectation under independence (class priors from row counts):
    chi2_i = sum_g (obs_gi - exp_gi)^2 / exp_gi. One groupBy(label)
    pass of (n, sum, min) per feature; a negative value raises (the
    sklearn contract); all-zero features score NaN.

    NULL/NaN edge (sklearn parity note): NULL/NaN rows contribute
    ZERO mass to a feature's per-class observed sums but still count
    toward the class priors (the row-count n used for expectations) —
    sklearn has no such rows because it rejects NaN input outright.
    With a shared null pattern across features this shrinks every
    statistic toward independence proportionally (ranking preserved);
    with per-feature null patterns the priors are those of the whole
    frame, not of each feature's non-null subset. For exact sklearn
    semantics drop null rows first:
    ``chi2(df.dropna(subset=feats + [label]), feats)`` equals
    sklearn's ``chi2(X, y)`` on the same dense matrix (tested)."""
    feats = list(feature_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(feats):
        x = _nn(c)
        aggs += [F.sum(x).alias(f"__s{i}"), F.min(x).alias(f"__m{i}")]
    rows = df.groupBy(F.col(label_col).alias("__y")).agg(*aggs).collect()
    n_total = sum(r["__n"] for r in rows)
    out = {}
    for i, c in enumerate(feats):
        mins = [r[f"__m{i}"] for r in rows if r[f"__m{i}"] is not None]
        if mins and min(mins) < 0:
            raise ValueError(f"chi2 requires non-negative features; "
                             f"{c!r} has negative values")
        total = sum(r[f"__s{i}"] or 0.0 for r in rows)
        if len(rows) < 2 or total <= 0:
            out[c] = float("nan")
            continue
        stat = 0.0
        for r in rows:
            exp = total * r["__n"] / n_total
            obs = r[f"__s{i}"] or 0.0
            stat += (obs - exp) ** 2 / exp
        out[c] = stat
    return out


class SelectKBest(BaseEstimator, TransformerMixin):
    """Keep the k features with the highest score (``f_classif`` for
    classification targets, ``f_regression`` for continuous ones).
    Ties keep the earlier column (sklearn's stable argsort)."""

    def __init__(self, k: int = 10, score_func: str = "f_classif"):
        self.k = k
        self.score_func = score_func

    def fit(self, df: DataFrame, columns=None,
            label_col: str = "label") -> "SelectKBest":
        cols = self._validate_data(df, columns)
        cols = [c for c in cols if c != label_col]
        if self.score_func == "f_classif":
            scores = f_classif(df, cols, label_col)
        elif self.score_func == "f_regression":
            scores = f_regression(df, cols, label_col)
        elif self.score_func == "chi2":
            scores = chi2(df, cols, label_col)
        else:
            raise ValueError(f"unknown score_func {self.score_func!r}")
        self.columns_ = cols
        self.scores_ = [scores[c] for c in cols]
        order = sorted(range(len(cols)),
                       key=lambda i: (-(self.scores_[i]
                                        if not math.isnan(self.scores_[i])
                                        else float("-inf")), i))
        chosen = set(order[:self.k])
        self.support_ = [i in chosen for i in range(len(cols))]
        self.transformed_columns_ = [c for c, keep in zip(cols, self.support_)
                                     if keep]
        return self

    def get_support(self):
        return list(self.support_)

    def transform(self, df: DataFrame) -> DataFrame:
        drop = [c for c, keep in zip(self.columns_, self.support_)
                if not keep]
        return df.drop(*drop)
