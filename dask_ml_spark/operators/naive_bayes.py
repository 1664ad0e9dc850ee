"""Gaussian Naive Bayes.

Reference: dask_ml/naive_bayes.py:30-151 — fit computes per-class
mean/var/count (a textbook grouped aggregation), predict is a
broadcast log-likelihood argmax.

Spark design: fit = ONE ``groupBy(label).agg(avg(f_i), var_pop(f_i),
count)`` — hash aggregate with map-side combine, k×d driver state.
predict = pure column expressions: for each class c a log-likelihood
column built from broadcast (theta, sigma) literals, then
argmax via greatest(); entirely JVM-side codegen, zero Python in the
hot path (the reference needs numpy blocks for the same step).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.base import BaseEstimator, ClassifierMixin


class GaussianNB(BaseEstimator, ClassifierMixin):
    def __init__(self, var_smoothing: float = 1e-9, priors=None):
        self.var_smoothing = var_smoothing
        self.priors = priors

    def fit(self, df: DataFrame, columns=None, label_col: str = "label") -> "GaussianNB":
        cols = self._validate_data(df, columns)
        aggs = [F.count("*").alias("__n")]
        for c in cols:
            aggs += [
                F.avg(F.col(c).cast("double")).alias(f"mean_{c}"),
                F.var_pop(F.col(c).cast("double")).alias(f"var_{c}"),
            ]
        rows = df.groupBy(label_col).agg(*aggs).orderBy(label_col).collect()
        self.classes_ = np.asarray([r[label_col] for r in rows])
        self.class_count_ = np.asarray([r["__n"] for r in rows], dtype="float64")
        self.theta_ = np.asarray([[r[f"mean_{c}"] for c in cols] for r in rows])
        var = np.asarray([[r[f"var_{c}"] for c in cols] for r in rows])
        # var_smoothing: largest feature variance epsilon (sklearn parity)
        self.epsilon_ = self.var_smoothing * float(var.max()) if var.size else 0.0
        self.var_ = var + self.epsilon_
        if self.priors is not None:
            self.class_prior_ = np.asarray(self.priors, dtype="float64")
        else:
            self.class_prior_ = self.class_count_ / self.class_count_.sum()
        self.feature_columns_ = cols
        self.label_col_ = label_col
        return self

    def _jll_exprs(self):
        """One log-likelihood Column per class — broadcast numpy state
        folded into the plan as literals (reference naive_bayes.py:123-151)."""
        exprs = []
        for ci in range(len(self.classes_)):
            const = math.log(float(self.class_prior_[ci]))
            for j, c in enumerate(self.feature_columns_):
                const += -0.5 * math.log(2.0 * math.pi * float(self.var_[ci, j]))
            e = F.lit(const)
            for j, c in enumerate(self.feature_columns_):
                mu = float(self.theta_[ci, j])
                sig2 = float(self.var_[ci, j])
                x = F.col(c).cast("double")
                e = e - F.pow(x - F.lit(mu), 2) / F.lit(2.0 * sig2)
            exprs.append(e)
        return exprs

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        jll = self._jll_exprs()
        arr = F.array(*jll)
        best = F.array_position(arr, F.array_max(arr)).cast("int") - 1
        classes = F.array(*[F.lit(c.item() if hasattr(c, "item") else c) for c in self.classes_])
        return df.withColumn(output_col, F.element_at(classes, best + 1))

    def predict_proba(self, df: DataFrame, output_col: str = "probability") -> DataFrame:
        """softmax over joint log-likelihoods (logsumexp-stabilized,
        reference naive_bayes.py:62-121)."""
        jll = self._jll_exprs()
        arr = F.array(*jll)
        mx = F.array_max(arr)
        exps = F.transform(arr, lambda v: F.exp(v - mx))
        total = F.aggregate(exps, F.lit(0.0), lambda a, x: a + x)
        return df.withColumn(output_col, F.transform(exps, lambda v: v / total))

    def predict_log_proba(self, df: DataFrame, output_col: str = "log_probability") -> DataFrame:
        out = self.predict_proba(df, output_col)
        return out.withColumn(output_col, F.transform(F.col(output_col), lambda v: F.log(v)))
