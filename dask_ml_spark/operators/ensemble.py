"""Blockwise voting ensembles.

Reference: dask_ml/ensemble/_blockwise.py:11-291 — fit one clone of
the base estimator per partition; predict aggregates the per-model
predictions (majority vote / mean).

Spark design: fit = applyInPandas over a partition-id grouping, each
group fitting a clone and returning the PICKLED model as bytes (models
are small; data never leaves executors). predict = broadcast model
list + one pandas UDF that stacks votes — for m models this is m
model.predict calls per batch, then mode/mean across axis 0.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_ml_spark.base import BaseEstimator, ClassifierMixin, RegressorMixin


class _BlockwiseBase(BaseEstimator):
    def __init__(self, estimator=None):
        self.estimator = estimator

    def fit(self, df: DataFrame, columns=None, label_col: str = "label") -> "_BlockwiseBase":
        cols = self._validate_data(df, columns)
        est = self.estimator
        sel = df.select(*cols, F.col(label_col).alias("__label"), F.spark_partition_id().alias("__pid"))

        def _fit_block(pdf: pd.DataFrame) -> pd.DataFrame:
            import copy

            model = copy.deepcopy(est)
            X = pdf[cols].to_numpy(dtype="float64")
            y = pdf["__label"].to_numpy()
            model.fit(X, y)
            return pd.DataFrame({"pid": [int(pdf["__pid"].iloc[0])], "model": [pickle.dumps(model)]})

        schema = T.StructType([
            T.StructField("pid", T.IntegerType()),
            T.StructField("model", T.BinaryType()),
        ])
        rows = sel.groupBy("__pid").applyInPandas(_fit_block, schema=schema).collect()
        rows.sort(key=lambda r: r["pid"])
        self.estimators_ = [pickle.loads(r["model"]) for r in rows]
        self.feature_columns_ = cols
        return self

    def _stack(self, df: DataFrame, output_col: str, combine, rtype) -> DataFrame:
        models = self.estimators_
        cols = self.feature_columns_
        bc = df.sparkSession.sparkContext.broadcast(pickle.dumps(models))

        @F.pandas_udf(rtype)
        def _vote(*series: pd.Series) -> pd.Series:
            ms = pickle.loads(bc.value)
            X = np.column_stack([s.to_numpy(dtype="float64") for s in series])
            preds = np.stack([np.asarray(m.predict(X)) for m in ms], axis=0)
            return pd.Series(combine(preds))

        return df.withColumn(output_col, _vote(*[F.col(c).cast("double") for c in cols]))


class BlockwiseVotingClassifier(_BlockwiseBase, ClassifierMixin):
    """Hard-voting classifier (reference _blockwise.py:147-215)."""

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        def majority(preds: np.ndarray):
            # mode along model axis; ties → smallest value (np.unique order)
            out = np.empty(preds.shape[1], dtype=preds.dtype)
            for j in range(preds.shape[1]):
                vals, counts = np.unique(preds[:, j], return_counts=True)
                out[j] = vals[counts.argmax()]
            return out

        return self._stack(df, output_col, majority, T.DoubleType())


class BlockwiseVotingRegressor(_BlockwiseBase, RegressorMixin):
    """Mean-aggregated regressor (reference _blockwise.py:258-291)."""

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        return self._stack(df, output_col, lambda p: p.mean(axis=0), T.DoubleType())
