"""Estimator base protocol.

Mirrors the sklearn fit/transform/predict protocol that the reference
exposes (reference: dask_ml/base.py, dask_ml/_utils.py:8-12), with
Spark DataFrames as the collection type. Fitted state ("learned
attributes", trailing-underscore names) is small driver-side numpy /
Python state, broadcast to executors inside transform expressions —
never the data itself.
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame

from dask_ml_spark.utils import (  # noqa: F401  (re-exported for
    check_array,  # dask_ml.base namespace parity, reference base.py:1-5)
    check_X_y,
    resolve_feature_columns,
)


class BaseEstimator:
    """Minimal sklearn-style estimator over Spark DataFrames.

    Parameters are constructor args stored verbatim; ``get_params`` /
    ``set_params`` / ``clone`` support the model-selection machinery
    (reference: model_selection/_normalize.py hashing requires stable
    param dicts).
    """

    def get_params(self, deep: bool = True) -> dict:
        import inspect

        sig = inspect.signature(type(self).__init__)
        return {
            name: getattr(self, name)
            for name in sig.parameters
            if name not in ("self", "args", "kwargs") and hasattr(self, name)
        }

    def set_params(self, **params) -> "BaseEstimator":
        for k, v in params.items():
            if not hasattr(self, k):
                raise ValueError(f"Invalid parameter {k!r} for {type(self).__name__}")
            setattr(self, k, v)
        return self

    def clone(self) -> "BaseEstimator":
        cls = type(self)
        return cls(**{k: copy.deepcopy(v) for k, v in self.get_params().items()})

    # The library-wide fit/transform contract is COLUMN-SCOPED: an
    # estimator reads only the `columns` it is handed (plus the
    # label). Estimators that read OTHER frame columns (arbitrary
    # per-partition funcs, transformers with their own column specs)
    # must override required_input_columns — the CV planners use it to
    # prune the fold cache, and an over-narrow answer would break
    # their fits.
    def required_input_columns(self, columns):
        """Input-frame columns this estimator's fit/transform reads,
        given the `columns` it will be called with; None = unknown
        (callers must keep the full frame)."""
        return list(columns) if columns is not None else None

    def prepare_cv_cache(self, df, columns, label_col):
        """Hook for CV planners (GridSearchCV & co): transform the
        frame ONCE, before it is split into folds and persisted, with
        any row-wise parameter-independent preparation every candidate
        fit would otherwise repeat (e.g. the GLMs assemble their
        ``__features`` vector here so k*n_candidates fits share one
        cached copy instead of persisting k*n_candidates private
        ones). Must be row-wise (no shuffle, no fitting — it runs
        BEFORE the train/test split, so anything data-dependent here
        would leak). Default: no-op."""
        return df

    def save(self, path: str) -> str:
        """Persist the estimator (params + fitted state) with pickle.
        Every estimator here is a plain Python object whose fitted
        state is driver-sized (coefficients, centers, dictionaries,
        edges) — the DataFrames they consume are never part of the
        state, so the artifact stays small and survives across
        SparkSessions. Returns the path."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self, f)
        return path

    @classmethod
    def load(cls, path: str) -> "BaseEstimator":
        """Inverse of `save`. Loading through a subclass checks the
        type (StandardScaler.load won't silently return a KMeans);
        loading through BaseEstimator accepts any estimator."""
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
        if cls is not BaseEstimator and not isinstance(obj, cls):
            raise TypeError(
                f"{path!r} holds a {type(obj).__name__}, not a {cls.__name__}")
        return obj

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in sorted(self.get_params().items()))
        return f"{type(self).__name__}({params})"

    # -- validation ------------------------------------------------------
    def _validate_data(
        self, df: DataFrame, columns=None, reset: bool = True
    ) -> list[str]:
        """Resolve + check feature columns; track ``n_features_in_``.

        Spark analog of the reference's ``_validate_data``
        (dask_ml/base.py:8-100): schema is authoritative (StructType),
        so validation is a driver-side schema check — no data pass.
        """
        cols = resolve_feature_columns(df, columns)
        if reset:
            self.n_features_in_ = len(cols)
            self.feature_names_in_ = list(cols)
        else:
            if getattr(self, "n_features_in_", len(cols)) != len(cols):
                raise ValueError(
                    f"X has {len(cols)} features, but {type(self).__name__} "
                    f"is expecting {self.n_features_in_} features as input"
                )
        return cols


class TransformerMixin:
    def fit_transform(self, df: DataFrame, columns=None, **kwargs) -> DataFrame:
        return self.fit(df, columns=columns, **kwargs).transform(df)


class ClassifierMixin:
    _estimator_type = "classifier"

    def score(self, df: DataFrame, label_col: str = "label", prediction_col: str = "prediction") -> float:
        from dask_ml_spark.functions.metrics import accuracy_score

        pred = self.predict(df)
        return accuracy_score(pred, label_col=label_col, prediction_col=prediction_col)


class RegressorMixin:
    _estimator_type = "regressor"

    def score(self, df: DataFrame, label_col: str = "label", prediction_col: str = "prediction") -> float:
        from dask_ml_spark.functions.metrics import r2_score

        pred = self.predict(df)
        return r2_score(pred, label_col=label_col, prediction_col=prediction_col)


# Reference base.py:7-100 ships _validate_data as a mixin; here every
# estimator inherits it from BaseEstimator, so the mixin is an alias.
DaskMLBaseMixin = BaseEstimator
