"""sklearn.feature_selection-style namespace (beyond-reference:
dask-ml ships no feature_selection module; these compose with
``Pipeline``/``ColumnTransformer`` like their sklearn namesakes)."""

from dask_ml_spark.operators.feature_selection import (  # noqa: F401
    SelectKBest,
    VarianceThreshold,
    chi2,
    f_classif,
    f_regression,
)
