"""sklearn.neighbors-style namespace (beyond the dask-ml surface)."""

from dask_ml_spark.operators.neighbors import (  # noqa: F401
    KNeighborsClassifier,
    KNeighborsRegressor,
)
