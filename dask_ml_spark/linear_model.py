"""dask_ml.linear_model-compatible namespace."""

from dask_ml_spark.operators.linear_model import (  # noqa: F401
    LinearRegression,
    LogisticRegression,
    PoissonRegression,
)
