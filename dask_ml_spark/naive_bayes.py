"""dask_ml.naive_bayes-compatible namespace."""

from dask_ml_spark.operators.naive_bayes import GaussianNB  # noqa: F401
