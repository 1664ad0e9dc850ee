"""dask_ml.impute-compatible namespace."""

from dask_ml_spark.operators.preprocessing import SimpleImputer  # noqa: F401
