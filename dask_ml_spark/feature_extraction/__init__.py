from dask_ml_spark.feature_extraction import text  # noqa: F401
