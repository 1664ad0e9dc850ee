from dask_ml_spark.functions import metrics, vector  # noqa: F401
