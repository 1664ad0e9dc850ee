"""dask_ml.xgboost-compatible namespace.

The reference module is a thin re-export of the external dask_xgboost
integration (reference dask_ml/xgboost.py:1-8) and fails to import
without it. The Spark analog is the official distributed XGBoost
integration that ships inside xgboost itself (xgboost.spark,
xgboost >= 1.7): SparkXGBClassifier / SparkXGBRegressor train with one
barrier-mode Spark job and predict via Arrow-batched UDFs. Import is
gated the same way the reference gates dask_xgboost.
"""

try:
    from xgboost.spark import (  # noqa: F401
        SparkXGBClassifier,
        SparkXGBClassifierModel,
        SparkXGBRegressor,
        SparkXGBRegressorModel,
    )
except ImportError as e:  # pragma: no cover - xgboost not in this image
    raise ImportError(
        "dask_ml_spark.xgboost requires the xgboost package (>=1.7, "
        "which bundles the xgboost.spark integration): pip install xgboost"
    ) from e
