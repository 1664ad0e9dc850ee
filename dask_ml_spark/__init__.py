"""dask_ml_spark — a PySpark-native distributed ML / analytics engine.

Re-expresses the capabilities of dask-ml (reference: /root/reference, BSD)
on top of the Spark DataFrame API: estimator fitting is Spark SQL
aggregation, transforms are column expressions or Arrow-batched pandas
UDFs, iterative algorithms are driver-orchestrated Spark jobs, and
hyperparameter search runs concurrent Spark jobs over cached folds
(grid) or executor-side (model_id, batch) training rounds (adaptive).

Everything here is Spark-first: logical plans are declared with the
DataFrame/SQL API so Catalyst can push filters, prune columns and pick
join strategies; Python executes only where JVM operators genuinely
cannot express the semantics (sklearn-protocol interop, CDF interpolation,
custom kernels), and then always via Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from dask_ml_spark._session import get_spark

__all__ = ["get_spark", "__version__"]
