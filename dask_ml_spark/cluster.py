"""dask_ml.cluster-compatible namespace."""

from dask_ml_spark.operators.cluster import (  # noqa: F401
    DBSCAN,
    KMeans,
    SpectralClustering,
)
