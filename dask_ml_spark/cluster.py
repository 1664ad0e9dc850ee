"""dask_ml.cluster-compatible namespace."""

from dask_ml_spark.operators.cluster import KMeans, SpectralClustering  # noqa: F401
