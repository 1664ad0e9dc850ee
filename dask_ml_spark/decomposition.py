"""dask_ml.decomposition-compatible namespace."""

from dask_ml_spark.operators.decomposition import (  # noqa: F401
    PCA,
    IncrementalPCA,
    TruncatedSVD,
)
