"""dask_ml.ensemble-compatible namespace."""

from dask_ml_spark.operators.ensemble import (  # noqa: F401
    BlockwiseVotingClassifier,
    BlockwiseVotingRegressor,
)
