"""dask_ml.wrappers-compatible namespace."""

from dask_ml_spark.operators.wrappers import (  # noqa: F401
    BlockTransformer,
    Incremental,
    ParallelPostFit,
)
from dask_ml_spark.utils import copy_learned_attributes  # noqa: F401
