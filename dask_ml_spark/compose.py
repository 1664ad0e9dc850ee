"""dask_ml.compose-compatible namespace."""

from dask_ml_spark.operators.compose import (  # noqa: F401
    ColumnTransformer,
    FeatureUnion,
    Pipeline,
    make_column_transformer,
    make_pipeline,
)
