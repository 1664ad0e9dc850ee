"""dask_ml.feature_extraction.text-compatible namespace."""

from dask_ml_spark.operators.text import (  # noqa: F401
    CountVectorizer,
    FeatureHasher,
    HashingVectorizer,
    TfidfTransformer,
)
